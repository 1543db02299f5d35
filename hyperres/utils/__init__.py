from .compile_cache import enable_compilation_cache
from .profiling import StageTimer, profile_trace

__all__ = ["StageTimer", "profile_trace", "enable_compilation_cache"]
