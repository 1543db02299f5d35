from .profiling import StageTimer, profile_trace

__all__ = ["StageTimer", "profile_trace"]
