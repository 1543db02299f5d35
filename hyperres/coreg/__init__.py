from .local import (CoregResult, TiePoint, coregister_local,
                    deshift, shift_field)
from .granule import (
    coregister_s2_to_emit, s2_bandmap_from_descriptions, closest_band_1based,
)

__all__ = [
    "CoregResult", "TiePoint", "coregister_local", "deshift",
    "shift_field",
    "coregister_s2_to_emit", "s2_bandmap_from_descriptions",
    "closest_band_1based",
]
