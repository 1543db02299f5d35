"""Per-band linear calibration (pseudo -> real) — demo cells 65/72."""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..kernels.lstsq import linear_fit_masked


def calibrate_linear(
    pseudo_stack: np.ndarray,
    real_stack: np.ndarray,
    valid_mask: np.ndarray,
    min_valid: float = 0.0,
    min_count: int = 50,
) -> Tuple[np.ndarray, List[Tuple[float, float]]]:
    """Fit per-band y = a*x + b mapping pseudo -> real on valid pixels and
    return (corrected stack (B, H, W) float32, [(a, b), ...]).

    Reference semantics (demo cell 72): validity requires the shared mask,
    finite x and y, and x, y > min_valid; identity fallback below
    ``min_count`` samples. The correction is applied to *all* pixels."""
    pseudo = np.asarray(pseudo_stack, dtype=np.float32)
    real = np.asarray(real_stack, dtype=np.float32)
    nb = pseudo.shape[0]
    corrected = np.zeros_like(pseudo)
    params: List[Tuple[float, float]] = []
    for k in range(nb):
        x = pseudo[k]
        y = real[k]
        vk = (np.asarray(valid_mask, dtype=bool)
              & np.isfinite(x) & np.isfinite(y)
              & (x > min_valid) & (y > min_valid))
        a, b = linear_fit_masked(
            jnp.asarray(x.ravel()), jnp.asarray(y.ravel()),
            jnp.asarray(vk.ravel()), min_count=min_count)
        a, b = float(a), float(b)
        corrected[k] = (x * a + b).astype(np.float32)
        params.append((a, b))
    return corrected, params
