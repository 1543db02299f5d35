"""Optimal-transport colour/statistical matching model family.

Reference semantics reproduced:
- ``ot_match_rgb_sinkhorn`` — sample, Sinkhorn, barycentric projection,
  affine fit, apply+clip (s2_emit/color.py:65-116);
- ``fit_ot_affine_rgb`` / ``apply_affine_rgb`` — demo notebook cell 74;
- ``fit_ot_poly_rgb`` / ``apply_poly_rgb`` — s2_emit/poly_regression.py:
  16-84 and demo cell 81, including the identity fallback under 200
  valid pixels (coeff layout (C, deg+1), highest power first, with the
  linear term set to 1).

Sampling happens on the host (exact reference RNG parity); the Sinkhorn
plan, barycentric targets and the fits run on device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.config import OTConfig
from ..kernels.lstsq import affine_fit, polyfit, polyval_channels
from ..kernels.sinkhorn import ot_barycentric_targets
from .sampling import sample_valid_pixels_host


def _sample_pair(src_rgb, ref_rgb, mask, n_samples, seed):
    rng = np.random.default_rng(seed)
    X = sample_valid_pixels_host(np.asarray(src_rgb), np.asarray(mask),
                                 n_samples, rng=rng)
    Y = sample_valid_pixels_host(np.asarray(ref_rgb), np.asarray(mask),
                                 n_samples, rng=rng)
    return X, Y


def _barycentric(X: np.ndarray, Y: np.ndarray, cfg: OTConfig) -> np.ndarray:
    Ybar = ot_barycentric_targets(
        jnp.asarray(X, dtype=jnp.float32), jnp.asarray(Y, dtype=jnp.float32),
        reg=cfg.reg, num_itermax=cfg.num_itermax, stop_thr=cfg.stop_thr,
        debias=getattr(cfg, "debias", False))
    return np.asarray(Ybar, dtype=np.float64)


def fit_ot_affine(
    src_rgb: np.ndarray,
    ref_rgb: np.ndarray,
    mask: np.ndarray,
    cfg: OTConfig = OTConfig(),
) -> Tuple[np.ndarray, np.ndarray]:
    """(A (C, C), t (C,)) via OT barycentric targets + lstsq (demo cell 74).
    Identity fallback when under 2 valid pixels."""
    X, Y = _sample_pair(src_rgb, ref_rgb, mask, cfg.n_samples, cfg.seed)
    c = src_rgb.shape[-1]
    if X.shape[0] < 2 or Y.shape[0] < 2:
        return np.eye(c, dtype=np.float64), np.zeros(c, dtype=np.float64)
    Ybar = _barycentric(X, Y, cfg)
    A, t = affine_fit(jnp.asarray(X, dtype=jnp.float32),
                      jnp.asarray(Ybar, dtype=jnp.float32))
    return np.asarray(A, dtype=np.float64), np.asarray(t, dtype=np.float64)


def apply_affine(rgb: np.ndarray, A: np.ndarray, t: np.ndarray,
                 mask: Optional[np.ndarray] = None) -> np.ndarray:
    """rgb' = rgb @ A + t, clipped to [0, 1]; outside-mask pixels kept
    (demo cell 74)."""
    out = np.asarray(rgb, dtype=np.float32).copy()
    if mask is None:
        Y = out.reshape(-1, out.shape[-1]).astype(np.float64) @ A + t
        return np.clip(Y, 0, 1).reshape(out.shape).astype(np.float32)
    X = out[mask].reshape(-1, out.shape[-1]).astype(np.float64)
    Y = np.clip(X @ A + t, 0, 1)
    out[mask] = Y.reshape(out[mask].shape).astype(np.float32)
    return out


def ot_match_rgb_sinkhorn(
    src_rgb: np.ndarray,
    ref_rgb: np.ndarray,
    mask: np.ndarray,
    n_samples: int = 5000,
    reg: float = 0.05,
    num_itermax: int = 300,
    stop_thr: float = 1e-6,
    seed: int = 0,
) -> np.ndarray:
    """Full OT colour transfer (color.py:65-116): returns src with masked
    pixels affinely mapped toward ref's distribution, clipped to [0, 1].
    Unchanged copy when fewer than 2 valid pixels."""
    cfg = OTConfig(n_samples=n_samples, reg=reg, num_itermax=num_itermax,
                   stop_thr=stop_thr, seed=seed)
    X, Y = _sample_pair(src_rgb, ref_rgb, mask, cfg.n_samples, cfg.seed)
    if X.shape[0] < 2 or Y.shape[0] < 2:
        return np.asarray(src_rgb).copy()
    Ybar = _barycentric(X, Y, cfg)
    A, t = affine_fit(jnp.asarray(X, dtype=jnp.float32),
                      jnp.asarray(Ybar, dtype=jnp.float32))
    return apply_affine(src_rgb, np.asarray(A, dtype=np.float64),
                        np.asarray(t, dtype=np.float64), mask)


def fit_ot_poly(
    src_rgb: np.ndarray,
    ref_rgb: np.ndarray,
    mask: np.ndarray,
    deg: int = 2,
    cfg: OTConfig = OTConfig(),
    min_pixels: int = 200,
) -> np.ndarray:
    """Per-channel polynomial coefficients (C, deg+1), highest power
    first, fit on OT barycentric targets (poly_regression.py:16-62)."""
    c = src_rgb.shape[-1]
    X, Y = _sample_pair(src_rgb, ref_rgb, mask, cfg.n_samples, cfg.seed)
    if X.shape[0] < min_pixels or Y.shape[0] < min_pixels:
        coeffs = np.zeros((c, deg + 1), dtype=np.float64)
        coeffs[:, -2] = 1.0  # identity fallback (poly_regression.py:38-41)
        return coeffs
    Ybar = _barycentric(X, Y, cfg)
    coeffs = np.zeros((c, deg + 1), dtype=np.float64)
    for ch in range(c):
        coeffs[ch] = np.asarray(polyfit(
            jnp.asarray(X[:, ch], dtype=jnp.float32),
            jnp.asarray(Ybar[:, ch], dtype=jnp.float32), deg))
    return coeffs


def apply_poly(rgb: np.ndarray, coeffs: np.ndarray,
               mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Per-channel polynomial application, clipped to [0, 1]; only masked
    pixels are replaced when a mask is given (poly_regression.py:65-84)."""
    out = np.asarray(rgb, dtype=np.float32).copy()
    mapped = np.asarray(polyval_channels(
        jnp.asarray(coeffs, dtype=jnp.float32), jnp.asarray(out)))
    if mask is None:
        return np.clip(mapped, 0.0, 1.0)
    out[mask] = mapped[mask]
    return np.clip(out, 0.0, 1.0)
