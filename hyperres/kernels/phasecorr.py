"""Batched FFT phase correlation with subpixel peak refinement.

Device replacement for AROSICS' per-tie-point FFT shift estimation
(the black box behind s2_emit/arosics_coreg.py:135-163). All tie-point
windows are processed as one batched program:

  windows -> Hann taper -> rFFT2 -> normalised cross-power spectrum ->
  irFFT2 -> argmax (wrapped) -> 3-point parabolic subpixel refinement,

with a reliability score in AROSICS' spirit: the correlation-surface
peak prominence ((peak - mean) / std, scaled to ~0-100).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# Reliability scale: reliability = 100 * (1 - exp(-snr / RELIABILITY_TAU))
# where snr = (corr peak - mean) / std. Calibrated on synthetic
# texture x noise x shift sweeps incl. the cross-resolution (6x + 1/6
# low-pass) case (scripts/calibrate_coreg_reliability.py) so that the
# AROSICS-semantics default threshold min_reliability=60
# (s2_emit/arosics_coreg.py:102) accepts exactly the windows whose shift
# recovery error is < 0.5 px with >= 99% probability on the ensemble.
# Measured: snr* = 19.1 over 1440 windows (4 texture scales x 6 noise
# levels same-res + 3 x 4 cross-res, accept rate at snr* = 99.2%), so
# tau = snr* / ln(100/40).
RELIABILITY_TAU = 20.8


def _hann2d(h: int, w: int) -> np.ndarray:
    wy = np.hanning(h)
    wx = np.hanning(w)
    return (wy[:, None] * wx[None, :]).astype(np.float32)


@partial(jax.jit, static_argnames=("lowpass_frac",))
def phase_correlate_batch(ref: jax.Array, tgt: jax.Array,
                          lowpass_frac: float = 1.0
                          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """ref/tgt (N, H, W) float32 -> (dy (N,), dx (N,), reliability (N,)).

    The returned shift is the amount the *target* is displaced relative
    to the reference: shifting tgt by (-dy, -dx) aligns it to ref.

    ``lowpass_frac`` masks the cross-power spectrum beyond that fraction
    of Nyquist. Essential when the reference is an upsampled coarser
    raster (e.g. EMIT 60 m matched on the S2 10 m grid: frac ~ 1/6):
    spectral whitening would otherwise amplify frequencies where the
    reference has no signal at all, biasing the subpixel peak."""
    n, h, w = ref.shape
    win = jnp.asarray(_hann2d(h, w))

    def norm(x):
        m = jnp.mean(x, axis=(1, 2), keepdims=True)
        return (x - m) * win[None]

    F1 = jnp.fft.rfft2(norm(ref))
    F2 = jnp.fft.rfft2(norm(tgt))
    cross = F1 * jnp.conj(F2)
    cross = cross / (jnp.abs(cross) + 1e-12)
    if lowpass_frac < 1.0:
        fy = jnp.fft.fftfreq(h)[:, None]      # cycles/sample, |fy| <= 0.5
        fx = jnp.fft.rfftfreq(w)[None, :]
        rad = jnp.sqrt(fy * fy + fx * fx) / 0.5
        cross = cross * (rad <= lowpass_frac)[None]
    corr = jnp.fft.irfft2(cross, s=(h, w))  # (N, H, W)

    flat = corr.reshape(n, -1)
    peak_idx = jnp.argmax(flat, axis=1)
    py = peak_idx // w
    px = peak_idx % w

    # 3-point parabolic refinement around the (wrapped) peak
    def parabola(cm, c0, cp):
        denom = cm - 2.0 * c0 + cp
        off = jnp.where(jnp.abs(denom) > 1e-12,
                        0.5 * (cm - cp) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    bi = jnp.arange(n)
    c0 = corr[bi, py, px]
    cym = corr[bi, (py - 1) % h, px]
    cyp = corr[bi, (py + 1) % h, px]
    cxm = corr[bi, py, (px - 1) % w]
    cxp = corr[bi, py, (px + 1) % w]
    dy = py.astype(jnp.float32) + parabola(cym, c0, cyp)
    dx = px.astype(jnp.float32) + parabola(cxm, c0, cxp)
    # unwrap: shifts beyond half the window are negative, then negate so
    # the result is the displacement of tgt relative to ref (tgt(r, c) =
    # ref(r - dy, c - dx) => returns (dy, dx))
    dy = jnp.where(dy > h / 2.0, dy - h, dy)
    dx = jnp.where(dx > w / 2.0, dx - w, dx)
    dy = -dy
    dx = -dx

    # reliability: peak prominence of the correlation surface, mapped to
    # a 0-100 scale calibrated so 60 == the AROSICS-default acceptance
    # boundary (see RELIABILITY_TAU above)
    mean = jnp.mean(flat, axis=1)
    std = jnp.std(flat, axis=1) + 1e-12
    snr = (c0 - mean) / std
    reliability = 100.0 * (1.0 - jnp.exp(-snr / RELIABILITY_TAU))
    return dy, dx, reliability


def estimate_shift(ref_img: np.ndarray, tgt_img: np.ndarray
                   ) -> Tuple[float, float, float]:
    """Single-pair convenience wrapper; returns (dy, dx, reliability)."""
    dy, dx, rel = phase_correlate_batch(
        jnp.asarray(ref_img, jnp.float32)[None],
        jnp.asarray(tgt_img, jnp.float32)[None])
    return float(dy[0]), float(dx[0]), float(rel[0])
