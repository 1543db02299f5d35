"""Histogram matching (CDF transfer) — s2_emit/color.py:36-63.

Device implementation: per channel, sort the masked reference values and
map each masked source value through its empirical CDF rank into the
reference quantile function. Fixed shapes via 0-weighted invalid slots.

The reference may have a different shape/mask than the source (e.g. a
10 m source matched against the 60 m stretched reference distribution the
fit used — keeps the normalization consistent across resolutions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _match_channel_device(src: jax.Array, src_mask: jax.Array,
                          ref: jax.Array, ref_mask: jax.Array) -> jax.Array:
    """(H, W) channel histogram match within masks. Masked-out source
    pixels pass through unchanged (color.py:49-53)."""
    flat_src = src.ravel()
    flat_ref = ref.ravel()
    flat_sm = src_mask.ravel()
    flat_rm = ref_mask.ravel()
    n_src = jnp.sum(flat_sm)
    n_ref = jnp.sum(flat_rm)

    # reference quantile function: sorted valid values (invalid -> +inf at
    # the tail, never indexed because positions stay < n_ref)
    ref_sorted = jnp.sort(jnp.where(flat_rm, flat_ref, jnp.inf))

    # source CDF rank of each pixel among valid source values:
    # searchsorted over the sorted valid source values
    src_sorted = jnp.sort(jnp.where(flat_sm, flat_src, jnp.inf))
    ranks = jnp.searchsorted(src_sorted, flat_src, side="right")
    quant = ranks.astype(jnp.float32) / jnp.maximum(n_src, 1).astype(
        jnp.float32)

    # interpolate into the reference quantile function
    pos = quant * (n_ref.astype(jnp.float32) - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0,
                  jnp.maximum(n_ref - 1, 0))
    hi = jnp.clip(lo + 1, 0, jnp.maximum(n_ref - 1, 0))
    t = pos - lo.astype(jnp.float32)
    matched = (1.0 - t) * jnp.take(ref_sorted, lo) + t * jnp.take(
        ref_sorted, hi)
    out = jnp.where(flat_sm, matched, flat_src)
    return out.reshape(src.shape)


@jax.jit
def _match_rgb_device(src_rgb: jax.Array, src_mask: jax.Array,
                      ref_rgb: jax.Array, ref_mask: jax.Array) -> jax.Array:
    chans = [
        _match_channel_device(src_rgb[..., c], src_mask,
                              ref_rgb[..., c], ref_mask)
        for c in range(src_rgb.shape[-1])
    ]
    return jnp.clip(jnp.stack(chans, axis=-1), 0.0, 1.0)


def histogram_match_rgb(src_rgb: np.ndarray, ref_rgb: np.ndarray,
                        mask: np.ndarray,
                        ref_mask: np.ndarray = None) -> np.ndarray:
    """Channel-wise histogram matching within mask, clipped to [0, 1]
    (color.py:55-63). Inputs (H, W, C) in [0, 1]. ``ref_mask`` lets the
    reference distribution come from a different raster/mask than the
    source (defaults to the shared ``mask``, the reference behaviour)."""
    if ref_mask is None:
        ref_mask = mask
    out = _match_rgb_device(
        jnp.asarray(src_rgb, dtype=jnp.float32),
        jnp.asarray(np.asarray(mask, dtype=bool)),
        jnp.asarray(ref_rgb, dtype=jnp.float32),
        jnp.asarray(np.asarray(ref_mask, dtype=bool)))
    return np.asarray(out)
