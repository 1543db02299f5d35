"""Pallas TPU kernels for the hot ops (opt-in fused variants).

The XLA-level kernels in this package already hit the MXU/VPU well; the
Pallas variants here fuse the masking/fill elementwise work into the
same VMEM pass so nodata handling costs no extra HBM round trip:

- ``pallas_srf_synthesize``: tiled (rows, B) x (B, S) band-mixing matmul
  with the nodata fill fused into the tile epilogue (the SRF synthesis,
  s2_emit/synth.py:41-43, as one VMEM-resident pass),
- ``pallas_quantize_u16``: scale/clip/round/sentinel quantization
  (gdal_translate -scale semantics, emit_proj.py:248-276) on the VPU.

On CPU (tests) the kernels run in interpreter mode; on TPU they compile
through Mosaic. Public entry points fall back to the XLA versions when
Pallas is unavailable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import NO_DATA_VALUE


def _on_cpu() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pallas_srf_synthesize(
    cube_flat: jax.Array,        # (N, B) float32
    weights: jax.Array,          # (B, S) float32
    valid: Optional[jax.Array] = None,  # (N,) bool
    fill_value: float = NO_DATA_VALUE,
    tile_rows: int = 1024,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """(N, B) @ (B, S) with the invalid-row fill fused into the kernel.
    N is padded to the tile size internally; returns (N, S) float32."""
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = _on_cpu()

    n, b = cube_flat.shape
    s = weights.shape[1]
    # pad operands to hardware-friendly shapes
    n_pad = _round_up(n, tile_rows)
    s_pad = _round_up(s, 128)
    b_pad = _round_up(b, 128)
    x = jnp.zeros((n_pad, b_pad), jnp.float32).at[:n, :b].set(cube_flat)
    w = jnp.zeros((b_pad, s_pad), jnp.float32).at[:b, :s].set(weights)
    if valid is None:
        v = jnp.ones((n_pad, 1), jnp.float32)
    else:
        v = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(
            valid.astype(jnp.float32))

    def kernel(x_ref, w_ref, v_ref, o_ref):
        acc = jnp.dot(x_ref[:], w_ref[:],
                      preferred_element_type=jnp.float32)
        mask = v_ref[:] > 0.0  # (tile, 1) broadcasts over S
        o_ref[:] = jnp.where(mask, acc, fill_value)

    grid = (n_pad // tile_rows,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, s_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_rows, b_pad), lambda i: (i, 0)),
            pl.BlockSpec((b_pad, s_pad), lambda i: (0, 0)),
            pl.BlockSpec((tile_rows, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile_rows, s_pad), lambda i: (i, 0)),
        interpret=interpret,
    )(x, w, v)
    return out[:n, :s]


def pallas_quantize_u16(
    x: jax.Array,                # (N, C) float32
    lo: float, hi: float,
    valid: Optional[jax.Array] = None,  # (N, C) bool
    nodata_u16: int = 0,
    tile_rows: int = 2048,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused scale/clip/round/cast with a nodata sentinel on the VPU."""
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = _on_cpu()

    n, c = x.shape
    n_pad = _round_up(n, tile_rows)
    c_pad = _round_up(c, 128)
    xp = jnp.zeros((n_pad, c_pad), jnp.float32).at[:n, :c].set(x)
    if valid is None:
        vp = jnp.ones((n_pad, c_pad), jnp.float32)
    else:
        vp = jnp.zeros((n_pad, c_pad), jnp.float32).at[:n, :c].set(
            valid.astype(jnp.float32))
    scale = 65535.0 / (hi - lo + 1e-32)

    def kernel(x_ref, v_ref, o_ref):
        q = jnp.clip(jnp.rint((x_ref[:] - lo) * scale), 0.0, 65535.0)
        # Mosaic has no direct f32->u16 cast; go through int32
        q16 = q.astype(jnp.int32).astype(jnp.uint16)
        o_ref[:] = jnp.where(v_ref[:] > 0.0, q16, jnp.uint16(nodata_u16))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, c_pad), jnp.uint16),
        grid=(n_pad // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, c_pad), lambda i: (i, 0)),
            pl.BlockSpec((tile_rows, c_pad), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile_rows, c_pad), lambda i: (i, 0)),
        interpret=interpret,
    )(xp, vp)
    return out[:n, :c]


def srf_synthesize_auto(cube_hwb, weights_bs, valid_mask=None,
                        fill_value: float = NO_DATA_VALUE,
                        use_pallas: bool = False):
    """SRF synthesis dispatching to the Pallas kernel on request (TPU)
    or the XLA matmul otherwise."""
    from .srf import srf_synthesize

    if not use_pallas:
        return srf_synthesize(cube_hwb, weights_bs, valid_mask,
                              fill_value=fill_value)
    h, w, b = cube_hwb.shape
    flat = cube_hwb.reshape(-1, b)
    v = valid_mask.reshape(-1) if valid_mask is not None else None
    out = pallas_srf_synthesize(flat, weights_bs, v, fill_value)
    return out.reshape(h, w, weights_bs.shape[1])
