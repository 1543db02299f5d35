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


def _dot_f32(w: jax.Array, x: jax.Array, precision: str) -> jax.Array:
    """f32 matmul inside a Mosaic kernel at a named precision.

    Mosaic exposes ``Precision.HIGHEST`` (full f32, ~6 MXU passes) and
    ``Precision.DEFAULT`` (1-pass bf16, ~6e-3 relative error) but not
    XLA's 3-pass ``HIGH``. ``"high"`` is implemented here explicitly as
    the standard bf16x3 split (Henry et al. 2019 — the same algorithm
    XLA lowers HIGH to): w = w_hi + w_lo, x = x_hi + x_lo in bf16, keep
    the three highest-order products. Max error ~2^-16 relative (matches
    the XLA einsum path's measured 4.5e-5 at granule scale, below the
    u16 product quantization step) at half the MXU passes of HIGHEST.
    """
    if precision == "highest":
        return jnp.dot(w, x, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if precision == "default":
        return jnp.dot(w, x, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)
    if precision != "high":
        raise ValueError(f"Unknown precision {precision!r}")
    w_hi = w.astype(jnp.bfloat16)
    w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def bf16_dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)

    return (bf16_dot(w_hi, x_hi) + bf16_dot(w_hi, x_lo)
            + bf16_dot(w_lo, x_hi))


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
        # compact HBM output: drop the lane padding before the store
        o_ref[:] = jnp.where(mask, acc[:, :o_ref.shape[1]], fill_value)

    grid = (n_pad // tile_rows,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, s), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_rows, b_pad), lambda i: (i, 0)),
            pl.BlockSpec((b_pad, s_pad), lambda i: (0, 0)),
            pl.BlockSpec((tile_rows, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile_rows, s), lambda i: (i, 0)),
        interpret=interpret,
    )(x, w, v)
    return out[:n]


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
    # reserved sentinel code (same contract as kernels.stats.quantize_u16)
    q_lo = 1.0 if nodata_u16 == 0 else 0.0
    q_hi = 65534.0 if nodata_u16 == 65535 else 65535.0

    def kernel(x_ref, v_ref, o_ref):
        cc = o_ref.shape[1]
        q = jnp.clip(jnp.rint((x_ref[:, :cc] - lo) * scale), q_lo, q_hi)
        # Mosaic has no direct f32->u16 cast; go through int32
        q16 = q.astype(jnp.int32).astype(jnp.uint16)
        o_ref[:] = jnp.where(v_ref[:, :cc] > 0.0, q16,
                             jnp.uint16(nodata_u16))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.uint16),
        grid=(n_pad // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, c_pad), lambda i: (i, 0)),
            pl.BlockSpec((tile_rows, c_pad), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile_rows, c), lambda i: (i, 0)),
        interpret=interpret,
    )(xp, vp)
    return out[:n]


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


def pallas_scanline_resample(
    src: jax.Array,              # (N, S, C) float32
    pos: jax.Array,              # (N, D) float32
    method: str = "cubic",
    s_tile: int = 128,
    precision: str = "high",
    interpret: Optional[bool] = None,
) -> jax.Array:
    """out[n, d, c] = sum_s k(pos[n, d] - s) * src[n, s, c].

    One pass of the two-pass scanline warp as a Pallas kernel: the
    banded interpolation-weight tile W = k(pos - iota) is generated in
    VMEM per grid step and fed straight to the MXU — the XLA einsum
    version materialises ~0.5 GB weight tensors per row block in HBM
    (~50 GB of traffic per granule), which this eliminates entirely.
    Out-of-range taps contribute nothing (padded source samples carry
    zero values AND zero validity, matching the banded-matrix edge
    semantics of ``_two_pass_core``).
    """
    if interpret is None:
        interpret = _on_cpu()
    from jax.experimental import pallas as pl

    n, s, c = src.shape
    d = pos.shape[1]
    s_pad = _round_up(s, s_tile)
    d_pad = _round_up(d, 8)
    if s_pad != s:
        src = jnp.pad(src, ((0, 0), (0, s_pad - s), (0, 0)))
    if d_pad != d:
        # padded positions sit far outside any source sample
        pos = jnp.pad(pos, ((0, 0), (0, d_pad - d)),
                      constant_values=-1e6)
    # Mosaic blocks need their last two dims (8,128)-aligned or full;
    # a (1, D) block fails the sublane rule, so carry pos as (N, 1, D)
    pos = pos[:, None, :]
    n_s = s_pad // s_tile

    if method == "cubic":
        a = -0.5

        def profile(dist):
            ax = jnp.abs(dist)
            w1 = (a + 2.0) * ax ** 3 - (a + 3.0) * ax ** 2 + 1.0
            w2 = (a * ax ** 3 - 5.0 * a * ax ** 2 + 8.0 * a * ax
                  - 4.0 * a)
            return jnp.where(ax <= 1.0, w1,
                             jnp.where(ax < 2.0, w2, 0.0))
    elif method == "bilinear":
        def profile(dist):
            return jnp.maximum(0.0, 1.0 - jnp.abs(dist))
    else:
        raise ValueError(f"Unknown method {method!r}")

    def kernel(pos_ref, src_ref, out_ref):
        si = pl.program_id(1)

        @pl.when(si == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        # Mosaic iota must be integer-typed; cast after
        offs = (jax.lax.broadcasted_iota(
            jnp.int32, (d_pad, s_tile), 1)
            + si * s_tile).astype(jnp.float32)
        w = profile(pos_ref[0, 0, :][:, None] - offs)     # (D, s_tile)
        out_ref[0, :, :] += _dot_f32(w, src_ref[0, :, :], precision)

    out = pl.pallas_call(
        kernel,
        grid=(n, n_s),
        in_specs=[
            pl.BlockSpec((1, 1, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s_tile, c), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, d_pad, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d_pad, c), jnp.float32),
        interpret=interpret,
    )(pos, src)
    return out[:, :d]


# ---------------------------------------------------------------------------
# Banded scanline warp (round 3): skip the zero tiles
# ---------------------------------------------------------------------------
#
# The dense two-pass warp multiplies banded weight matrices whose
# support is only ~4 taps wide against the FULL source axis (~1500
# samples): >97 % of the MXU contraction is zeros. These kernels
# contract each 128-wide destination tile against a 256-sample source
# window selected per tile via scalar-prefetched block indices
# (block-sparse style): ~6x fewer FLOPs and no transposed multi-GB
# intermediates (pass 2 consumes pass 1's natural layout directly).

_BANDED_WBLK = 128     # window block granularity (source samples)
_BANDED_NBLK = 3       # window = 3 blocks = 384 samples
_BANDED_DTILE = 128    # destination columns/rows per block


def _banded_group() -> int:
    """Default rows (pass 1) / columns (pass 2) sharing one
    scalar-prefetched source window per grid step, when the caller does
    not select one (see :func:`select_banded_group`). Larger groups
    mean fewer, bigger grid steps at the cost of a wider position span
    per window; the feasibility check (:func:`banded_spans_ok`) must use
    the same value. Env-tunable for experiments:
    HYPERRES_BANDED_GROUP."""
    import os

    return max(1, int(os.environ.get("HYPERRES_BANDED_GROUP", "8")))


#: candidate window-sharing group sizes, largest (fastest, measured
#: 93 ms vs 101 ms full-granule warp for 32 vs 8 on v5e) first. 64
#: exceeds the 64 MB scoped-VMEM limit.
BANDED_GROUP_CANDIDATES = (32, 16, 8, 4)


def select_banded_group(cstar: np.ndarray, rows_t: np.ndarray,
                        candidates=BANDED_GROUP_CANDIDATES):
    """HOST-side choice of the largest feasible window-sharing group
    for :func:`pallas_banded_two_pass`: both passes' position fields
    must satisfy :func:`banded_spans_ok` at the group. Returns None
    when no candidate fits (strong down/upsampling or sharply curved
    scanlines) — callers then use the dense two-pass path. ``cstar`` is
    the pass-1 (N, D) position field, ``rows_t`` the pass-2 (M, D)
    transposed row field."""
    for g in candidates:
        if banded_spans_ok(cstar, group=g) and banded_spans_ok(rows_t,
                                                               group=g):
            return int(g)
    return None


def _banded_compiler_params(window_bytes: int = 0, out_bytes: int = 0):
    """Large window-sharing groups (32 x 384 x C window) push the
    kernels' scoped-VMEM stack past Mosaic's 16 MB default; raise the
    limit to cover the double-buffered window + output blocks plus
    weight/accumulator temporaries, floored at the measured-good 64 MB
    and capped at v5e's 128 MB VMEM."""
    from jax.experimental.pallas import tpu as pltpu

    need = 2 * (window_bytes + out_bytes) + 16 * 1024 * 1024
    limit = min(max(need, 64 * 1024 * 1024), 128 * 1024 * 1024)
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def _banded_profile(method: str):
    if method == "cubic":
        a = -0.5

        def profile(dist):
            ax = jnp.abs(dist)
            w1 = (a + 2.0) * ax ** 3 - (a + 3.0) * ax ** 2 + 1.0
            w2 = (a * ax ** 3 - 5.0 * a * ax ** 2 + 8.0 * a * ax
                  - 4.0 * a)
            return jnp.where(ax <= 1.0, w1,
                             jnp.where(ax < 2.0, w2, 0.0))
        return profile
    if method == "bilinear":
        return lambda dist: jnp.maximum(0.0, 1.0 - jnp.abs(dist))
    raise ValueError(f"Unknown method {method!r}")


def banded_spans_ok(pos: np.ndarray, group: Optional[int] = None,
                    nblk: Optional[int] = None,
                    dtile: Optional[int] = None) -> bool:
    """HOST feasibility check for the banded kernels: every destination
    tile's source-position span must be <= window minus one block of
    flooring slack minus the cubic support (251 samples at the default
    3 x 128 window). True for near-1:1 scanline warps (the EMIT
    ortho->UTM case); False for strong down/upsampling, where the dense
    path or ``resample_to_grid`` applies.

    ``group`` models the kernels' actual window sharing: both passes
    select ONE source window per (group leading rows/cols x ``dtile``
    destination samples) block, so the span is taken over the whole
    (group, dtile) block, not a single row. ``pos`` is (R, D): R
    grouped in ``group`` chunks, D tiled by ``dtile``. ``nblk``/
    ``dtile`` must match the values given to
    :func:`pallas_banded_two_pass`."""
    pos = np.asarray(pos, dtype=np.float64)
    if pos.ndim == 1:
        pos = pos[None, :]
    r, d = pos.shape[-2], pos.shape[-1]
    dt = int(dtile if dtile is not None else _BANDED_DTILE)
    nb = int(nblk if nblk is not None else _BANDED_NBLK)
    max_span = nb * _BANDED_WBLK - _BANDED_WBLK - 5
    g = max(1, int(group if group is not None else _banded_group()))
    d_pad = _round_up(d, dt)
    r_pad = _round_up(r, g)
    if d_pad != d or r_pad != r:
        padded = np.full(pos.shape[:-2] + (r_pad, d_pad), np.nan)
        padded[..., :r, :d] = pos
        pos = padded
    t = pos.reshape(pos.shape[:-2] + (r_pad // g, g, d_pad // dt, dt))
    with np.errstate(invalid="ignore"):
        span = np.nanmax(t, (-3, -1)) - np.nanmin(t, (-3, -1))
    return bool(np.nanmax(np.nan_to_num(span)) <= float(max_span))


def _banded_pass1(src, pos, method, precision, interpret, group=None,
                  nblk=None, dtile=None):
    """Horizontal pass: out[n, d, c] = sum_s k(pos[n, d] - s) src[n, s, c]
    contracting only an NB x 128-sample window per (group scanlines x
    DT columns) block — the group shares one scalar-prefetched window,
    which cuts the grid to 1/group of the per-scanline version
    (per-step dispatch overhead dominated the pass at granule scale:
    ~20k steps of one (128, 384)x(384, C) matmul each). Wider DT tiles
    amortize the window DMA over more destination columns (the window
    overlap between adjacent tiles is the banded path's only source
    re-read).
    src (N, S, C), pos (N, D) -> (N_pad, D_pad, C); padded rows carry
    out-of-range positions so their outputs are exactly zero."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, s, c = src.shape
    d = pos.shape[1]
    W = _BANDED_WBLK
    NB = int(nblk) if nblk else _BANDED_NBLK
    DT = int(dtile) if dtile else _BANDED_DTILE
    RG = int(group) if group else _banded_group()
    s_pad = _round_up(max(s, NB * W), W)
    d_pad = _round_up(d, DT)
    n_pad = _round_up(n, RG)
    if s_pad != s or n_pad != n:
        src = jnp.pad(src, ((0, n_pad - n), (0, s_pad - s), (0, 0)))
    if d_pad != d or n_pad != n:
        pos = jnp.pad(pos, ((0, n_pad - n), (0, d_pad - d)),
                      constant_values=1e6)
    starts = jnp.clip(
        jnp.floor((pos.reshape(n_pad // RG, RG, d_pad // DT, DT)
                   .min((1, 3)) - 2.5) / W),
        0, s_pad // W - NB).astype(jnp.int32)
    profile = _banded_profile(method)

    def kernel(st_ref, pos_ref, *refs):
        i = pl.program_id(0)
        j = pl.program_id(1)
        s_refs, o_ref = refs[:-1], refs[-1]
        s0 = (st_ref[i, j] * W).astype(jnp.float32)
        offs = jax.lax.broadcasted_iota(
            jnp.int32, (DT, NB * W), 1).astype(jnp.float32) + s0
        win = jnp.concatenate([r[...] for r in s_refs],
                              axis=1)  # (RG, NB*W, C)
        # precision here is "highest" or "default" only: the public
        # entry upgrades "high" to bit-exact f32 (these kernels are
        # DMA/scheduling-bound, exactness is free — see
        # pallas_banded_two_pass). ONE (DT, NB*W) x (NB*W, C) dot per
        # row: the kernels are bound by per-dot fixed cost (~2.5 us;
        # measured, scripts/exp_banded_batch.py), so fewer, larger
        # dots beat per-block accumulation (3x the dot count, +45%
        # end-to-end).
        for k in range(RG):
            w = profile(pos_ref[k, :][:, None] - offs)  # (DT, NB*W)
            o_ref[k] = _dot_f32(w, win[k], precision)

    def _spec(nb):
        return pl.BlockSpec((RG, W, c),
                            lambda i, j, st, nb=nb: (i, st[i, j] + nb, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // RG, d_pad // DT),
        in_specs=[pl.BlockSpec((RG, DT), lambda i, j, st: (i, j))]
        + [_spec(nb) for nb in range(NB)],
        out_specs=pl.BlockSpec((RG, DT, c), lambda i, j, st: (i, j, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d_pad, c), jnp.float32),
        compiler_params=_banded_compiler_params(
            window_bytes=RG * NB * W * c * 4,
            out_bytes=RG * DT * c * 4),
        interpret=interpret)(starts, pos, *([src] * NB))


def _banded_pass2(h, pos_t, method, precision, interpret, group=None,
                  nblk=None, dtile=None):
    """Vertical pass consuming pass 1's NATURAL layout (no transpose):
    h (S, M, C) with S the contraction (scanline) axis, pos_t (M, D) the
    per-column fractional scanline positions -> out (D_pad, M_pad, C).
    Columns are processed ``_banded_group()`` per block (one shared
    window per group x DT-row tile).

    The validity renormalisation deliberately stays OUTSIDE the kernel:
    a fused divide/mask epilogue was measured 140 ms slower end-to-end
    (lane-unaligned c-1 slicing per row block; see warp.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, m, c = h.shape
    d = pos_t.shape[1]
    W = _BANDED_WBLK
    NB = int(nblk) if nblk else _BANDED_NBLK
    DT = int(dtile) if dtile else _BANDED_DTILE
    G = int(group) if group else _banded_group()
    s_pad = _round_up(max(s, NB * W), W)
    d_pad = _round_up(d, DT)
    m_pad = _round_up(m, G)
    if s_pad != s or m_pad != m:
        h = jnp.pad(h, ((0, s_pad - s), (0, m_pad - m), (0, 0)))
    # pos_t may carry fewer columns than h's (already padded) M axis
    if pos_t.shape != (m_pad, d_pad):
        pos_t = jnp.pad(
            pos_t, ((0, m_pad - pos_t.shape[0]),
                    (0, d_pad - pos_t.shape[1])),
            constant_values=1e6)
    starts = jnp.clip(
        jnp.floor((pos_t.reshape(m_pad // G, G, d_pad // DT, DT)
                   .min((1, 3)) - 2.5) / W),
        0, s_pad // W - NB).astype(jnp.int32)
    profile = _banded_profile(method)

    def kernel(st_ref, pos_ref, *refs):
        j = pl.program_id(0)
        i = pl.program_id(1)
        h_refs, o_ref = refs[:-1], refs[-1]
        s0 = (st_ref[j, i] * W).astype(jnp.float32)
        offs = jax.lax.broadcasted_iota(
            jnp.int32, (DT, NB * W), 1).astype(jnp.float32) + s0
        win = jnp.concatenate([r[...] for r in h_refs],
                              axis=0)  # (NB*W, G, C)
        # "highest" or "default" only; one dot per column (see pass 1)
        for k in range(G):
            w = profile(pos_ref[k, :][:, None] - offs)  # (DT, NB*W)
            o_ref[:, k, :] = _dot_f32(w, win[:, k, :], precision)

    def _spec(nb):
        return pl.BlockSpec((W, G, c),
                            lambda j, i, st, nb=nb: (st[j, i] + nb, j, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_pad // G, d_pad // DT),
        in_specs=([pl.BlockSpec((G, DT), lambda j, i, st: (j, i))]
                  + [_spec(nb) for nb in range(NB)]),
        out_specs=pl.BlockSpec((DT, G, c), lambda j, i, st: (i, j, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d_pad, m_pad, c), jnp.float32),
        compiler_params=_banded_compiler_params(
            window_bytes=NB * W * G * c * 4,
            out_bytes=DT * G * c * 4),
        interpret=interpret)(starts, pos_t, *([h] * NB))


def pallas_banded_two_pass(src_ext, rows, cstar, method: str = "cubic",
                           precision: str = "highest",
                           interpret: Optional[bool] = None,
                           group: Optional[int] = None,
                           nblk: Optional[int] = None,
                           dtile: Optional[int] = None):
    """Both scanline-warp passes as banded Pallas kernels: identical
    sampling positions to ``_two_pass_core`` but each destination tile
    contracts a 384-sample source window instead of the full axis
    (~4-6x fewer FLOPs at EMIT granule geometry), and pass 2 consumes
    pass 1's natural layout so no multi-GB transposes materialise.

    Callers must verify feasibility on the host with
    :func:`banded_spans_ok` at the SAME ``group``/``nblk``/``dtile``
    (or pick a group with :func:`select_banded_group`) — tiles whose
    positions span more than the window produce nodata, not garbage
    (their taps get zero weight and the validity channel
    renormalisation marks them invalid).

    ``nblk``/``dtile`` set the window width (nblk x 128 source
    samples) and destination tile (dtile samples). The window overlap
    between adjacent tiles is the banded path's only source re-read
    (~nblk*128/dtile bytes DMA'd per output byte), so wider tiles
    amortize DMA at the cost of more VMEM and a wider contraction;
    see scripts/exp_banded_tile.py for the measured trade-off (the
    default 3 x 128 window / 128-sample tile wins at EMIT geometry:
    wider tiles scale the per-dot cost with window width).
    """
    if interpret is None:
        interpret = _on_cpu()
    if precision == "high":
        # free exactness: these kernels are DMA-bound at granule scale
        # (measured v5e full scale: 3-pass bf16 0.131 s vs full f32
        # 0.132 s), so the bf16x3 approximation buys nothing here —
        # run bit-exact. The real 3-pass stays available for the dense
        # scanline kernel (pallas_scanline_resample), which IS MXU-pass
        # bound.
        precision = "highest"
    h = _banded_pass1(src_ext, cstar, method, precision, interpret,
                      group=group, nblk=nblk, dtile=dtile)
    hd, wd = rows.shape
    out = _banded_pass2(h, jnp.transpose(rows), method, precision,
                        interpret, group=group, nblk=nblk, dtile=dtile)
    return out[:hd, :wd]


# ---------------------------------------------------------------------------
# VMEM-resident Sinkhorn
# ---------------------------------------------------------------------------
#
# The XLA log-domain Sinkhorn (kernels.sinkhorn.sinkhorn_log)
# nominally reads the (n, m) cost matrix from HBM twice per iteration.
# This kernel instead runs ALL iterations inside ONE Pallas program
# with the cost matrix resident in VMEM (5120^2 f32 = 105 MB on a
# 128 MB v5e), fusing the f- and g-updates into a single sweep (the
# column sum reuses the row pass's exponentials). Measured outcome at
# the production 5000^2 x 300-iteration shape on v5e: XLA fuses its
# two passes to ~one HBM read per iteration and both paths sit at the
# same elementwise exp+reduce compute wall (~133 vs ~156 us/iter), so
# the kernel is NOT the default — it exists for HBM-contended
# configurations and as the measured speed-of-light reference.

#: largest resident cost matrix (bytes); 5120^2 f32 + block temporaries
#: just fits v5e's 128 MB VMEM
PALLAS_SINKHORN_VMEM_BUDGET = 5120 * 5120 * 4


def pallas_sinkhorn_duals(log_a: jax.Array, log_b: jax.Array,
                          Mr: jax.Array, num_itermax: int = 300,
                          stop_thr: float = 1e-6, check_every: int = 10,
                          block_rows: int = 128,
                          interpret: Optional[bool] = None):
    """Log-domain Sinkhorn duals with the cost matrix VMEM-resident.

    ``Mr`` is the regularised negative cost (-M / reg), ``log_a`` /
    ``log_b`` the log marginals (pad-safe: -1e30 for zero-mass slots).
    Returns ``(f, g, err)`` with ``P = exp(Mr + f[:, None] + g[None, :])``
    — the same update sequence as :func:`~hyperres.kernels.sinkhorn.
    sinkhorn_log` (f <- log_a - lse_row(Mr + g); g <- log_b -
    lse_col(Mr + f)), so the duals match the XLA path to f32 roundoff
    at equal iteration counts.

    Stopping: every ``check_every`` iterations the ROW-marginal
    violation ||sum_j P_ij - a||_1 of the previous iterate (available
    as a zero-cost byproduct of the fused sweep) is tested against
    ``stop_thr`` — the faithful POT criterion (the marginal NOT fixed
    by the most recent update; POT sinkhorn_knopp checks its analogue
    after the final scaling update).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = _on_cpu()
    n, m = Mr.shape
    RB = block_rows
    n_pad = _round_up(n, RB)
    m_pad = _round_up(m, 128)
    NEG = -1e30
    if (n_pad, m_pad) != (n, m):
        Mr = jnp.pad(Mr, ((0, n_pad - n), (0, m_pad - m)),
                     constant_values=NEG)
        log_a = jnp.pad(log_a, (0, n_pad - n), constant_values=NEG)
        log_b = jnp.pad(log_b, (0, m_pad - m), constant_values=NEG)
    nb = n_pad // RB
    la = log_a.astype(jnp.float32)[:, None]          # (n_pad, 1)
    lb = log_b.astype(jnp.float32)[None, :]          # (1, m_pad)

    def kernel(mr_ref, la_ref, lb_ref, f_ref, g_ref, err_ref):
        f_ref[...] = jnp.zeros_like(f_ref[...])
        g_ref[...] = jnp.zeros_like(g_ref[...])

        def sweep(_):
            """One Sinkhorn iteration; returns the row-marginal err of
            the PREVIOUS iterate (computed before f is overwritten).

            The column sum reuses the row pass's exponentials instead
            of a second stabilised exp sweep:
            exp(Mr_ij + f_i) = E_ij * u_i * exp(-g_j) with
            E = exp(Mr + g - rmax) (in registers from the row pass) and
            u_i = a_i / rowsum_i <= a_i, so
            lse_col = log(sum_i E_ij u_i) - g_j. E's elementwise
            underflow drops the same far pairs a max-stabilised pass
            would round to zero; a whole column of underflows (every
            sample further than ~sqrt(87*reg) in normalised RGB from
            ALL rows — geometrically impossible for stretched
            reflectances) is clamped by the 1e-38 floor."""
            def row_block(rb, carry):
                s_col, errs = carry                  # (1, m_pad), f32
                blk = mr_ref[pl.ds(rb * RB, RB), :]  # (RB, m_pad)
                z = blk + g_ref[...]                 # + g broadcast row
                rmax = jnp.max(z, axis=1, keepdims=True)
                E = jnp.exp(z - rmax)                # (RB, m_pad)
                rowsum = jnp.sum(E, axis=1, keepdims=True)
                rlse = rmax + jnp.log(rowsum)
                a_blk = jnp.exp(la_ref[pl.ds(rb * RB, RB), :])
                f_old = f_ref[pl.ds(rb * RB, RB), :]
                errs = errs + jnp.sum(jnp.abs(jnp.exp(f_old + rlse)
                                              - a_blk))
                f_ref[pl.ds(rb * RB, RB), :] = (
                    la_ref[pl.ds(rb * RB, RB), :] - rlse)
                u = a_blk / rowsum                   # (RB, 1)
                s_col = s_col + jnp.sum(E * u, axis=0, keepdims=True)
                return s_col, errs

            s_col, errs = jax.lax.fori_loop(
                0, nb, row_block,
                (jnp.zeros((1, m_pad), jnp.float32), jnp.float32(0.0)))
            # lse_col(Mr + f) = log(s_col) - g. Floor must be a NORMAL
            # f32 (1e-38 is subnormal and XLA flushes it to zero ->
            # log(0) = -inf on fully-underflowed padded columns).
            g_ref[...] = (lb_ref[...]
                          - jnp.log(jnp.maximum(s_col, 1e-37))
                          + g_ref[...])
            return errs

        def cond(carry):
            it, err = carry
            return (it < num_itermax) & (err > stop_thr)

        def body(carry):
            it, _ = carry
            err = jax.lax.fori_loop(0, check_every,
                                    lambda k, e: sweep(e),
                                    jnp.float32(jnp.inf))
            return it + check_every, err

        _, err = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.float32(jnp.inf)))
        err_ref[...] = jnp.full((1, 1), err, jnp.float32)

    f, g, err = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(127.5 * 1024 * 1024)),
        interpret=interpret,
    )(Mr.astype(jnp.float32), la, lb)
    return f[:n, 0], g[0, :m], err[0, 0]


# ---------------------------------------------------------------------------
# Fused spectral-SR prediction
# ---------------------------------------------------------------------------

def pallas_sr_predict_u16(X: jax.Array, valid: jax.Array,
                          x_mean: jax.Array, x_std: jax.Array,
                          selectors: "tuple[jax.Array, ...]",
                          W: jax.Array, intercept: jax.Array,
                          tile_rows: int = 8192,
                          interpret: Optional[bool] = None) -> jax.Array:
    """The whole ridge-SR inference as ONE fused kernel:
    standardise -> degree-d monomial expansion -> ridge matmul ->
    sigmoid -> u16 x10000 quantize (65535 = nodata).

    The XLA path materialises the (N, F) feature matrix in HBM and,
    worse, builds it with minor-axis gathers (285 x 4 B picks per
    pixel — gather-transaction-bound, measured 1.97 s per 85 Mpx
    granule). Here each ``tile_rows`` block expands IN VMEM via one-hot
    selection matmuls (``selectors[d]`` is the (Bx+1, F) 0/1 matrix
    picking monomial factor d; F_block = prod_d X_ext @ S_d) and the
    (F, By) ridge weights stay resident, so HBM traffic is just
    X in + u16 out (~100 B/pixel).

    X (N, Bx) f32 (finite; nan_to_num upstream), valid (N,) bool,
    selectors from :func:`~hyperres.kernels.lstsq.poly_selector_matrices`.
    Returns (N, By) uint16.
    """
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = _on_cpu()
    n, bx = X.shape
    f, by = W.shape
    degree = len(selectors)
    RT = tile_rows
    n_pad = _round_up(n, RT)
    f_pad = _round_up(f, 128)
    by_pad = _round_up(by, 128)
    if n_pad != n:
        X = jnp.pad(X, ((0, n_pad - n), (0, 0)))
        valid = jnp.pad(valid, (0, n_pad - n))
    # X is consumed AS-IS (no (N, bx_pad) extended copy: at granule
    # scale that materialised an extra 5.4 GB in HBM next to the
    # 3.4 GB input and OOMed a 16 GB chip). The constant-one monomial
    # factor is folded into a selector split instead:
    #   dot([1, xs], S_d) = S_d[0, :] + dot(xs, S_d[1:, :])
    mean_p = x_mean.astype(jnp.float32).reshape(1, bx)
    inv_std_p = (1.0 / x_std.astype(jnp.float32)).reshape(1, bx)
    sel0 = [jnp.zeros((1, f_pad), jnp.float32)
            .at[0, :f].set(s[0].astype(jnp.float32))
            for s in selectors]
    sel1 = [jnp.zeros((bx, f_pad), jnp.float32)
            .at[:, :f].set(s[1:bx + 1].astype(jnp.float32))
            for s in selectors]
    W_p = jnp.zeros((f_pad, by_pad), jnp.float32).at[:f, :by].set(
        W.astype(jnp.float32))
    ic_p = jnp.zeros((1, by_pad), jnp.float32).at[0, :by].set(
        intercept.astype(jnp.float32))
    vp = valid.astype(jnp.float32)[:, None]

    def kernel(x_ref, v_ref, m_ref, s_ref, w_ref, i_ref, *rest):
        sel0_refs = rest[:degree]
        sel1_refs = rest[degree:2 * degree]
        o_ref = rest[2 * degree]
        xs = (x_ref[...] - m_ref[...]) * s_ref[...]   # (RT, bx)
        F_blk = sel0_refs[0][...] + jnp.dot(
            xs, sel1_refs[0][...], preferred_element_type=jnp.float32)
        for d in range(1, degree):
            F_blk = F_blk * (sel0_refs[d][...] + jnp.dot(
                xs, sel1_refs[d][...],
                preferred_element_type=jnp.float32))
        z = jnp.dot(F_blk, w_ref[...],
                    preferred_element_type=jnp.float32) + i_ref[...]
        # slice the lane padding off BEFORE the store: the HBM output
        # stays compact (N, By) — a 128-padded u16 output would be
        # 4x the cube (21.8 GB at granule scale)
        z = z[:, :o_ref.shape[1]]
        y = 1.0 / (1.0 + jnp.exp(-z))
        q = jnp.clip(jnp.rint(y * 10000.0), 0.0, 65534.0)
        q16 = q.astype(jnp.int32).astype(jnp.uint16)
        o_ref[...] = jnp.where(v_ref[...] > 0.0, q16, jnp.uint16(65535))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, by), jnp.uint16),
        grid=(n_pad // RT,),
        in_specs=[
            pl.BlockSpec((RT, bx), lambda i: (i, 0)),
            pl.BlockSpec((RT, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, bx), lambda i: (0, 0)),
            pl.BlockSpec((1, bx), lambda i: (0, 0)),
            pl.BlockSpec((f_pad, by_pad), lambda i: (0, 0)),
            pl.BlockSpec((1, by_pad), lambda i: (0, 0)),
        ] + [pl.BlockSpec((1, f_pad), lambda i: (0, 0))
             for _ in range(degree)]
          + [pl.BlockSpec((bx, f_pad), lambda i: (0, 0))
             for _ in range(degree)],
        out_specs=pl.BlockSpec((RT, by), lambda i: (i, 0)),
        compiler_params=_banded_compiler_params(),
        interpret=interpret,
    )(X, vp, mean_p, inv_std_p, W_p, ic_p, *sel0, *sel1)
    # skip the tail slice when nothing was padded: an eager slice of a
    # large device array RESOURCE_EXHAUSTs on the axon tunnel backend
    # (round-4 repro) and is a pointless copy everywhere else
    return out if n_pad == n else out[:n]


def pallas_sr_predict_u16_cmajor(
        X_cm: jax.Array, x_mean: jax.Array, x_std: jax.Array,
        selectors: "tuple[jax.Array, ...]", W: jax.Array,
        intercept: jax.Array, tile_cols: int = 8192,
        interpret: Optional[bool] = None) -> jax.Array:
    """Channel-major twin of :func:`pallas_sr_predict_u16` — the form
    that is actually feasible at granule scale on TPU.

    The row-major kernel takes (N, Bx) f32 / returns (N, By) u16 —
    but Mosaic requires the (8, 128)-tiled layout on its operands, so
    a narrow-minor (N, 10) input materialises 128-lane-padded:
    **12.8x its logical bytes** (measured on hardware: an 85 Mpx
    granule's 3.4 GB input demands a 25.2 GB copy —
    `Allocation would exceed memory ... f32[49152000,10]{1,0:T(8,128)}`
    — structurally impossible on a 16 GB chip). Channel-major arrays
    tile exactly: input (16, N) f32 (16 sublanes = 2 tiles), output
    (By=32, N) u16 (32 sublanes = 2 tiles of the u16 (16, 128) tiling),
    zero padding waste — and (Bx, N) is the product convention's
    natural layout anyway (predict_cube_u16 takes (Bx, H, W)).

    ``X_cm`` is (16, N): rows 0..Bx-1 the standardisable band values
    (finite; nan_to_num upstream), rows Bx..14 zero, **row 15 the
    validity plane** (1.0 valid / 0.0 nodata). N must be a multiple of
    ``tile_cols``. Returns (By, N) uint16 (65535 = nodata).

    Math per column tile (transposed form of the row-major kernel):
    xs = (x - mean) * inv_std; F = prod_d (S_d^T [1; xs]) via the
    selector split (S0 column + S1^T @ xs, 3-pass-bf16 f32 matmuls);
    z = W^T F + c; u16(sigmoid(z) * 1e4).
    """
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = _on_cpu()
    bxp, n = X_cm.shape
    assert bxp == 16, "pad the band axis to 16 rows host-side"
    f, by = W.shape
    degree = len(selectors)
    bx = selectors[0].shape[0] - 1  # rows: [const 1, band0..bandBx-1]
    assert bx <= 14, "row 15 is reserved for the validity plane"
    CT = tile_cols
    if n % CT:
        raise ValueError(f"N={n} must be a multiple of tile_cols={CT} "
                         "(pad host-side; device pads of multi-GB "
                         "uploads OOM the axon backend)")
    f_pad = _round_up(f, 128)

    # (16, 1) standardisation columns; identity on the validity row
    mean_c = jnp.zeros((16, 1), jnp.float32).at[:bx, 0].set(
        x_mean.astype(jnp.float32))
    inv_std_c = jnp.ones((16, 1), jnp.float32).at[:bx, 0].set(
        1.0 / x_std.astype(jnp.float32))
    # selector split, transposed: F_d = S0_d^T (col) + S1_d^T @ xs
    sel0 = [jnp.zeros((f_pad, 1), jnp.float32)
            .at[:f, 0].set(s[0].astype(jnp.float32)) for s in selectors]
    sel1 = [jnp.zeros((f_pad, 16), jnp.float32)
            .at[:f, :bx].set(s[1:bx + 1].astype(jnp.float32).T)
            for s in selectors]
    Wt = jnp.zeros((by, f_pad), jnp.float32).at[:, :f].set(
        W.astype(jnp.float32).T)
    ic_c = intercept.astype(jnp.float32).reshape(by, 1)

    def kernel(x_ref, m_ref, s_ref, w_ref, i_ref, *rest):
        sel0_refs = rest[:degree]
        sel1_refs = rest[degree:2 * degree]
        o_ref = rest[2 * degree]
        x = x_ref[...]                                  # (16, CT)
        v = x[15:16, :]                                 # validity plane
        xs = (x - m_ref[...]) * s_ref[...]
        F = sel0_refs[0][...] + _dot_f32(sel1_refs[0][...], xs, "high")
        for d in range(1, degree):
            F = F * (sel0_refs[d][...]
                     + _dot_f32(sel1_refs[d][...], xs, "high"))
        z = _dot_f32(w_ref[...], F, "high") + i_ref[...]
        y = 1.0 / (1.0 + jnp.exp(-z))
        q = jnp.clip(jnp.rint(y * 10000.0), 0.0, 65534.0)
        q16 = q.astype(jnp.int32).astype(jnp.uint16)
        o_ref[...] = jnp.where(v > 0.0, q16, jnp.uint16(65535))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((by, n), jnp.uint16),
        grid=(n // CT,),
        in_specs=[
            pl.BlockSpec((16, CT), lambda i: (0, i)),
            pl.BlockSpec((16, 1), lambda i: (0, 0)),
            pl.BlockSpec((16, 1), lambda i: (0, 0)),
            pl.BlockSpec((by, f_pad), lambda i: (0, 0)),
            pl.BlockSpec((by, 1), lambda i: (0, 0)),
        ] + [pl.BlockSpec((f_pad, 1), lambda i: (0, 0))
             for _ in range(degree)]
          + [pl.BlockSpec((f_pad, 16), lambda i: (0, 0))
             for _ in range(degree)],
        out_specs=pl.BlockSpec((by, CT), lambda i: (0, i)),
        compiler_params=_banded_compiler_params(),
        interpret=interpret,
    )(X_cm, mean_c, inv_std_c, Wt, ic_c, *sel0, *sel1)
