import numpy as np
import jax.numpy as jnp
import pytest

from hyperres.kernels.pallas_ops import (
    pallas_quantize_u16, pallas_srf_synthesize, srf_synthesize_auto,
)
from hyperres.kernels.srf import build_srf_weight_matrix, srf_synthesize
from hyperres.kernels.stats import quantize_u16
from hyperres.spectral.srf_tables import builtin_srf
from hyperres.testing.scenes import emit_wavelength_grid


def test_pallas_srf_matches_xla(rng):
    wl, good = emit_wavelength_grid(96)
    W, _, _ = build_srf_weight_matrix(wl, builtin_srf("S2A"), good)
    cube = rng.random((17, 23, 96)).astype(np.float32)
    valid = rng.random((17, 23)) > 0.3
    want = np.asarray(srf_synthesize(jnp.asarray(cube), jnp.asarray(W),
                                     jnp.asarray(valid)))
    got_flat = pallas_srf_synthesize(
        jnp.asarray(cube.reshape(-1, 96)), jnp.asarray(W),
        jnp.asarray(valid.reshape(-1)), tile_rows=128)
    got = np.asarray(got_flat).reshape(17, 23, -1)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_pallas_srf_no_mask(rng):
    wl, _ = emit_wavelength_grid(64)
    W, _, _ = build_srf_weight_matrix(wl, builtin_srf("S2A",
                                                      bands=["B2", "B4"]))
    cube = rng.random((40, 64)).astype(np.float32)
    got = np.asarray(pallas_srf_synthesize(jnp.asarray(cube),
                                           jnp.asarray(W), tile_rows=128))
    want = cube @ np.asarray(W)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_srf_synthesize_auto_dispatch(rng):
    wl, _ = emit_wavelength_grid(32)
    W, _, _ = build_srf_weight_matrix(wl, builtin_srf("S2A", bands=["B3"]))
    cube = rng.random((9, 11, 32)).astype(np.float32)
    a = np.asarray(srf_synthesize_auto(jnp.asarray(cube), jnp.asarray(W),
                                       use_pallas=False))
    b = np.asarray(srf_synthesize_auto(jnp.asarray(cube), jnp.asarray(W),
                                       use_pallas=True))
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)


def test_pallas_quantize_matches_xla(rng):
    x = rng.random((300, 7)).astype(np.float32) * 1.4 - 0.2
    valid = rng.random((300, 7)) > 0.2
    want = np.asarray(quantize_u16(jnp.asarray(x), 0.0, 1.0,
                                   jnp.asarray(valid), nodata_u16=0))
    got = np.asarray(pallas_quantize_u16(jnp.asarray(x), 0.0, 1.0,
                                         jnp.asarray(valid), nodata_u16=0,
                                         tile_rows=128))
    np.testing.assert_array_equal(got, want)


def test_banded_two_pass_matches_dense(rng):
    """The block-sparse banded scanline kernels reproduce the dense
    two-pass warp bit-level (pre-division; post-division differences are
    confined to near-zero-denominator boundary pixels)."""
    import jax
    import jax.numpy as jnp
    from hyperres.kernels.glt import prepare_glt
    from hyperres.kernels.pallas_ops import (
        banded_spans_ok, pallas_banded_two_pass,
    )
    from hyperres.kernels.warp import (
        _two_pass_core, orthowarp_two_pass, scanline_cstar,
    )

    raw = rng.random((150, 160, 7)).astype(np.float32)
    ho, wo = 200, 210
    hd, wd = 190, 205
    glt = np.zeros((ho, wo, 2), np.int32)
    valid = rng.random((ho, wo)) > 0.15
    glt[..., 0] = np.where(valid, rng.integers(1, 161, (ho, wo)), 0)
    glt[..., 1] = np.where(valid, rng.integers(1, 151, (ho, wo)), 0)
    flat_idx, vmask = prepare_glt(glt, (150, 160))
    r = np.arange(hd, dtype=np.float32)[:, None]
    j = np.arange(wd, dtype=np.float32)[None, :]
    rows = (r * (ho / hd) + 0.004 * j * r / hd + 0.3).astype(np.float32)
    cols = (j * (wo / wd) + 0.003 * r - 0.2).astype(np.float32)
    cstar = np.asarray(scanline_cstar(rows, cols, ho))
    assert banded_spans_ok(cstar) and banded_spans_ok(rows.T)

    b = raw.shape[-1]
    v = jnp.take(jnp.asarray(raw).reshape(-1, b),
                 jnp.asarray(flat_idx).reshape(-1),
                 axis=0).reshape(ho, wo, b)
    validf = jnp.asarray(vmask).astype(jnp.float32)[..., None]
    src_ext = jnp.concatenate([v * validf, validf], axis=-1)
    for method in ("cubic", "bilinear"):
        dense = np.asarray(_two_pass_core(
            src_ext, jnp.asarray(rows), jnp.asarray(cstar), method,
            64, 64, jax.lax.Precision.HIGHEST))
        band = np.asarray(pallas_banded_two_pass(
            src_ext, jnp.asarray(rows), jnp.asarray(cstar),
            method=method, precision="highest"))
        np.testing.assert_allclose(band, dense, rtol=0, atol=3e-6)
        # end-to-end through orthowarp_two_pass (masks + fill)
        a = np.asarray(orthowarp_two_pass(
            jnp.asarray(raw), jnp.asarray(flat_idx), jnp.asarray(vmask),
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(cstar),
            method=method, precision="highest"))
        g = np.asarray(orthowarp_two_pass(
            jnp.asarray(raw), jnp.asarray(flat_idx), jnp.asarray(vmask),
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(cstar),
            method=method, precision="highest",
            backend="pallas_banded"))
        np.testing.assert_array_equal(a == -9999.0, g == -9999.0)


def test_select_banded_group_adaptive(rng):
    """select_banded_group returns the largest candidate whose grouped
    span check passes, degrades for curvier fields, and returns None
    when even the smallest group is infeasible."""
    from hyperres.kernels.pallas_ops import (
        BANDED_GROUP_CANDIDATES, banded_spans_ok, select_banded_group,
    )

    d = 512
    j = np.arange(d, dtype=np.float32)[None, :]

    def field(slope):
        r = np.arange(256, dtype=np.float32)[:, None]
        return (j + slope * r).astype(np.float32)

    near_identity = field(0.0)
    assert select_banded_group(near_identity, near_identity) == \
        BANDED_GROUP_CANDIDATES[0]
    # slope 5: a group of 32 rows spans 31*5=155 extra samples on top of
    # the 127-wide tile -> >251, infeasible; 16 rows span 75+127 -> ok
    curved = field(5.0)
    g = select_banded_group(curved, near_identity)
    assert g is not None and g < BANDED_GROUP_CANDIDATES[0]
    assert banded_spans_ok(curved, group=g)
    # strong downsampling: even per-4-rows tiles span > 251 samples
    wide = (j * 4.0) + 0.0 * np.arange(8, dtype=np.float32)[:, None]
    assert select_banded_group(wide, wide) is None


def test_banded_groups_agree(rng):
    """The banded kernels produce identical results for every window-
    sharing group size (the group only changes scheduling, not taps)."""
    import jax.numpy as jnp
    from hyperres.kernels.pallas_ops import (
        banded_spans_ok, pallas_banded_two_pass,
    )
    from hyperres.kernels.warp import scanline_cstar

    ho, wo, c = 150, 160, 5
    hd, wd = 140, 155
    src = rng.random((ho, wo, c)).astype(np.float32)
    r = np.arange(hd, dtype=np.float32)[:, None]
    j = np.arange(wd, dtype=np.float32)[None, :]
    rows = (r * (ho / hd) + 0.004 * j * r / hd + 0.3).astype(np.float32)
    cols = (j * (wo / wd) + 0.003 * r - 0.2).astype(np.float32)
    cstar = np.asarray(scanline_cstar(rows, cols, ho))
    outs = []
    for g in (4, 8, 32):
        assert banded_spans_ok(cstar, group=g)
        assert banded_spans_ok(rows.T, group=g)
        outs.append(np.asarray(pallas_banded_two_pass(
            jnp.asarray(src), jnp.asarray(rows), jnp.asarray(cstar),
            method="cubic", precision="highest", group=g)))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_banded_tile_geometries_agree(rng):
    """Window/tile geometry (nblk window blocks x dtile destination
    samples) only changes DMA scheduling, not taps: every feasible
    geometry produces identical results, including ones whose window
    spans more blocks than the default 3 and wider-than-128 tiles."""
    import jax.numpy as jnp
    from hyperres.kernels.pallas_ops import (
        banded_spans_ok, pallas_banded_two_pass,
    )
    from hyperres.kernels.warp import scanline_cstar

    ho, wo, c = 150, 600, 5
    hd, wd = 140, 590
    src = rng.random((ho, wo, c)).astype(np.float32)
    r = np.arange(hd, dtype=np.float32)[:, None]
    j = np.arange(wd, dtype=np.float32)[None, :]
    rows = (r * (ho / hd) + 0.004 * j * r / hd + 0.3).astype(np.float32)
    cols = (j * (wo / wd) + 0.003 * r - 0.2).astype(np.float32)
    cstar = np.asarray(scanline_cstar(rows, cols, ho))
    outs = []
    for nblk, dtile, g in ((3, 128, 8), (4, 256, 8), (5, 384, 4)):
        assert banded_spans_ok(cstar, group=g, nblk=nblk, dtile=dtile)
        assert banded_spans_ok(rows.T, group=g, nblk=nblk, dtile=dtile)
        outs.append(np.asarray(pallas_banded_two_pass(
            jnp.asarray(src), jnp.asarray(rows), jnp.asarray(cstar),
            method="cubic", precision="highest", group=g, nblk=nblk,
            dtile=dtile)))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_banded_high_upgrades_to_exact(rng):
    """The banded kernels are DMA-bound (measured), so precision='high'
    upgrades to the bit-exact full-f32 path — outputs identical to
    'highest'."""
    import jax.numpy as jnp
    from hyperres.kernels.pallas_ops import (
        banded_spans_ok, pallas_banded_two_pass,
    )
    from hyperres.kernels.warp import scanline_cstar

    ho, wo, c = 170, 180, 9
    hd, wd = 160, 175
    src = rng.random((ho, wo, c)).astype(np.float32)
    r = np.arange(hd, dtype=np.float32)[:, None]
    j = np.arange(wd, dtype=np.float32)[None, :]
    rows = (r * (ho / hd) + 0.004 * j * r / hd + 0.3).astype(np.float32)
    cols = (j * (wo / wd) + 0.003 * r - 0.2).astype(np.float32)
    cstar = np.asarray(scanline_cstar(rows, cols, ho))
    assert banded_spans_ok(cstar) and banded_spans_ok(rows.T)
    exact = np.asarray(pallas_banded_two_pass(
        jnp.asarray(src), jnp.asarray(rows), jnp.asarray(cstar),
        method="cubic", precision="highest"))
    high = np.asarray(pallas_banded_two_pass(
        jnp.asarray(src), jnp.asarray(rows), jnp.asarray(cstar),
        method="cubic", precision="high"))
    np.testing.assert_array_equal(high, exact)


def test_scanline_high_precision_3pass(rng):
    """precision='high' in the dense scanline kernel is the explicit
    bf16x3 split (Mosaic exposes no native HIGH): stays within the XLA
    HIGH error envelope of the full-f32 result but is a genuinely
    different code path."""
    import jax.numpy as jnp
    from hyperres.kernels.pallas_ops import pallas_scanline_resample

    n, s, c, d = 12, 160, 9, 144
    src = rng.random((n, s, c)).astype(np.float32)
    pos = (np.linspace(2.0, s - 3.0, d, dtype=np.float32)[None, :]
           + rng.random((n, 1)).astype(np.float32))
    exact = np.asarray(pallas_scanline_resample(
        jnp.asarray(src), jnp.asarray(pos), method="cubic",
        precision="highest"))
    high = np.asarray(pallas_scanline_resample(
        jnp.asarray(src), jnp.asarray(pos), method="cubic",
        precision="high"))
    # single pass, values O(1): the bf16x3 error bound is ~2^-16 rel
    np.testing.assert_allclose(high, exact, rtol=0, atol=5e-5)
    assert np.max(np.abs(high - exact)) > 0.0


def test_banded_spans_ok_rejects_wide_tiles():
    from hyperres.kernels.pallas_ops import banded_spans_ok
    pos = np.linspace(0.0, 4000.0, 256, dtype=np.float32)[None, :]
    assert not banded_spans_ok(pos)   # ~2000-sample tile span
    pos2 = np.linspace(0.0, 250.0, 256, dtype=np.float32)[None, :]
    assert banded_spans_ok(pos2)      # ~125-sample tile span
