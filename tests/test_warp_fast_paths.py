import numpy as np
import jax.numpy as jnp
import pytest

from hyperres.kernels import warp as kw


def index_axes(hs, ws, hd, wd, scale, off=0.0):
    rows = (np.arange(hd) + 0.5) / scale - 0.5 + off
    cols = (np.arange(wd) + 0.5) / scale - 0.5 + off
    return rows.astype(np.float32), cols.astype(np.float32)


@pytest.mark.parametrize("method", ["bilinear", "cubic"])
def test_taploop_matches_unrolled(rng, method):
    img = rng.normal(size=(40, 44, 7)).astype(np.float32)
    img[3:6, 8:11, :] = -9999.0
    rows = rng.uniform(-2, 41, size=(25, 30)).astype(np.float32)
    cols = rng.uniform(-2, 45, size=(25, 30)).astype(np.float32)
    a = np.asarray(kw.warp_interpolate(jnp.asarray(img), jnp.asarray(rows),
                                       jnp.asarray(cols), nodata=-9999.0,
                                       method=method))
    b = np.asarray(kw.warp_interpolate_taploop(
        jnp.asarray(img), jnp.asarray(rows), jnp.asarray(cols),
        nodata=-9999.0, method=method))
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)


@pytest.mark.parametrize("method", ["bilinear", "cubic"])
def test_separable_matmul_matches_gather(rng, method):
    hs, ws, b = 30, 34, 5
    img = rng.normal(size=(hs, ws, b)).astype(np.float32)
    img[10:12, 5:9, :] = -9999.0
    hd, wd = 85, 97
    rows1, cols1 = index_axes(hs, ws, hd, wd, scale=2.85)
    rows2d, cols2d = np.meshgrid(rows1, cols1, indexing="ij")
    want = np.asarray(kw.warp_interpolate(
        jnp.asarray(img), jnp.asarray(rows2d), jnp.asarray(cols2d),
        nodata=-9999.0, method=method))
    Wr = kw.separable_weight_matrix(rows1, hs, method)
    Wc = kw.separable_weight_matrix(cols1, ws, method)
    got = np.asarray(kw.separable_resample_matmul(
        jnp.asarray(img), jnp.asarray(Wr), jnp.asarray(Wc),
        nodata=-9999.0, fast=False))
    # pixels whose valid-weight mass nearly cancels (signed cubic taps
    # next to the nodata block) are fp-ill-conditioned under
    # renormalisation; compare them loosely and the rest tightly
    rows2d_, cols2d_ = np.meshgrid(rows1, cols1, indexing="ij")
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-3)
    stable = np.abs(want) < 1e4  # all finite pixels
    diffs = np.abs(got - want)[stable]
    assert np.percentile(diffs, 99) < 5e-5


def test_separable_matmul_no_nodata(rng):
    img = rng.random((20, 22, 3)).astype(np.float32)
    rows1, cols1 = index_axes(20, 22, 60, 66, scale=3.0)
    rows2d, cols2d = np.meshgrid(rows1, cols1, indexing="ij")
    want = np.asarray(kw.warp_interpolate(
        jnp.asarray(img), jnp.asarray(rows2d), jnp.asarray(cols2d),
        method="bilinear", fill=-9999.0))
    Wr = kw.separable_weight_matrix(rows1, 20, "bilinear")
    Wc = kw.separable_weight_matrix(cols1, 22, "bilinear")
    got = np.asarray(kw.separable_resample_matmul(
        jnp.asarray(img), jnp.asarray(Wr), jnp.asarray(Wc),
        fill=-9999.0, fast=False))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_separable_matmul_outside_fill(rng):
    img = rng.random((10, 10, 1)).astype(np.float32)
    rows1 = np.array([-3.0, 4.0], dtype=np.float32)   # first fully outside
    cols1 = np.array([4.0, 30.0], dtype=np.float32)   # second fully outside
    Wr = kw.separable_weight_matrix(rows1, 10, "cubic")
    Wc = kw.separable_weight_matrix(cols1, 10, "cubic")
    got = np.asarray(kw.separable_resample_matmul(
        jnp.asarray(img), jnp.asarray(Wr), jnp.asarray(Wc),
        fill=-9999.0, fast=False))
    assert got[0, 0, 0] == -9999.0
    assert got[0, 1, 0] == -9999.0
    assert got[1, 1, 0] == -9999.0
    assert got[1, 0, 0] != -9999.0


def test_fused_orthowarp_matches_two_step(rng):
    """orthowarp_taploop == glt_gather + warp_interpolate (cubic) with
    reference nodata semantics."""
    from hyperres.kernels.glt import glt_gather, prepare_glt

    raw = rng.random((30, 35, 9)).astype(np.float32)
    ho, wo = 40, 44
    glt = np.zeros((ho, wo, 2), dtype=np.int32)
    valid = rng.random((ho, wo)) > 0.25
    glt[..., 0] = np.where(valid, rng.integers(1, 36, (ho, wo)), 0)
    glt[..., 1] = np.where(valid, rng.integers(1, 31, (ho, wo)), 0)
    flat_idx, vmask = prepare_glt(glt, (30, 35))

    rows = rng.uniform(-2, ho + 1, size=(50, 52)).astype(np.float32)
    cols = rng.uniform(-2, wo + 1, size=(50, 52)).astype(np.float32)

    ortho = glt_gather(jnp.asarray(raw), jnp.asarray(flat_idx),
                       jnp.asarray(vmask))
    want = np.asarray(kw.warp_interpolate(
        ortho, jnp.asarray(rows), jnp.asarray(cols), nodata=-9999.0,
        method="cubic"))
    got = np.asarray(kw.orthowarp_taploop(
        jnp.asarray(raw), jnp.asarray(flat_idx), jnp.asarray(vmask),
        jnp.asarray(rows), jnp.asarray(cols), method="cubic"))
    # identical up to renormalisation conditioning at masked borders
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-3)
    diffs = np.abs(got - want)
    assert np.percentile(diffs, 99) < 1e-4


def test_band_chunked_matches_plain(rng):
    img = rng.normal(size=(30, 34, 11)).astype(np.float32)
    img[5:7, 8:10, :] = -9999.0
    rows = rng.uniform(0, 29, size=(20, 21)).astype(np.float32)
    cols = rng.uniform(0, 33, size=(20, 21)).astype(np.float32)
    a = np.asarray(kw.warp_interpolate(
        jnp.asarray(img), jnp.asarray(rows), jnp.asarray(cols),
        nodata=-9999.0, method="cubic"))
    b = np.asarray(kw.warp_interpolate_chunked(
        jnp.asarray(img), jnp.asarray(rows), jnp.asarray(cols),
        nodata=-9999.0, method="cubic", band_chunk=4))
    np.testing.assert_allclose(a, b, rtol=0, atol=5e-3)
    assert np.percentile(np.abs(a - b), 99) < 1e-4
