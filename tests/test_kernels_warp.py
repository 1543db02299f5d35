import numpy as np
import jax.numpy as jnp
import pytest

from hyperres.core.crs import CRS
from hyperres.core.grid import Grid
from hyperres.kernels import warp as kwarp


def test_identity_warp_is_exact(rng):
    img = rng.normal(size=(20, 24, 3)).astype(np.float32)
    rows, cols = np.meshgrid(np.arange(20.0), np.arange(24.0), indexing="ij")
    for method in ("bilinear", "cubic"):
        out = np.asarray(kwarp.warp_interpolate(
            jnp.asarray(img), jnp.asarray(rows, dtype=jnp.float32),
            jnp.asarray(cols, dtype=jnp.float32), method=method))
        np.testing.assert_allclose(out, img, rtol=0, atol=1e-5)
    out = np.asarray(kwarp.warp_nearest(
        jnp.asarray(img), jnp.asarray(rows, dtype=jnp.float32),
        jnp.asarray(cols, dtype=jnp.float32)))
    np.testing.assert_array_equal(out, img)


def test_bilinear_matches_scipy_map_coordinates(rng):
    from scipy.ndimage import map_coordinates
    img = rng.normal(size=(30, 35)).astype(np.float32)
    rows = rng.uniform(0, 29, size=(40, 41)).astype(np.float32)
    cols = rng.uniform(0, 34, size=(40, 41)).astype(np.float32)
    got = np.asarray(kwarp.warp_interpolate(
        jnp.asarray(img[..., None]), jnp.asarray(rows), jnp.asarray(cols),
        method="bilinear"))[..., 0]
    want = map_coordinates(img, [rows, cols], order=1, mode="nearest")
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_cubic_reproduces_quadratics(rng):
    """Cubic convolution with a=-0.5 is exact for polynomials of degree
    <= 2 on uniform grids (Keys 1981) — a strong analytic oracle."""
    h, w = 40, 44
    r, c = np.meshgrid(np.arange(h, dtype=np.float64),
                       np.arange(w, dtype=np.float64), indexing="ij")
    img = (0.3 + 0.02 * r - 0.013 * c + 0.0021 * r * c
           + 0.0011 * r ** 2 + 0.0007 * c ** 2).astype(np.float32)
    rows = rng.uniform(2, h - 3, size=(50,)).astype(np.float32)
    cols = rng.uniform(2, w - 3, size=(50,)).astype(np.float32)
    got = np.asarray(kwarp.warp_interpolate(
        jnp.asarray(img[..., None]), jnp.asarray(rows), jnp.asarray(cols),
        method="cubic"))[..., 0]
    want = (0.3 + 0.02 * rows - 0.013 * cols + 0.0021 * rows * cols
            + 0.0011 * rows ** 2 + 0.0007 * cols ** 2)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_nodata_renormalisation_bilinear():
    img = np.array([[1.0, -9999.0], [1.0, 1.0]], dtype=np.float32)[..., None]
    # sample at centre of the 2x2 block: plain bilinear would average in
    # the nodata; renormalised result must be exactly 1.0
    out = np.asarray(kwarp.warp_interpolate(
        jnp.asarray(img), jnp.asarray([0.5], dtype=jnp.float32),
        jnp.asarray([0.5], dtype=jnp.float32), nodata=-9999.0))
    np.testing.assert_allclose(out, [[1.0]], atol=1e-6)
    # fully-nodata neighbourhood -> fill
    img2 = np.full((4, 4, 1), -9999.0, dtype=np.float32)
    out2 = np.asarray(kwarp.warp_interpolate(
        jnp.asarray(img2), jnp.asarray([1.5], dtype=jnp.float32),
        jnp.asarray([1.5], dtype=jnp.float32), nodata=-9999.0))
    assert out2[0, 0] == -9999.0


def test_outside_source_is_fill(rng):
    img = rng.normal(size=(10, 10, 1)).astype(np.float32)
    out = np.asarray(kwarp.warp_interpolate(
        jnp.asarray(img), jnp.asarray([-3.0, 5.0], dtype=jnp.float32),
        jnp.asarray([5.0, 30.0], dtype=jnp.float32), method="cubic"))
    assert np.all(out == -9999.0)


def test_block_average_excludes_nodata(rng):
    img = rng.random((12, 18, 2)).astype(np.float32)
    img[0, 0, :] = -9999.0
    out = np.asarray(kwarp.block_average(jnp.asarray(img), 6,
                                         nodata=-9999.0))
    assert out.shape == (2, 3, 2)
    block = img[:6, :6, 0].ravel()
    want = block[block != -9999.0].mean()
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-6)
    # fully valid block matches plain mean
    np.testing.assert_allclose(out[1, 2, 1], img[6:12, 12:18, 1].mean(),
                               rtol=1e-6)


def test_resample_average_integer_path(rng):
    utm = CRS.utm(33, True)
    src = Grid(utm, 0.0, 0.0, 10.0, 10.0, 60, 60)
    dst = Grid(utm, 0.0, 0.0, 60.0, 60.0, 10, 10)
    data = rng.random((60, 60)).astype(np.float32)
    out = kwarp.resample_to_grid(data, src, dst, method="average")
    want = data.reshape(10, 6, 10, 6).mean(axis=(1, 3))
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_resample_average_offset_aligned(rng):
    utm = CRS.utm(33, True)
    src = Grid(utm, 0.0, 0.0, 10.0, 10.0, 60, 60)
    dst = Grid(utm, 120.0, -60.0, 60.0, 60.0, 6, 6)  # offset by (12, 6) px
    data = rng.random((60, 60)).astype(np.float32)
    out = kwarp.resample_to_grid(data, src, dst, method="average")
    want = data[6:42, 12:48].reshape(6, 6, 6, 6).mean(axis=(1, 3))
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_reproject_geographic_to_utm_alignment():
    """A bright square placed at a known UTM location in a geographic
    source must land at the same UTM location after the warp."""
    utm = CRS.utm(33, True)
    # geographic source grid around (15E, 52N)
    geo = Grid(CRS.geographic(), 14.95, 52.05, 0.0008, 0.0005, 160, 160)
    img = np.zeros((160, 160), dtype=np.float32)
    img[70:90, 70:90] = 1.0
    # centre of the bright square in geographic coords
    gx, gy = geo.xy_of(79.5, 79.5)
    ux, uy = utm.from_geographic(gx, gy)
    dst = Grid(utm, float(ux) - 3000.0, float(uy) + 3000.0, 60.0, 60.0,
               100, 100)
    out = kwarp.resample_to_grid(img, geo, dst, method="bilinear",
                                 nodata=None, fill=0.0)
    # centroid of the warped square
    ys, xs = np.mgrid[0:100, 0:100]
    m = out > 0.5
    assert m.sum() > 100
    cx = (xs[m]).mean()
    cy = (ys[m]).mean()
    wx, wy = dst.xy_of(cx, cy)
    assert abs(float(wx) - float(ux)) < 60.0  # within one 60 m pixel
    assert abs(float(wy) - float(uy)) < 60.0


def test_reproject_stack_api(rng):
    utm = CRS.utm(33, True)
    src = Grid(utm, 0.0, 0.0, 60.0, 60.0, 20, 20)
    dst = Grid(utm, 0.0, 0.0, 10.0, 10.0, 120, 120)
    stack = rng.random((3, 20, 20)).astype(np.float32)
    out = kwarp.reproject_stack_to_grid(stack, src, dst,
                                        resampling="bilinear")
    assert out.shape == (3, 120, 120)
    # upsampling preserves range
    assert out.min() >= stack.min() - 1e-5
    assert out.max() <= stack.max() + 1e-5
