"""Regression tests for review-driven fixes (round 2): each test pins a
behavior that was observed broken and repaired."""

import datetime as dt

import numpy as np
import pytest

from hyperres.core.crs import CRS
from hyperres.core.grid import Grid


def test_copy_any_merges_into_existing_dir(tmp_path):
    """Re-archiving after new files appeared must copy them into an
    existing destination subdirectory (rsync --ignore-existing parity);
    the shutil fallback used to skip the whole directory."""
    from hyperres.artifacts.copy import copy_any
    src = tmp_path / "run"
    (src / "tiles").mkdir(parents=True)
    (src / "tiles" / "a.tif").write_text("a")
    dst = tmp_path / "archive"
    copy_any(src, dst, use_rsync=False)
    assert (dst / "tiles" / "a.tif").exists()
    # new tile appears; existing file changes (must NOT be overwritten)
    (src / "tiles" / "b.tif").write_text("b")
    (src / "tiles" / "a.tif").write_text("a-modified")
    copy_any(src, dst, use_rsync=False)
    assert (dst / "tiles" / "b.tif").read_text() == "b"
    assert (dst / "tiles" / "a.tif").read_text() == "a"


def test_choose_nearest_naive_target():
    """A tz-naive target datetime is treated as UTC instead of raising
    on aware-naive subtraction."""
    from hyperres.catalog.clients import choose_nearest

    def item(iso):
        return {"umm": {"TemporalExtent": {
            "RangeDateTime": {"BeginningDateTime": iso}}}}

    items = [item("2023-08-19T10:00:00Z"), item("2023-08-19T14:00:00Z")]
    best = choose_nearest(items, dt.datetime(2023, 8, 19, 13, 0))
    got = best["umm"]["TemporalExtent"]["RangeDateTime"][
        "BeginningDateTime"]
    assert got == "2023-08-19T14:00:00Z"


def test_s2_anchored_grid_checks_yres():
    """The divides-S2-resolution contract applies to BOTH axes; yres
    used to be unchecked."""
    from hyperres.core.grid import s2_anchored_target_grid
    utm = CRS.utm(33, True)
    src = Grid(utm, 400000.0, 5800000.0, 60.0, 60.0, 10, 10)
    s2 = Grid(utm, 399960.0, 5800020.0, 10.0, 10.0, 100, 100)
    with pytest.raises(ValueError, match="integer multiple"):
        s2_anchored_target_grid(src, s2, 60.0, 55.0)


def test_warp_nearest_masks_nan(rng):
    """warp_nearest applies the package-wide nodata contract: non-finite
    sources are invalid (NaN used to leak through the sentinel compare)."""
    import jax.numpy as jnp
    from hyperres.kernels.warp import warp_nearest
    img = rng.random((6, 6, 2)).astype(np.float32)
    img[2, 2, :] = np.nan
    rows = jnp.asarray(np.full((3, 3), 2.0, np.float32))
    cols = jnp.asarray(np.full((3, 3), 2.0, np.float32))
    out = np.asarray(warp_nearest(jnp.asarray(img), rows, cols,
                                  nodata=-9999.0, fill=-1.0))
    assert (out == -1.0).all()


def test_resample_average_non_integer_ratio(rng):
    """Same-CRS non-integer-ratio 'average' routes through the
    area-weighted matmul instead of silently degrading to 2-tap
    bilinear: a constant field must reproduce exactly, and averaging a
    fine checkerboard at 2.5x must land near the mean (bilinear would
    alias to the extremes)."""
    from hyperres.kernels.warp import resample_to_grid
    utm = CRS.utm(33, True)
    src = Grid(utm, 0.0, 1000.0, 10.0, 10.0, 40, 40)
    dst = Grid(utm, 0.0, 1000.0, 25.0, 25.0, 16, 16)  # 2.5x: non-integer
    const = np.full((40, 40), 7.5, np.float32)
    out = np.asarray(resample_to_grid(const, src, dst, method="average"))
    np.testing.assert_allclose(out, 7.5, atol=1e-5)
    checker = np.indices((40, 40)).sum(axis=0) % 2
    out2 = np.asarray(resample_to_grid(checker.astype(np.float32), src,
                                       dst, method="average"))
    inner = out2[2:-2, 2:-2]
    assert np.abs(inner - 0.5).max() < 0.21  # area average, not aliased


def test_resample_average_offset_outside_source(rng):
    """An aligned integer-ratio dst grid extending OUTSIDE the source
    must not take the block fast path and silently misplace data."""
    from hyperres.core.constants import NO_DATA_VALUE
    from hyperres.kernels.warp import resample_to_grid
    utm = CRS.utm(33, True)
    src = Grid(utm, 0.0, 1200.0, 10.0, 10.0, 60, 60)
    # aligned 3x grid whose first row/col lie above/left of the source
    dst = Grid(utm, -30.0, 1230.0, 30.0, 30.0, 21, 21)
    data = rng.random((60, 60)).astype(np.float32)
    out = np.asarray(resample_to_grid(data, src, dst, method="average",
                                      nodata=NO_DATA_VALUE))
    # interior block: exact 3x3 mean of the corresponding source block
    np.testing.assert_allclose(out[1, 1], data[0:3, 0:3].mean(),
                               rtol=1e-5)
    np.testing.assert_allclose(out[5, 7], data[12:15, 18:21].mean(),
                               rtol=1e-5)


def test_scanline_cstar_rejects_nonmonotone():
    from hyperres.kernels.warp import scanline_cstar
    rows = np.array([[0.0], [2.0], [1.0], [3.0]], np.float32)
    cols = np.zeros((4, 1), np.float32)
    with pytest.raises(ValueError, match="not monotone"):
        scanline_cstar(np.repeat(rows, 2, 1), np.repeat(cols, 2, 1), 4)


def test_idw_chunked_matches_unchunked(rng):
    """The chunked IDW residual evaluation (memory-bounded) must equal
    the direct computation."""
    from hyperres.coreg.local import CoregResult, TiePoint, shift_field
    tps = [TiePoint(col=int(c), row=int(r), dy=float(dy), dx=float(dx),
                    reliability=90.0)
           for r, c, dy, dx in [(5, 5, 1.0, -0.5), (5, 25, 0.5, 0.2),
                                (25, 5, -0.3, 0.8), (25, 25, 0.9, -1.1),
                                (15, 15, 0.1, 0.1)]]
    res = CoregResult(True, None, tie_points=tps,
                      affine=np.array([[0.0, 0.0, 0.4],
                                       [0.0, 0.0, -0.2]]))
    dy, dx = shift_field(res, (30, 30), local_residuals=True)
    # direct reference computation
    rr, cc = np.meshgrid(np.arange(30, dtype=np.float32),
                         np.arange(30, dtype=np.float32), indexing="ij")
    pr = np.array([t.row for t in tps], np.float32)
    pc = np.array([t.col for t in tps], np.float32)
    ry = np.array([t.dy - 0.4 for t in tps], np.float32)
    d2 = (rr[..., None] - pr) ** 2 + (cc[..., None] - pc) ** 2
    wgt = 1.0 / (d2 + 1.0)
    want_dy = 0.4 + (wgt * ry).sum(-1) / (wgt.sum(-1) + 1e-12)
    np.testing.assert_allclose(dy, want_dy, atol=1e-5)


def test_load_s2_rgb_u8_excludes_nodata(tmp_path, rng):
    """uint16 stacks with a 65535 sentinel must stretch on VALID data
    (global /max() rendered valid reflectance near-black and nodata
    white)."""
    from hyperres.io.tiff import write_geotiff
    from hyperres.viz.quicklook import load_s2_rgb_u8
    utm = CRS.utm(33, True)
    g = Grid(utm, 0.0, 1000.0, 10.0, 10.0, 20, 20)
    data = rng.integers(500, 9000, (3, 20, 20)).astype(np.uint16)
    data[:, :3, :3] = 65535  # nodata corner
    p = tmp_path / "s.tif"
    write_geotiff(p, data, g, nodata=65535)
    rgb = load_s2_rgb_u8(p)
    assert rgb[10, 10].max() > 60  # valid data uses the dynamic range
    assert (rgb[0, 0] == 0).all()  # nodata renders black, not white


def test_predictor2_numpy_fallback_2d():
    from hyperres.native import predictor2
    a = np.arange(20, dtype=np.int64).reshape(4, 5)  # int64 -> fallback
    enc = predictor2(a, True)
    assert enc.shape == a.shape
    np.testing.assert_array_equal(predictor2(enc, False), a)
