import numpy as np
import pytest

from hyperres.pipeline import fuse_pair, psnr, run_pair_pipeline, sam
from hyperres.testing.scenes import make_scene, truth_reflectance


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return make_scene(tmp_path_factory.mktemp("e2e"),
                      raw_shape=(80, 90), n_bands=48, s2_size=420)


@pytest.fixture(scope="module")
def pair_result(scene, tmp_path_factory):
    from hyperres.core.config import TilingConfig
    out = tmp_path_factory.mktemp("pair_out")
    return run_pair_pipeline(
        scene.emit_nc_path, scene.s2_tif_path, out,
        tiling_config=TilingConfig(emit_tile_size=16, max_black_frac=0.05),
        max_tiles=4, train_sr=True)


def test_metrics_helpers(rng):
    a = rng.random((20, 20, 4)).astype(np.float32)
    assert psnr(a, a) == float("inf")
    assert sam(a, a) < 1e-3
    b = a + 0.01
    p = psnr(a, b)
    assert 35 < p < 45  # MSE 1e-4 -> 40 dB


def test_pair_pipeline_outputs(pair_result):
    res = pair_result
    assert res.fused_tif.exists()
    assert res.report_path.exists()
    assert res.run.local_manifest_csv.exists()
    report = res.report_path.read_text()
    for section in ("Orthorectification", "Fusion (OT + poly)", "Tiles",
                    "Spectral SR (ridge)", "Timing"):
        assert section in report
    assert len(res.tiles) >= 1
    assert len(res.tile_records) == len(res.tiles)
    # tile artifacts on disk
    rec = res.tile_records[0]
    from pathlib import Path
    assert Path(rec.emit_tif).exists()
    assert Path(rec.s2_tif).exists()
    assert Path(rec.emit_b32_tif).exists()


def test_fusion_matches_s2_distribution(pair_result, scene):
    """After OT+poly matching, the fused 10 m product's distribution must
    be close to the real (stretched) S2 RGB over the overlap."""
    res = pair_result
    fused = res.fusion.fused_10m
    assert fused.shape[-1] == 3
    valid = np.isfinite(fused).all(axis=-1)
    assert valid.mean() > 0.3
    vals = fused[valid]
    assert vals.min() >= 0.0 and vals.max() <= 1.0
    # matched 60 m view correlates strongly with the S2 60 m target:
    # the OT+poly map is monotone per channel on the same scene
    assert res.fusion.info["n_valid_60m"] > 500


def test_sr_model_quality(pair_result):
    """On a smooth synthetic world the ridge SR model should explain most
    of the variance (the reference reports per-band R2 the same way)."""
    m = pair_result.sr_metrics
    assert m is not None
    assert m["n_train_pixels"] > 1000
    assert m["r2_mean"] > 0.8
    assert m["rmse_mean"] < 0.05
    assert len(m["r2_per_band"]) == len(m["band_indices"])


def test_ortho_utm_psnr_vs_truth(pair_result, scene):
    """PSNR of the orthorectified UTM cube vs the analytic world —
    the BASELINE.md parity metric wired end-to-end."""
    from hyperres.io import envi
    res = pair_result
    r = envi.EnviReader(
        res.ortho_info["outputs"]["data_envi_hdr"])
    cube = r.read()
    grid = r.grid
    xs, ys = grid.pixel_center_coords()
    X, Y = np.meshgrid(xs, ys)
    truth = truth_reflectance(X, Y, scene.spectra, seed=0)
    valid = cube[..., 0] != -9999.0
    from scipy.ndimage import binary_erosion
    interior = binary_erosion(valid, iterations=2)
    p = psnr(cube[interior], truth[interior])
    s = sam(cube[interior], truth[interior])
    assert p > 25.0, f"PSNR too low: {p}"
    assert s < 0.1, f"SAM too high: {s}"


def test_pipeline_with_coregistration(tmp_path, rng):
    """Config #5 end-to-end including the coreg step: a shifted S2 stack
    must be re-aligned before fusion."""
    import cv2
    from hyperres.core.config import CoregConfig, TilingConfig
    from hyperres.io.tiff import TiffReader, write_geotiff

    scene = make_scene(tmp_path / "scene", raw_shape=(90, 100), n_bands=24,
                       s2_size=480, noise=0.001)
    # shift the S2 stack by a known subpixel amount
    with TiffReader(scene.s2_tif_path) as r:
        stack = r.read().astype(np.float32)
        grid = r.grid
        descs = r.descriptions
        nodata = r.nodata
    dy, dx = 2.0, -3.0
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    shifted = np.stack([
        cv2.warpAffine(b, M, (b.shape[1], b.shape[0]),
                       flags=cv2.INTER_LINEAR,
                       borderMode=cv2.BORDER_REFLECT) for b in stack])
    shifted_path = tmp_path / "s2_shifted.tif"
    write_geotiff(shifted_path, shifted.astype(np.uint16), grid,
                  nodata=nodata, descriptions=descs)

    res = run_pair_pipeline(
        scene.emit_nc_path, shifted_path, tmp_path / "out",
        coregister=True,
        coreg_config=CoregConfig(window_size=(256, 256), grid_res=120,
                                 max_points=9, min_reliability=20,
                                 max_shift=8.0),
        tiling_config=TilingConfig(emit_tile_size=16, max_black_frac=0.1),
        max_tiles=2, train_sr=False)
    assert res.info["coreg"] is not None
    final = res.info["coreg"]["final"]
    assert final.get("success"), res.info["coreg"]
    mdy, mdx = final["mean_shift_px"]
    # accuracy bound: the EMIT reference itself carries GLT
    # nearest-neighbour quantization (+-0.5 raw px = +-3 S2 px), so the
    # recovered shift is within ~1.5 px of the injected one
    assert abs(mdy - dy) < 1.5 and abs(mdx - dx) < 1.5
    assert "Coregistration" in res.report_path.read_text()


def test_fusion_deterministic(scene, tmp_path):
    """Same inputs + seeds => identical fused product (kernel purity —
    the determinism check SURVEY §5 asks for in place of sanitizers)."""
    from hyperres.io import envi
    from hyperres.io.tiff import TiffReader
    from hyperres.ortho import orthorectify_granule
    from hyperres.pipeline import fuse_pair
    from hyperres.core.config import OrthoConfig

    res = orthorectify_granule(
        scene.emit_nc_path, tmp_path / "o", scene.s2_tif_path,
        config=OrthoConfig(save_geotiffs=False, write_xml=False))
    r = envi.EnviReader(res.data_envi_bin.with_suffix(".hdr"))
    cube = r.read()
    with TiffReader(scene.s2_tif_path) as t:
        stack = t.read().astype(np.float32)
        s2_grid = t.grid
        nodata = t.nodata
    a = fuse_pair(cube, r.wavelengths, r.grid, stack, s2_grid,
                  s2_scale=1e-4, s2_nodata=nodata)
    b = fuse_pair(cube, r.wavelengths, r.grid, stack, s2_grid,
                  s2_scale=1e-4, s2_nodata=nodata)
    np.testing.assert_array_equal(np.nan_to_num(a.fused_10m),
                                  np.nan_to_num(b.fused_10m))
    np.testing.assert_array_equal(a.coeffs, b.coeffs)


def test_sr_cube_product(scene, tmp_path):
    from hyperres.core.config import TilingConfig, RidgeSRConfig
    from hyperres.io.tiff import TiffReader
    res = run_pair_pipeline(
        scene.emit_nc_path, scene.s2_tif_path, tmp_path / "srrun",
        tiling_config=TilingConfig(emit_tile_size=16, max_black_frac=0.1),
        sr_config=RidgeSRConfig(degree=2, n_emit_bands=16),
        max_tiles=1, train_sr=True, predict_sr_cube=True)
    p = res.sr_metrics["sr_cube_tif"]
    with TiffReader(p) as r:
        assert r.count == 16
        assert r.nodata == 65535
        q = r.read()
        assert q.dtype == np.uint16
        # decoded reflectance plausible over valid pixels
        valid = q[0] != 65535
        refl = q[:, valid].astype(np.float32) * 1e-4
        assert valid.mean() > 0.2
        assert 0.0 <= refl.min() and refl.max() <= 1.0
        assert "nm" in r.descriptions[0]


def test_fuse_pair_box_variant(tmp_path):
    """The rectangular band-pass synthesis variant (demo cell 58) drives
    the same fusion path. Needs a spectral axis dense enough that each
    rectangular window holds >= 2 samples (at 48 bands the variant
    correctly yields no valid bands, like the reference returning None)."""
    from hyperres.io import envi
    from hyperres.io.tiff import TiffReader
    from hyperres.ortho import orthorectify_granule
    from hyperres.pipeline import fuse_pair
    from hyperres.core.config import OrthoConfig

    scene = make_scene(tmp_path / "boxscene", raw_shape=(60, 70),
                       n_bands=200, s2_size=300)
    res = orthorectify_granule(
        scene.emit_nc_path, tmp_path / "bo", scene.s2_tif_path,
        config=OrthoConfig(save_geotiffs=False, write_xml=False))
    r = envi.EnviReader(res.data_envi_bin.with_suffix(".hdr"))
    cube = r.read()
    with TiffReader(scene.s2_tif_path) as t:
        stack = t.read().astype(np.float32)
        s2_grid = t.grid
        nodata = t.nodata
    out = fuse_pair(cube, r.wavelengths, r.grid, stack, s2_grid,
                    s2_scale=1e-4, s2_nodata=nodata, synth_method="box")
    valid = np.isfinite(out.fused_10m).all(axis=-1)
    assert valid.mean() > 0.3
    assert out.info["n_valid_60m"] > 500


@pytest.mark.parametrize("method", ["ot_affine", "linear", "histogram"])
def test_fuse_pair_model_families(scene, tmp_path, method):
    """All four matching model families run through the fusion driver and
    pull the simulated bands toward the real S2 distribution."""
    from hyperres.io import envi
    from hyperres.io.tiff import TiffReader
    from hyperres.ortho import orthorectify_granule
    from hyperres.pipeline import fuse_pair
    from hyperres.core.config import OrthoConfig

    res = orthorectify_granule(
        scene.emit_nc_path, tmp_path / f"mf_{method}", scene.s2_tif_path,
        config=OrthoConfig(save_geotiffs=False, write_xml=False))
    r = envi.EnviReader(res.data_envi_bin.with_suffix(".hdr"))
    cube = r.read()
    with TiffReader(scene.s2_tif_path) as t:
        stack = t.read().astype(np.float32)
        s2_grid = t.grid
        nodata = t.nodata
    out = fuse_pair(cube, r.wavelengths, r.grid, stack, s2_grid,
                    s2_scale=1e-4, s2_nodata=nodata,
                    fusion_method=method)
    assert out.info["fusion_method"] == method
    valid = np.isfinite(out.fused_10m).all(axis=-1)
    assert valid.mean() > 0.3
    vals = out.fused_10m[valid]
    assert vals.min() >= 0.0 and vals.max() <= 1.0
    assert np.isfinite(out.matched_60m).all()


def test_fuse_pair_histogram_60m_10m_consistent(scene, tmp_path):
    """The histogram family must use the SAME stretched 60 m reference
    distribution at both resolutions (round-1 weakness: the 10 m apply
    re-matched against raw unstretched S2), so 60 m and 10 m outputs
    agree on overlapping statistics."""
    from hyperres.io import envi
    from hyperres.io.tiff import TiffReader
    from hyperres.ortho import orthorectify_granule
    from hyperres.pipeline import fuse_pair
    from hyperres.core.config import OrthoConfig

    res = orthorectify_granule(
        scene.emit_nc_path, tmp_path / "hc", scene.s2_tif_path,
        config=OrthoConfig(save_geotiffs=False, write_xml=False))
    r = envi.EnviReader(res.data_envi_bin.with_suffix(".hdr"))
    cube = r.read()
    with TiffReader(scene.s2_tif_path) as t:
        stack = t.read().astype(np.float32)
        s2_grid = t.grid
        nodata = t.nodata
    out = fuse_pair(cube, r.wavelengths, r.grid, stack, s2_grid,
                    s2_scale=1e-4, s2_nodata=nodata,
                    fusion_method="histogram")
    v60 = np.isfinite(out.matched_60m).all(axis=-1)
    v10 = np.isfinite(out.fused_10m).all(axis=-1)
    for c in range(3):
        q60 = np.percentile(out.matched_60m[..., c][v60], [10, 50, 90])
        q10 = np.percentile(out.fused_10m[..., c][v10], [10, 50, 90])
        np.testing.assert_allclose(q10, q60, atol=0.06)
