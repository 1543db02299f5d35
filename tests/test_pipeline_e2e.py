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
