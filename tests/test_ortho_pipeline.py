import json
from pathlib import Path

import numpy as np
import pytest

from hyperres.core.config import OrthoConfig
from hyperres.io import envi
from hyperres.io.granule import EmitGranule, apply_glt
from hyperres.io.tiff import TiffReader
from hyperres.kernels.warp import resample_to_grid
from hyperres.ortho import orthorectify_granule
from hyperres.testing.scenes import make_scene, truth_reflectance


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return make_scene(tmp_path_factory.mktemp("orthoscene"),
                      raw_shape=(64, 72), n_bands=24, s2_size=300)


@pytest.fixture(scope="module")
def result(scene, tmp_path_factory):
    out = tmp_path_factory.mktemp("ortho_out")
    return orthorectify_granule(
        scene.emit_nc_path, out, scene.s2_tif_path, export_loc=True,
        config=OrthoConfig(),
        save_info_path=out / "info.json"), out


def test_outputs_exist(result):
    res, out = result
    assert res.data_envi_bin.exists()
    assert res.data_envi_bin.with_suffix(".hdr").exists()
    assert res.data_envi_bin.with_suffix(".xml").exists()
    assert (out / "info.json").exists()
    info = res.info
    assert info["product"] == "L2A_RFL"
    assert "data_utm_tif" in info["outputs"]
    assert "loc_envi_bin" in info["outputs"]
    assert info["glt_diag"]["valid_glt_dropped_oob"] == 0
    # stage timings recorded
    warp_stage = ("data_two_pass_orthowarp"
                  if "data_two_pass_orthowarp" in info["stages"]
                  else "data_fused_orthowarp")
    assert info["stages"][warp_stage]["seconds"] >= 0


def test_utm_grid_is_s2_anchored(result, scene):
    res, _ = result
    g = res.utm_grid
    assert g.crs == scene.s2_grid.crs
    assert g.dx == 60.0 and g.dy == 60.0
    assert abs(((g.x0 - scene.s2_grid.x0) / 60.0) % 1.0) < 1e-9
    assert abs(((scene.s2_grid.y0 - g.y0) / 60.0) % 1.0) < 1e-9
    # info echoes the alignment contract
    assert res.info["s2_align"]["emit_anchor_mode"] == "s2_origin"


def test_envi_cube_matches_oracle_path(result, scene):
    """The written UTM cube must equal gather(oracle) + warp(oracle) to
    float32 tolerance."""
    res, _ = result
    r = envi.EnviReader(res.data_envi_bin.with_suffix(".hdr"))
    got = r.read()
    assert r.grid == res.utm_grid
    assert r.nodata == -9999.0

    with EmitGranule(scene.emit_nc_path) as g:
        raw = g.read_cube()
        ortho_oracle = apply_glt(raw, g.glt)  # reference-semantics gather
        utm_oracle = resample_to_grid(
            ortho_oracle, g.ortho_grid, res.utm_grid, method="cubic",
            nodata=-9999.0, fill=-9999.0)
    # the pipeline uses the fused GLT+warp kernel: identical semantics,
    # renormalisation conditioning differs only at masked borders
    np.testing.assert_allclose(got, utm_oracle, rtol=0, atol=5e-3)
    assert np.percentile(np.abs(got - utm_oracle), 99) < 1e-4

    # exactness check for the two-step path
    from hyperres.core.config import OrthoConfig
    from hyperres.ortho import orthorectify_granule
    res2 = orthorectify_granule(
        scene.emit_nc_path, res.data_envi_bin.parent.parent / "twostep",
        scene.s2_tif_path,
        config=OrthoConfig(fused_orthowarp=False, save_geotiffs=False,
                           write_xml=False))
    got2 = envi.EnviReader(res2.data_envi_bin.with_suffix(".hdr")).read()
    np.testing.assert_allclose(got2, utm_oracle, rtol=0, atol=1e-5)


def test_utm_cube_close_to_world_truth(result, scene):
    """End-to-end geometric check: the projected cube must agree with the
    analytic world at UTM pixel centres (away from swath edges)."""
    res, _ = result
    r = envi.EnviReader(res.data_envi_bin.with_suffix(".hdr"))
    cube = r.read()
    grid = res.utm_grid
    xs, ys = grid.pixel_center_coords()
    X, Y = np.meshgrid(xs, ys)
    truth = truth_reflectance(X, Y, scene.spectra, seed=0)
    valid = cube[..., 0] != -9999.0
    # erode edges: only compare pixels whose 3x3 neighbourhood is valid
    from scipy.ndimage import binary_erosion
    interior = binary_erosion(valid, iterations=2)
    assert interior.sum() > 50
    err = np.abs(cube[interior] - truth[interior])
    # nearest-GLT + cubic interp on a 60 m grid of a smooth world:
    # expect small error (world curvature over 60 m + noise 0.002)
    assert np.median(err) < 0.02
    assert err.mean() < 0.03


def test_geotiff_export_decodes_back(result):
    res, _ = result
    tif = res.info["outputs"]["data_utm_tif"]
    with TiffReader(tif) as t:
        q = t.read()
        assert q.dtype == np.uint16
        assert t.nodata == 65535
        assert t.dataset_tags["scale_factor"] == "0.0001"
    r = envi.EnviReader(res.data_envi_bin.with_suffix(".hdr"))
    cube = r.read()
    valid = cube != -9999.0
    decoded = q.astype(np.float32) * 1e-4
    decoded = np.moveaxis(decoded, 0, -1)
    np.testing.assert_allclose(decoded[valid], cube[valid], atol=6e-5)


def test_idempotent_skip(result, scene, tmp_path):
    res, out = result
    res2 = orthorectify_granule(
        scene.emit_nc_path, out, scene.s2_tif_path,
        config=OrthoConfig())
    assert res2.info.get("skipped") is True
    assert res2.data_envi_bin == res.data_envi_bin


def test_loc_geotiff_decode_roundtrip(result, scene):
    res, _ = result
    loc_tif = res.info["outputs"]["loc_utm_tif"]
    with TiffReader(loc_tif) as t:
        q = t.read()
        scale0 = float(t.band_tags[0]["scale"])
        off0 = float(t.band_tags[0]["offset"])
        lon = q[0].astype(np.float64) * scale0 + off0
    # decoded longitudes must sit in the scene's area (~13-16 E)
    valid = q[0] != 0
    assert valid.sum() > 100
    assert 10.0 < lon[valid].mean() < 18.0


def test_obs_export_branch(scene, tmp_path, rng):
    """OBS granule export with the REAL L1B_OBS file structure: the cube
    lives in an 'obs' variable (not radiance/reflectance), band names in
    sensor_band_parameters/observation_bands, and NO wavelengths
    (emit_proj.py:29-115, 1191-1280)."""
    from hyperres.io.hdf5 import HDF5Writer
    from hyperres.io.granule import EmitGranule

    # fabricate an OBS granule sharing the scene's GLT/geometry
    with EmitGranule(scene.emit_nc_path) as g:
        h, w = g.raw_height, g.raw_width
        glt_x = g.glt[..., 0].astype(np.float64)
        glt_y = g.glt[..., 1].astype(np.float64)
        gt = np.array(g.geotransform)
    nb = 11
    names = [f"Geometry band {i}" for i in range(nb)]
    obs = np.stack([np.full((h, w), 100.0 * (i + 1))
                    + rng.normal(size=(h, w))
                    for i in range(nb)], axis=-1).astype(np.float32)
    wgr = HDF5Writer(tmp_path / "obs.nc")
    wgr.create_dataset("/obs", obs)
    wgr.create_group("/sensor_band_parameters")
    wgr.create_dataset("/sensor_band_parameters/observation_bands",
                       np.array([n.encode() for n in names], dtype="S32"))
    wgr.create_group("/location")
    wgr.create_dataset("/location/glt_x", glt_x)
    wgr.create_dataset("/location/glt_y", glt_y)
    wgr.set_attrs("/", geotransform=gt)
    wgr.save()

    # the granule opens as an OBS product with its own band names
    with EmitGranule(tmp_path / "obs.nc") as og:
        assert og.product == "L1B_OBS"
        assert og.wavelengths is None
        assert og.band_names == names

    res = orthorectify_granule(
        scene.emit_nc_path, tmp_path / "obs_out", scene.s2_tif_path,
        obs_file=tmp_path / "obs.nc",
        config=OrthoConfig(write_xml=False))
    assert "obs_error" not in res.info, res.info.get("obs_error")
    assert "obs_envi_bin" in res.info["outputs"]
    assert "obs_utm_tif" in res.info["outputs"]

    from hyperres.io import envi
    from hyperres.io.tiff import TiffReader
    r = envi.EnviReader(
        Path(res.info["outputs"]["obs_envi_bin"]).with_suffix(".hdr"))
    cube = r.read()
    assert cube.shape[-1] == nb
    valid = cube[..., 0] != -9999.0
    # band i centred near 100*(i+1)
    for i in (0, 5, 10):
        assert abs(np.median(cube[..., i][valid]) - 100.0 * (i + 1)) < 5.0

    with TiffReader(res.info["outputs"]["obs_utm_tif"]) as t:
        assert t.count == nb
        # band names taken from the granule's observation_bands
        assert t.descriptions[0] == names[0]
        q = t.read()
        # decode band 3 via its scale/offset tags
        s3 = float(t.band_tags[3]["scale"])
        o3 = float(t.band_tags[3]["offset"])
        dec = q[3].astype(np.float64) * s3 + o3
        vm = q[3] != 0
        assert abs(np.median(dec[vm]) - 400.0) < 5.0
