import json

import pytest

from hyperres.cli import main


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliscene")
    assert main(["scene", str(d), "--raw", "36", "40", "--bands", "12",
                 "--s2-size", "180"]) == 0
    return d


def test_cli_scene_and_info(scene_dir, capsys):
    s2 = scene_dir / "s2_stack_10m.tif"
    assert s2.exists()
    assert main(["info", str(s2)]) == 0
    out = capsys.readouterr().out
    assert "s2_stack_10m.tif" in out


def test_cli_ortho(scene_dir, tmp_path, capsys):
    nc = next(scene_dir.glob("*.nc"))
    rc = main(["ortho", str(nc), str(tmp_path / "o"),
               "--s2", str(scene_dir / "s2_stack_10m.tif")])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert "data_envi_bin" in doc
    assert (tmp_path / "o" / "ortho_info.json").exists()


def test_cli_fuse_and_tiles(scene_dir, tmp_path, capsys):
    nc = next(scene_dir.glob("*.nc"))
    rc = main(["fuse", str(nc), str(scene_dir / "s2_stack_10m.tif"),
               str(tmp_path / "f"), "--tile-size", "10",
               "--max-black-frac", "0.1", "--max-tiles", "2", "--no-sr"])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["n_tiles"] >= 0
    assert (tmp_path / "f" / "report.md").exists()

    emit_tif = tmp_path / "f" / "emit" / "emit_overlap.tif"
    s2_tif = tmp_path / "f" / "s2" / "s2_overlap.tif"
    rc = main(["tiles", str(emit_tif), str(s2_tif), str(tmp_path / "t"),
               "--tile-size", "8", "--max-black-frac", "0.2",
               "--max-tiles", "3"])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["n_tiles"] >= 1


def test_cli_batch(scene_dir, tmp_path, capsys):
    nc = next(scene_dir.glob("*.nc"))
    jobs = [{"pair_id": "p1", "emit_nc_path": str(nc),
             "s2_stack_tif": str(scene_dir / "s2_stack_10m.tif")}]
    jobs_path = tmp_path / "jobs.json"
    jobs_path.write_text(json.dumps(jobs))
    rc = main(["batch", str(jobs_path), str(tmp_path / "batchout")])
    # the default tiling (tile 100) finds no tiles on this small scene,
    # but the pipeline still completes
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["summary"]["done"] == 1
    assert (tmp_path / "batchout" / "pairs_manifest.json").exists()


def test_cli_coreg(tmp_path, capsys):
    """The coreg subcommand end-to-end on a shifted pair."""
    import cv2
    import numpy as np
    from hyperres.core.crs import CRS
    from hyperres.core.grid import Grid
    from hyperres.io.hdf5 import HDF5Writer
    from hyperres.io.tiff import write_geotiff

    rng = np.random.default_rng(3)
    h = w = 360
    f = rng.normal(size=(h // 10 + 2, w // 10 + 2))
    base = cv2.resize(f, (w, h), interpolation=cv2.INTER_CUBIC).astype(
        np.float32)
    base = (base - base.min()) / (np.ptp(base) + 1e-6)
    utm = CRS.utm(33, True)
    s2_grid = Grid(utm, 500000.0, 5800000.0, 10.0, 10.0, w, h)
    M = np.float32([[1, 0, -2.0], [0, 1, 3.0]])
    shifted = cv2.warpAffine(base, M, (w, h), flags=cv2.INTER_CUBIC,
                             borderMode=cv2.BORDER_REFLECT)
    write_geotiff(tmp_path / "s2.tif",
                  (np.stack([shifted]) * 10000).astype(np.uint16),
                  s2_grid, nodata=0, descriptions=["B08_nir"])
    emit_grid = Grid(utm, 500000.0, 5800000.0, 60.0, 60.0, w // 6, h // 6)
    emit = base.reshape(h // 6, 6, w // 6, 6).mean(axis=(1, 3))
    write_geotiff(tmp_path / "emit.tif",
                  (emit[None] * 10000).astype(np.uint16), emit_grid,
                  nodata=65535)
    wgr = HDF5Writer(tmp_path / "emit.nc")
    wgr.create_dataset("/reflectance", np.zeros((4, 4, 1), np.float32))
    wgr.create_group("/sensor_band_parameters")
    wgr.create_dataset("/sensor_band_parameters/wavelengths",
                       np.array([842.0], dtype=np.float32),
                       attrs={"units": "nanometers"})
    wgr.create_group("/location")
    wgr.create_dataset("/location/glt_x", np.ones((4, 4)))
    wgr.create_dataset("/location/glt_y", np.ones((4, 4)))
    wgr.set_attrs("/", geotransform=np.array([0., 1., 0., 0., 0., -1.]))
    wgr.save()

    rc = main(["coreg", "--emit-ref", str(tmp_path / "emit.tif"),
               "--s2", str(tmp_path / "s2.tif"),
               "--nc", str(tmp_path / "emit.nc"),
               "--out", str(tmp_path / "out.tif")])
    doc = json.loads(capsys.readouterr().out)
    # default CoregConfig windows (512^2) exceed this image; the driver
    # is expected to degrade gracefully with its attempts ledger either
    # way, and rc reflects final success
    assert "attempts" in doc
    assert rc in (0, 1)
    if doc["final"].get("success"):
        assert (tmp_path / "out.tif").exists()
