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
