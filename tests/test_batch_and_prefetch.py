import json

import numpy as np
import pytest

from hyperres.batch import BatchPairDriver, PairJob
from hyperres.io.pipeline import PrefetchToDevice, band_chunk_reader, \
    tile_batch_reader


def test_prefetch_to_device_order_and_values(rng):
    batches = [rng.random((4, 5)).astype(np.float32) for _ in range(7)]
    out = list(PrefetchToDevice(iter(batches), depth=3))
    assert len(out) == 7
    for got, want in zip(out, batches):
        np.testing.assert_array_equal(np.asarray(got), want)


def test_prefetch_propagates_errors():
    def gen():
        yield np.zeros(3)
        raise RuntimeError("boom in loader")

    it = iter(PrefetchToDevice(gen(), depth=2))
    next(it)
    with pytest.raises(RuntimeError, match="boom in loader"):
        next(it)


def test_band_chunk_reader(rng):
    cube = rng.random((6, 7, 10)).astype(np.float32)
    chunks = list(band_chunk_reader(lambda a, b: cube[:, :, a:b], 10, 4))
    assert [c.shape[-1] for c in chunks] == [4, 4, 2]
    np.testing.assert_array_equal(np.concatenate(chunks, -1), cube)


def test_tile_batch_reader(tmp_path, rng):
    from hyperres.core.crs import CRS
    from hyperres.core.grid import Grid, Window
    from hyperres.io.tiff import TiffReader, write_geotiff
    data = rng.random((3, 40, 40)).astype(np.float32)
    g = Grid(CRS.utm(33, True), 0.0, 0.0, 10.0, 10.0, 40, 40)
    write_geotiff(tmp_path / "x.tif", data, g, tiled=True, blockxsize=16,
                  blockysize=16)
    wins = [Window(c, r, 10, 10) for r in range(0, 40, 10)
            for c in range(0, 40, 10)]
    with TiffReader(tmp_path / "x.tif") as r:
        batches = list(tile_batch_reader(r, wins, batch=6))
    assert [b.shape for b in batches] == [(6, 3, 10, 10)] * 2 + [(6, 3, 10, 10)]
    np.testing.assert_allclose(batches[0][0], data[:, 0:10, 0:10],
                               rtol=1e-6)
    # final batch zero-padded (16 windows -> 6+6+4pad2)
    assert np.all(batches[-1][-2:] == 0)


# -------------------------------------------------------------- batch -----

def test_batch_driver_resume_and_retry(tmp_path):
    calls = {"n": 0, "flaky": 0}

    def flaky_runner(job, pair_dir):
        calls["n"] += 1
        if job.pair_id == "bad":
            raise ValueError("synthetic failure")
        if job.pair_id == "flaky":
            calls["flaky"] += 1
            if calls["flaky"] == 1:
                raise RuntimeError("transient")
        pair_dir.mkdir(parents=True, exist_ok=True)
        return {"ok": True}

    jobs = [PairJob("good", "e.nc", "s.tif"),
            PairJob("flaky", "e.nc", "s.tif"),
            PairJob("bad", "e.nc", "s.tif")]
    d = BatchPairDriver(tmp_path / "runs", max_retries=1,
                        runner=flaky_runner)
    manifest = d.run(jobs)
    assert manifest["good"]["status"] == "done"
    assert manifest["flaky"]["status"] == "done"
    assert len(manifest["flaky"]["attempts"]) == 2
    assert manifest["bad"]["status"] == "failed"
    assert len(manifest["bad"]["attempts"]) == 2
    assert "synthetic failure" in manifest["bad"]["attempts"][0]["error"]
    assert d.summary() == {"done": 2, "failed": 1, "pending": 0}

    # resume: completed jobs skipped, failed retried
    before = calls["n"]
    d2 = BatchPairDriver(tmp_path / "runs", max_retries=0,
                         runner=flaky_runner)
    m2 = d2.run(jobs)
    assert calls["n"] == before + 1  # only "bad" re-attempted
    assert m2["bad"]["status"] == "failed"
    # manifest persisted on disk
    on_disk = json.loads((tmp_path / "runs" / "pairs_manifest.json")
                         .read_text())
    assert on_disk["good"]["status"] == "done"


def test_batch_driver_end_to_end_with_scene(tmp_path):
    from hyperres.core.config import TilingConfig
    from hyperres.testing.scenes import make_scene
    scene = make_scene(tmp_path / "scene", raw_shape=(40, 46), n_bands=12,
                       s2_size=200)
    d = BatchPairDriver(tmp_path / "runs",
                        tiling_config=TilingConfig(emit_tile_size=12,
                                                   max_black_frac=0.1),
                        sr_config=None)
    jobs = [PairJob("p1", str(scene.emit_nc_path), str(scene.s2_tif_path))]
    manifest = d.run(jobs)
    assert manifest["p1"]["status"] == "done", manifest["p1"]
    assert manifest["p1"]["outputs"]["n_tiles"] >= 0
