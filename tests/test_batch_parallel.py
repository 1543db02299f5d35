"""Scene-level data parallelism in the batch driver (SURVEY.md §2.8
"data parallelism over tiles/scenes"): BatchPairDriver.run(devices=...)
replaces the reference's sequential pair loop (comb_exps.ipynb cell 9)
with one worker per device, each pair's device work pinned to its chip
via jax.default_device. Runs on the 8-virtual-device CPU mesh from
conftest."""

import time

import jax
import numpy as np
import pytest

from hyperres.batch import BatchPairDriver, PairJob
from hyperres.core.config import TilingConfig
from hyperres.testing.scenes import make_scene


@pytest.fixture(scope="module")
def pair_scenes(tmp_path_factory):
    root = tmp_path_factory.mktemp("batch_scenes")
    scenes = []
    for i in range(3):
        scenes.append(make_scene(root / f"pair{i}",
                                 raw_shape=(48, 52), n_bands=48,
                                 s2_size=360, seed=i))
    return scenes


def test_batch_runs_pairs_concurrently_across_devices(pair_scenes,
                                                      tmp_path):
    devices = jax.devices()
    assert len(devices) >= 3, "conftest provides 8 virtual CPU devices"
    spans = {}

    driver = BatchPairDriver(tmp_path / "out", sr_config=None,
                             tiling_config=TilingConfig(
                                 emit_tile_size=16, max_black_frac=0.5))

    base_runner = driver.runner

    def tracking_runner(job, pair_dir):
        t0 = time.monotonic()
        out = base_runner(job, pair_dir)
        spans[job.pair_id] = (t0, time.monotonic())
        return out

    driver.runner = tracking_runner
    jobs = [PairJob(pair_id=f"pair{i}", emit_nc_path=str(s.emit_nc_path),
                    s2_stack_tif=str(s.s2_tif_path))
            for i, s in enumerate(pair_scenes)]
    manifest = driver.run(jobs, devices=devices[:3])

    # every pair completed with its ledger intact
    assert set(manifest) == {"pair0", "pair1", "pair2"}
    used_devices = set()
    for rec in manifest.values():
        assert rec["status"] == "done"
        assert rec["attempts"] and rec["attempts"][-1]["success"]
        assert "device" in rec["attempts"][-1]
        used_devices.add(rec["attempts"][-1]["device"])
        assert np.isfinite(rec["outputs"].get("total_seconds", 0.0))
    # scene-level parallelism: distinct chips actually used ...
    assert len(used_devices) >= 2
    # ... and at least two pipelines genuinely overlapped in wall-clock
    ids = sorted(spans)
    overlapped = any(
        spans[a][0] < spans[b][1] and spans[b][0] < spans[a][1]
        for i, a in enumerate(ids) for b in ids[i + 1:])
    assert overlapped, f"no concurrent execution observed: {spans}"

    # resume: a second run skips everything (ledgers untouched)
    before = {k: len(v["attempts"]) for k, v in manifest.items()}
    manifest2 = driver.run(jobs, devices=devices[:3])
    after = {k: len(v["attempts"]) for k, v in manifest2.items()}
    assert before == after


def test_batch_sequential_path_unchanged(pair_scenes, tmp_path):
    driver = BatchPairDriver(tmp_path / "seq", sr_config=None,
                             tiling_config=TilingConfig(
                                 emit_tile_size=16, max_black_frac=0.5))
    jobs = [PairJob(pair_id="solo",
                    emit_nc_path=str(pair_scenes[0].emit_nc_path),
                    s2_stack_tif=str(pair_scenes[0].s2_tif_path))]
    manifest = driver.run(jobs)
    assert manifest["solo"]["status"] == "done"
    assert "device" not in manifest["solo"]["attempts"][-1]
