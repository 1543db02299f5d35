"""The benchmark measures the SHIPPED pipeline, not a private twin.

``bench.py`` builds its workload through ``build_workload`` and times
``FusedOrthoFusionPlan`` — these tests run the same builder at reduced
scale and assert (a) the benched object IS the library plan, and (b)
its output matches the phase-wise reference-shaped path
(``fuse_pair(engine="phases")``, demo cell 81 semantics) on the same
inputs.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import build_workload  # noqa: E402
from hyperres.core.config import OTConfig, PolyFusionConfig  # noqa: E402
from hyperres.fusion.fused import FusedOrthoFusionPlan  # noqa: E402
from hyperres.pipeline import fuse_pair, psnr  # noqa: E402


@pytest.fixture(scope="module")
def workload():
    # scale 0.05 -> raw 64x64x285, ~80x80 ortho grid, ~470^2 10 m grid
    return build_workload(
        scale=0.05,
        config=PolyFusionConfig(ot=OTConfig(n_samples=1500,
                                            num_itermax=120)))


def test_bench_runs_the_shipped_plan(workload):
    assert isinstance(workload["plan"], FusedOrthoFusionPlan)


def test_bench_workload_matches_phasewise_path(workload):
    """plan(raw, s2) == ortho product + phase-wise fusion on it."""
    plan = workload["plan"]
    out = plan(workload["raw"], plan.prepare_s2(workload["s2_dn"]))
    utm_cube = np.asarray(out["utm_cube"])
    fused = np.asarray(out["fused_10m"])
    coeffs = np.asarray(out["coeffs"])

    ref = fuse_pair(
        utm_cube, workload["wavelengths"], workload["utm60"],
        workload["s2_dn"].astype(np.float32), workload["s2_grid"],
        good_mask=workload["good_mask"], s2_scale=1e-4, s2_nodata=65535.0,
        config=PolyFusionConfig(ot=OTConfig(n_samples=1500,
                                            num_itermax=120)),
        engine="phases")

    va = np.isfinite(fused).all(-1)
    vb = np.isfinite(ref.fused_10m).all(-1)
    np.testing.assert_array_equal(va, vb)
    assert int(out["n_valid_60m"]) == ref.info["n_valid_60m"]
    # both estimate the same transport map from (different) 1500-px
    # subsamples: statistical agreement, not bitwise
    assert psnr(fused[va], ref.fused_10m[vb]) > 35.0
    assert coeffs.shape == ref.coeffs.shape
    # the fitted curves agree where the data lives (evaluate both
    # polynomials over the stretched domain)
    x = np.linspace(0.05, 0.95, 64)
    for c in range(3):
        ya = np.polyval(coeffs[c], x)
        yb = np.polyval(ref.coeffs[c], x)
        assert np.max(np.abs(ya - yb)) < 0.05


def test_bench_workload_s2_is_production_format(workload):
    s2 = workload["s2_dn"]
    assert s2.dtype == np.uint16
    assert s2.shape[0] == 3
    assert s2.max() <= 65534  # never collides with the 65535 nodata


def test_scene_cache_roundtrip(tmp_path, monkeypatch):
    """The memoized bench scene reproduces the generated one bit-exactly
    (so cached runs bench the identical program and inputs)."""
    import bench as bench_mod

    monkeypatch.setattr(
        bench_mod, "_scene_cache_path",
        lambda scale, seed: str(tmp_path / f"s{scale}_r{seed}.pkl"))
    fresh = build_workload(scale=0.03, scene_cache=True)   # generates+saves
    cached = build_workload(scale=0.03, scene_cache=True)  # loads
    for k in ("raw", "s2_dn", "wavelengths", "good_mask", "glt"):
        np.testing.assert_array_equal(fresh[k], cached[k])
    assert cached["utm60"] == fresh["utm60"]
    assert isinstance(cached["plan"], FusedOrthoFusionPlan)
