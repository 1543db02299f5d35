"""The `hyperres verify-granule` parity harness (hyperres.verify) —
round-4 VERDICT item 5: the one-command shipped-vs-exact report, CI-run
on a synthetic granule so a real pair needs zero new code."""

import json

import numpy as np
import pytest

from hyperres.testing.scenes import make_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return make_scene(tmp_path_factory.mktemp("verify"),
                      raw_shape=(80, 90), n_bands=48, s2_size=420)


def test_verify_granule_report(scene, tmp_path):
    from hyperres.verify import verify_granule

    res = verify_granule(scene.emit_nc_path, scene.s2_tif_path,
                         tmp_path / "verify")
    assert res.report_path.exists() and res.json_path.exists()
    m = json.loads(res.json_path.read_text())
    # shipped two-pass vs exact taploop: sub-1e-3 deviation on this
    # geometry -> comfortably above the default 40 dB gates
    assert m["passed"] is True, m["gates"]
    assert m["cube_shipped_vs_exact"]["psnr_db"] > 40.0
    assert m["cube_shipped_vs_exact"]["mask_agreement"] > 0.999
    assert m["fused_shipped_vs_exact"]["psnr_db"] > 40.0
    assert m["pipeline_audit"]["psnr_db"] > 40.0
    assert m["coeffs_max_abs_delta"] < 0.5
    text = res.report_path.read_text()
    assert "Granule parity report" in text and "PASS" in text


def test_verify_granule_cli(scene, tmp_path, capsys):
    from hyperres.cli import main

    rc = main(["verify-granule", str(scene.emit_nc_path),
               str(scene.s2_tif_path), str(tmp_path / "v2")])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["passed"] is True
    assert (tmp_path / "v2" / "verify_granule.md").exists()
