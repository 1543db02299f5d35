"""Interactive single-file HTML quicklook (the reference's
EMIT_experiments.ipynb hvplot exploration surface, reimplemented as a
dependency-free export; viz/interactive.py)."""

import base64
import json
import re

import numpy as np
import pytest

from hyperres.viz.interactive import (prepare_viewer_payload,
                                      quicklook_from_product,
                                      write_interactive_quicklook)


@pytest.fixture()
def cube(rng):
    h, w, b = 40, 50, 20
    base = np.linspace(0.1, 0.8, h * w, dtype=np.float32).reshape(h, w)
    cube = base[..., None] * np.linspace(0.5, 1.5, b, dtype=np.float32)
    cube += 0.01 * rng.random((h, w, b)).astype(np.float32)
    return cube


def test_payload_roundtrip_quantization(cube):
    wl = np.linspace(400, 2400, cube.shape[-1])
    p = prepare_viewer_payload(cube, wl, max_size=64, max_bands=32)
    assert (p["h"], p["w"], p["b"]) == cube.shape
    q = np.frombuffer(base64.b64decode(p["data_b64"]),
                      dtype=np.uint8).reshape(cube.shape)
    # dequantize with the embedded per-band (lo, hi); quantization error
    # bounded by half a step of the 254-level scale
    for k in (0, cube.shape[-1] // 2, cube.shape[-1] - 1):
        lo, hi = p["lo"][k], p["hi"][k]
        got = lo + (q[..., k].astype(np.float64) - 1) / 254 * (hi - lo)
        want = np.clip(cube[..., k], lo, hi)
        assert np.abs(got - want).max() <= (hi - lo) / 254
    assert p["wl"] == list(wl)


def test_payload_subsampling_and_nodata(cube):
    cube = cube.copy()
    cube[:5, :5, :] = -9999.0
    p = prepare_viewer_payload(cube, None, nodata=-9999.0,
                               max_size=16, max_bands=8)
    assert p["h"] <= 16 and p["w"] <= 16 and p["b"] == 8
    q = np.frombuffer(base64.b64decode(p["data_b64"]),
                      dtype=np.uint8).reshape(p["h"], p["w"], p["b"])
    assert (q[0, 0] == 0).all()  # nodata sentinel
    assert (q[-1, -1] > 0).all()


def test_html_export_self_contained(tmp_path, cube):
    wl = np.linspace(400, 2400, cube.shape[-1])
    out = write_interactive_quicklook(cube, tmp_path / "v.html", wl,
                                      title="t123")
    html = out.read_text()
    assert "t123" in html
    m = re.search(r"const M = (\{.*?\});\n", html, re.S)
    assert m, "embedded metadata object missing"
    meta = json.loads(m.group(1))
    assert meta["b"] == cube.shape[-1]
    assert len(meta["wl"]) == meta["b"]
    # no external references: must work from file:// offline
    assert "http://" not in html and "https://" not in html
    assert "<script src" not in html


def test_quicklook_from_granule_and_cli(tmp_path):
    from hyperres.cli import main
    from hyperres.testing.scenes import make_scene
    scene = make_scene(tmp_path / "scn", raw_shape=(24, 28), n_bands=12,
                       s2_size=60)
    out = tmp_path / "g.html"
    rc = main(["quicklook", str(scene.emit_nc_path), str(out),
               "--max-size", "32", "--max-bands", "8"])
    assert rc == 0 and out.exists()
    meta = json.loads(re.search(r"const M = (\{.*?\});\n",
                                out.read_text(), re.S).group(1))
    assert meta["b"] == 8 and meta["h"] <= 32
    # GeoTIFF stack path too
    out2 = tmp_path / "s.html"
    rc = main(["quicklook", str(scene.s2_tif_path), str(out2)])
    assert rc == 0 and out2.exists()
