"""Measured-SRF import, end to end (round-4 verdict item 6).

The reference downloads the official Copernicus workbook and parses it
with pandas+openpyxl on every run (s2_emit/srf.py:6-9, 20-52). Here the
import happens ONCE through the CLI and persists; these tests drive the
full chain against a workbook-shaped fixture served over a REAL local
HTTP socket:

    hyperres srf --fetch --url <fixture>
      -> fetch_srf_workbook (urllib)
      -> load_srf_from_xlsx (own stdlib xlsx codec, hyperres.io.xlsx)
      -> save_srf_npz into the user cache
      -> resolver (load_srf / describe_srf_source) flips from
         "parametric" to "measured-cache:..."
      -> BOTH fusion engines (fused single-program + phase-wise) build
         their synthesis matrices from the measured curves and the loud
         parametric warning disappears.
"""

import threading
import warnings
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from hyperres.core.constants import S2_BANDS_13
from hyperres.core.crs import CRS
from hyperres.core.grid import Grid
from hyperres.io.xlsx import read_table, sheet_names, write_xlsx
from hyperres.spectral.srf_tables import (
    builtin_srf, describe_srf_source, load_srf, load_srf_from_xlsx,
)


# ---------------------------------------------------------------------------
# workbook-shaped fixture: the Copernicus sheet/column conventions
# (s2_emit/srf.py:20-52 reads sheet "Spectral Responses (S2A)",
# columns SR_WL + {platform}_SR_AV_{band}) with "measured" curves that
# deliberately DIFFER from the builtin parametric model so a resolver
# that silently kept the parametric table would fail the value checks
# ---------------------------------------------------------------------------

def _measured_like_curves(platform):
    base = builtin_srf(platform)
    out = {}
    for b, (wl, resp) in base.items():
        # asymmetric ripple: measurably non-parametric, still a valid SRF
        out[b] = (wl, np.clip(
            resp * (1.0 + 0.08 * np.sin(wl / 11.0)) , 0.0, None))
    return out


def _workbook_sheets():
    wl = np.arange(380.0, 2401.0, 1.0)
    sheets = {}
    for platform in ("S2A", "S2B"):
        curves = _measured_like_curves(platform)
        cols = [f"{platform}_SR_AV_{b}" for b in S2_BANDS_13]
        mat = np.full((wl.size, 1 + len(cols)), np.nan)
        mat[:, 0] = wl
        for j, b in enumerate(S2_BANDS_13):
            bwl, resp = curves[b]
            idx = np.searchsorted(wl, bwl)
            mat[idx, 1 + j] = resp
        sheets[f"Spectral Responses ({platform})"] = (
            ["SR_WL"] + cols, mat)
    # a decoy sheet ahead of the data sheets, like the real workbook's
    # preamble pages — the loader must select by name, not position
    sheets = {"Information": (["note"], np.zeros((0, 1))), **sheets}
    return sheets


@pytest.fixture(scope="module")
def workbook(tmp_path_factory):
    path = tmp_path_factory.mktemp("srf") / "S2-SRF_fixture.xlsx"
    write_xlsx(path, _workbook_sheets())
    return path


@pytest.fixture()
def srf_server(workbook):
    payload = workbook.read_bytes()

    class _Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            self.send_response(200)
            self.send_header("Content-Type",
                             "application/vnd.openxmlformats-officedocu"
                             "ment.spreadsheetml.sheet")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}/S2-SRF.xlsx"
    finally:
        srv.shutdown()


# ------------------------------------------------------------ xlsx codec --

def test_xlsx_roundtrip_sparse_numeric(tmp_path):
    header = ["SR_WL", "A", "B"]
    mat = np.array([[400.0, np.nan, 0.25],
                    [401.0, 0.5, np.nan],
                    [402.0, 0.75, 1.0]])
    p = write_xlsx(tmp_path / "t.xlsx", {"S1": (header, mat),
                                         "S2": (["x"], np.zeros((0, 1)))})
    assert sheet_names(p) == ["S1", "S2"]
    h, data = read_table(p, "S1")
    assert h == header
    np.testing.assert_array_equal(np.isnan(data), np.isnan(mat))
    np.testing.assert_allclose(np.nan_to_num(data), np.nan_to_num(mat))


def test_load_srf_from_xlsx_matches_fixture(workbook):
    srf = load_srf_from_xlsx(workbook, platform="S2B")
    want = _measured_like_curves("S2B")
    assert set(srf) == set(S2_BANDS_13)
    wl, resp = srf["B4"]
    wwl, wresp = want["B4"]
    keep = wresp > 0  # loader drops resp <= 0 rows
    np.testing.assert_allclose(wl, wwl[keep])
    np.testing.assert_allclose(resp, wresp[keep], rtol=1e-9)
    # and the values are NOT the parametric model's
    assert not np.allclose(resp, builtin_srf("S2B")["B4"][1][keep],
                           rtol=0.01)


# --------------------------------------------------- CLI fetch -> engines --

def _tiny_fusion_inputs(seed=0):
    rng = np.random.default_rng(seed)
    utm = CRS.utm(33, True)
    h60, w60 = 40, 42
    emit_grid = Grid(utm, 500000.0, 5800020.0, 60.0, 60.0, w60, h60)
    s2_grid = Grid(utm, 500000.0, 5800020.0, 10.0, 10.0, w60 * 6, h60 * 6)
    from hyperres.testing.scenes import emit_wavelength_grid
    wl, _fwhm = emit_wavelength_grid(64)
    cube = (0.15 + 0.5 * rng.random((h60, w60, 64))).astype(np.float32)
    stack = (0.1 + 0.6 * rng.random((3, h60 * 6, w60 * 6))
             ).astype(np.float32)
    return cube, wl, emit_grid, stack, s2_grid


def test_cli_fetch_to_both_engines(srf_server, tmp_path, monkeypatch,
                                   capsys):
    from hyperres.cli import main
    from hyperres.pipeline import fuse_pair

    monkeypatch.setenv("HYPERRES_SRF_CACHE", str(tmp_path / "cache"))
    monkeypatch.delenv("HYPERRES_SRF_SOURCE", raising=False)

    # before the import: resolver reports (and engines warn) parametric
    assert describe_srf_source("S2A") == "parametric"
    cube, wl, emit_grid, stack, s2_grid = _tiny_fusion_inputs()
    with pytest.warns(UserWarning, match="PARAMETRIC"):
        fuse_pair(cube, wl, emit_grid, stack, s2_grid, engine="fused")

    rc = main(["srf", "--fetch", "--url", srf_server,
               "--platforms", "S2A", "S2B"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "S2A" in out and "S2B" in out
    assert (tmp_path / "cache" / "srf_s2a.npz").exists()
    assert (tmp_path / "cache" / "srf_s2b.npz").exists()

    # resolver flips to the measured cache and serves the fixture values
    assert describe_srf_source("S2A").startswith("measured-cache:")
    got = load_srf("S2A")
    want = _measured_like_curves("S2A")
    keep = want["B3"][1] > 0
    np.testing.assert_allclose(got["B3"][1], want["B3"][1][keep],
                               rtol=1e-9)

    # both fusion engines now resolve to it: ledger records the source
    # and the loud parametric warning is gone
    for engine in ("fused", "phases"):
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            res = fuse_pair(cube, wl, emit_grid, stack, s2_grid,
                            engine=engine)
        assert res.info["engine"] == engine
        assert res.info["srf_source"].startswith("measured-cache:"), \
            f"{engine} engine did not resolve the measured tables"

    # the measured curves actually change the synthesis: pseudo-S2 from
    # the measured tables differs from the parametric run
    monkeypatch.setenv("HYPERRES_SRF_SOURCE", "parametric")
    with pytest.warns(UserWarning, match="PARAMETRIC"):
        par = fuse_pair(cube, wl, emit_grid, stack, s2_grid,
                        engine="fused")
    monkeypatch.delenv("HYPERRES_SRF_SOURCE")
    a = np.asarray(res.matched_60m)
    b = np.asarray(par.matched_60m)
    m = np.isfinite(a) & np.isfinite(b)
    assert np.abs(a[m] - b[m]).max() > 1e-5
