"""Measured-SRF import/cache machinery (spectral.srf_cache).

The reference integrates the measured Copernicus workbook responses
(s2_emit/srf.py:6-52). These tests validate the offline import loop:
sheet (CSV export of the workbook) -> npz cache -> load_srf resolution
-> synthesis parity against the reference trapz formula on the imported
tables.
"""

import json

import numpy as np
import pytest

from hyperres.core.constants import S2_BANDS_13
from hyperres.spectral import builtin_srf, load_srf
from hyperres.spectral.srf_cache import (
    import_srf_tables, load_srf_from_csv, load_srf_npz, measured_srf,
    save_srf_npz, user_cache_dir,
)


def _write_sheet_csv(path, srf, platform="S2A"):
    """Export an SRF dict as a workbook-convention CSV sheet: one SR_WL
    column + {platform}_SR_AV_{band} columns on a shared 1 nm axis."""
    lo = min(float(wl[0]) for wl, _ in srf.values())
    hi = max(float(wl[-1]) for wl, _ in srf.values())
    axis = np.arange(np.floor(lo), np.ceil(hi) + 1.0)
    cols = {"SR_WL": axis}
    for band, (wl, resp) in srf.items():
        on = np.interp(axis, wl, resp, left=0.0, right=0.0)
        cols[f"{platform}_SR_AV_{band}"] = on
    header = ",".join(cols)
    rows = np.column_stack(list(cols.values()))
    with open(path, "w") as f:
        f.write(header + "\n")
        for row in rows:
            f.write(",".join(f"{v:.10g}" for v in row) + "\n")
    return axis


def test_npz_round_trip(tmp_path):
    srf = builtin_srf("S2A")
    p = save_srf_npz(srf, tmp_path / "srf_s2a.npz", source="unit-test")
    back = load_srf_npz(p)
    assert set(back) == set(srf)
    for b in srf:
        np.testing.assert_array_equal(back[b][0], srf[b][0])
        np.testing.assert_array_equal(back[b][1], srf[b][1])
    with pytest.raises(KeyError):
        load_srf_npz(p, bands=["NOPE"])


def test_csv_import_and_resolution(tmp_path, monkeypatch):
    """CSV sheet -> import -> load_srf serves the measured tables
    (bit-for-bit the imported arrays), and the device synthesis matches
    the reference trapz formula on them."""
    monkeypatch.setenv("HYPERRES_SRF_CACHE", str(tmp_path / "cache"))
    monkeypatch.delenv("HYPERRES_SRF_SOURCE", raising=False)

    truth = builtin_srf("S2A")  # stands in for measured curves
    csv = tmp_path / "sheet.csv"
    axis = _write_sheet_csv(csv, truth)

    parsed = load_srf_from_csv(csv, "S2A")
    assert set(parsed) == set(S2_BANDS_13)
    # support trimmed to response > 0, values exactly the sheet's
    for b, (wl, resp) in parsed.items():
        assert (resp > 0).all()
        on = np.interp(axis, truth[b][0], truth[b][1], left=0, right=0)
        np.testing.assert_allclose(resp, on[np.isin(axis, wl)], rtol=1e-9)

    import_srf_tables(csv, platform="S2A", dest="user")
    assert (user_cache_dir() / "srf_s2a.npz").exists()

    got = measured_srf("S2A")
    assert got is not None
    resolved = load_srf("S2A")  # the canonical resolver picks the cache
    for b in parsed:
        np.testing.assert_array_equal(resolved[b][0], parsed[b][0])
        np.testing.assert_array_equal(resolved[b][1], parsed[b][1])

    # synthesis on the imported tables == reference trapz formula
    # (synth.py:41-43) to f32 tolerance
    from hyperres.kernels.srf import pseudo_s2_srf_integral
    from hyperres.testing.scenes import emit_wavelength_grid

    wl_emit, good = emit_wavelength_grid(285)
    rng = np.random.default_rng(0)
    R = rng.random((9, 11, 285)).astype(np.float32) * 0.8
    got_bands = pseudo_s2_srf_integral(R, wl_emit, resolved,
                                       good_mask=good)
    for b, (lam, rsp) in resolved.items():
        rsp_on = np.interp(wl_emit, lam, rsp, left=0.0, right=0.0) * good
        if np.all(rsp_on == 0):
            assert got_bands[b] is None
            continue
        num = np.trapezoid(R * rsp_on[None, None, :], x=wl_emit, axis=-1)
        den = np.trapezoid(rsp_on, x=wl_emit)
        np.testing.assert_allclose(got_bands[b], num / (den + 1e-32),
                                   rtol=0, atol=2e-6)


def test_parametric_override(tmp_path, monkeypatch):
    monkeypatch.setenv("HYPERRES_SRF_CACHE", str(tmp_path / "cache"))
    csv = tmp_path / "sheet.csv"
    _write_sheet_csv(csv, builtin_srf("S2B", bands=["B2", "B3"]),
                     platform="S2B")
    import_srf_tables(csv, platform="S2B", dest="user",
                      bands=["B2", "B3"])
    assert measured_srf("S2B", bands=["B2"]) is not None
    monkeypatch.setenv("HYPERRES_SRF_SOURCE", "parametric")
    assert measured_srf("S2B", bands=["B2"]) is None


def test_parametric_warning_fires(tmp_path, monkeypatch):
    """VERDICT r3 item 4: fuse-time code must warn loudly when SRF
    synthesis would run on the unmeasured parametric model."""
    from hyperres.spectral import warn_if_parametric_srf

    monkeypatch.setenv("HYPERRES_SRF_CACHE", str(tmp_path / "empty"))
    monkeypatch.setenv("HYPERRES_SRF_SOURCE", "parametric")
    with pytest.warns(UserWarning, match="PARAMETRIC"):
        src = warn_if_parametric_srf("S2A", context="fusion")
    assert src == "parametric"


def test_parametric_warning_silent_with_measured(tmp_path, monkeypatch):
    """No warning once measured tables are imported (or an explicit srf
    dict bypasses the resolver in the fused plan)."""
    import warnings

    from hyperres.spectral import warn_if_parametric_srf

    monkeypatch.setenv("HYPERRES_SRF_CACHE", str(tmp_path / "cache"))
    monkeypatch.delenv("HYPERRES_SRF_SOURCE", raising=False)
    csv = tmp_path / "sheet.csv"
    _write_sheet_csv(csv, builtin_srf("S2A"))
    import_srf_tables(csv, platform="S2A", dest="user")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        src = warn_if_parametric_srf("S2A", context="fusion")
    assert src.startswith("measured-cache:")


def test_cli_srf_import(tmp_path, monkeypatch, capsys):
    from hyperres.cli import main

    monkeypatch.setenv("HYPERRES_SRF_CACHE", str(tmp_path / "cache"))
    csv = tmp_path / "sheet.csv"
    _write_sheet_csv(csv, builtin_srf("S2A"))
    rc = main(["srf", str(csv), "--platforms", "S2A"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert "S2A" in out["imported"]
    assert (user_cache_dir() / "srf_s2a.npz").exists()


def test_cli_srf_requires_source(capsys):
    from hyperres.cli import main

    assert main(["srf"]) == 2
