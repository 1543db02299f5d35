"""Coverage for entry points not exercised elsewhere: batch ortho
conversion, offline STAC asset downloads, and small io/stats helpers."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyperres.core.crs import CRS
from hyperres.core.grid import Grid
from hyperres.io.tiff import TiffReader, write_geotiff


def test_convert_granules_record_and_continue(tmp_path):
    from hyperres.ortho.pipeline import convert_granules
    from hyperres.testing.scenes import make_scene

    scene = make_scene(tmp_path / "s", raw_shape=(24, 28), n_bands=6,
                       s2_size=120)
    results = convert_granules(
        [scene.emit_nc_path, tmp_path / "missing.nc"],
        tmp_path / "out", scene.s2_tif_path)
    assert len(results) == 2
    path0, info0 = results[0]
    assert path0 is not None and path0.exists()
    path1, info1 = results[1]
    assert path1 is None
    assert "error" in info1


def _fake_stac(tmp_path, rng, keys, size=24):
    """StacClient whose download writes synthetic band GeoTIFFs."""
    from hyperres.catalog.clients import StacClient

    utm = CRS.utm(33, True)
    res = {"nearest": 10.0, "bilinear": 20.0}

    def fake_download(href, dst):
        key = href.split("/")[-1].split(".")[0]
        scale = 2 if key in ("rededge1", "rededge2", "rededge3", "nir08",
                             "swir16", "swir22") else 1
        n = size // scale
        g = Grid(utm, 500000.0, 5800000.0, 10.0 * scale, 10.0 * scale,
                 n, n)
        data = (rng.random((1, n, n)) * 10000).astype(np.uint16)
        write_geotiff(dst, data, g, nodata=0)
        return dst

    item = {"id": "S2TEST", "assets": {
        k: {"href": f"https://fake/{k}.tif"} for k in keys}}
    client = StacClient("https://fake", download=fake_download)
    return item, client


def test_download_s2_spectral_stack_offline(tmp_path, rng):
    from hyperres.catalog.s2_stack import (REQUIRED_ASSETS,
                                           download_s2_spectral_stack)
    from hyperres.catalog.clients import StacClient

    item, client = _fake_stac(tmp_path, rng, REQUIRED_ASSETS)
    out = download_s2_spectral_stack(item, tmp_path / "s2", client)
    assert out.exists()
    with TiffReader(out) as r:
        assert r.count == len(REQUIRED_ASSETS)
        descs = r.descriptions
        assert "B02_blue" in descs and "B12_swir22" in descs
    # idempotent second call
    out2 = download_s2_spectral_stack(item, tmp_path / "s2", client)
    assert out2 == out


def test_download_s2_truecolor_composite(tmp_path, rng):
    from hyperres.catalog.s2_stack import download_s2_truecolor

    # no "visual" asset -> composite from red/green/blue
    item, client = _fake_stac(tmp_path, rng, ["red", "green", "blue"])
    out = download_s2_truecolor(item, tmp_path / "tc", client)
    with TiffReader(out) as r:
        assert r.count == 3


def test_masked_minmax(rng):
    from hyperres.kernels.stats import masked_minmax
    x = rng.normal(size=(200,)).astype(np.float32)
    mask = x > 0.3
    lo, hi = masked_minmax(jnp.asarray(x), jnp.asarray(mask))
    assert float(lo) == pytest.approx(x[mask].min())
    assert float(hi) == pytest.approx(x[mask].max())


def test_open_reflectance_and_wavelengths(tmp_path):
    from hyperres.io.granule import (load_emit_wavelengths_from_nc,
                                     open_reflectance)
    from hyperres.testing.scenes import make_scene

    scene = make_scene(tmp_path / "s", raw_shape=(20, 24), n_bands=8,
                       s2_size=100)
    cube, wl, good = open_reflectance(scene.emit_nc_path)
    assert cube.shape[-1] == 8
    assert not (cube == -9999.0).any()          # fill became NaN
    wl2, good2 = load_emit_wavelengths_from_nc(scene.emit_nc_path)
    np.testing.assert_array_equal(wl, wl2)
    np.testing.assert_array_equal(good, good2)


def test_open_hdf5_helper(tmp_path, rng):
    from hyperres.io.hdf5 import HDF5Writer, open_hdf5
    w = HDF5Writer(tmp_path / "x.h5")
    data = rng.random((4, 5)).astype(np.float32)
    w.create_dataset("/d", data)
    w.save()
    with open_hdf5(tmp_path / "x.h5") as f:
        np.testing.assert_array_equal(f.variables["d"].read(), data)


def test_quantize_u16_reserves_nodata_code(rng):
    """Valid pixels at/below lo (p1-percentile bound) must not collide
    with the nodata sentinel code (they'd silently decode as missing)."""
    import jax.numpy as jnp
    from hyperres.kernels.stats import quantize_u16
    x = jnp.asarray(np.array([-5.0, 0.0, 50.0, 200.0], np.float32))
    valid = jnp.asarray(np.array([True, True, True, True]))
    q0 = np.asarray(quantize_u16(x, 0.0, 100.0, valid, nodata_u16=0))
    assert q0.min() >= 1  # code 0 reserved for nodata
    assert q0[3] == 65535
    q1 = np.asarray(quantize_u16(x, 0.0, 100.0, valid, nodata_u16=65535))
    assert q1.max() <= 65534  # code 65535 reserved
    assert q1[0] == 0
    # invalid pixels land exactly on the sentinel
    q2 = np.asarray(quantize_u16(x, 0.0, 100.0,
                                 jnp.asarray(np.array([False] * 4)),
                                 nodata_u16=0))
    assert (q2 == 0).all()


def test_apply_glt_drops_out_of_bounds(rng):
    """GLT entries pointing past the raw swath are dropped like the
    device path's prepare_glt, not allowed to IndexError
    (emit_proj.py:691-703)."""
    from hyperres.io.granule import apply_glt
    raw = rng.random((4, 5, 2)).astype(np.float32)
    glt = np.zeros((3, 3, 2), np.int32)
    glt[0, 0] = (1, 1)       # valid -> raw[0, 0]
    glt[1, 1] = (5, 4)       # valid -> raw[3, 4]
    glt[2, 2] = (6, 9)       # OUT OF BOUNDS -> dropped
    out = apply_glt(raw, glt, fill_value=-1.0)
    np.testing.assert_allclose(out[0, 0], raw[0, 0])
    np.testing.assert_allclose(out[1, 1], raw[3, 4])
    assert (out[2, 2] == -1.0).all()
    assert (out[0, 1] == -1.0).all()


def test_prefetch_releases_loader_on_early_exit():
    """A consumer that stops early must not leave the loader thread
    blocked on the bounded queue (it pins buffers + the open source)."""
    import threading
    import time as _time
    from hyperres.io.pipeline import PrefetchToDevice

    closed = {"v": False}

    class Source:
        def __iter__(self):
            for i in range(100):
                yield np.full((8,), i, np.float32)

        def close(self):
            closed["v"] = True

    pf = PrefetchToDevice(Source(), depth=2)
    for i, item in enumerate(pf):
        if i == 1:
            break
    t0 = _time.time()
    while pf._thread.is_alive() and _time.time() - t0 < 5.0:
        _time.sleep(0.05)
    assert not pf._thread.is_alive(), "loader thread still blocked"
    assert closed["v"], "source not closed on early exit"
