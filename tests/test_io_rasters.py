import numpy as np
import pytest

from hyperres.core.crs import CRS
from hyperres.core.grid import Grid, Window
from hyperres.io import envi, tiff


def utm_grid(w=64, h=48, dx=10.0):
    return Grid(CRS.utm(33, True), 500000.0, 5800020.0, dx, dx, w, h)


# ---------------------------------------------------------------- ENVI ----

def test_envi_roundtrip_bil(tmp_path, rng):
    cube = rng.normal(size=(20, 30, 7)).astype(np.float32)
    g = Grid(CRS.geographic(), 13.0, 52.0, 0.0005, 0.0005, 30, 20)
    wl = np.linspace(380, 2500, 7)
    binp, hdrp = envi.write_cube(tmp_path / "cube.bin", cube, g,
                                 nodata=-9999.0, wavelengths=wl,
                                 fwhm=np.full(7, 8.0))
    r = envi.EnviReader(hdrp)
    np.testing.assert_array_equal(r.read(), cube)
    assert r.nodata == -9999.0
    assert r.grid == g
    np.testing.assert_allclose(r.wavelengths, wl)
    np.testing.assert_array_equal(r.read_band(3), cube[:, :, 3])
    np.testing.assert_array_equal(r.read(bands=[1, 5]), cube[:, :, [1, 5]])


@pytest.mark.parametrize("interleave", ["bsq", "bil", "bip"])
def test_envi_interleaves(tmp_path, rng, interleave):
    cube = (rng.random((11, 13, 5)) * 1000).astype(np.uint16)
    envi.write_cube(tmp_path / f"c_{interleave}.bin", cube,
                    interleave=interleave)
    r = envi.EnviReader(tmp_path / f"c_{interleave}.hdr")
    assert r.interleave == interleave
    np.testing.assert_array_equal(r.read(), cube)


def test_envi_incremental_band_writer(tmp_path, rng):
    h, w, b = 16, 20, 6
    header = {
        "samples": w, "lines": h, "bands": b, "data type": 4,
        "interleave": "bil", "byte order": 0,
    }
    wr = envi.EnviWriter(tmp_path / "inc.bin", header)
    bands = [rng.normal(size=(h, w)).astype(np.float32) for _ in range(b)]
    for i, bd in enumerate(bands):
        wr.write_band(bd, i)
    r = envi.EnviReader(tmp_path / "inc.hdr")
    for i, bd in enumerate(bands):
        np.testing.assert_array_equal(r.read_band(i), bd)


def test_envi_utm_map_info_roundtrip(tmp_path):
    g = utm_grid()
    cube = np.zeros((48, 64, 1), dtype=np.float32)
    envi.write_cube(tmp_path / "u.bin", cube, g)
    r = envi.EnviReader(tmp_path / "u.hdr")
    assert r.grid == g


def test_envi_header_list_parse(tmp_path):
    (tmp_path / "x.hdr").write_text(
        "ENVI\nsamples = 4\nlines = 2\nbands = 1\ndata type = 4\n"
        "interleave = bsq\nwavelength = { 450.5,\n 550.5, 650.5 }\n"
        "description = { test file }\n")
    h = envi.parse_header(tmp_path / "x.hdr")
    assert h["samples"] == "4"
    assert [float(x) for x in h["wavelength"]] == [450.5, 550.5, 650.5]


# ---------------------------------------------------------------- TIFF ----

@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int16", "float32",
                                   "float64", "uint32", "int32"])
def test_tiff_roundtrip_dtypes(tmp_path, rng, dtype):
    dt = np.dtype(dtype)
    if dt.kind == "f":
        data = rng.normal(size=(3, 21, 33)).astype(dt)
    else:
        info = np.iinfo(dt)
        data = rng.integers(max(0, info.min), min(1000, info.max),
                            size=(3, 21, 33)).astype(dt)
    p = tiff.write_geotiff(tmp_path / f"x_{dtype}.tif", data, utm_grid(33, 21))
    got, grid, nodata = tiff.read_geotiff(p)
    np.testing.assert_array_equal(got, data)
    assert grid == utm_grid(33, 21)


@pytest.mark.parametrize("compress,predictor", [
    (None, None), ("deflate", None), ("deflate", 2), ("deflate", 1)])
def test_tiff_compression_modes(tmp_path, rng, compress, predictor):
    data = rng.integers(0, 10000, size=(2, 40, 50)).astype(np.uint16)
    p = tiff.write_geotiff(tmp_path / "c.tif", data, compress=compress,
                           predictor=predictor)
    got, _, _ = tiff.read_geotiff(p)
    np.testing.assert_array_equal(got, data)


def test_tiff_tiled_roundtrip(tmp_path, rng):
    data = rng.normal(size=(4, 100, 130)).astype(np.float32)
    p = tiff.write_geotiff(tmp_path / "t.tif", data, utm_grid(130, 100),
                           tiled=True, blockxsize=64, blockysize=48)
    with tiff.TiffReader(p) as r:
        assert r.tiled
        assert (r.block_w, r.block_h) == (64, 48)
        np.testing.assert_array_equal(r.read(), data)


def test_tiff_windowed_read(tmp_path, rng):
    data = rng.integers(0, 65000, size=(5, 90, 110)).astype(np.uint16)
    p = tiff.write_geotiff(tmp_path / "w.tif", data, tiled=True,
                           blockxsize=32, blockysize=32)
    with tiff.TiffReader(p) as r:
        win = Window(17, 23, 41, 37)
        got = r.read(window=win, bands=[0, 3])
        np.testing.assert_array_equal(
            got, data[[0, 3], 23:23 + 37, 17:17 + 41])
        # strip-layout windowed read
    p2 = tiff.write_geotiff(tmp_path / "w2.tif", data, rows_per_strip=7)
    with tiff.TiffReader(p2) as r:
        got = r.read(window=Window(5, 11, 60, 44))
        np.testing.assert_array_equal(got, data[:, 11:55, 5:65])


def test_tiff_metadata_roundtrip(tmp_path, rng):
    data = rng.integers(0, 255, size=(3, 10, 12)).astype(np.uint8)
    p = tiff.write_geotiff(
        tmp_path / "m.tif", data, utm_grid(12, 10), nodata=0,
        descriptions=["B02_blue", None, "B04_red"],
        tags={"SOURCE": "hyperres-test", "PAIR_ID": "p1"},
        band_tags=[{"wavelength": "490"}, {}, {"wavelength": "665"}],
    )
    with tiff.TiffReader(p) as r:
        assert r.nodata == 0.0
        assert r.descriptions == ["B02_blue", None, "B04_red"]
        assert r.dataset_tags["SOURCE"] == "hyperres-test"
        assert r.band_tags[2]["wavelength"] == "665"


def test_tiff_geographic_crs(tmp_path):
    g = Grid(CRS.geographic(), -120.5, 45.25, 0.0005425, 0.0005425, 20, 15)
    data = np.zeros((1, 15, 20), dtype=np.float32)
    p = tiff.write_geotiff(tmp_path / "g.tif", data, g)
    _, grid, _ = tiff.read_geotiff(p)
    assert grid.crs.is_geographic
    assert abs(grid.x0 - g.x0) < 1e-12
    assert abs(grid.dy - g.dy) < 1e-15


def test_tiff_bigtiff_forced(tmp_path, rng):
    data = rng.integers(0, 100, size=(2, 30, 40)).astype(np.uint16)
    p = tiff.write_geotiff(tmp_path / "big.tif", data, utm_grid(40, 30),
                           bigtiff=True)
    with tiff.TiffReader(p) as r:
        assert r.big
        np.testing.assert_array_equal(r.read(), data)


def test_tiff_readable_by_pil(tmp_path, rng):
    """Independent validation: a single-band file written by our codec is
    readable by Pillow's TIFF decoder."""
    from PIL import Image
    data = rng.integers(0, 60000, size=(1, 25, 31)).astype(np.uint16)
    p = tiff.write_geotiff(tmp_path / "pil.tif", data, compress="deflate")
    img = Image.open(p)
    got = np.array(img)
    np.testing.assert_array_equal(got, data[0])


def test_tiff_pil_written_readable_by_us(tmp_path, rng):
    """Independent validation the other way: we can read a PIL-written TIFF."""
    from PIL import Image
    arr = rng.integers(0, 255, size=(17, 23), dtype=np.uint8)
    p = tmp_path / "pilw.tif"
    Image.fromarray(arr).save(p, compression="tiff_adobe_deflate")
    with tiff.TiffReader(p) as r:
        np.testing.assert_array_equal(r.read()[0], arr)


def test_tiff_http_range_source_windowed(tmp_path, rng):
    """Remote COG emulation: a fake HTTP-range fetcher over a local file;
    windowed reads must transfer only a fraction of the file."""
    data = rng.integers(0, 60000, size=(4, 256, 256)).astype(np.uint16)
    p = tiff.write_geotiff(tmp_path / "cog.tif", data, utm_grid(256, 256),
                           tiled=True, blockxsize=64, blockysize=64)
    blob = p.read_bytes()
    transferred = {"bytes": 0, "requests": 0}

    def fetch_range(url, start, end):
        transferred["bytes"] += min(end + 1, len(blob)) - start
        transferred["requests"] += 1
        return blob[start:end + 1]

    r = tiff.TiffReader.open_url("https://fake/cog.tif",
                                 fetch_range=fetch_range,
                                 block_size=4096)
    with r:
        assert r.grid == utm_grid(256, 256)
        win = Window(70, 10, 40, 30)
        got = r.read(window=win, bands=[1, 3])
        np.testing.assert_array_equal(got, data[[1, 3], 10:40, 70:110])
    assert transferred["bytes"] < len(blob) * 0.6, (
        transferred, len(blob))
    assert transferred["requests"] >= 2


def test_scl_metrics_from_remote_window(tmp_path, rng):
    """count_cloud_pixels over a remote SCL raster via range reads — the
    reference's /vsicurl probing pattern (cloud_utils.py:33-53)."""
    from hyperres.catalog.cloud import count_cloud_pixels
    scl = np.full((120, 120), 4, dtype=np.uint8)
    scl[:40] = 9
    g = utm_grid(120, 120, dx=20.0)
    p = tiff.write_geotiff(tmp_path / "scl.tif", scl[None], g, tiled=True,
                           blockxsize=32, blockysize=32)
    blob = p.read_bytes()

    def fetch_range(url, start, end):
        return blob[start:end + 1]

    with tiff.TiffReader.open_url("https://fake/scl.tif",
                                  fetch_range=fetch_range) as r:
        clouds, valid = count_cloud_pixels(r.read()[0], grid=r.grid)
    assert valid == 120 * 120
    assert clouds == 40 * 120


def test_envi_big_endian_read(tmp_path):
    """byte order = 1 files decode through the byteswapped dtype path."""
    data = np.arange(12, dtype=">f4").reshape(3, 4)
    (tmp_path / "be.bin").write_bytes(data.tobytes())
    (tmp_path / "be.hdr").write_text(
        "ENVI\nsamples = 4\nlines = 3\nbands = 1\ndata type = 4\n"
        "interleave = bsq\nbyte order = 1\nheader offset = 0\n")
    r = envi.EnviReader(tmp_path / "be.hdr")
    np.testing.assert_array_equal(r.read()[..., 0],
                                  data.astype(np.float32))


def test_spatial_subset_empty_polygon(tmp_path):
    from hyperres.catalog.geometry import LonLatPolygon
    from hyperres.io.granule import EmitGranule
    from hyperres.ortho.toolkit import spatial_subset
    from hyperres.testing.scenes import make_scene
    scene = make_scene(tmp_path / "s", raw_shape=(20, 24), n_bands=8,
                       s2_size=100)
    with EmitGranule(scene.emit_nc_path) as g:
        far = LonLatPolygon.from_bounds(100.0, 10.0, 101.0, 11.0)
        with pytest.raises(ValueError, match="no valid GLT"):
            spatial_subset(g, far)
