import numpy as np
import pytest

from hyperres.testing.scenes import make_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return make_scene(tmp_path_factory.mktemp("viz"),
                      raw_shape=(30, 34), n_bands=16, s2_size=120)


def test_emit_rgb_from_cube(rng):
    from hyperres.viz import emit_rgb_from_cube
    wl = np.linspace(400, 2400, 24)
    cube = rng.random((10, 12, 24)).astype(np.float32)
    cube[0, 0, :] = -9999.0
    rgb = emit_rgb_from_cube(cube, wl)
    assert rgb.shape == (10, 12, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0


def test_show_quicklooks_and_scl(tmp_path, scene, rng):
    from hyperres.core.config import OrthoConfig
    from hyperres.ortho import orthorectify_granule
    from hyperres.viz import (plot_scl_map, print_raster_geometry,
                              show_emit_rgb_from_envi, show_side_by_side)

    res = orthorectify_granule(scene.emit_nc_path, tmp_path / "o",
                               scene.s2_tif_path,
                               config=OrthoConfig(save_geotiffs=True,
                                                  write_xml=False))
    rgb = show_emit_rgb_from_envi(
        res.data_envi_bin.with_suffix(".hdr"),
        save_path=tmp_path / "ql.png")
    assert (tmp_path / "ql.png").exists()
    assert rgb.shape[-1] == 3

    show_side_by_side(rgb, rgb, "a", "b", save_path=tmp_path / "sbs.png")
    assert (tmp_path / "sbs.png").exists()

    scl = rng.integers(0, 12, size=(50, 50)).astype(np.uint8)
    plot_scl_map(scl, save_path=tmp_path / "scl.png")
    assert (tmp_path / "scl.png").exists()

    info = print_raster_geometry(res.info["outputs"]["data_utm_tif"])
    assert info["count"] == 16


def test_plot_tile_pair(tmp_path, rng):
    from hyperres.core.crs import CRS
    from hyperres.core.grid import Grid
    from hyperres.io.tiff import write_geotiff
    from hyperres.viz import plot_tile_pair_simple
    utm = CRS.utm(33, True)
    eg = Grid(utm, 0.0, 0.0, 60.0, 60.0, 20, 20)
    sg = Grid(utm, 0.0, 0.0, 10.0, 10.0, 120, 120)
    emit = (rng.random((8, 20, 20)) * 10000).astype(np.uint16)
    wl = np.linspace(450, 900, 8)
    write_geotiff(tmp_path / "e.tif", emit, eg, nodata=65535,
                  descriptions=[f"{w:.1f} nm" for w in wl])
    s2 = (rng.random((3, 120, 120)) * 8000).astype(np.uint16)
    write_geotiff(tmp_path / "s.tif", s2, sg, nodata=0,
                  descriptions=["B04_red", "B03_green", "B02_blue"])
    plot_tile_pair_simple(tmp_path / "e.tif", tmp_path / "s.tif",
                          save_path=tmp_path / "pair.png")
    assert (tmp_path / "pair.png").exists()


def test_ridge_sr_save_load(tmp_path, rng):
    from hyperres.core.config import RidgeSRConfig
    from hyperres.fusion import RidgeSpectralSR, load_params, save_params
    X = rng.random((2000, 5)).astype(np.float32)
    Y = np.clip(0.3 + 0.3 * X[:, :1] + 0.05 * rng.random((2000, 7)),
                0.01, 0.99).astype(np.float32)
    m = RidgeSpectralSR(5, 7, RidgeSRConfig(degree=2, alpha=0.5)).fit(X, Y)
    save_params(tmp_path / "m.npz", m)
    m2 = load_params(tmp_path / "m.npz")
    assert m2.cfg.alpha == 0.5 and m2.cfg.degree == 2
    np.testing.assert_allclose(m2.predict(X[:50]), m.predict(X[:50]),
                               atol=1e-6)


def test_plot_s2_truecolor(tmp_path, scene):
    from hyperres.viz import plot_s2_truecolor
    out = plot_s2_truecolor(scene.s2_tif_path,
                            save_path=tmp_path / "tc.png")
    assert (tmp_path / "tc.png").exists()
    assert out.shape[-1] == 3
