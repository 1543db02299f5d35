import numpy as np
import pytest

from hyperres.catalog.geometry import LonLatPolygon
from hyperres.catalog.s2_stack import (
    build_s2_spectral_stack, crop_s2_stack_to_te,
)
from hyperres.core.crs import CRS
from hyperres.core.grid import Grid
from hyperres.io.granule import EmitGranule, apply_glt
from hyperres.io.tiff import TiffReader, write_geotiff
from hyperres.ortho.toolkit import merge_emit, ortho_browse, spatial_subset
from hyperres.testing.scenes import make_scene


# ----------------------------------------------------------- s2 stack -----

def make_band_files(tmp_path, rng):
    utm = CRS.utm(33, True)
    g10 = Grid(utm, 399960.0, 5800020.0, 10.0, 10.0, 120, 120)
    g20 = Grid(utm, 399960.0, 5800020.0, 20.0, 20.0, 60, 60)
    paths = {}
    for key in ("blue", "green", "red", "nir"):
        data = (rng.random((1, 120, 120)) * 8000).astype(np.uint16)
        p = tmp_path / f"{key}.tif"
        write_geotiff(p, data, g10, nodata=0)
        paths[key] = p
    for key in ("rededge1", "rededge2", "rededge3", "nir08", "swir16",
                "swir22"):
        data = (rng.random((1, 60, 60)) * 8000).astype(np.uint16)
        p = tmp_path / f"{key}.tif"
        write_geotiff(p, data, g20, nodata=0)
        paths[key] = p
    return paths, g10


def test_build_s2_stack_10band(tmp_path, rng):
    paths, g10 = make_band_files(tmp_path, rng)
    out = build_s2_spectral_stack(paths, tmp_path / "stack.tif")
    with TiffReader(out) as r:
        assert r.count == 10
        assert r.descriptions[0] == "B02_blue"
        assert r.descriptions[7] == "B8A_nir08"
        assert r.grid == g10
        data = r.read()
        # 10 m bands copied verbatim
        with TiffReader(paths["blue"]) as b:
            np.testing.assert_array_equal(data[0], b.read()[0])
    # caching: second call returns immediately
    out2 = build_s2_spectral_stack(paths, tmp_path / "stack.tif")
    assert out2 == out


def test_build_s2_stack_9band_when_nir08_same_res(tmp_path, rng):
    paths, _ = make_band_files(tmp_path, rng)
    # overwrite nir08 with a 10 m band -> excluded
    with TiffReader(paths["nir"]) as r:
        g = r.grid
    write_geotiff(paths["nir08"],
                  (rng.random((1, 120, 120)) * 8000).astype(np.uint16), g,
                  nodata=0)
    out = build_s2_spectral_stack(paths, tmp_path / "stack9.tif")
    with TiffReader(out) as r:
        assert r.count == 9
        assert "B8A_nir08" not in r.descriptions


def test_crop_s2_stack_to_te(tmp_path, rng):
    paths, g10 = make_band_files(tmp_path, rng)
    stack = build_s2_spectral_stack(paths, tmp_path / "stack.tif")
    l, b, r_, t = g10.bounds
    out = crop_s2_stack_to_te(stack, tmp_path / "crop.tif",
                              l + 203.0, b + 155.0, l + 797.0, b + 751.0,
                              chunk=32)
    with TiffReader(out) as r:
        # snapped inward to the 10 m lattice
        assert (r.grid.x0 - g10.x0) % 10.0 == 0.0
        gl, gb, gr, gt = r.grid.bounds
        assert gl >= l + 203.0 and gr <= l + 797.0
        assert gb >= b + 155.0 and gt <= b + 751.0
        assert r.descriptions[0] == "B02_blue"
        assert r.count == 10


# ------------------------------------------------------------- toolkit ----

@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return make_scene(tmp_path_factory.mktemp("tk"),
                      raw_shape=(40, 46), n_bands=12, s2_size=200)


def test_spatial_subset(scene):
    with EmitGranule(scene.emit_nc_path) as g:
        og = g.ortho_grid
        l, b, r, t = og.bounds
        cx, cy = (l + r) / 2, (b + t) / 2
        poly = LonLatPolygon.from_bounds(cx - (r - l) / 6, cy - (t - b) / 6,
                                         cx + (r - l) / 6, cy + (t - b) / 6)
        sub = spatial_subset(g, poly)
        assert sub.data.shape[0] < g.raw_height
        assert sub.data.shape[2] == g.n_bands
        # re-based GLT must orthorectify the subset consistently with the
        # full-granule ortho over the subset window
        full = apply_glt(g.read_cube(), g.glt)
        sub_ortho = apply_glt(sub.data, sub.glt)
        oy0 = round((og.y0 - sub.ortho_grid.y0) / og.dy)
        ox0 = round((sub.ortho_grid.x0 - og.x0) / og.dx)
        want = full[oy0:oy0 + sub.ortho_grid.height,
                    ox0:ox0 + sub.ortho_grid.width]
        valid = sub_ortho[..., 0] != -9999.0
        np.testing.assert_array_equal(sub_ortho[valid], want[valid])
        assert valid.mean() > 0.5


def test_merge_emit_two_granules(tmp_path, rng):
    s1 = make_scene(tmp_path / "a", raw_shape=(30, 34), n_bands=8,
                    s2_size=160, seed=1)
    s2 = make_scene(tmp_path / "b", raw_shape=(30, 34), n_bands=8,
                    s2_size=160, seed=1, swath_angle_deg=35.0)
    with EmitGranule(s1.emit_nc_path) as g1, \
            EmitGranule(s2.emit_nc_path) as g2:
        mosaic, grid = merge_emit([g1, g2])
        assert mosaic.shape[-1] == 8
        # mosaic bounds cover both granules
        for g in (g1, g2):
            gl, gb, gr, gt = g.ortho_grid.bounds
            ml, mb, mr, mt = grid.bounds
            assert ml <= gl and mr >= gr and mb <= gb and mt >= gt
        valid = mosaic[..., 0] != -9999.0
        assert valid.mean() > 0.2


def test_ortho_browse(rng):
    rgb = (rng.random((12, 14, 3)) * 255).astype(np.uint8)
    glt = np.zeros((16, 18, 2), dtype=np.int32)
    glt[4, 5] = (3, 2)  # 1-based: raw (1, 2)
    out = ortho_browse(rgb, glt)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[4, 5], rgb[1, 2])
    assert np.all(out[0, 0] == 0)
