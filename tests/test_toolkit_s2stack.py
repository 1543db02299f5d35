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


class _FakeGranule:
    """Duck-typed granule for exact merge-placement tests."""

    def __init__(self, cube, grid):
        self._cube = cube
        self.ortho_grid = grid
        self.n_bands = cube.shape[-1]
        h, w = cube.shape[:2]
        glt = np.zeros((h, w, 2), dtype=np.int32)
        glt[..., 0] = np.arange(w)[None, :] + 1   # identity GLT (1-based)
        glt[..., 1] = np.arange(h)[:, None] + 1
        self.glt = glt

    def read_cube(self):
        return self._cube


def test_merge_emit_off_lattice_exact_nearest_placement():
    """Off-lattice grids must land by per-destination nearest sampling
    (no duplicated/smeared border rows from clipped index rounding)."""
    geo = CRS.geographic()
    h, w, b = 10, 10, 2
    vals_a = (np.arange(h)[:, None] * 100.0
              + np.arange(w)[None, :]).astype(np.float32)
    cube_a = np.stack([vals_a, vals_a + 0.5], axis=-1)
    cube_b = cube_a + 5000.0
    # A on the unit lattice; B shifted right by 10.4 cells (off-lattice)
    ga = Grid(geo, 0.0, 10.0, 1.0, 1.0, w, h)
    gb = Grid(geo, 10.4, 10.0, 1.0, 1.0, w, h)
    fa, fb = _FakeGranule(cube_a, ga), _FakeGranule(cube_b, gb)

    mosaic, grid = merge_emit([fa, fb])

    # oracle: per destination cell, nearest source cell of the first
    # granule that covers it; outside every granule -> nodata
    want = np.full(mosaic.shape, -9999.0, dtype=np.float32)
    xs, ys = grid.pixel_center_coords()
    for g, cube in ((fa, cube_a), (fb, cube_b)):
        gr = g.ortho_grid
        colf = (xs - gr.x0) / gr.dx - 0.5
        rowf = (gr.y0 - ys) / gr.dy - 0.5
        ci = np.round(colf).astype(int)
        ri = np.round(rowf).astype(int)
        for i, r in enumerate(ri):
            if not (0 <= r < gr.height):
                continue
            for j, c in enumerate(ci):
                if not (0 <= c < gr.width):
                    continue
                if want[i, j, 0] == -9999.0:
                    want[i, j] = cube[r, c]
    np.testing.assert_array_equal(mosaic, want)
    # every source row appears at most once per column: no edge smear
    col_b_edge = mosaic[:, -1, 0]
    valid = col_b_edge != -9999.0
    assert len(np.unique(col_b_edge[valid])) == valid.sum()


def test_merge_emit_out_of_bounds_granule_clipped_not_smeared():
    """A granule extending past an explicitly small mosaic (via a coarse
    resolution_deg that snaps the union) must drop outside cells instead
    of smearing them onto the mosaic edge."""
    geo = CRS.geographic()
    h = w = 8
    cube = np.full((h, w, 1), 7.0, dtype=np.float32)
    cube[0, :, 0] = 1.0     # top row distinct
    cube[-1, :, 0] = 2.0    # bottom row distinct
    ga = Grid(geo, 0.0, 8.0, 1.0, 1.0, w, h)
    # second granule hangs 3.6 cells below the first
    gb = Grid(geo, 0.0, 4.4, 1.0, 1.0, w, h)
    cube_b = np.full((h, w, 1), 9.0, dtype=np.float32)
    mosaic, grid = merge_emit([_FakeGranule(cube, ga),
                               _FakeGranule(cube_b, gb)])
    # the union grid covers both; no value appears duplicated along the
    # bottom edge beyond what nearest sampling produces
    assert grid.bounds[1] <= gb.bounds[1] + 1e-9
    bottom = mosaic[-1, :, 0]
    assert set(np.unique(bottom)).issubset({9.0, -9999.0})
