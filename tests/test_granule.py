import numpy as np
import pytest

from hyperres.io.granule import EmitGranule, apply_glt
from hyperres.testing.scenes import make_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return make_scene(tmp_path_factory.mktemp("scene"),
                      raw_shape=(48, 56), n_bands=32, s2_size=240)


def test_granule_opens_and_exposes_metadata(scene):
    with EmitGranule(scene.emit_nc_path) as g:
        assert g.product == "L2A_RFL"
        assert g.data_var == "reflectance"
        assert g.raw_height == 48 and g.raw_width == 56
        assert g.n_bands == 32
        assert g.wavelengths.shape == (32,)
        assert 380.0 <= g.wavelengths[0] <= 382.0
        assert g.good_wavelengths.dtype == bool
        assert g.time_coverage_start.startswith("2023-08-19")
        assert g.ortho_grid.crs.is_geographic
        assert g.glt.shape == (g.ortho_height, g.ortho_width, 2)


def test_glt_indices_validity(scene):
    with EmitGranule(scene.emit_nc_path) as g:
        glt0, valid, diag = g.glt_indices()
        assert diag.dropped_oob == 0
        assert diag.valid_count == int(valid.sum())
        # all valid indices in raw bounds
        assert glt0[valid][:, 0].min() >= 0
        assert glt0[valid][:, 0].max() < g.raw_width
        assert glt0[valid][:, 1].max() < g.raw_height
        # the swath covers a substantial part of the ortho box
        assert valid.mean() > 0.4


def test_read_bands_matches_cube(scene):
    with EmitGranule(scene.emit_nc_path) as g:
        cube = g.read_cube()
        blk = g.read_bands(5, 9)
        np.testing.assert_array_equal(blk, cube[:, :, 5:9])
        assert cube.dtype == np.float32
        assert np.all(cube > 0.0) and np.all(cube < 1.0)


def test_apply_glt_oracle_semantics(scene):
    """apply_glt must reproduce the reference's gather semantics exactly
    (emit_tools.py:153-181): 1-based indices, 0=nodata, fill -9999."""
    with EmitGranule(scene.emit_nc_path) as g:
        cube = g.read_cube()
        ortho = apply_glt(cube, g.glt)
        valid = np.all(g.glt != 0, axis=-1)
        assert ortho.shape == (g.ortho_height, g.ortho_width, 32)
        assert np.all(ortho[~valid] == -9999.0)
        # spot-check a few valid cells against manual indexing
        ys, xs = np.nonzero(valid)
        for k in range(0, len(ys), max(1, len(ys) // 17)):
            r, c = ys[k], xs[k]
            gx, gy = g.glt[r, c]
            np.testing.assert_array_equal(ortho[r, c], cube[gy - 1, gx - 1])


def test_scene_s2_stack_valid(scene):
    from hyperres.io.tiff import TiffReader
    with TiffReader(scene.s2_tif_path) as r:
        assert r.count == 10
        assert r.descriptions[0] == "B02_blue"
        assert r.grid == scene.s2_grid
        data = r.read()
        assert data.dtype == np.uint16
        assert data.max() < 10000 * 1.01
        assert data.min() >= 0


def test_scene_is_deterministic(tmp_path):
    s1 = make_scene(tmp_path / "a", raw_shape=(24, 28), n_bands=16,
                    s2_size=120, seed=7)
    s2 = make_scene(tmp_path / "b", raw_shape=(24, 28), n_bands=16,
                    s2_size=120, seed=7)
    with EmitGranule(s1.emit_nc_path) as g1, EmitGranule(s2.emit_nc_path) as g2:
        np.testing.assert_array_equal(g1.read_cube(), g2.read_cube())
        np.testing.assert_array_equal(g1.glt, g2.glt)
