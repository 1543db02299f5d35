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


def test_granule_transposed_dims(tmp_path, rng):
    """Granules whose raw array is stored (crosstrack, downtrack, bands)
    must be transposed on read (emit_proj.py:646-661 sniffing)."""
    from hyperres.io.hdf5 import HDF5Writer
    h, w, b = 14, 18, 5
    cube_yx = rng.random((h, w, b)).astype(np.float32)
    wgr = HDF5Writer(tmp_path / "t.nc")
    wgr.create_dataset("/reflectance",
                       np.transpose(cube_yx, (1, 0, 2)).copy(),
                       attrs={"dimensions":
                              "crosstrack downtrack bands".split()})
    wgr.create_group("/sensor_band_parameters")
    wgr.create_dataset("/sensor_band_parameters/wavelengths",
                       np.linspace(400, 900, b).astype(np.float32),
                       attrs={"units": "nanometers"})
    wgr.create_group("/location")
    wgr.create_dataset("/location/glt_x", np.ones((6, 7)))
    wgr.create_dataset("/location/glt_y", np.ones((6, 7)))
    wgr.set_attrs("/", geotransform=np.array([0., 1., 0., 0., 0., -1.]))
    wgr.save()
    with EmitGranule(tmp_path / "t.nc") as g:
        assert g.transpose_raw_yx
        assert (g.raw_height, g.raw_width) == (h, w)
        np.testing.assert_array_equal(g.read_cube(), cube_yx)


def test_micrometer_wavelengths_normalised(tmp_path, rng):
    from hyperres.io.hdf5 import HDF5Writer
    wgr = HDF5Writer(tmp_path / "um.nc")
    wgr.create_dataset("/reflectance", rng.random((4, 5, 3)).astype(np.float32))
    wgr.create_group("/sensor_band_parameters")
    wgr.create_dataset("/sensor_band_parameters/wavelengths",
                       np.array([0.45, 0.56, 0.66], dtype=np.float32),
                       attrs={"units": "micrometers"})
    wgr.create_group("/location")
    wgr.create_dataset("/location/glt_x", np.ones((4, 5)))
    wgr.create_dataset("/location/glt_y", np.ones((4, 5)))
    wgr.set_attrs("/", geotransform=np.array([0., 1., 0., 0., 0., -1.]))
    wgr.save()
    with EmitGranule(tmp_path / "um.nc") as g:
        np.testing.assert_allclose(g.wavelengths, [450.0, 560.0, 660.0])


def test_mask_granule_quality_and_band_mask(tmp_path, rng):
    from hyperres.io.granule import EmitMaskGranule
    from hyperres.io.hdf5 import HDF5Writer
    h, w = 9, 11
    mask = np.zeros((h, w, 8), dtype=np.float32)
    mask[2, 3, 0] = 1.0   # cloud flag band 0
    mask[4, 5, 1] = 1.0
    mask[4, 5, 3] = 1.0   # multiple flags -> still 1 after clipping
    packed = rng.integers(0, 255, size=(h, w, 36)).astype(np.uint8)
    wgr = HDF5Writer(tmp_path / "mask.nc")
    wgr.create_dataset("/mask", mask)
    wgr.create_dataset("/band_mask", packed)
    wgr.save()
    with EmitMaskGranule(tmp_path / "mask.nc") as m:
        q = m.quality_mask([0, 1, 3])
        assert q.dtype == np.uint8
        assert q[2, 3] == 1 and q[4, 5] == 1
        assert q.sum() == 2
        with pytest.raises(ValueError, match="data band"):
            m.quality_mask([0, 5])
        bm = m.band_mask()
        assert bm.shape == (h, w, 285)
        want = np.unpackbits(packed, axis=-1)[:, :, :285]
        np.testing.assert_array_equal(bm, want)


def test_radiance_product_detection(tmp_path, rng):
    from hyperres.io.hdf5 import HDF5Writer
    wgr = HDF5Writer(tmp_path / "rdn.nc")
    wgr.create_dataset("/radiance", rng.random((6, 7, 4)).astype(np.float32))
    wgr.create_group("/sensor_band_parameters")
    wgr.create_dataset("/sensor_band_parameters/wavelengths",
                       np.linspace(400, 900, 4).astype(np.float32),
                       attrs={"units": "nanometers"})
    wgr.create_group("/location")
    wgr.create_dataset("/location/glt_x", np.ones((6, 7)))
    wgr.create_dataset("/location/glt_y", np.ones((6, 7)))
    wgr.set_attrs("/", geotransform=np.array([0., 1., 0., 0., 0., -1.]))
    wgr.save()
    with EmitGranule(tmp_path / "rdn.nc") as g:
        assert g.product == "L1B_RDN"
        assert g.data_var == "radiance"
