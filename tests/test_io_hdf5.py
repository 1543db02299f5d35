import numpy as np
import pytest

from hyperres.io.hdf5 import HDF5File, HDF5Writer


def test_roundtrip_contiguous(tmp_path, rng):
    w = HDF5Writer(tmp_path / "a.h5")
    data = rng.normal(size=(7, 9)).astype(np.float32)
    w.create_dataset("/x", data)
    w.set_attrs("/", title="hello", version=np.int32(3))
    w.save()

    with HDF5File(tmp_path / "a.h5") as f:
        np.testing.assert_array_equal(f.variables["x"].read(), data)
        assert f.attrs["title"] == "hello"
        assert f.attrs["version"] == 3


def test_roundtrip_groups_and_attrs(tmp_path, rng):
    w = HDF5Writer(tmp_path / "g.h5")
    wl = np.linspace(380.0, 2500.0, 285)
    w.create_group("/sensor_band_parameters")
    w.create_dataset("/sensor_band_parameters/wavelengths", wl)
    w.create_dataset("/sensor_band_parameters/good_wavelengths",
                     np.ones(285, dtype=np.uint8))
    w.create_group("/location")
    w.create_dataset("/location/glt_x",
                     rng.integers(0, 100, (40, 50)).astype(np.int32))
    w.set_attrs("/", geotransform=np.arange(6, dtype=np.float64),
                time_coverage_start="2023-08-19T11:01:26+0000")
    w.save()

    with HDF5File(tmp_path / "g.h5") as f:
        assert "sensor_band_parameters" in f.groups
        sbp = f.groups["sensor_band_parameters"]
        np.testing.assert_allclose(sbp.variables["wavelengths"].read(), wl)
        assert f.attrs["time_coverage_start"] == "2023-08-19T11:01:26+0000"
        np.testing.assert_array_equal(f.attrs["geotransform"],
                                      np.arange(6, dtype=np.float64))
        assert f.groups["location"]["glt_x"].shape == (40, 50)


@pytest.mark.parametrize("compression,shuffle", [
    (None, False), ("deflate", False), ("deflate", True)])
def test_roundtrip_chunked(tmp_path, rng, compression, shuffle):
    w = HDF5Writer(tmp_path / "c.h5")
    data = rng.normal(size=(30, 44, 12)).astype(np.float32)
    w.create_dataset("/reflectance", data, chunks=(16, 16, 12),
                     compression=compression, shuffle=shuffle)
    w.save()

    with HDF5File(tmp_path / "c.h5") as f:
        ds = f.variables["reflectance"]
        assert ds.layout == "chunked"
        np.testing.assert_array_equal(ds.read(), data)


def test_dataset_attrs_and_slicing(tmp_path, rng):
    w = HDF5Writer(tmp_path / "d.h5")
    data = rng.integers(0, 1000, size=(10, 20)).astype(np.int16)
    w.create_dataset("/m", data, attrs={"units": "nm",
                                        "_FillValue": np.float32(-9999.0)})
    w.save()
    with HDF5File(tmp_path / "d.h5") as f:
        ds = f.variables["m"]
        assert ds.attrs["units"] == "nm"
        assert ds.attrs["_FillValue"] == np.float32(-9999.0)
        np.testing.assert_array_equal(ds[2:5, 3:7], data[2:5, 3:7])


def test_non_hdf5_rejected(tmp_path):
    (tmp_path / "x.h5").write_bytes(b"not an hdf5 file at all.....")
    with pytest.raises(ValueError, match="Not an HDF5"):
        HDF5File(tmp_path / "x.h5")


def test_many_children_sorted_lookup(tmp_path, rng):
    w = HDF5Writer(tmp_path / "many.h5")
    arrays = {}
    for i in range(40):
        name = f"var_{i:02d}"
        arrays[name] = rng.normal(size=(5,)).astype(np.float64)
        w.create_dataset(f"/{name}", arrays[name])
    w.save()
    with HDF5File(tmp_path / "many.h5") as f:
        assert len(f.variables) == 40
        for name, arr in arrays.items():
            np.testing.assert_array_equal(f.variables[name].read(), arr)


def test_unsupported_attribute_datatype_skipped(tmp_path, rng, monkeypatch):
    """Real netcdf-c granules carry attrs with datatypes outside the
    subset (object references like REFERENCE_LIST); those must be
    skipped, not crash the open."""
    from hyperres.io import hdf5 as h5mod

    w = HDF5Writer(tmp_path / "r.h5")
    data = rng.random((4, 5)).astype(np.float32)
    w.create_dataset("/x", data, attrs={"good": "keep", "bad": "poison"})
    w.set_attrs("/", root_bad="poison", root_good="keep")
    w.save()

    orig = h5mod.HDF5File._parse_attribute

    def flaky(self, body):
        k, v = orig(self, body)
        if v == "poison":
            raise ValueError("Unsupported datatype class 7")
        return k, v

    monkeypatch.setattr(h5mod.HDF5File, "_parse_attribute", flaky)
    with HDF5File(tmp_path / "r.h5") as f:
        assert f.attrs.get("root_good") == "keep"
        assert "root_bad" not in f.attrs
        ds = f.variables["x"]
        assert ds.attrs.get("good") == "keep"
        assert "bad" not in ds.attrs
        np.testing.assert_array_equal(ds.read(), data)


def test_read_band_range_chunked(tmp_path, rng):
    w = HDF5Writer(tmp_path / "br.h5")
    data = rng.normal(size=(20, 24, 37)).astype(np.float32)
    w.create_dataset("/reflectance", data, chunks=(8, 8, 8),
                     compression="deflate")
    w.create_dataset("/contig", data)
    w.save()
    with HDF5File(tmp_path / "br.h5") as f:
        ds = f.variables["reflectance"]
        np.testing.assert_array_equal(ds.read_band_range(5, 19),
                                      data[..., 5:19])
        np.testing.assert_array_equal(ds.read_band_range(0, 37), data)
        np.testing.assert_array_equal(ds.read_band_range(32, 99),
                                      data[..., 32:])
        dc = f.variables["contig"]
        np.testing.assert_array_equal(dc.read_band_range(2, 6),
                                      data[..., 2:6])


def test_superblock_v2_read_path(tmp_path, rng):
    """Exercise the v2 superblock branch: rewrite a v0 file's superblock
    as version 2 pointing at the same root object header (all internal
    addresses are absolute, so the rest of the file is untouched)."""
    import struct

    w = HDF5Writer(tmp_path / "v0.h5")
    data = rng.normal(size=(6, 7)).astype(np.float32)
    w.create_dataset("/x", data, attrs={"units": "nm"})
    w.set_attrs("/", title="v2 test")
    w.save()

    with HDF5File(tmp_path / "v0.h5") as f0:
        root_addr = f0._root_header_addr
        want = f0.variables["x"].read()

    blob = bytearray((tmp_path / "v0.h5").read_bytes())
    sb2 = struct.pack("<8sBBBB4Q", b"\x89HDF\r\n\x1a\n", 2, 8, 8, 0,
                      0, 0xFFFFFFFFFFFFFFFF, len(blob), root_addr)
    sb2 += b"\x00\x00\x00\x00"  # checksum (not verified by the reader)
    blob[:len(sb2)] = sb2
    (tmp_path / "v2.h5").write_bytes(bytes(blob))

    with HDF5File(tmp_path / "v2.h5") as f2:
        np.testing.assert_array_equal(f2.variables["x"].read(), want)
        assert f2.attrs["title"] == "v2 test"
        assert f2.variables["x"].attrs["units"] == "nm"


# ------------------------------------------------- v2/"latest" format ----

class TestLatestFormat:
    """h5py libver="latest" files: superblock v3, v2 (OHDR) object headers,
    compact link messages, layout message v4 with the new chunk indexes."""

    def _roundtrip(self, tmp_path, make, expect, path="d"):
        import h5py
        from hyperres.io.hdf5 import HDF5File
        p = tmp_path / "latest.h5"
        with h5py.File(p, "w", libver="latest") as f:
            make(f)
        with HDF5File(p) as f:
            node = f.root
            *parents, leaf = path.split("/")
            for g in parents:
                node = node.groups[g]
            np.testing.assert_array_equal(node.variables[leaf].read(), expect)

    def test_contiguous(self, tmp_path):
        a = np.arange(10, dtype=np.int16)
        self._roundtrip(tmp_path, lambda f: f.create_dataset("d", data=a), a)

    def test_single_chunk_filtered(self, tmp_path):
        a = np.arange(24, dtype=np.float32).reshape(4, 6)
        self._roundtrip(tmp_path, lambda f: f.create_dataset(
            "d", data=a, chunks=(4, 6), compression="gzip"), a)

    def test_fixed_array_filtered_shuffle(self, tmp_path):
        a = np.arange(24, dtype=np.float32).reshape(4, 6)
        self._roundtrip(tmp_path, lambda f: f.create_dataset(
            "d", data=a, chunks=(2, 3), compression="gzip", shuffle=True), a)

    def test_fixed_array_unfiltered(self, tmp_path):
        a = np.arange(24, dtype=np.float32).reshape(4, 6)
        self._roundtrip(tmp_path, lambda f: f.create_dataset(
            "d", data=a, chunks=(2, 3)), a)

    def test_fixed_array_paged(self, tmp_path):
        # 33*32 = 1056 chunks > the 2**10 page size -> paged data block
        a = np.arange(66 * 64, dtype=np.float32).reshape(66, 64)
        self._roundtrip(tmp_path, lambda f: f.create_dataset(
            "d", data=a, chunks=(2, 2), compression="gzip"), a)

    def test_nested_group_links(self, tmp_path):
        a = np.arange(24, dtype=np.float32).reshape(4, 6)
        self._roundtrip(tmp_path, lambda f: f.create_group(
            "grp").create_dataset("d", data=a, compression="gzip"),
            a, path="grp/d")

    def test_attrs_and_band_range(self, tmp_path):
        import h5py
        from hyperres.io.hdf5 import HDF5File
        cube = np.arange(5 * 7 * 20, dtype=np.float32).reshape(5, 7, 20)
        p = tmp_path / "attrs.h5"
        with h5py.File(p, "w", libver="latest") as f:
            f.attrs["title"] = "v2"
            d = f.create_dataset("cube", data=cube, chunks=(5, 7, 4),
                                 compression="gzip")
            d.attrs["units"] = "nm"
        with HDF5File(p) as f:
            ds = f.variables["cube"]
            np.testing.assert_array_equal(ds.read_band_range(3, 11),
                                          cube[..., 3:11])
            assert f.attrs["title"] == "v2"

    # -- unlimited dimensions: extensible-array / v2-B-tree chunk indexes
    # (the layouts netcdf-c emits for record dims in newer formats;
    # reference boundary: EMIT_data/emit_proj.py:607-614 reads anything)

    def test_extensible_array_filtered(self, tmp_path):
        a = np.arange(5 * 8 * 6, dtype=np.float32).reshape(5, 8, 6)
        self._roundtrip(tmp_path, lambda f: f.create_dataset(
            "d", data=a, maxshape=(None, 8, 6), chunks=(2, 4, 3),
            compression="gzip", shuffle=True), a)

    def test_extensible_array_unfiltered(self, tmp_path):
        a = np.arange(20, dtype=np.int32)
        self._roundtrip(tmp_path, lambda f: f.create_dataset(
            "d", data=a, maxshape=(None,), chunks=(3,)), a)

    def test_extensible_array_superblocks(self, tmp_path):
        # enough 1-element chunks to spill past the index block into
        # the doubling super-block structure
        a = np.arange(6000, dtype=np.float32)
        self._roundtrip(tmp_path, lambda f: f.create_dataset(
            "d", data=a, maxshape=(None,), chunks=(1,)), a)

    def test_extensible_array_unlimited_not_first(self, tmp_path):
        # element order swizzles the unlimited dim to the front
        a = np.arange(4 * 500, dtype=np.float64).reshape(4, 500)
        self._roundtrip(tmp_path, lambda f: f.create_dataset(
            "d", data=a, maxshape=(4, None), chunks=(2, 5)), a)

    def test_btree2_unfiltered_deep(self, tmp_path):
        # 50*40 = 2000 records forces internal (BTIN) nodes
        a = np.arange(100 * 120, dtype=np.float32).reshape(100, 120)
        self._roundtrip(tmp_path, lambda f: f.create_dataset(
            "d", data=a, maxshape=(None, None), chunks=(2, 3)), a)

    def test_btree2_filtered(self, tmp_path):
        a = np.arange(6 * 7, dtype=np.float64).reshape(6, 7)
        self._roundtrip(tmp_path, lambda f: f.create_dataset(
            "d", data=a, maxshape=(None, None), chunks=(2, 3),
            compression="gzip"), a)

    def test_btree2_band_range(self, tmp_path):
        import h5py
        from hyperres.io.hdf5 import HDF5File
        cube = np.arange(6 * 5 * 30, dtype=np.float32).reshape(6, 5, 30)
        p = tmp_path / "bt2br.h5"
        with h5py.File(p, "w", libver="latest") as f:
            f.create_dataset("cube", data=cube,
                             maxshape=(None, None, 30), chunks=(2, 5, 4),
                             compression="gzip")
        with HDF5File(p) as f:
            np.testing.assert_array_equal(
                f.variables["cube"].read_band_range(5, 17),
                cube[..., 5:17])

    def test_vlen_string_dataset(self, tmp_path):
        import h5py
        from hyperres.io.hdf5 import HDF5File
        names = ["alpha", "bravo-long-string", "", "émit"]
        for libver in ("earliest", "latest"):
            p = tmp_path / f"vls_{libver}.h5"
            with h5py.File(p, "w", libver=libver) as f:
                f.create_dataset("names", data=names,
                                 dtype=h5py.string_dtype())
            with HDF5File(p) as f:
                got = f.variables["names"].read()
                assert list(got) == names

    def test_maxshape_surfaced(self, tmp_path):
        import h5py
        from hyperres.io.hdf5 import HDF5File
        p = tmp_path / "ms.h5"
        with h5py.File(p, "w", libver="latest") as f:
            f.create_dataset("d", shape=(3, 4), maxshape=(None, 4),
                             chunks=(1, 4))
        with HDF5File(p) as f:
            assert f.variables["d"].maxshape == (None, 4)

    def test_maxshape_grid_strides(self, tmp_path):
        """Element-index strides come from MAXSHAPE, not current shape:
        a fixed-but-resizable dim whose max chunk grid differs from the
        current one changes the linearization for both the fixed-array
        and extensible-array indexes."""
        import h5py
        from hyperres.io.hdf5 import HDF5File
        p = tmp_path / "ms_grid.h5"
        with h5py.File(p, "w", libver="latest") as f:
            a = np.arange(1500).reshape(3, 500).astype("f4")
            d = f.create_dataset("ea", shape=(3, 500), maxshape=(8, None),
                                 chunks=(2, 5))
            d[:] = a
            b = np.arange(42).reshape(6, 7).astype("f4")
            d2 = f.create_dataset("fa", shape=(6, 7), maxshape=(12, 15),
                                  chunks=(2, 3))
            d2[:] = b
        with HDF5File(p) as f:
            assert f.variables["ea"].chunk_index[0] == "extensible"
            np.testing.assert_array_equal(f.variables["ea"].read(), a)
            assert f.variables["fa"].chunk_index[0] == "fixed"
            np.testing.assert_array_equal(f.variables["fa"].read(), b)

    def test_dense_links_and_attributes(self, tmp_path):
        """Groups with >8 links and objects with many attributes switch
        to DENSE storage under libver="latest" (fractal heap + name-index
        v2 B-trees) — the layout netcdf-c emits for many-variable files
        in the newer formats."""
        import h5py
        from hyperres.io.hdf5 import HDF5File
        p = tmp_path / "dense.h5"
        with h5py.File(p, "w", libver="latest") as f:
            g = f.create_group("many")
            for i in range(120):
                g.create_dataset(f"variable_with_a_long_name_{i:04d}",
                                 data=np.array([i, i * 2], dtype="i8"))
            sub = g.create_group("nested")
            for i in range(20):
                sub.create_dataset(f"n{i:03d}", data=np.float32(i))
            d = f.create_dataset("attrs_heavy", data=np.zeros(2, "f4"))
            for i in range(60):
                d.attrs[f"attribute_number_{i:04d}"] = f"value-{i}"
        with HDF5File(p) as f:
            g = f.groups["many"]
            assert len(g.variables) == 120
            for i in (0, 7, 63, 119):
                np.testing.assert_array_equal(
                    g.variables[f"variable_with_a_long_name_{i:04d}"]
                    .read(), np.array([i, i * 2], dtype="i8"))
            assert len(g.groups["nested"].variables) == 20
            d = f.variables["attrs_heavy"]
            assert len(d.attrs) == 60
            assert all(d.attrs[f"attribute_number_{i:04d}"] == f"value-{i}"
                       for i in range(60))

    def test_dense_root_group_links(self, tmp_path):
        import h5py
        from hyperres.io.hdf5 import HDF5File
        p = tmp_path / "dense_root.h5"
        with h5py.File(p, "w", libver="latest") as f:
            for i in range(30):
                f.create_dataset(f"v{i:02d}",
                                 data=np.arange(4, dtype=np.int32) + i)
        with HDF5File(p) as f:
            assert len(f.variables) == 30
            np.testing.assert_array_equal(
                f.variables["v29"].read(), np.arange(4) + 29)


def test_writer_output_readable_by_h5py(tmp_path, rng):
    """HDF5Writer must emit files stock libhdf5 accepts — local-heap
    free-list sentinel, padded v1 B-tree nodes, chunk-multiple final
    keys (all rejected by h5py before round 2)."""
    import h5py
    w = HDF5Writer(tmp_path / "interop.h5")
    w.create_group("/g")
    a = rng.normal(size=(4, 6)).astype(np.float32)
    w.create_dataset("/g/x", a, attrs={"units": "nm"})
    b = rng.integers(0, 1000, (7, 9, 5)).astype(np.int32)
    w.create_dataset("/g/c", b, chunks=(4, 4, 5), compression="gzip",
                     shuffle=True)
    w.create_dataset("/plain", np.arange(10, dtype="f8"),
                     attrs={"k": np.int32(3)})
    w.set_attrs("/", title="interop")
    w.save()
    with h5py.File(tmp_path / "interop.h5") as f:
        assert sorted(f) == ["g", "plain"]
        np.testing.assert_array_equal(f["g/x"][...], a)
        np.testing.assert_array_equal(f["g/c"][...], b)
        np.testing.assert_array_equal(f["plain"][...], np.arange(10.0))
        def _s(v):
            return v.decode() if isinstance(v, bytes) else v
        assert _s(f.attrs["title"]) == "interop"
        assert _s(f["g/x"].attrs["units"]) == "nm"


def test_null_dataspace_attr_skipped(tmp_path):
    """h5py.Empty attrs (NULL dataspace) must be skipped like other
    unsupported attributes, not crash the open with IndexError."""
    import h5py
    from hyperres.io.hdf5 import HDF5File
    for libver in ("earliest", "latest"):
        p = tmp_path / f"null_{libver}.h5"
        with h5py.File(p, "w", libver=libver) as f:
            d = f.create_dataset("x", data=np.arange(3, dtype="f4"))
            d.attrs.create("empty", h5py.Empty("f4"))
            d.attrs["real"] = 7
        with HDF5File(p) as f:
            ds = f.variables["x"]
            assert ds.attrs.get("real") == 7
            assert "empty" not in ds.attrs


def test_implicit_index_maxshape_strides(tmp_path):
    """Implicit (early-allocation) chunk index linearizes over the
    MAXSHAPE grid — current-shape strides silently misplaced rows."""
    import h5py
    from h5py import h5d, h5p, h5s, h5t
    from hyperres.io.hdf5 import HDF5File
    p = tmp_path / "impl.h5"
    with h5py.File(p, "w", libver="latest") as f:
        space = h5s.create_simple((6, 8), (6, 16))
        dcpl = h5p.create(h5p.DATASET_CREATE)
        dcpl.set_chunk((2, 4))
        dcpl.set_alloc_time(h5d.ALLOC_TIME_EARLY)
        dset = h5d.create(f.id, b"d", h5t.NATIVE_FLOAT, space, dcpl)
        data = np.arange(48, dtype="f4").reshape(6, 8)
        dset.write(h5s.ALL, h5s.ALL, data)
        dset.close()
    with h5py.File(p) as hf:
        truth = hf["d"][...]
    with HDF5File(p) as f:
        ds = f.variables["d"]
        assert ds.chunk_index[0] == "implicit"
        np.testing.assert_array_equal(ds.read(), truth)
