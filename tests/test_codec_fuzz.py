"""Randomized round-trip fuzz over the self-contained codecs: many
shapes, dtypes, tilings, compression combos. Seeded (deterministic)."""

import os

import numpy as np
import pytest

from hyperres.core.crs import CRS
from hyperres.core.grid import Grid
from hyperres.io import envi, tiff


# CI is deterministic; HYPERRES_FUZZ_SEED lets fuzz sessions sweep seeds
RNG = np.random.default_rng(int(os.environ.get("HYPERRES_FUZZ_SEED",
                                               "20260816")))


def _rand_grid(w, h):
    if RNG.random() < 0.5:
        return Grid(CRS.utm(int(RNG.integers(1, 60)), bool(RNG.random() < 0.8)),
                    float(RNG.uniform(1e5, 8e5)),
                    float(RNG.uniform(1e6, 9e6)),
                    float(RNG.uniform(1, 120)), float(RNG.uniform(1, 120)),
                    w, h)
    return Grid(CRS.geographic(), float(RNG.uniform(-179, 178)),
                float(RNG.uniform(-88, 88)),
                float(RNG.uniform(1e-5, 1e-2)),
                float(RNG.uniform(1e-5, 1e-2)), w, h)


@pytest.mark.parametrize("trial", range(12))
def test_tiff_roundtrip_fuzz(tmp_path, trial):
    h = int(RNG.integers(1, 70))
    w = int(RNG.integers(1, 70))
    b = int(RNG.integers(1, 6))
    dt = np.dtype(RNG.choice(["uint8", "uint16", "int16", "int32",
                              "uint32", "float32", "float64"]))
    if dt.kind == "f":
        data = RNG.normal(size=(b, h, w)).astype(dt)
    else:
        info = np.iinfo(dt)
        data = RNG.integers(max(info.min, -5000), min(info.max, 50000),
                            size=(b, h, w)).astype(dt)
    tiled = bool(RNG.random() < 0.5) and h >= 16 and w >= 16
    kwargs = {}
    if tiled:
        kwargs = {"tiled": True,
                  "blockxsize": int(RNG.choice([16, 32, 48])),
                  "blockysize": int(RNG.choice([16, 32, 48]))}
    elif RNG.random() < 0.5:
        kwargs = {"rows_per_strip": int(RNG.integers(1, h + 1))}
    compress = RNG.choice([None, "deflate"])
    predictor = int(RNG.choice([1, 2])) if compress else None
    g = _rand_grid(w, h)
    p = tiff.write_geotiff(tmp_path / f"f{trial}.tif", data, g,
                           compress=compress, predictor=predictor,
                           bigtiff=bool(RNG.random() < 0.15), **kwargs)
    got, grid, _ = tiff.read_geotiff(p)
    np.testing.assert_array_equal(got, data)
    assert grid == g


@pytest.mark.parametrize("trial", range(8))
def test_envi_roundtrip_fuzz(tmp_path, trial):
    h = int(RNG.integers(1, 50))
    w = int(RNG.integers(1, 50))
    b = int(RNG.integers(1, 9))
    dt = np.dtype(RNG.choice(["uint16", "int16", "float32", "float64",
                              "uint8"]))
    interleave = str(RNG.choice(["bsq", "bil", "bip"]))
    if dt.kind == "f":
        cube = RNG.normal(size=(h, w, b)).astype(dt)
    else:
        cube = RNG.integers(0, 250, size=(h, w, b)).astype(dt)
    envi.write_cube(tmp_path / f"e{trial}.bin", cube,
                    interleave=interleave)
    r = envi.EnviReader(tmp_path / f"e{trial}.hdr")
    np.testing.assert_array_equal(r.read(), cube)
    bi = int(RNG.integers(0, b))
    np.testing.assert_array_equal(r.read_band(bi), cube[:, :, bi])


@pytest.mark.parametrize("trial", range(8))
def test_hdf5_roundtrip_fuzz(tmp_path, trial):
    from hyperres.io.hdf5 import HDF5File, HDF5Writer
    shape = tuple(int(RNG.integers(1, 24))
                  for _ in range(int(RNG.integers(1, 4))))
    dt = np.dtype(RNG.choice(["float32", "float64", "int16", "uint16",
                              "int32", "uint8"]))
    if dt.kind == "f":
        data = RNG.normal(size=shape).astype(dt)
    else:
        data = RNG.integers(0, 200, size=shape).astype(dt)
    w = HDF5Writer(tmp_path / f"h{trial}.h5")
    chunks = None
    if len(shape) >= 2 and min(shape) >= 4 and RNG.random() < 0.6:
        chunks = tuple(max(1, s // 2) for s in shape)
    w.create_dataset("/g/d", data, chunks=chunks,
                     compression="gzip" if (chunks and RNG.random() < 0.7)
                     else None,
                     shuffle=bool(chunks and RNG.random() < 0.5))
    w.set_attrs("/g/d", units="x", count=np.int32(7))
    w.save()
    with HDF5File(tmp_path / f"h{trial}.h5") as f:
        ds = f.groups["g"].variables["d"]
        np.testing.assert_array_equal(ds.read(), data)
        assert ds.attrs["units"] == "x"


@pytest.mark.parametrize("trial", range(10))
def test_hdf5_unlimited_dims_fuzz(tmp_path, trial):
    """h5py-written files with unlimited dimensions: random rank, which
    dims are unlimited (1 unlimited -> extensible-array index, >1 ->
    v2 B-tree under libver="latest"; v1 B-tree under "earliest"), chunk
    shapes, filters. The reader must round-trip them all."""
    import h5py
    from hyperres.io.hdf5 import HDF5File
    rank = int(RNG.integers(1, 4))
    shape = tuple(int(RNG.integers(2, 20)) for _ in range(rank))
    n_unlim = int(RNG.integers(1, rank + 1))
    unlim = RNG.choice(rank, size=n_unlim, replace=False)
    maxshape = tuple(None if i in unlim else s for i, s in enumerate(shape))
    chunks = tuple(max(1, int(RNG.integers(1, s + 1))) for s in shape)
    dt = np.dtype(RNG.choice(["float32", "float64", "int16", "uint32"]))
    if dt.kind == "f":
        data = RNG.normal(size=shape).astype(dt)
    else:
        data = RNG.integers(0, 1000, size=shape).astype(dt)
    libver = str(RNG.choice(["earliest", "latest"]))
    compression = RNG.choice([None, "gzip"])
    p = tmp_path / f"u{trial}.h5"
    with h5py.File(p, "w", libver=libver) as f:
        f.create_dataset("d", data=data, maxshape=maxshape, chunks=chunks,
                         compression=compression,
                         shuffle=bool(compression and RNG.random() < 0.5))
    with HDF5File(p) as f:
        np.testing.assert_array_equal(f.variables["d"].read(), data)
