"""Integration: streaming tile batches through the prefetch pipeline into
sharded device processing — the host->HBM feed pattern of SURVEY §5."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyperres.core.crs import CRS
from hyperres.core.grid import Grid, Window
from hyperres.io.pipeline import PrefetchToDevice, tile_batch_reader
from hyperres.io.tiff import TiffReader, write_geotiff
from hyperres.parallel import make_mesh, sharded_tile_map


def test_prefetched_sharded_tile_stats(tmp_path, rng, eight_devices):
    """Stream 10x10 tiles from a tiled GeoTIFF with background prefetch,
    process each batch with an 8-way sharded per-tile reduction, and
    match the NumPy oracle."""
    h = w = 80
    bands = 4
    data = rng.random((bands, h, w)).astype(np.float32)
    g = Grid(CRS.utm(33, True), 0.0, 0.0, 10.0, 10.0, w, h)
    p = tmp_path / "scene.tif"
    write_geotiff(p, data, g, tiled=True, blockxsize=16, blockysize=16)

    wins = [Window(c, r, 10, 10) for r in range(0, h, 10)
            for c in range(0, w, 10)]  # 64 tiles
    mesh = make_mesh()

    def per_tile(tile):  # (B, th, tw) -> per-band mean
        return jnp.mean(tile, axis=(1, 2))

    results = []
    with TiffReader(p) as reader:
        source = tile_batch_reader(reader, wins, batch=8)
        for batch in PrefetchToDevice(source, depth=2):
            results.append(np.asarray(
                sharded_tile_map(per_tile, batch, mesh)))
    got = np.concatenate(results)[:len(wins)]

    want = np.stack([
        data[:, win.row_off:win.row_off + 10,
             win.col_off:win.col_off + 10].mean(axis=(1, 2))
        for win in wins])
    np.testing.assert_allclose(got, want, rtol=1e-5)
