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


# ------------------------------------------------- granule cube ingest ----

def test_stream_cube_f32_bit_exact(rng):
    from hyperres.io.ingest import stream_cube_to_device

    cube = rng.random((20, 24, 70)).astype(np.float32)
    cube[3:5, 7:9, :] = -9999.0
    out = stream_cube_to_device(
        lambda b0, b1: cube[..., b0:b1], cube.shape,
        transfer="f32", chunk_bands=32)
    np.testing.assert_array_equal(np.asarray(out), cube)


def test_stream_cube_u16_error_bound(rng):
    from hyperres.io.ingest import stream_cube_to_device

    cube = (0.05 + 0.9 * rng.random((18, 22, 80))).astype(np.float32)
    cube[2:4, 5:7, :] = -9999.0          # nodata pixels
    cube[..., 40] = -9999.0              # a fully dead band
    out = np.asarray(stream_cube_to_device(
        lambda b0, b1: cube[..., b0:b1], cube.shape,
        transfer="u16", chunk_bands=32))
    valid = cube != -9999.0
    # nodata round-trips exactly through the 65535 sentinel
    np.testing.assert_array_equal(out[~valid], cube[~valid])
    # per-band quantization error bound: range / 65534 / 2
    err = np.abs(out - cube)
    for b in range(cube.shape[-1]):
        v = valid[..., b]
        if not v.any():
            continue
        rng_b = cube[..., b][v].max() - cube[..., b][v].min()
        assert err[..., b][v].max() <= rng_b / 65534.0 / 2.0 + 1e-7


def test_quantize_slab_u16_dead_and_constant_bands(rng):
    from hyperres.io.ingest import quantize_slab_u16

    slab = np.stack([np.full((6, 7), -9999.0, np.float32),   # dead
                     np.full((6, 7), 0.42, np.float32),      # constant
                     rng.random((6, 7)).astype(np.float32)], axis=-1)
    q, scale, offset = quantize_slab_u16(slab)
    assert (q[..., 0] == 65535).all()
    assert (q[..., 1] != 65535).all()
    np.testing.assert_allclose(
        q[..., 1].astype(np.float32) * scale[1] + offset[1], 0.42,
        atol=1e-6)


def test_ortho_streaming_ingest_matches_monolithic(tmp_path):
    """The default streaming u16 ingest must reproduce the monolithic
    read path within the quantization error bound (cubic warp amplifies
    by at most the kernel's |weight| sum per pass)."""
    from hyperres.core.config import OrthoConfig
    from hyperres.io import envi
    from hyperres.ortho import orthorectify_granule
    from hyperres.testing.scenes import make_scene

    scene = make_scene(tmp_path / "ssc", raw_shape=(40, 44), n_bands=48,
                       s2_size=240)
    res_s = orthorectify_granule(
        scene.emit_nc_path, tmp_path / "stream", scene.s2_tif_path,
        config=OrthoConfig(save_geotiffs=False, write_xml=False))
    res_m = orthorectify_granule(
        scene.emit_nc_path, tmp_path / "mono", scene.s2_tif_path,
        config=OrthoConfig(save_geotiffs=False, write_xml=False,
                           streaming_ingest=False))
    assert "data_streamed_orthowarp" in res_s.info["stages"]
    assert "data_streamed_orthowarp" not in res_m.info["stages"]
    a = envi.EnviReader(res_s.data_envi_bin.with_suffix(".hdr")).read()
    b = envi.EnviReader(res_m.data_envi_bin.with_suffix(".hdr")).read()
    # nodata masks identical
    np.testing.assert_array_equal(a == -9999.0, b == -9999.0)
    v = a != -9999.0
    err = np.abs(a[v] - b[v])
    # interior: quantization step (range/65534/2 ~ 7e-6) amplified by the
    # cubic kernel's |weight| sums (<= 1.48 per pass); nodata-boundary
    # pixels renormalize by small weight sums and amplify further
    assert np.percentile(err, 99) < 3e-5
    assert err.max() < 1e-3


def test_ortho_streaming_f32_bit_identical(tmp_path):
    """f32 transfer streaming is bit-identical to the monolithic path."""
    from hyperres.core.config import OrthoConfig
    from hyperres.io import envi
    from hyperres.ortho import orthorectify_granule
    from hyperres.testing.scenes import make_scene

    scene = make_scene(tmp_path / "sf", raw_shape=(36, 40), n_bands=40,
                       s2_size=220)
    res_s = orthorectify_granule(
        scene.emit_nc_path, tmp_path / "s", scene.s2_tif_path,
        config=OrthoConfig(save_geotiffs=False, write_xml=False,
                           ingest_transfer="f32"))
    res_m = orthorectify_granule(
        scene.emit_nc_path, tmp_path / "m", scene.s2_tif_path,
        config=OrthoConfig(save_geotiffs=False, write_xml=False,
                           streaming_ingest=False))
    a = envi.EnviReader(res_s.data_envi_bin.with_suffix(".hdr")).read()
    b = envi.EnviReader(res_m.data_envi_bin.with_suffix(".hdr")).read()
    np.testing.assert_array_equal(a, b)


def test_ortho_streaming_two_step_path(tmp_path):
    """The assembled-cube streaming branch (no fused orthowarp) is also
    bit-identical to monolithic under f32 transfer."""
    from hyperres.core.config import OrthoConfig
    from hyperres.io import envi
    from hyperres.ortho import orthorectify_granule
    from hyperres.testing.scenes import make_scene

    scene = make_scene(tmp_path / "ts", raw_shape=(30, 34), n_bands=40,
                       s2_size=200)
    kw = dict(save_geotiffs=False, write_xml=False, fused_orthowarp=False)
    res_s = orthorectify_granule(
        scene.emit_nc_path, tmp_path / "s", scene.s2_tif_path,
        config=OrthoConfig(ingest_transfer="f32", **kw))
    res_m = orthorectify_granule(
        scene.emit_nc_path, tmp_path / "m", scene.s2_tif_path,
        config=OrthoConfig(streaming_ingest=False, **kw))
    assert "data_stream_ingest" in res_s.info["stages"]
    a = envi.EnviReader(res_s.data_envi_bin.with_suffix(".hdr")).read()
    b = envi.EnviReader(res_m.data_envi_bin.with_suffix(".hdr")).read()
    np.testing.assert_array_equal(a, b)


def test_stream_cube_u12_transfer(rng):
    """12-bit packed transfer: 25% fewer wire bytes than u16, error
    bounded by band_range/4094/2, sentinel-coded invalid pixels."""
    from hyperres.io.ingest import (quantize_slab_u12,
                                    stream_cube_to_device)
    cube = rng.random((30, 40, 21)).astype(np.float32)  # odd band count
    cube[3, 4, :] = -9999.0
    cube[8, 8, 5] = np.nan

    packed, scale, offset, nb = quantize_slab_u12(cube, -9999.0)
    assert packed.dtype == np.uint8
    assert packed.nbytes < cube.nbytes * 0.4  # < u16's 0.5

    out = np.asarray(stream_cube_to_device(
        lambda b0, b1: cube[..., b0:b1], cube.shape, transfer="u12",
        chunk_bands=8))
    valid = np.isfinite(cube) & (cube != -9999.0)
    err = np.abs(out - cube)[valid]
    assert err.max() <= float(scale.max()) / 2 * 1.01
    assert (out[3, 4] == -9999.0).all()
    assert out[8, 8, 5] == -9999.0
