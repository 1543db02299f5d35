import zlib

import numpy as np
import pytest

from hyperres.native import (
    deflate_blocks, inflate_blocks, native_available, predictor2,
)


def test_native_builds():
    assert native_available(), "native codec failed to build/load"


def test_deflate_inflate_roundtrip(rng):
    blocks = [rng.integers(0, 255, size=rng.integers(100, 5000),
                           dtype=np.uint8).tobytes() for _ in range(17)]
    comp = deflate_blocks(blocks, level=6)
    # every block decompressible by stock zlib (format compatibility)
    for c, b in zip(comp, blocks):
        assert zlib.decompress(c) == b
    back = inflate_blocks(comp, [len(b) for b in blocks])
    assert back == blocks


def test_inflate_accepts_python_zlib_output(rng):
    blocks = [rng.integers(0, 1000, size=400, dtype=np.uint16).tobytes()
              for _ in range(5)]
    comp = [zlib.compress(b, 3) for b in blocks]
    back = inflate_blocks(comp, [len(b) for b in blocks])
    assert back == blocks


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.uint32])
def test_predictor2_matches_numpy(rng, dtype):
    info = np.iinfo(dtype)
    block = rng.integers(0, info.max, size=(13, 29, 3)).astype(dtype)
    enc = predictor2(block, encode=True)
    want = block.copy()
    want[:, 1:, :] = block[:, 1:, :] - block[:, :-1, :]
    np.testing.assert_array_equal(enc, want)
    dec = predictor2(enc, encode=False)
    np.testing.assert_array_equal(dec, block)


def test_tiff_writer_native_output_stock_readable(tmp_path, rng):
    """Files written through the native batch compressor must stay
    readable by the pure-python reader and by Pillow."""
    from hyperres.io.tiff import TiffReader, write_geotiff
    from PIL import Image
    data = rng.integers(0, 60000, size=(1, 64, 80)).astype(np.uint16)
    p = write_geotiff(tmp_path / "n.tif", data, compress="deflate",
                      zlevel=6)
    with TiffReader(p) as r:
        np.testing.assert_array_equal(r.read(), data)
    np.testing.assert_array_equal(np.array(Image.open(p)), data[0])
