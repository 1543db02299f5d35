"""Native (C++) IO codec bindings.

Builds ``libhyperresio.so`` from fastio.cpp on first use (g++ is part of
the target image) and binds it with ctypes. Every entry point has a pure
NumPy fallback, so the package works — just slower — without a compiler.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_HERE = Path(__file__).parent
_SO_PATH = _HERE / "libhyperresio.so"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_I64P = ctypes.POINTER(ctypes.c_int64)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           str(_HERE / "fastio.cpp"), "-o", str(_SO_PATH), "-lz",
           "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """The bound library, building it on first call; None when
    unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not _SO_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
        except OSError:
            return None
        lib.hr_deflate_blocks.restype = ctypes.c_int
        lib.hr_deflate_blocks.argtypes = [
            _U8P, _I64P, _I64P, _U8P, _I64P, _I64P, _I64P,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.hr_inflate_blocks.restype = ctypes.c_int
        lib.hr_inflate_blocks.argtypes = [
            _U8P, _I64P, _I64P, _U8P, _I64P, _I64P, _I64P,
            ctypes.c_int, ctypes.c_int]
        for name in ("u8", "u16", "u32"):
            for op in ("encode", "decode"):
                fn = getattr(lib, f"hr_predictor2_{op}_{name}")
                fn.restype = None
                fn.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_int]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return load_native() is not None


def _as_u8p(arr: np.ndarray):
    return arr.ctypes.data_as(_U8P)


def _as_i64p(arr: np.ndarray):
    return arr.ctypes.data_as(_I64P)


def deflate_blocks(blocks: Sequence[bytes], level: int = 1,
                   n_threads: int = 0) -> List[bytes]:
    """Compress independent blocks, multi-threaded natively when
    available; zlib fallback otherwise."""
    lib = load_native()
    if lib is None or not blocks:
        import zlib
        return [zlib.compress(b, level) for b in blocks]
    n = len(blocks)
    src_sizes = np.array([len(b) for b in blocks], dtype=np.int64)
    src_offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(src_sizes[:-1], out=src_offsets[1:])
    arena = np.frombuffer(b"".join(blocks), dtype=np.uint8)
    # zlib worst case: size + size/1000 + 64
    caps = src_sizes + src_sizes // 1000 + 64
    dst_offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(caps[:-1], out=dst_offsets[1:])
    dst = np.empty(int(caps.sum()), dtype=np.uint8)
    out_sizes = np.zeros(n, dtype=np.int64)
    rc = lib.hr_deflate_blocks(
        _as_u8p(arena), _as_i64p(src_offsets), _as_i64p(src_sizes),
        _as_u8p(dst), _as_i64p(dst_offsets), _as_i64p(caps),
        _as_i64p(out_sizes), n, level, n_threads)
    if rc != 0:
        import zlib
        return [zlib.compress(b, level) for b in blocks]
    return [dst[dst_offsets[i]:dst_offsets[i] + out_sizes[i]].tobytes()
            for i in range(n)]


def inflate_blocks(blocks: Sequence[bytes], raw_sizes: Sequence[int],
                   n_threads: int = 0) -> List[bytes]:
    """Decompress independent blocks with known decompressed sizes."""
    lib = load_native()
    if lib is None or not blocks:
        import zlib
        return [zlib.decompress(b) for b in blocks]
    n = len(blocks)
    src_sizes = np.array([len(b) for b in blocks], dtype=np.int64)
    src_offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(src_sizes[:-1], out=src_offsets[1:])
    arena = np.frombuffer(b"".join(blocks), dtype=np.uint8)
    caps = np.asarray(raw_sizes, dtype=np.int64)
    dst_offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(caps[:-1], out=dst_offsets[1:])
    dst = np.empty(int(caps.sum()), dtype=np.uint8)
    out_sizes = np.zeros(n, dtype=np.int64)
    rc = lib.hr_inflate_blocks(
        _as_u8p(arena), _as_i64p(src_offsets), _as_i64p(src_sizes),
        _as_u8p(dst), _as_i64p(dst_offsets), _as_i64p(caps),
        _as_i64p(out_sizes), n, n_threads)
    if rc != 0:
        import zlib
        return [zlib.decompress(b) for b in blocks]
    return [dst[dst_offsets[i]:dst_offsets[i] + out_sizes[i]].tobytes()
            for i in range(n)]


_PRED_NAMES = {1: "u8", 2: "u16", 4: "u32"}


def predictor2(block: np.ndarray, encode: bool,
               n_threads: int = 0) -> np.ndarray:
    """Horizontal differencing over (rows, cols, samples); returns a new
    array. Integer dtypes only (TIFF predictor 2 semantics)."""
    lib = load_native()
    arr = np.ascontiguousarray(block)
    itemsize = arr.dtype.itemsize
    if lib is None or itemsize not in _PRED_NAMES or arr.ndim != 3:
        # NumPy fallback: normalize to (rows, cols, samples) so 2-D
        # input doesn't index a missing sample axis
        a3 = arr if arr.ndim == 3 else arr[..., None]
        out = a3.copy()
        if encode:
            out[:, 1:, :] = a3[:, 1:, :] - a3[:, :-1, :]
        else:
            out = np.cumsum(a3, axis=1, dtype=a3.dtype)
        return out if arr.ndim == 3 else out[..., 0]
    out = arr.copy()
    fn = getattr(lib, f"hr_predictor2_"
                      f"{'encode' if encode else 'decode'}_"
                      f"{_PRED_NAMES[itemsize]}")
    rows, cols, samples = out.shape
    fn(out.ctypes.data, rows, cols, samples, n_threads)
    return out
