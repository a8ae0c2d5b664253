"""Native (C++) components: LZ4-block codec for pixel replay compression.

The reference's only native dependency is the lz4 C library used through its
Python binding for compressed pixel replay (reference: utils/buffers.py:9).
Here the codec is built from source (native/codec.cpp) with g++ and bound via
ctypes; ``ensure_built()`` compiles on first use and caches the .so.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_SO_PATH = _DIR / "libaidcodec.so"
_LIB: Optional[ctypes.CDLL] = None


def ensure_built(force: bool = False) -> Path:
    """Compile codec.cpp -> libaidcodec.so if missing or stale."""
    src = _DIR / "codec.cpp"
    if force or not _SO_PATH.exists() or _SO_PATH.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                str(src), "-o", str(_SO_PATH),
            ],
            check=True,
            capture_output=True,
        )
    return _SO_PATH


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(str(ensure_built()))
        lib.aid_compress_bound.restype = ctypes.c_size_t
        lib.aid_compress_bound.argtypes = [ctypes.c_size_t]
        lib.aid_compress.restype = ctypes.c_size_t
        lib.aid_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t
        ]
        lib.aid_decompress.restype = ctypes.c_size_t
        lib.aid_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t
        ]
        lib.aid_decompress_batch.restype = ctypes.c_size_t
        lib.aid_decompress_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        _LIB = lib
    return _LIB


def native_available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def compress(data: np.ndarray) -> bytes:
    """Compress a uint8 array's bytes with the native LZ4-block codec."""
    lib = _lib()
    raw = np.ascontiguousarray(data).tobytes()
    bound = lib.aid_compress_bound(len(raw))
    out = ctypes.create_string_buffer(bound)
    n = lib.aid_compress(raw, len(raw), out, bound)
    if n == 0 and len(raw) > 0:
        raise RuntimeError("native compression failed")
    return out.raw[:n]


def decompress(blob: bytes, shape, dtype=np.uint8) -> np.ndarray:
    """Decompress into an array of the given shape/dtype."""
    lib = _lib()
    size = int(np.prod(shape)) * np.dtype(dtype).itemsize
    out = ctypes.create_string_buffer(size)
    n = lib.aid_decompress(blob, len(blob), out, size)
    if n != size:
        raise RuntimeError("native decompression failed (corrupt blob?)")
    return np.frombuffer(out.raw, dtype=dtype).reshape(shape).copy()


def decompress_batch(blobs, shape, dtype=np.uint8) -> np.ndarray:
    """Decompress a sequence of LZ4 blocks into one ``(N, *shape)`` array.

    One C call for the whole replay sample batch (aid_decompress_batch)
    instead of a ctypes round trip + allocation + ``np.stack`` copy per
    item (measured 2.4x at batch 128 of stack-3 84x84x3 frames)."""
    lib = _lib()
    n = len(blobs)
    item_size = int(np.prod(shape)) * np.dtype(dtype).itemsize
    out = np.empty((n,) + tuple(shape), dtype)
    if n == 0:
        return out
    srcs = (ctypes.c_char_p * n)(*blobs)  # keeps the bytes objects alive
    sizes = (ctypes.c_size_t * n)(*(len(b) for b in blobs))
    done = lib.aid_decompress_batch(
        srcs, sizes, n, out.ctypes.data_as(ctypes.c_void_p), item_size
    )
    if done != n:
        raise RuntimeError(
            f"native batch decompression failed at item {done} (corrupt blob?)"
        )
    return out
