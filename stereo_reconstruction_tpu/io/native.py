"""ctypes bindings for the native C++ IO runtime (native/stereo_io.cpp).

The reference's data layer is native C++ (OpenCV imread + Middlebury SDK
PFM, data_loader.cpp); ``libstereo_io.so`` is this framework's native
equivalent — zlib PNG decode, PFM codec, and a threaded batch prefetcher.
Falls back transparently to the pure-Python readers when the library
hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libstereo_io.so"),
    os.path.join(os.path.dirname(__file__), "libstereo_io.so"),
)

_lib: Optional[ctypes.CDLL] = None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for path in _LIB_PATHS:
        path = os.path.abspath(path)
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            lib.stereo_io_png_info.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.stereo_io_png_read.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.stereo_io_pfm_info.argtypes = lib.stereo_io_png_info.argtypes
            lib.stereo_io_pfm_read.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.stereo_io_pfm_write.argtypes = lib.stereo_io_pfm_read.argtypes
            lib.stereo_io_png_read_batch.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.stereo_io_last_error.restype = ctypes.c_char_p
            _lib = lib
            return lib
    return None


def available() -> bool:
    return load_library() is not None


def _check(rc: int, lib) -> None:
    if rc != 0:
        raise IOError(lib.stereo_io_last_error().decode())


def read_png(path: str, channels: int = 3) -> np.ndarray:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native stereo_io library not built")
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    _check(lib.stereo_io_png_info(path.encode(), w, h, c), lib)
    out = np.empty((h.value, w.value, channels), np.uint8)
    _check(
        lib.stereo_io_png_read(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h.value,
            w.value,
            channels,
        ),
        lib,
    )
    return out[..., 0] if channels == 1 else out


def read_pfm(path: str) -> np.ndarray:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native stereo_io library not built")
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    _check(lib.stereo_io_pfm_info(path.encode(), w, h, c), lib)
    out = np.empty(
        (h.value, w.value, c.value) if c.value == 3 else (h.value, w.value),
        np.float32,
    )
    _check(
        lib.stereo_io_pfm_read(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h.value,
            w.value,
            c.value,
        ),
        lib,
    )
    return out


def write_pfm(path: str, image: np.ndarray) -> None:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native stereo_io library not built")
    image = np.ascontiguousarray(image, np.float32)
    c = 1 if image.ndim == 2 else image.shape[2]
    _check(
        lib.stereo_io_pfm_write(
            path.encode(),
            image.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            image.shape[0],
            image.shape[1],
            c,
        ),
        lib,
    )


def read_png_batch(
    paths: List[str], height: int, width: int, channels: int = 3,
    num_threads: int = 0,
) -> np.ndarray:
    """Threaded batch decode into one (N, H, W, C) array — the prefetch
    path for padded device batches."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native stereo_io library not built")
    joined = b"\0".join(p.encode() for p in paths) + b"\0\0"
    out = np.empty((len(paths), height, width, channels), np.uint8)
    _check(
        lib.stereo_io_png_read_batch(
            joined,
            len(paths),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            height,
            width,
            channels,
            num_threads,
        ),
        lib,
    )
    return out
