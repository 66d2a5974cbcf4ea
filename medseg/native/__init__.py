"""ctypes bindings for the native host-runtime library (libmedseg_native.so).

Built on demand with the in-tree Makefile (g++ + zlib + OpenMP; no pybind11).
All entry points gracefully return None when the library is unavailable so
the pure-Python/numpy paths keep everything working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "libmedseg_native.so")


@lru_cache(maxsize=1)
def load() -> ctypes.CDLL | None:
    """Load (building if necessary) the native library; None on failure."""
    if not os.path.exists(_LIB):
        try:
            subprocess.run(
                ["make", "-s"], cwd=_DIR, check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None

    c_ll = ctypes.c_longlong
    c_f = ctypes.c_float
    c_d = ctypes.c_double
    ptr_u8 = ctypes.POINTER(ctypes.c_ubyte)
    ptr_f = ctypes.POINTER(c_f)
    ptr_d = ctypes.POINTER(c_d)
    ptr_ll = ctypes.POINTER(c_ll)

    lib.msn_inflate_gzip.restype = c_ll
    lib.msn_inflate_gzip.argtypes = [ptr_u8, c_ll, ptr_u8, c_ll]
    lib.msn_trilinear_resample.restype = None
    lib.msn_trilinear_resample.argtypes = [ptr_f, c_ll, c_ll, c_ll, c_ll, ptr_d, ptr_f, c_ll, c_ll, c_ll]
    lib.msn_nearest_resample.restype = None
    lib.msn_nearest_resample.argtypes = lib.msn_trilinear_resample.argtypes
    lib.msn_scale_intensity.restype = None
    lib.msn_scale_intensity.argtypes = [ptr_f, c_ll, c_f, c_f, c_f, c_f, ctypes.c_int]
    lib.msn_znorm_nonzero.restype = None
    lib.msn_znorm_nonzero.argtypes = [ptr_f, c_ll]
    lib.msn_foreground_bbox.restype = ctypes.c_int
    lib.msn_foreground_bbox.argtypes = [ptr_f, c_ll, c_ll, c_ll, c_ll, c_f, ptr_ll]
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def inflate_gzip(data: bytes, out_size: int) -> bytes | None:
    lib = load()
    if lib is None:
        return None
    out = np.empty(out_size, dtype=np.uint8)
    n = lib.msn_inflate_gzip(
        (ctypes.c_ubyte * len(data)).from_buffer_copy(data),
        len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out_size,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def trilinear_resample(src: np.ndarray, matrix: np.ndarray, out_shape) -> np.ndarray | None:
    """src (X,Y,Z,C) float32 C-order; matrix 3x4 dst-voxel -> src-voxel."""
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.float32)
    m = np.ascontiguousarray(matrix, dtype=np.float64).reshape(12)
    dst = np.empty(tuple(out_shape) + (src.shape[3],), dtype=np.float32)
    lib.msn_trilinear_resample(
        _fptr(src), *src.shape[:3], src.shape[3],
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _fptr(dst), *dst.shape[:3],
    )
    return dst


def nearest_resample(src: np.ndarray, matrix: np.ndarray, out_shape) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.float32)
    m = np.ascontiguousarray(matrix, dtype=np.float64).reshape(12)
    dst = np.empty(tuple(out_shape) + (src.shape[3],), dtype=np.float32)
    lib.msn_nearest_resample(
        _fptr(src), *src.shape[:3], src.shape[3],
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _fptr(dst), *dst.shape[:3],
    )
    return dst


def scale_intensity(data: np.ndarray, a_min, a_max, b_min, b_max, clip=True) -> bool:
    """In-place windowed rescale; returns False if native lib unavailable."""
    lib = load()
    if lib is None or data.dtype != np.float32 or not data.flags.c_contiguous:
        return False
    lib.msn_scale_intensity(_fptr(data), data.size, a_min, a_max, b_min, b_max, int(clip))
    return True


def znorm_nonzero(data: np.ndarray) -> bool:
    lib = load()
    if lib is None or data.dtype != np.float32 or not data.flags.c_contiguous:
        return False
    lib.msn_znorm_nonzero(_fptr(data), data.size)
    return True


def foreground_bbox(data: np.ndarray, threshold: float = 0.0):
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(data, dtype=np.float32)
    if src.ndim == 3:
        src = src[..., None]
    bbox = np.zeros(6, dtype=np.int64)
    found = lib.msn_foreground_bbox(
        _fptr(src), *src.shape[:3], src.shape[3], threshold,
        bbox.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
    )
    return bbox if found else None
