"""ctypes bindings for the native host preprocessing library.

Compiles ``csrc/host_preprocess.cpp`` on first use (g++ -O3 -fopenmp,
cached next to the source) and exposes:
  * ``read_nifti(path)``            — multithreaded NIfTI decode
  * ``zoom(vol, size, order)``      — OpenMP trilinear/nearest resample
  * ``clip_zscore(vol, lo, hi)``    — exact percentile clip + z-score

Every entry point silently falls back to the pure-Python implementations
(``data.nifti`` / scipy) when the toolchain or library is unavailable,
so the framework never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "csrc", "host_preprocess.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libhostpre.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
           "-fPIC", _SRC, "-o", _LIB_PATH, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.info("native host-preprocess build failed (%s); using "
                    "Python fallback", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            # containers often report nproc=1 from cgroup quota while
            # more cores are usable; libgomp then defaults to 1 thread
            os.environ.setdefault("OMP_NUM_THREADS", "8")
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH)
                    < os.path.getmtime(_SRC)):
                if not _build():
                    return None
            lib = ctypes.CDLL(_LIB_PATH)
            lib.nifti_read_f32.restype = ctypes.c_int64
            lib.nifti_read_f32.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32)]
            lib.zoom_trilinear_f32.restype = None
            lib.zoom_nearest_f32.restype = None
            zoom_args = [ctypes.c_void_p] + [ctypes.c_int32] * 3 + \
                        [ctypes.c_void_p] + [ctypes.c_int32] * 3
            lib.zoom_trilinear_f32.argtypes = zoom_args
            lib.zoom_nearest_f32.argtypes = zoom_args
            lib.clip_zscore_f32.restype = ctypes.c_int
            lib.clip_zscore_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_float,
                ctypes.c_float, ctypes.c_float]
            lib.host_threads.restype = ctypes.c_int
            _lib = lib
            logger.info("native host-preprocess loaded (%d threads)",
                        lib.host_threads())
        except Exception as e:
            logger.info("native host-preprocess unavailable: %s", e)
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def read_nifti(path: str) -> Optional[np.ndarray]:
    """Decode a (little-endian, <=3D) NIfTI to float32 (D,H,W-style
    array with NIfTI axis order); None if unsupported -> caller falls
    back to the Python codec."""
    lib = get_lib()
    if lib is None:
        return None
    shape = (ctypes.c_int32 * 3)()
    count = lib.nifti_read_f32(path.encode(), None, 0, shape)
    # header-only shape queries cannot bounds-check the data section,
    # so a lying dim field could otherwise drive a huge host allocation
    # (int16 dims allow up to 32767^3 ~ 140 TB of f32); the largest
    # legitimate volume here is ~14 Mvox — cap with wide headroom
    if count <= 0 or count > (1 << 30):
        return None
    buf = np.empty(count, np.float32)
    got = lib.nifti_read_f32(
        path.encode(), buf.ctypes.data_as(ctypes.c_void_p), count, shape)
    if got != count:
        return None
    try:
        # NIfTI stores x-fastest; view as (x,y,z) F-order == (z,y,x)
        # C-order. The contract is None-on-unsupported (caller falls
        # back to the Python codec) — a corrupt header must not raise.
        return np.ascontiguousarray(
            buf.reshape((shape[2], shape[1], shape[0]))).transpose(2, 1, 0)
    except ValueError:
        return None


def zoom(vol: np.ndarray, size: Tuple[int, int, int],
         order: int = 1) -> Optional[np.ndarray]:
    """Resample C-contiguous (a,b,c) float32 volume to ``size``."""
    lib = get_lib()
    # only orders 0 (nearest) and 1 (trilinear) exist natively; higher
    # spline orders must fall back to scipy, not silently degrade to
    # linear (results would depend on whether g++ was available)
    if lib is None or vol.ndim != 3 or order not in (0, 1):
        return None
    src = np.ascontiguousarray(vol, np.float32)
    out = np.empty(tuple(size), np.float32)
    # C-order (a,b,c): minor axis is c == native 'x'
    fn = lib.zoom_trilinear_f32 if order == 1 else lib.zoom_nearest_f32
    fn(src.ctypes.data_as(ctypes.c_void_p),
       src.shape[2], src.shape[1], src.shape[0],
       out.ctypes.data_as(ctypes.c_void_p),
       size[2], size[1], size[0])
    return out


def clip_zscore(vol: np.ndarray, p_lo: float = 1.0, p_hi: float = 99.0,
                eps: float = 1e-8) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    # one copy (in-place C call needs owned contiguous f32; an
    # ascontiguousarray().copy() chain duplicated the volume twice)
    buf = np.array(vol, np.float32, order="C")
    rc = lib.clip_zscore_f32(buf.ctypes.data_as(ctypes.c_void_p),
                             buf.size, p_lo, p_hi, eps)
    if rc != 0:
        # native path failed mid-flight (e.g. bad_alloc); the buffer is
        # NOT normalized — signal the caller to use the Python fallback
        logger.warning("native clip_zscore failed (rc=%d); falling back",
                       rc)
        return None
    return buf
