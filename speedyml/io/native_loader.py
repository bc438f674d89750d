"""ctypes bindings for the native IO runtime (native/speedy_io.cpp).

Builds the shared library lazily with the in-tree Makefile on first use and
falls back to pure numpy when no toolchain is available, so the framework
stays importable everywhere. The native paths replace the reference's
NetCDF-C/MPI-IO reader stack (mod_io.f90:1905-2282) for this framework's
raw-cache formats.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libspeedy_io.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.si_read_records.restype = ctypes.c_int64
        lib.si_read_records.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
        lib.si_stream_open.restype = ctypes.c_void_p
        lib.si_stream_open.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                       ctypes.c_int64]
        lib.si_stream_close.restype = None
        lib.si_stream_close.argtypes = [ctypes.c_void_p]
        lib.si_stream_gather.restype = ctypes.c_int
        lib.si_stream_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.si_mem_gather.restype = ctypes.c_int
        lib.si_mem_gather.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def read_records_native(path: str, ix: int, il: int) -> Optional[np.ndarray]:
    """Native fort.2x decode; None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    nbytes = os.path.getsize(path)
    nrec = nbytes // (ix * il * 4)
    if nrec * ix * il * 4 != nbytes:
        raise ValueError(f"{path}: not a whole number of ({il},{ix}) records")
    out = np.empty((nrec, il, ix), np.float64)
    got = lib.si_read_records(
        path.encode(), ix, il,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nrec)
    if got < 0:
        raise OSError(f"si_read_records failed on {path}")
    return out[:got]


class GvStream:
    """Out-of-core training-series cache: a raw float32 (T, width) file
    served by the native mmap+threads gather (the per-region halo hyperslab
    read, read_era_data_parallel mod_io.f90:1905-2036)."""

    def __init__(self, path: str, T: int, width: int):
        self.path = path
        self.T = T
        self.width = width
        self._lib = get_lib()
        self._h = None
        if self._lib is not None:
            h = self._lib.si_stream_open(path.encode(), T, width)
            self._h = h if h else None
        if self._h is None:
            # numpy memmap fallback
            self._mm = np.memmap(path, dtype=np.float32, mode="r",
                                 shape=(T, width))

    @staticmethod
    def write_cache(path: str, series: np.ndarray) -> "GvStream":
        series = np.ascontiguousarray(series, np.float32)
        series.tofile(path)
        return GvStream(path, series.shape[0], series.shape[1])

    def gather(self, idx: np.ndarray, t0: int, nt: int) -> np.ndarray:
        """(nt, *idx.shape) float32 block: out[t] = series[t0+t, idx]."""
        idx32 = np.ascontiguousarray(idx, np.int32)
        out = np.empty((nt,) + idx32.shape, np.float32)
        if self._h is not None:
            rc = self._lib.si_stream_gather(
                self._h, idx32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                int(np.prod(idx32.shape[:-1], initial=1)), idx32.shape[-1],
                t0, nt, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if rc != 0:
                raise IndexError(f"gather out of bounds: t0={t0} nt={nt}")
            return out
        out[:] = self._mm[t0:t0 + nt][:, idx32]
        return out

    def close(self):
        if self._h is not None and self._lib is not None:
            self._lib.si_stream_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def mem_gather(series: np.ndarray, idx: np.ndarray, t0: int, nt: int
               ) -> np.ndarray:
    """Threaded gather from an in-memory float32 series; numpy fallback."""
    lib = get_lib()
    idx32 = np.ascontiguousarray(idx, np.int32)
    if lib is None or series.dtype != np.float32 or not series.flags.c_contiguous:
        return np.asarray(series[t0:t0 + nt][:, idx32], np.float32)
    out = np.empty((nt,) + idx32.shape, np.float32)
    rc = lib.si_mem_gather(
        series.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        series.shape[0], series.shape[1],
        idx32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(np.prod(idx32.shape[:-1], initial=1)), idx32.shape[-1],
        t0, nt, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IndexError(f"gather out of bounds: t0={t0} nt={nt}")
    return out
