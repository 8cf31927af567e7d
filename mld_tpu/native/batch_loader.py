"""ctypes binding + lazy build for the C++ batch loader."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cc")
_LIB = os.path.join(_HERE, "build", "libmldloader.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception:
        return None


def get_native_loader():
    """Load (building if needed) the shared library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if _build() is None:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.mld_load_batch.restype = ctypes.c_int
        lib.mld_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.mld_read_npy_header.restype = ctypes.c_int
        lib.mld_read_npy_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long)]
        _lib = lib
        return _lib


class NativeBatchLoader:
    """Assemble normalized padded motion batches straight from npy files.

    Bypasses per-sample Python: the crop/normalize/pad loop runs in C++
    threads writing directly into the output buffer.
    """

    def __init__(self, mean: np.ndarray, std: np.ndarray, max_len: int,
                 num_threads: int = 8):
        self.lib = get_native_loader()
        if self.lib is None:
            raise RuntimeError("native loader unavailable (no g++?)")
        self.mean = np.ascontiguousarray(mean, np.float32)
        self.std = np.ascontiguousarray(std, np.float32)
        self.nfeats = len(self.mean)
        self.max_len = max_len
        self.num_threads = num_threads

    def npy_shape(self, path: str):
        rows = ctypes.c_long()
        cols = ctypes.c_long()
        rc = self.lib.mld_read_npy_header(path.encode(), ctypes.byref(rows),
                                          ctypes.byref(cols))
        if rc != 0:
            raise IOError(f"bad npy {path} (rc={rc})")
        return int(rows.value), int(cols.value)

    def load(self, paths: Sequence[str], starts: Sequence[int],
             crops: Sequence[int]):
        n = len(paths)
        motion = np.zeros((n, self.max_len, self.nfeats), np.float32)
        lengths = np.zeros(n, np.int32)
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        c_starts = np.ascontiguousarray(starts, np.int32)
        c_crops = np.ascontiguousarray(crops, np.int32)
        rc = self.lib.mld_load_batch(
            c_paths, n,
            c_starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            c_crops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            self.max_len,
            self.mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.nfeats,
            motion.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            self.num_threads)
        if rc != 0:
            raise IOError("native batch load failed")
        return motion, lengths
