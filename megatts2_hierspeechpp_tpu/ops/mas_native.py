"""ctypes binding for the native C++/OpenMP MAS kernel (native/mas.cpp).

Compiled lazily with g++ on first use (cached as libmas.so next to the source);
see ops/monotonic_align.py for the TPU-resident JAX variant.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "mas.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libmas.so")


@lru_cache(maxsize=1)
def _load():
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
        )
    lib = ctypes.CDLL(_LIB)
    lib.maximum_path_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    return lib


def maximum_path(values: np.ndarray, t_ys: np.ndarray, t_xs: np.ndarray) -> np.ndarray:
    """values: (B, T_y, T_x) float32; returns {0,1} int32 paths."""
    lib = _load()
    values = np.ascontiguousarray(values, np.float32).copy()
    b, t_y, t_x = values.shape
    paths = np.zeros((b, t_y, t_x), np.int32)
    t_ys = np.ascontiguousarray(t_ys, np.int32)
    t_xs = np.ascontiguousarray(t_xs, np.int32)
    lib.maximum_path_batch(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t_y, t_x,
    )
    return paths
