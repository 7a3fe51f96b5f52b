"""ctypes binding for the native C++/OpenMP MAS kernel (native/mas.cpp).

Always compiled from source with the local toolchain, cached in a temp dir
keyed on a hash of mas.cpp (no prebuilt binaries are shipped or trusted);
see ops/monotonic_align.py for the TPU-resident JAX variant.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "mas.cpp")


@lru_cache(maxsize=1)
def _load():
    with open(_SRC, "rb") as f:
        src_hash = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), "megatts2_native")
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, f"libmas-{src_hash}.so")
    if not os.path.exists(lib_path):
        tmp = lib_path + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", tmp],
            check=True,
        )
        os.replace(tmp, lib_path)  # atomic vs concurrent test workers
    lib = ctypes.CDLL(lib_path)
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
