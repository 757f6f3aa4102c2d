"""ctypes bindings for the native A* router (native/astar.cpp).

The C++ router is ~100x faster than per-cell Python on large occupancy grids; the
pure-Python implementation in astar.py remains as the fallback when the toolchain is
unavailable. The shared library is built on first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libastar.so")
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            src = os.path.join(_NATIVE_DIR, "astar.cpp")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.astar_grid.restype = ctypes.c_int
        lib.astar_grid.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.occupancy_downsample.restype = None
        lib.occupancy_downsample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def astar_native(
    grid: np.ndarray, start: Tuple[int, int], goal: Tuple[int, int]
) -> Optional[List[Tuple[int, int]]]:
    """8-connected A* on a bool grid (True = blocked). Returns cell path or None."""
    lib = _load()
    if lib is None:
        return None
    g = np.ascontiguousarray(grid.astype(np.uint8))
    h, w = g.shape
    max_path = h * w
    out = np.zeros((max_path, 2), np.int32)
    n = lib.astar_grid(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        int(start[0]), int(start[1]), int(goal[0]), int(goal[1]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_path,
    )
    if n <= 0:
        return None
    return [tuple(p) for p in out[:n]]


def occupancy_downsample_native(
    mask: np.ndarray, scale: int, blocked_fraction: float
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask.astype(np.float32))
    h, w = m.shape
    gh, gw = h // scale, w // scale
    out = np.zeros((gh, gw), np.uint8)
    lib.occupancy_downsample(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        scale, float(blocked_fraction),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), gh, gw,
    )
    return out > 0
