"""ctypes binding for the native text-raster formatter (native/fastio.cpp).

The maps-on pairwise path writes hundreds of per-pair ASCII grids;
Python-level "%.12g" formatting costs ~1 s per 1M-cell map.  The native
body writer produces identical text (both are C printf "%.12g") at ~10x
the throughput and releases the GIL, so a writer thread overlaps the
device solve.  Falls back to None when the library can't build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcsio.so")

_lib = None
_tried = False


def load():
    """The loaded library, or None if unavailable (pure-Python path)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR, "libcsio.so"],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.csio_write_asc_body.restype = ctypes.c_longlong
        lib.csio_write_asc_body.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.csio_write_asc_body_fast.restype = ctypes.c_longlong
        lib.csio_write_asc_body_fast.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.csio_write_asc_body_f32.restype = ctypes.c_longlong
        lib.csio_write_asc_body_f32.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.csio_write_dlm.restype = ctypes.c_longlong
        lib.csio_write_dlm.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_char,
        ]
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.csio_node_currents_f32.restype = ctypes.c_longlong
        lib.csio_node_currents_f32.argtypes = [
            f32p, f32p, f32p, f32p, f32p, f32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def write_dlm_body(path: str, arr: np.ndarray, delim: str,
                   digits: int = 17) -> bool:
    """Whole-file delimited f64 matrix write (`digits` significant
    digits; 17 = exact double round-trip); True on success."""
    lib = load()
    if lib is None or len(delim) != 1:
        return False
    a = np.ascontiguousarray(arr, np.float64)
    n = lib.csio_write_dlm(path.encode(), a, np.int64(a.shape[0]),
                           np.int64(a.shape[1]), int(digits),
                           delim.encode())
    return n >= 0


def node_currents_f32(planes, V: np.ndarray, cutoff=1e-8):
    """Native node currents for one (H, W) f32 voltage map; None when
    the library is unavailable (caller falls back to the numpy
    implementation, solve/stencil.py node_currents_np — both encode
    the max(inflow, outflow) / cutoff*max-branch semantics of
    src/out.jl:178-290)."""
    lib = load()
    if lib is None:
        return None
    V = np.ascontiguousarray(V, np.float32)
    H, W = V.shape
    out = np.empty((H, W), np.float32)
    we, ws, wse, wne = (np.ascontiguousarray(p, np.float32)
                        for p in planes[:4])
    lib.csio_node_currents_f32(we, ws, wse, wne, V, out,
                               np.int64(H), np.int64(W),
                               np.float32(cutoff))
    return out


def write_asc_body(path: str, arr: np.ndarray) -> bool:
    """Append the grid body to path; True on success.

    float64 input emits 12 significant digits, float32 emits 9 (the
    f32 round-trip width) — both through the table-driven formatter in
    native/fastio.cpp (~30 ns/value vs ~350 ns for snprintf %.12g; the
    last digit may differ from printf by one, relative ~1e-11/1e-8,
    far below the 1e-6 output tolerance, src/out.jl:119-121)."""
    lib = load()
    if lib is None:
        return False
    if arr.dtype == np.float32:
        a = np.ascontiguousarray(arr)
        n = lib.csio_write_asc_body_f32(path.encode(), a,
                                        np.int64(a.shape[0]),
                                        np.int64(a.shape[1]), 9)
    else:
        a = np.ascontiguousarray(arr, np.float64)
        n = lib.csio_write_asc_body_fast(path.encode(), a,
                                         np.int64(a.shape[0]),
                                         np.int64(a.shape[1]), 12)
    return n >= 0
