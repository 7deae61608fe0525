"""ctypes binding for the native C++ sparse Cholesky (native/cholesky.cpp).

The direct tier's equivalent of the reference's CHOLMOD dependency:
factorize once per component, back-substitute batched multi-RHS blocks
(src/core.jl:519-523, :446-493).  The library provides a supernodal
BLAS-3 factorization (dense kernels come from scipy's bundled OpenBLAS,
located here and handed over via chol_set_blas) and a native level-set
nested-dissection fill-reducing ordering (chol_order) — the roles AMD/
METIS and the BLAS play inside CHOLMOD.

Builds lazily with `make` on first use; DirectContext falls back to
scipy SuperLU if the shared library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np
import scipy.sparse as sp


_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcschol.so")

_lib = None


def _find_blas() -> str | None:
    """Locate a dense BLAS shared library to power the supernodal
    engine; scipy wheels bundle OpenBLAS (symbols scipy_dgemm_ etc)."""
    import glob

    import scipy
    libs_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(scipy.__file__))), "scipy.libs")
    hits = sorted(glob.glob(os.path.join(libs_dir, "*openblas*.so*")))
    return hits[0] if hits else None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.chol_set_blas.restype = ctypes.c_int
    lib.chol_set_blas.argtypes = [ctypes.c_char_p]
    blas = _find_blas()
    if blas is not None:
        lib.chol_set_blas(blas.encode())
    lib.chol_factorize.restype = ctypes.c_void_p
    lib.chol_factorize.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]
    lib.chol_solve.restype = None
    lib.chol_solve.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
    ]
    lib.chol_nnz.restype = ctypes.c_int64
    lib.chol_nnz.argtypes = [ctypes.c_void_p]
    lib.chol_order.restype = None
    lib.chol_order.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]
    lib.chol_free.restype = None
    lib.chol_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    """True when the native library loads (builds lazily on first call)."""
    try:
        _load()
        return True
    except Exception:
        return False


class NativeCholesky:
    """Factorization of an SPD sparse matrix via the native library."""

    def __init__(self, matrix: sp.spmatrix):
        lib = _load()
        A = matrix.tocsc().astype(np.float64)
        n = A.shape[0]
        perm = np.empty(n, np.int64)
        indptr = np.ascontiguousarray(A.indptr, np.int64)
        indices = np.ascontiguousarray(A.indices, np.int64)
        lib.chol_order(np.int64(n), indptr, indices, perm)
        self.perm = perm
        # the permutation is applied inside the library (no host-side
        # symmetric permute / matrix copy)
        self._handle = lib.chol_factorize(
            np.int64(n), indptr, indices,
            np.ascontiguousarray(A.data, np.float64), perm)
        if not self._handle:
            raise RuntimeError("native Cholesky: matrix not positive definite")
        self.n = n
        self.nnz_L = lib.chol_nnz(self._handle)

    def solve(self, b: np.ndarray) -> np.ndarray:
        lib = _load()
        one_d = b.ndim == 1
        B = b.reshape(-1, 1) if one_d else b
        Bp = np.array(B, np.float64, order="C")  # always a fresh copy
        lib.chol_solve(self._handle, Bp, np.int64(Bp.shape[1]))
        return Bp[:, 0] if one_d else Bp

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                _load().chol_free(self._handle)
        except Exception:
            pass
