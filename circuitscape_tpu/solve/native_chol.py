"""ctypes binding for the native C++ sparse Cholesky (native/cholesky.cpp).

The direct tier's equivalent of the reference's CHOLMOD dependency:
factorize once per component, back-substitute batched multi-RHS blocks
(src/core.jl:519-523, :446-493).  A reverse-Cuthill-McKee fill-reducing
permutation is computed host-side (setup work, matching the reference's
delegation of ordering to the CHOLMOD library).

Builds lazily with `make` on first use; DirectContext falls back to
scipy SuperLU if the shared library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcschol.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.chol_factorize.restype = ctypes.c_void_p
    lib.chol_factorize.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    lib.chol_solve.restype = None
    lib.chol_solve.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.float64, flags="F_CONTIGUOUS"),
        ctypes.c_int64,
    ]
    lib.chol_nnz.restype = ctypes.c_int64
    lib.chol_nnz.argtypes = [ctypes.c_void_p]
    lib.chol_free.restype = None
    lib.chol_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _bfs_levels_local(adj: sp.csr_matrix, start: int) -> np.ndarray:
    """BFS level per node from start (-1 = unreached), frontier sweeps
    using indptr/indices directly (no dense matvec)."""
    n = adj.shape[0]
    indptr, indices = adj.indptr, adj.indices
    levels = np.full(n, -1, np.int64)
    frontier = np.asarray([start])
    levels[start] = 0
    d = 0
    while frontier.size:
        d += 1
        starts = indptr[frontier]
        counts = indptr[frontier + 1] - starts
        total = int(counts.sum())
        if total == 0:
            break
        offsets = np.repeat(np.cumsum(counts) - counts, counts)
        flat = np.repeat(starts, counts) + (np.arange(total) - offsets)
        nbrs = np.unique(indices[flat])
        nbrs = nbrs[levels[nbrs] == -1]
        levels[nbrs] = d
        frontier = nbrs
    return levels


def nested_dissection(A: sp.spmatrix, min_size: int = 128) -> np.ndarray:
    """Level-set nested dissection: recursive BFS bisection with the
    median level as separator, separator ordered last.  A simple
    fill-reducing ordering that beats RCM several-fold on grid-like
    graphs (the common Circuitscape case) — the native direct tier's
    analogue of CHOLMOD's AMD/METIS step.  Each recursion level works
    on an extracted subgraph, so total cost is O(nnz log n)."""
    A = A.tocsr()
    n = A.shape[0]
    adj0 = A.copy()
    adj0.data = np.ones_like(adj0.data)

    order_out = np.empty(n, np.int64)
    pos = 0
    post = []  # separators (global ids), appended in recursion order

    # stack of (global_ids, subgraph_csr)
    stack = [(np.arange(n), adj0)]
    while stack:
        nodes, adj = stack.pop()
        m = len(nodes)
        if m <= min_size:
            local = np.asarray(reverse_cuthill_mckee(
                adj.tocsc(), symmetric_mode=True))
            order_out[pos:pos + m] = nodes[local]
            pos += m
            continue
        lv = _bfs_levels_local(adj, 0)
        if (lv < 0).any():
            reached = lv >= 0
            comp_ids = np.nonzero(reached)[0]
            rest_ids = np.nonzero(~reached)[0]
            stack.append((nodes[rest_ids], adj[rest_ids][:, rest_ids]))
            stack.append((nodes[comp_ids], adj[comp_ids][:, comp_ids]))
            continue
        far = int(np.argmax(lv))
        lv = _bfs_levels_local(adj, far)
        maxlv = int(lv.max())
        if maxlv < 2:
            local = np.asarray(reverse_cuthill_mckee(
                adj.tocsc(), symmetric_mode=True))
            order_out[pos:pos + m] = nodes[local]
            pos += m
            continue
        mid = maxlv // 2
        sep = lv == mid
        left = lv < mid
        right = lv > mid
        post.append(nodes[sep])
        li = np.nonzero(left)[0]
        ri = np.nonzero(right)[0]
        stack.append((nodes[li], adj[li][:, li]))
        stack.append((nodes[ri], adj[ri][:, ri]))

    for sep in reversed(post):
        order_out[pos:pos + len(sep)] = sep
        pos += len(sep)
    assert pos == n
    return order_out


class NativeCholesky:
    """Factorization of an SPD sparse matrix via the native library."""

    def __init__(self, matrix: sp.spmatrix):
        lib = _load()
        A = matrix.tocsc().astype(np.float64)
        if A.shape[0] > 4096:
            perm = nested_dissection(A)
        else:
            perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True),
                              np.int64)
        self.perm = perm
        n = A.shape[0]
        P = sp.csr_matrix((np.ones(n), (np.arange(n), perm)), shape=(n, n))
        Ap = (P @ A @ P.T).tocsc()
        Ap.sort_indices()
        self._handle = lib.chol_factorize(
            np.int64(Ap.shape[0]),
            np.ascontiguousarray(Ap.indptr, np.int64),
            np.ascontiguousarray(Ap.indices, np.int64),
            np.ascontiguousarray(Ap.data, np.float64))
        if not self._handle:
            raise RuntimeError("native Cholesky: matrix not positive definite")
        self.n = Ap.shape[0]
        self.nnz_L = lib.chol_nnz(self._handle)

    def solve(self, b: np.ndarray) -> np.ndarray:
        lib = _load()
        one_d = b.ndim == 1
        B = b.reshape(-1, 1) if one_d else b
        Bp = np.asfortranarray(B[self.perm], np.float64)
        lib.chol_solve(self._handle, Bp, np.int64(Bp.shape[1]))
        out = np.empty_like(Bp)
        out[self.perm] = Bp
        return out[:, 0] if one_d else out

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                _load().chol_free(self._handle)
        except Exception:
            pass
