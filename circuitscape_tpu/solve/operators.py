"""Device-resident sparse operators for the solve path.

The graph Laplacians produced by graph/build.py are ELL-converted here:
a fixed-width padded neighbor table (idx, w) plus a separate diagonal.
Raster stencil graphs have <= 8 neighbors per node, so ELL is near-dense
and SpMV becomes a gather + fused multiply-add that XLA tiles onto the
VPU with perfect HBM streaming; polygon-collapsed supernodes and network
graphs just widen K.  This replaces the reference's CSR SpMV inside
Krylov.cg (src/core.jl:636-643) with a TPU-friendly layout.

Shapes are bucketed (rows to powers of two, width to multiples of 4) so
jit compiles a small number of kernel variants across a test corpus of
many tiny grids.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp


def _bucket_rows(n: int) -> int:
    return max(8, 1 << math.ceil(math.log2(max(n, 1))))


def _bucket_width(k: int) -> int:
    return max(4, -(-k // 4) * 4)


@jax.tree_util.register_pytree_node_class
@dataclass
class EllMatrix:
    """Padded ELL sparse matrix: A = diag + scatter(w at idx).

    idx:  (n_pad, K) int32 gather indices (self-index on padding slots)
    w:    (n_pad, K) values (0 on padding slots)
    diag: (n_pad,)   diagonal (1 on padding rows, keeping A SPD)
    n:    true (unpadded) dimension
    """

    idx: jnp.ndarray
    w: jnp.ndarray
    diag: jnp.ndarray
    n: int

    def tree_flatten(self):
        return (self.idx, self.w, self.diag), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def n_pad(self) -> int:
        return self.diag.shape[0]

    @property
    def nnz(self) -> int:
        return int(self.n + np.count_nonzero(np.asarray(self.w)))


def ell_from_csr(L: sp.spmatrix, dtype=None) -> EllMatrix:
    """Convert a CSR/CSC sparse matrix (diag + off-diag) to padded ELL."""
    L = L.tocsr()
    n = L.shape[0]
    dtype = dtype or L.dtype
    d = L.diagonal().astype(dtype)

    coo = (L - sp.diags(L.diagonal())).tocoo()
    coo.eliminate_zeros()
    order = np.lexsort((coo.col, coo.row))
    rows, cols, vals = coo.row[order], coo.col[order], coo.data[order]
    counts = np.bincount(rows, minlength=n)
    K = int(counts.max()) if counts.size else 0

    n_pad = _bucket_rows(n)
    K_pad = _bucket_width(K)

    idx = np.tile(np.arange(n_pad, dtype=np.int32)[:, None], (1, K_pad))
    w = np.zeros((n_pad, K_pad), dtype)
    slot = np.zeros(n, np.int64)
    # slot position of each entry within its row
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(rows.size) - starts[rows]
    idx[rows, pos] = cols.astype(np.int32)
    w[rows, pos] = vals.astype(dtype)

    diag = np.ones(n_pad, dtype)
    diag[:n] = d
    return EllMatrix(jnp.asarray(idx), jnp.asarray(w), jnp.asarray(diag), n)


def ell_matvec(A: EllMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """Batched SpMV/SpMM: x is (n_pad, B); returns A @ x, (n_pad, B)."""
    gathered = x[A.idx]              # (n_pad, K, B)
    y = jnp.einsum("nk,nkb->nb", A.w, gathered)
    return A.diag[:, None] * x + y


def ell_matvec_rect(A: EllMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """Rectangular gather-ELL apply (no diagonal term): x may have any
    row count >= max(A.idx); returns (rows_pad, B).  Used for AMG
    grid-transfer operators (solve/amg.py)."""
    return jnp.einsum("nk,nkb->nb", A.w, x[A.idx])


def pad_rhs(b: np.ndarray, n_pad: int) -> np.ndarray:
    """Zero-pad RHS (n, B) to (n_pad, B)."""
    n, B = b.shape
    if n == n_pad:
        return b
    out = np.zeros((n_pad, B), b.dtype)
    out[:n] = b
    return out
