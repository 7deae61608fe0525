"""Smoothed-aggregation AMG preconditioner: host setup, device V-cycle.

The reference preconditions CG with AlgebraicMultigrid.jl's smoothed
aggregation (Gauss-Seidel smoothers, pinv coarse solve; src/core.jl:
164-167).  Gauss-Seidel is inherently sequential, so the TPU V-cycle
uses weighted-Jacobi smoothing instead — only the final residual is
tested (src/core.jl:640-642), and SA+Jacobi-CG converges to the same
answers with a comparable iteration count.

Setup (aggregation, tentative prolongator, prolongator smoothing,
Galerkin RAP SpGEMM) runs ONCE per connected component on the host in
scipy — the same host/device split the reference uses, where setup
lives in Julia and the hot loop in BLAS.  The resulting hierarchy is
converted to device-resident ELL operators; grid-transfer operators are
ELL in both directions; the coarsest level is a dense pseudo-inverse
applied on the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from .operators import (EllMatrix, ell_from_csr, ell_matvec,
                         ell_matvec_rect)


@jax.tree_util.register_pytree_node_class
@dataclass
class AmgLevel:
    A: EllMatrix          # level operator
    inv_diag: jnp.ndarray  # Jacobi smoother weights (n_pad,)
    P: EllMatrix | None   # prolongator (n_pad x nc_pad as rectangular ELL)
    R: EllMatrix | None   # restriction = P^T
    omega: float

    def tree_flatten(self):
        return (self.A, self.inv_diag, self.P, self.R), (self.omega,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


@jax.tree_util.register_pytree_node_class
@dataclass
class AmgHierarchy:
    levels: tuple
    coarse_pinv: jnp.ndarray  # (nc_pad, nc_pad) dense pseudo-inverse

    def tree_flatten(self):
        return (self.levels, self.coarse_pinv), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _rect_ell(M: sp.spmatrix, n_pad_rows: int, dtype) -> EllMatrix:
    """Rectangular sparse matrix as gather-ELL with explicit zero diag
    (rows padded to n_pad_rows; column index space left unpadded —
    gather sources must already be padded by the caller)."""
    M = M.tocsr()
    n, m = M.shape
    coo = M.tocoo()
    order = np.lexsort((coo.col, coo.row))
    rows, cols, vals = coo.row[order], coo.col[order], coo.data[order]
    counts = np.bincount(rows, minlength=n)
    K = max(int(counts.max()) if counts.size else 0, 1)
    idx = np.zeros((n_pad_rows, K), np.int32)
    w = np.zeros((n_pad_rows, K), dtype)
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(rows.size) - starts[rows]
    idx[rows, pos] = cols.astype(np.int32)
    w[rows, pos] = vals.astype(dtype)
    diag = np.zeros(n_pad_rows, dtype)
    return EllMatrix(jnp.asarray(idx), jnp.asarray(w), jnp.asarray(diag), n)


def _standard_aggregation(A: sp.csr_matrix) -> np.ndarray:
    """Aggregation on the strength graph (all off-diagonal couplings of
    a Laplacian are 'strong'), fully vectorized: a randomized maximal
    independent set seeds the aggregates (Luby rounds, each one scipy
    row-max over the adjacency), then every other node joins its
    highest-priority neighboring seed.  O(nnz * rounds) with ~O(log n)
    rounds — this is the step that would be a sequential greedy loop in
    a CPU AMG package."""
    n = A.shape[0]
    coo = A.tocoo()
    offd = coo.col != coo.row
    rows, cols = coo.row[offd], coo.col[offd]
    adj = sp.csr_matrix((np.ones(rows.size), (rows, cols)), shape=(n, n))

    rng = np.random.default_rng(0)
    pri = rng.permutation(n).astype(np.float64) + 1.0
    state = np.zeros(n, np.int8)  # 0 undecided, 1 seed, 2 dominated

    M = adj.copy()
    for _ in range(64):
        und = state == 0
        if not und.any():
            break
        p = np.where(und, pri, 0.0)
        M.data = p[M.indices]
        nbr_max = np.asarray(M.max(axis=1).todense()).ravel()
        new_seeds = und & (p > nbr_max)
        state[new_seeds] = 1
        # dominate undecided neighbors of the new seeds
        touched = adj @ new_seeds.astype(np.float64)
        state[(state == 0) & (touched > 0)] = 2

    seeds = np.nonzero(state == 1)[0]
    agg = -np.ones(n, np.int64)
    agg[seeds] = np.arange(seeds.size)

    # attach each dominated node to its max-priority neighboring seed
    seed_pri = np.where(state == 1, pri, 0.0)
    M.data = seed_pri[M.indices]
    best = np.asarray(M.argmax(axis=1)).ravel()
    dominated = state == 2
    agg[dominated] = agg[best[dominated]]
    return agg


def _estimate_rho(A: sp.csr_matrix, Dinv: np.ndarray, iters=10) -> float:
    """Power-iteration estimate of rho(D^-1 A)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[0])
    x /= np.linalg.norm(x) + 1e-30
    rho = 2.0
    for _ in range(iters):
        y = Dinv * (A @ x)
        nrm = np.linalg.norm(y)
        if nrm == 0:
            return 2.0
        rho = nrm
        x = y / nrm
    return float(rho)


def build_amg(A: sp.spmatrix, A_ell: EllMatrix, dtype,
              max_levels=12, coarse_size=64):
    """Build the SA hierarchy on the host; returns an AmgHierarchy of
    device-resident operators."""
    levels = []
    Acur = A.tocsr().astype(np.float64)
    n_pad_cur = A_ell.n_pad
    ell_cur = A_ell

    while len(levels) < max_levels and Acur.shape[0] > coarse_size:
        d = Acur.diagonal()
        dinv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1.0)

        agg = _standard_aggregation(Acur)
        nc = int(agg.max()) + 1
        if nc >= Acur.shape[0]:
            break  # no coarsening progress

        # tentative prolongator: piecewise constant, column-normalized
        P0 = sp.coo_matrix((np.ones(len(agg)),
                            (np.arange(len(agg)), agg)),
                           shape=(Acur.shape[0], nc)).tocsr()
        colnorm = np.sqrt(np.asarray(P0.multiply(P0).sum(axis=0))).ravel()
        P0 = P0 @ sp.diags(1.0 / np.where(colnorm == 0, 1.0, colnorm))

        # smoothed prolongator: (I - omega D^-1 A) P0
        rho = _estimate_rho(Acur, dinv)
        omega = 4.0 / 3.0 / max(rho, 1e-12)
        P = P0 - sp.diags(omega * dinv) @ (Acur @ P0)
        R = P.T.tocsr()
        Anext = (R @ Acur @ P).tocsr()

        nc_pad = max(8, 1 << (nc - 1).bit_length())
        ell_next = ell_from_csr(Anext, dtype)
        # Jacobi smoother weight for this level
        jac_omega = 2.0 / 3.0 / max(_estimate_rho(Acur, dinv), 1e-12)
        inv_diag = np.ones(n_pad_cur, dtype)
        inv_diag[:len(dinv)] = (jac_omega * dinv).astype(dtype)

        levels.append(AmgLevel(
            A=ell_cur,
            inv_diag=jnp.asarray(inv_diag),
            P=_rect_ell(P, n_pad_cur, dtype),
            R=_rect_ell(R, ell_next.n_pad, dtype),
            omega=float(jac_omega),
        ))
        Acur = Anext
        ell_cur = ell_next
        n_pad_cur = ell_next.n_pad

    # coarsest level: dense pseudo-inverse (pinv coarse solve parity)
    nc_pad = n_pad_cur
    dense = np.zeros((nc_pad, nc_pad), np.float64)
    dense[:Acur.shape[0], :Acur.shape[1]] = Acur.toarray()
    # padding rows get identity so the pinv stays benign
    for k in range(Acur.shape[0], nc_pad):
        dense[k, k] = 1.0
    pinv = np.linalg.pinv(dense).astype(dtype)

    return AmgHierarchy(tuple(levels), jnp.asarray(pinv))


def _level_vcycle(hier: AmgHierarchy, lvl: int, b: jnp.ndarray) -> jnp.ndarray:
    """Recursive V(1,1) cycle with weighted-Jacobi smoothing; unrolled
    over the (static) hierarchy depth at trace time."""
    if lvl == len(hier.levels):
        return hier.coarse_pinv @ b
    L = hier.levels[lvl]
    # pre-smooth: x = omega D^-1 b; one Jacobi sweep from zero
    x = L.inv_diag[:, None] * b
    r = b - ell_matvec(L.A, x)
    rc = ell_matvec_rect(L.R, r)
    xc = _level_vcycle(hier, lvl + 1, rc)
    x = x + ell_matvec_rect(L.P, xc)
    # post-smooth
    r = b - ell_matvec(L.A, x)
    x = x + L.inv_diag[:, None] * r
    return x


def amg_apply(hier: AmgHierarchy, R: jnp.ndarray) -> jnp.ndarray:
    """Preconditioner application M^-1 R for the batched CG."""
    return _level_vcycle(hier, 0, R)
