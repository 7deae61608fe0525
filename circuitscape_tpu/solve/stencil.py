"""Stencil operator: the TPU-native form of a raster graph Laplacian.

A raster habitat map produces a graph whose every node touches at most
8 fixed neighbors (src/raster/pairwise.jl:316-362 builds it as COO
triples).  On TPU we never build that sparse matrix for the solve:
the Laplacian is represented by 4 directed weight planes (E, S, SE, NE)
over the (H, W) grid plus a diagonal plane, and SpMV is a fused set of
shifted-plane multiply-adds over dense (H, W, B) voltage blocks — no
gathers, no indices, perfect HBM streaming, and the batch axis B maps
straight onto the MXU/VPU lanes.

All components of the grid solve SIMULTANEOUSLY: the operator is
block-diagonal across components, and CG iterates stay inside the
component that their RHS lives in, so per-component submatrix
extraction (src/core.jl:148-157) is unnecessary on the solve path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class StencilOperator:
    """Grid Laplacian as directed neighbor weight planes.

    we:   (H, W) weight to the East  neighbor (i, j)->(i, j+1); 0 in last col
    ws:   (H, W) weight to the South neighbor (i, j)->(i+1, j); 0 in last row
    wse:  (H, W) weight to the SE neighbor (i, j)->(i+1, j+1)
    wne:  (H, W) weight to the NE neighbor (i, j)->(i-1, j+1); 0 in first row
    diag: (H, W) Laplacian diagonal (sum of incident edge weights)
    """

    we: jnp.ndarray
    ws: jnp.ndarray
    wse: jnp.ndarray
    wne: jnp.ndarray
    diag: jnp.ndarray

    def tree_flatten(self):
        return (self.we, self.ws, self.wse, self.wne, self.diag), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.diag.shape

    @property
    def nnz(self) -> int:
        """Stored nonzeros of the equivalent sparse Laplacian."""
        planes = [self.we, self.ws, self.wse, self.wne]
        edges = sum(int(np.count_nonzero(np.asarray(p))) for p in planes)
        return 2 * edges + int(np.count_nonzero(np.asarray(self.diag)))


def _pad_plane(a: np.ndarray, H: int, W: int) -> np.ndarray:
    out = np.zeros((H, W), a.dtype)
    out[:a.shape[0], :a.shape[1]] = a
    return out


def stencil_from_gmap(gmap: np.ndarray, avg_res: bool, four_neighbors: bool,
                      dtype=np.float32) -> StencilOperator:
    """Build the weight planes from a conductance map, with the same four
    edge-weight rules as graph/build.py (res_avg/cond_avg/weird_avg/
    weirder_avg; src/raster/pairwise.jl:364-367).

    Only valid when no polygons collapse nodes (the stencil is then
    exactly the graph).  Cells with gmap <= 0 take no edges.
    """
    from ..graph.build import cond_avg, res_avg, weird_avg, weirder_avg

    g = np.asarray(gmap, np.float64)
    H, W = g.shape
    act = g > 0
    f1 = res_avg if avg_res else cond_avg
    f2 = weirder_avg if avg_res else weird_avg

    def plane(src_sl, dst_sl, fn):
        m = act[src_sl] & act[dst_sl]
        with np.errstate(divide="ignore", invalid="ignore"):
            w = np.where(m, fn(g[src_sl], g[dst_sl]), 0.0)
        w[~m] = 0.0
        return w

    we = _pad_plane(plane(np.s_[:, :-1], np.s_[:, 1:], f1), H, W)
    ws = _pad_plane(plane(np.s_[:-1, :], np.s_[1:, :], f1), H, W)
    if four_neighbors:
        wse = np.zeros((H, W))
        wne = np.zeros((H, W))
    else:
        wse = _pad_plane(plane(np.s_[:-1, :-1], np.s_[1:, 1:], f2), H, W)
        # NE plane indexed at the source cell (i, j), i >= 1
        wne_core = plane(np.s_[1:, :-1], np.s_[:-1, 1:], f2)
        wne = np.zeros((H, W))
        wne[1:, :W - 1] = wne_core

    diag = np.zeros((H, W))
    diag[:, :-1] += we[:, :-1]
    diag[:, 1:] += we[:, :-1]
    diag[:-1, :] += ws[:-1, :]
    diag[1:, :] += ws[:-1, :]
    diag[:-1, :-1] += wse[:-1, :-1]
    diag[1:, 1:] += wse[:-1, :-1]
    diag[1:, :-1] += wne[1:, :-1]
    diag[:-1, 1:] += wne[1:, :-1]

    to = lambda a: jnp.asarray(a, dtype)
    return StencilOperator(to(we), to(ws), to(wse), to(wne), to(diag))


def stencil_matvec(A: StencilOperator, x: jnp.ndarray) -> jnp.ndarray:
    """y = L @ x for x of shape (H, W, B): diag*x minus neighbor flows.

    Eight shifted multiply-adds; XLA fuses them into a single pass over
    HBM, and on the batch axis the VPU lanes are fully utilized.
    """
    we, ws, wse, wne, diag = A.we, A.ws, A.wse, A.wne, A.diag
    y = diag[..., None] * x
    # East/West
    y = y.at[:, :-1].add(-we[:, :-1, None] * x[:, 1:])
    y = y.at[:, 1:].add(-we[:, :-1, None] * x[:, :-1])
    # South/North
    y = y.at[:-1, :].add(-ws[:-1, :, None] * x[1:, :])
    y = y.at[1:, :].add(-ws[:-1, :, None] * x[:-1, :])
    # SE/NW
    y = y.at[:-1, :-1].add(-wse[:-1, :-1, None] * x[1:, 1:])
    y = y.at[1:, 1:].add(-wse[:-1, :-1, None] * x[:-1, :-1])
    # NE/SW
    y = y.at[1:, :-1].add(-wne[1:, :-1, None] * x[:-1, 1:])
    y = y.at[:-1, 1:].add(-wne[1:, :-1, None] * x[1:, :-1])
    return y


@partial(jax.jit, static_argnames=("itmax",))
def stencil_cg(A: StencilOperator, B: jnp.ndarray, rtol=1e-6,
               itmax=100_000):
    """Jacobi-preconditioned CG on the stencil operator.

    B: (H, W, nrhs) right-hand sides (one grid per pair solve).
    Returns (X, relres (nrhs,), iters).
    """
    inv_diag = jnp.where(A.diag > 0, 1.0 / jnp.where(A.diag == 0, 1.0, A.diag),
                         1.0)

    def apply_M(r):
        return inv_diag[..., None] * r

    bnorm = jnp.sqrt(jnp.sum(B * B, axis=(0, 1)))
    safe_bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    # floor the target at ~32 eps * ||b||: below that a finite-precision
    # CG stalls and would spin to itmax; the 1e-4 residual gate still
    # guards correctness (src/core.jl:640-642)
    eps_floor = 32 * jnp.finfo(B.dtype).eps
    tol = jnp.maximum(rtol, eps_floor) * bnorm

    X0 = jnp.zeros_like(B)
    R0 = B
    Z0 = apply_M(R0)
    P0 = Z0
    rz0 = jnp.sum(R0 * Z0, axis=(0, 1))
    big = jnp.asarray(jnp.finfo(B.dtype).max, B.dtype)

    # carry: X, R, Z, P, rz, k, best (stall tracker), since (iters
    # without meaningful progress)
    def not_done(carry):
        X, R, Z, P, rz, k, best, since = carry
        resnorm = jnp.sqrt(jnp.sum(R * R, axis=(0, 1)))
        return jnp.logical_and(
            jnp.logical_and(k < itmax, since < 200),
            jnp.any(resnorm > tol))

    def body(carry):
        X, R, Z, P, rz, k, best, since = carry
        AP = stencil_matvec(A, P)
        pAp = jnp.sum(P * AP, axis=(0, 1))
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        X = X + alpha[None, None, :] * P
        R = R - alpha[None, None, :] * AP
        # Periodic residual replacement: recompute the true residual so
        # the f32 recurrence cannot drift away from it (van der Vorst);
        # costs 1 extra matvec every 64 iterations.
        R = jax.lax.cond(
            (k + 1) % 64 == 0,
            lambda: B - stencil_matvec(A, X),
            lambda: R)
        Z = apply_M(R)
        rz_new = jnp.sum(R * Z, axis=(0, 1))
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        P = Z + beta[None, None, :] * P
        worst = jnp.max(jnp.sqrt(jnp.sum(R * R, axis=(0, 1))) / safe_bnorm)
        improved = worst < best * 0.999
        best = jnp.minimum(best, worst)
        since = jnp.where(improved, 0, since + 1)
        return (X, R, Z, P, rz_new, k + 1, best, since)

    X, R, Z, P, rz, iters, _, _ = jax.lax.while_loop(
        not_done, body, (X0, R0, Z0, P0, rz0, 0, big, 0))
    relres = jnp.sqrt(jnp.sum((B - stencil_matvec(A, X)) ** 2,
                              axis=(0, 1))) / safe_bnorm
    return X, relres, iters


def _to_dtype(A: StencilOperator, dtype) -> StencilOperator:
    return StencilOperator(*(p.astype(dtype) for p in
                             (A.we, A.ws, A.wse, A.wne, A.diag)))


@partial(jax.jit, static_argnames=("itmax", "max_refine"))
def stencil_solve(A_hi: StencilOperator, B: jnp.ndarray, rtol=1e-6,
                  itmax=100_000, max_refine=4):
    """Mixed-precision solve: f32 CG inner iterations (full HBM
    bandwidth on TPU), f64 outer residuals + iterative refinement so
    the TRUE relative residual reaches rtol despite the f32 stall
    floor.  A_hi/B are float64; the work operator is an f32 copy.

    Returns (X (f64), relres (nrhs,), total_iters).
    """
    A_lo = _to_dtype(A_hi, jnp.float32)
    bnorm = jnp.sqrt(jnp.sum(B * B, axis=(0, 1)))
    safe_bnorm = jnp.where(bnorm == 0, 1.0, bnorm)

    def true_relres(X):
        R = B - stencil_matvec(A_hi, X)
        return R, jnp.sqrt(jnp.sum(R * R, axis=(0, 1))) / safe_bnorm

    X0 = jnp.zeros_like(B)
    R0 = B

    def cond(carry):
        X, R, rel, iters, rounds = carry
        return jnp.logical_and(rounds < max_refine, jnp.any(rel > rtol))

    def body(carry):
        X, R, rel, iters, rounds = carry
        dX, _, it = stencil_cg(A_lo, R.astype(jnp.float32), rtol, itmax)
        X = X + dX.astype(jnp.float64)
        R, rel = true_relres(X)
        return (X, R, rel, iters + it, rounds + 1)

    big = jnp.full(B.shape[-1], jnp.inf)
    X, R, rel, iters, rounds = jax.lax.while_loop(
        cond, body, (X0, R0, big, 0, 0))
    return X, rel, iters
