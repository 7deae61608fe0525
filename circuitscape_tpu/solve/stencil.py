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


def _sh(x, dr, dc):
    """Shift the (B, H, W) block by (dr, dc) on the trailing grid dims
    with zero fill — pure slice+pad ops, which XLA fuses far better
    than scatter updates."""
    H, W = x.shape[-2], x.shape[-1]
    pads = [(0, 0), (max(dr, 0), max(-dr, 0)), (max(dc, 0), max(-dc, 0))]
    sl = (slice(max(-dr, 0), H - max(dr, 0)),
          slice(max(-dc, 0), W - max(dc, 0)))
    return jnp.pad(x[..., sl[0], sl[1]], pads)


def stencil_matvec(A: StencilOperator, x: jnp.ndarray) -> jnp.ndarray:
    """y = L @ x for x of shape (B, H, W): diag*x minus neighbor flows.

    Batch-first layout: the W axis lands on the TPU lane dimension
    (full 128-lane utilization independent of batch size) and the
    weight planes broadcast over the leading batch axis without
    materialization.  Each directed plane contributes twice (edge seen
    from both ends); the shifts are slice+pad so the whole matvec
    compiles to a few fused passes over HBM.
    """
    we, ws, wse, wne, diag = A.we, A.ws, A.wse, A.wne, A.diag
    wE = we[None]
    wS = ws[None]
    wSE = wse[None]
    wNE = wne[None]
    y = diag[None] * x
    # East edge (i,j)-(i,j+1): y[i,j] -= we[i,j]*x[i,j+1]; and transpose
    y = y - wE * _sh(x, 0, -1) - _sh(wE * x, 0, 1)
    # South edge (i,j)-(i+1,j)
    y = y - wS * _sh(x, -1, 0) - _sh(wS * x, 1, 0)
    # SE edge (i,j)-(i+1,j+1)
    y = y - wSE * _sh(x, -1, -1) - _sh(wSE * x, 1, 1)
    # NE edge (i,j)-(i-1,j+1)
    y = y - wNE * _sh(x, 1, -1) - _sh(wNE * x, -1, 1)
    return y


def _cg_state_init(A: StencilOperator, B: jnp.ndarray):
    inv_diag = jnp.where(A.diag > 0,
                         1.0 / jnp.where(A.diag == 0, 1.0, A.diag), 1.0)
    R = B
    Z = inv_diag[None] * R
    big = jnp.asarray(jnp.finfo(B.dtype).max, B.dtype)
    return (jnp.zeros_like(B), R, Z, Z, jnp.sum(R * Z, axis=(-2, -1)),
            jnp.asarray(0), big, jnp.asarray(0))


def _cg_loop(A, B, state, tol, safe_bnorm, k_stop, itmax):
    """while_loop running until convergence, stall, itmax, or k_stop
    (the per-device-call step budget for the chunked driver)."""
    inv_diag = jnp.where(A.diag > 0,
                         1.0 / jnp.where(A.diag == 0, 1.0, A.diag), 1.0)

    def not_done(carry):
        X, R, Z, P, rz, k, best, since = carry
        resnorm = jnp.sqrt(jnp.sum(R * R, axis=(-2, -1)))
        return jnp.logical_and(
            jnp.logical_and(jnp.logical_and(k < itmax, k < k_stop),
                            since < 200),
            jnp.any(resnorm > tol))

    def body(carry):
        X, R, Z, P, rz, k, best, since = carry
        AP = stencil_matvec(A, P)
        pAp = jnp.sum(P * AP, axis=(-2, -1))
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        X = X + alpha[:, None, None] * P
        R = R - alpha[:, None, None] * AP
        # Periodic residual replacement: recompute the true residual so
        # the f32 recurrence cannot drift away from it (van der Vorst);
        # costs 1 extra matvec every 64 iterations.
        R = jax.lax.cond(
            (k + 1) % 64 == 0,
            lambda: B - stencil_matvec(A, X),
            lambda: R)
        Z = inv_diag[None] * R
        rz_new = jnp.sum(R * Z, axis=(-2, -1))
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        P = Z + beta[:, None, None] * P
        worst = jnp.max(jnp.sqrt(jnp.sum(R * R, axis=(-2, -1))) / safe_bnorm)
        improved = worst < best * 0.999
        best = jnp.minimum(best, worst)
        since = jnp.where(improved, 0, since + 1)
        return (X, R, Z, P, rz_new, k + 1, best, since)

    return jax.lax.while_loop(not_done, body, state)


@partial(jax.jit, static_argnames=("itmax",))
def stencil_cg_device(A: StencilOperator, B: jnp.ndarray, rtol=1e-6,
                      itmax=100_000):
    """Single-dispatch Jacobi-CG (whole loop in one device execution).
    Used by the sharded/mesh path and for small bounded solves."""
    bnorm = jnp.sqrt(jnp.sum(B * B, axis=(-2, -1)))
    safe_bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    eps_floor = 32 * jnp.finfo(B.dtype).eps
    tol = jnp.maximum(rtol, eps_floor) * bnorm
    state = _cg_state_init(A, B)
    X, R, Z, P, rz, iters, _, _ = _cg_loop(A, B, state, tol, safe_bnorm,
                                           itmax, itmax)
    relres = jnp.sqrt(jnp.sum((B - stencil_matvec(A, X)) ** 2,
                              axis=(-2, -1))) / safe_bnorm
    return X, relres, iters


@partial(jax.jit, static_argnames=("chunk",))
def _cg_chunk(A, B, state, tol, safe_bnorm, chunk, itmax):
    k0 = state[5]
    return _cg_loop(A, B, state, tol, safe_bnorm, k0 + chunk, itmax)


@partial(jax.jit)
def _true_relres(A, B, X, safe_bnorm):
    return jnp.sqrt(jnp.sum((B - stencil_matvec(A, X)) ** 2,
                            axis=(-2, -1))) / safe_bnorm


def stencil_cg(A: StencilOperator, B: jnp.ndarray, rtol=1e-6,
               itmax=100_000, chunk=512):
    """Chunked Jacobi-CG driver: the loop runs on device in bounded
    bursts of `chunk` iterations, with a host check between bursts.

    B: (nrhs, H, W) right-hand sides (one grid per pair solve).
    Returns (X, relres (nrhs,), iters).

    Bounding each device execution keeps every dispatch well under any
    runtime watchdog (a single 100k-iteration while_loop is minutes of
    device time at the 1M-cell scale) and gives per-chunk progress
    observability; the full CG state stays device-resident, so the host
    round-trip per chunk is two scalars.
    """
    bnorm = jnp.sqrt(jnp.sum(B * B, axis=(-2, -1)))
    safe_bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    eps_floor = 32 * jnp.finfo(jnp.asarray(B).dtype).eps
    tol = jnp.maximum(rtol, eps_floor) * bnorm

    state = _cg_state_init(A, B)
    while True:
        state = _cg_chunk(A, B, state, tol, safe_bnorm, chunk, itmax)
        k = int(state[5])
        since = int(state[7])
        resnorm = np.sqrt(np.asarray(jnp.sum(state[1] ** 2, axis=(-2, -1))))
        if (k >= itmax or since >= 200 or
                not np.any(resnorm > np.asarray(tol))):
            break
    X = state[0]
    relres = _true_relres(A, B, X, safe_bnorm)
    return X, relres, state[5]


def stencil_matvec_np(A: StencilOperator, x: np.ndarray) -> np.ndarray:
    """Host (numpy, f64) stencil matvec on (B, H, W) blocks — used for
    the outer refinement residuals so no f64 arithmetic ever runs on a
    TPU core."""
    we = np.asarray(A.we, np.float64)
    ws = np.asarray(A.ws, np.float64)
    wse = np.asarray(A.wse, np.float64)
    wne = np.asarray(A.wne, np.float64)
    diag = np.asarray(A.diag, np.float64)
    y = diag[None] * x
    y[:, :, :-1] -= we[None, :, :-1] * x[:, :, 1:]
    y[:, :, 1:] -= we[None, :, :-1] * x[:, :, :-1]
    y[:, :-1, :] -= ws[None, :-1, :] * x[:, 1:, :]
    y[:, 1:, :] -= ws[None, :-1, :] * x[:, :-1, :]
    y[:, :-1, :-1] -= wse[None, :-1, :-1] * x[:, 1:, 1:]
    y[:, 1:, 1:] -= wse[None, :-1, :-1] * x[:, :-1, :-1]
    y[:, 1:, :-1] -= wne[None, 1:, :-1] * x[:, :-1, 1:]
    y[:, :-1, 1:] -= wne[None, 1:, :-1] * x[:, 1:, :-1]
    return y


def stencil_solve_mixed(A_hi: StencilOperator, B: np.ndarray, rtol=1e-6,
                        itmax=100_000, max_refine=4):
    """Mixed-precision solve with HOST-side refinement.

    Inner iterations: f32 stencil CG on device (full HBM bandwidth —
    v5e has no native f64, and emulated-f64 device loops are both slow
    and fragile).  Outer loop: numpy f64 true residuals + iterative
    refinement, so the returned solution satisfies the true rtol.

    Returns (X (np.float64), relres (nrhs,), total_iters).
    """
    A_lo = _to_dtype(A_hi, jnp.float32)
    B = np.asarray(B, np.float64)
    nb = B.shape[0]
    bnorm = np.linalg.norm(B.reshape(nb, -1), axis=1)
    safe_bnorm = np.where(bnorm == 0, 1.0, bnorm)

    X = np.zeros_like(B)
    R = B
    total_iters = 0
    rel = np.full(nb, np.inf)
    for _ in range(max_refine):
        dX, _, it = stencil_cg(A_lo, jnp.asarray(R, jnp.float32),
                               rtol, itmax=itmax)
        X = X + np.asarray(dX, np.float64)
        R = B - stencil_matvec_np(A_hi, X)
        rel = np.linalg.norm(R.reshape(nb, -1), axis=1) / safe_bnorm
        total_iters += int(it)
        if np.all(rel <= rtol):
            break
    return X, rel, total_iters


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
    bnorm = jnp.sqrt(jnp.sum(B * B, axis=(-2, -1)))
    safe_bnorm = jnp.where(bnorm == 0, 1.0, bnorm)

    def true_relres(X):
        R = B - stencil_matvec(A_hi, X)
        return R, jnp.sqrt(jnp.sum(R * R, axis=(-2, -1))) / safe_bnorm

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
