"""Geometric multigrid preconditioner for the stencil operator.

The stencil path's analogue of the reference's smoothed-aggregation AMG
(src/core.jl:164-167): every level stays a 9-point stencil, so the
whole V-cycle is shifted-plane arithmetic + 2x2 patch reductions —
ideal TPU code with no gathers at any level.

Coarsening is Galerkin with a piecewise-constant 2x2-patch prolongator.
For a graph Laplacian that collapses exactly to the Laplacian of the
patch-collapsed graph: each fine directed edge either stays inside a
patch (vanishes) or adds its weight to one coarse directed edge chosen
by the parity of its endpoint coordinates.  Setup is a handful of
numpy reshape-sums on the host; the hierarchy lives on device in f32.

Smoother: weighted Jacobi (2/3), symmetric V(1,1) so the operator is a
valid SPD preconditioner for CG.  Coarsest level: dense pseudo-inverse
(pinv coarse-solve parity with the reference), applied on the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .stencil import StencilOperator, stencil_matvec


@jax.tree_util.register_pytree_node_class
@dataclass
class GeoMgLevel:
    A: StencilOperator
    inv_diag: jnp.ndarray  # (H, W) plain 1/diag (0 on empty cells)
    lam_max: float         # estimate of rho(D^-1 A) for Chebyshev

    def tree_flatten(self):
        return (self.A, self.inv_diag), (self.lam_max,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


@jax.tree_util.register_pytree_node_class
@dataclass
class GeoMgHierarchy:
    levels: tuple
    coarse_pinv: jnp.ndarray  # (hc*wc, hc*wc)
    coarse_shape: tuple
    overcorrect: float = 1.9   # coarse-correction scaling (static)

    def tree_flatten(self):
        return ((self.levels, self.coarse_pinv),
                (self.coarse_shape, self.overcorrect))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _pad_even(p: np.ndarray) -> np.ndarray:
    H, W = p.shape
    return np.pad(p, ((0, H % 2), (0, W % 2)))


def _coarsen_planes(we, ws, wse, wne):
    """One 2x2 Galerkin coarsening step on the four directed planes.

    Each fine edge is routed to a coarse plane by endpoint parity
    (internal edges drop out of the collapsed Laplacian)."""
    we, ws, wse, wne = map(_pad_even, (we, ws, wse, wne))
    H, W = we.shape
    hc, wc = H // 2, W // 2
    cE = np.zeros((hc, wc))
    cS = np.zeros((hc, wc))
    cSE = np.zeros((hc, wc))
    cNE = np.zeros((hc, wc))

    def patch(i_par, j_par, p):
        """Sub-plane of p at cells with row parity i_par, col parity
        j_par, reshaped to the coarse grid."""
        return p[i_par::2, j_par::2][:hc, :wc]

    # E edges (i,j)-(i,j+1): cross iff j odd -> coarse E at (i//2, j//2)
    cE += patch(0, 1, we) + patch(1, 1, we)
    # S edges (i,j)-(i+1,j): cross iff i odd -> coarse S
    cS += patch(1, 0, ws) + patch(1, 1, ws)
    # SE edges (i,j)-(i+1,j+1):
    #   i odd, j odd  -> coarse SE;  i odd, j even -> coarse S
    #   i even, j odd -> coarse E;   i even, j even -> internal
    cSE += patch(1, 1, wse)
    cS += patch(1, 0, wse)
    cE += patch(0, 1, wse)
    # NE edges (i,j)-(i-1,j+1):
    #   i even, j odd -> coarse NE; i even, j even -> coarse N
    #   (= S plane of the upper coarse patch); i odd, j odd -> coarse E;
    #   i odd, j even -> internal
    ne_en = patch(0, 1, wne)   # i even, j odd
    cNE += ne_en
    n_up = patch(0, 0, wne)    # i even, j even: coarse edge (I,J)-(I-1,J)
    cS[:-1, :] += n_up[1:, :]  # stored at the upper patch's S plane
    cE += patch(1, 1, wne)

    # zero the out-of-range boundaries
    cE[:, -1] = 0
    cS[-1, :] = 0
    cSE[-1, :] = 0
    cSE[:, -1] = 0
    cNE[0, :] = 0
    cNE[:, -1] = 0
    return cE, cS, cSE, cNE


def _coarsen_planes_slab(we, ws, wse, wne, first: bool, last: bool):
    """_coarsen_planes for one even-aligned ROW SLAB of the fine grid.

    Used by the streamed mesh build (solve/prepare.py): each shard's
    slab coarsens independently so the full fine planes never
    materialize on the host.  Differences from the full-grid version:
    row-boundary zeroing applies only at the true grid edges
    (first/last), and the NE even-even contribution of the slab's FIRST
    patch row — which belongs to the PREVIOUS slab's last coarse S row
    — is returned as `carry` instead of being dropped.

    Returns (cE, cS, cSE, cNE, carry) with carry a (wc,) row (zeros
    when first: the full-grid build drops it there too)."""
    H, W = we.shape
    assert H % 2 == 0, "slab height must be even"
    we, ws, wse, wne = map(_pad_even, (we, ws, wse, wne))
    H, W = we.shape
    hc, wc = H // 2, W // 2

    def patch(i_par, j_par, p):
        return p[i_par::2, j_par::2][:hc, :wc]

    cE = patch(0, 1, we) + patch(1, 1, we) + patch(0, 1, wse) + \
        patch(1, 1, wne)
    cS = patch(1, 0, ws) + patch(1, 1, ws) + patch(1, 0, wse)
    cSE = patch(1, 1, wse).copy()   # patch() returns a view
    cNE = patch(0, 1, wne).copy()
    n_up = patch(0, 0, wne)
    cS[:-1, :] += n_up[1:, :]
    carry = np.zeros(wc) if first else n_up[0, :].copy()

    cE[:, -1] = 0
    cSE[:, -1] = 0
    cNE[:, -1] = 0
    if last:
        cS[-1, :] = 0
        cSE[-1, :] = 0
    if first:
        cNE[0, :] = 0
    return cE, cS, cSE, cNE, carry


def _planes_to_operator(we, ws, wse, wne, dtype) -> StencilOperator:
    H, W = we.shape
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


def _estimate_lam_max(we, ws, wse, wne, iters=12, pen=None) -> float:
    """Estimate of rho(D^-1 A) for the Chebyshev smoother interval.

    For a graph Laplacian rho(D^-1 L) <= 2 (Gershgorin: off-diagonal
    row sums equal the diagonal), so 2.0 is always a safe interval top;
    measured CG iteration counts are identical to the power-iteration
    estimate (lam in [1.5, 2.0] across the hierarchy).  Levels above
    64k cells therefore skip the host power iteration — it cost more
    wall-clock per job (12 full-grid host matvecs at the fine level)
    than it ever saved in solve time."""
    if we.size > 65536:
        return 2.0
    from .stencil import StencilOperator as _S, stencil_matvec_np
    diag = np.zeros(we.shape)
    diag[:, :-1] += we[:, :-1]
    diag[:, 1:] += we[:, :-1]
    diag[:-1, :] += ws[:-1, :]
    diag[1:, :] += ws[:-1, :]
    diag[:-1, :-1] += wse[:-1, :-1]
    diag[1:, 1:] += wse[:-1, :-1]
    diag[1:, :-1] += wne[1:, :-1]
    diag[:-1, 1:] += wne[1:, :-1]
    if pen is not None:
        diag = diag + pen
    dinv = np.where(diag > 0, 1.0 / np.where(diag == 0, 1.0, diag), 0.0)
    op = _S(we, ws, wse, wne, diag)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1,) + we.shape)
    x /= np.linalg.norm(x) + 1e-30
    lam = 2.0
    for _ in range(iters):
        y = dinv[None] * stencil_matvec_np(op, x)
        nrm = np.linalg.norm(y)
        if nrm == 0:
            return 2.0
        lam = nrm
        x = y / nrm
    return float(min(lam * 1.05, 2.0))


def _sym_pinv(A: np.ndarray) -> np.ndarray:
    """Pseudo-inverse of a symmetric PSD matrix via eigh — ~4x faster
    than np.linalg.pinv's SVD at the coarse-solve sizes used here."""
    w, V = np.linalg.eigh(A)
    cutoff = max(A.shape) * np.finfo(A.dtype).eps * np.max(np.abs(w))
    inv_w = np.where(w > cutoff, 1.0 / np.where(w == 0, 1.0, w), 0.0)
    return (V * inv_w) @ V.T


def _dense_laplacian(we, ws, wse, wne) -> np.ndarray:
    H, W = we.shape
    n = H * W
    A = np.zeros((n, n))

    def add(i, j, di, dj, w):
        a = i * W + j
        b = (i + di) * W + (j + dj)
        A[a, b] -= w
        A[b, a] -= w
        A[a, a] += w
        A[b, b] += w

    for i in range(H):
        for j in range(W):
            if j + 1 < W and we[i, j]:
                add(i, j, 0, 1, we[i, j])
            if i + 1 < H and ws[i, j]:
                add(i, j, 1, 0, ws[i, j])
            if i + 1 < H and j + 1 < W and wse[i, j]:
                add(i, j, 1, 1, wse[i, j])
            if i - 1 >= 0 and j + 1 < W and wne[i, j]:
                add(i, j, -1, 1, wne[i, j])
    return A


def _np_diag(we, ws, wse, wne):
    diag = np.zeros(we.shape)
    diag[:, :-1] += we[:, :-1]
    diag[:, 1:] += we[:, :-1]
    diag[:-1, :] += ws[:-1, :]
    diag[1:, :] += ws[:-1, :]
    diag[:-1, :-1] += wse[:-1, :-1]
    diag[1:, 1:] += wse[:-1, :-1]
    diag[1:, :-1] += wne[1:, :-1]
    diag[:-1, 1:] += wne[1:, :-1]
    return diag


@partial(jax.jit, static_argnames=("shapes", "lams", "coarse_shape",
                                   "overcorrect"))
def _unpack_hierarchy(flat, shapes, lams, coarse_shape, overcorrect,
                      fine_ops=None):
    """Slice ONE uploaded flat buffer into the hierarchy pytree in a
    single device execution (the host link is high-latency; per-array
    eager ops here used to cost more than the whole solve).

    fine_ops: optional 5-tuple of DEVICE f32 fine planes (we, ws, wse,
    wne, diag) for level 0; when given, level 0's six arrays are NOT in
    flat (they are derived from the already-resident f64 operator —
    skipping the largest level of the upload, which dominated warm
    setup on the tunneled TPU at 6M+ cells) and inv_diag computes here."""
    levels = []
    off = 0

    def take(shape):
        nonlocal off
        n = int(np.prod(shape))
        a = jax.lax.dynamic_slice_in_dim(flat, off, n).reshape(shape)
        off += n
        return a

    for li, (shape, lam) in enumerate(zip(shapes, lams)):
        if li == 0 and fine_ops is not None:
            we, ws, wse, wne, diag = fine_ops
            inv = jnp.where(diag > 0,
                            1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)
            levels.append(GeoMgLevel(
                StencilOperator(we, ws, wse, wne, diag), inv, lam))
            continue
        arrs = [take(shape) for _ in range(6)]
        levels.append(GeoMgLevel(StencilOperator(*arrs[:5]), arrs[5], lam))
    n_c = coarse_shape[0] * coarse_shape[1]
    pinv = take((n_c, n_c))
    return GeoMgHierarchy(tuple(levels), pinv, coarse_shape, overcorrect)


def attach_pallas_planes(hier: GeoMgHierarchy) -> GeoMgHierarchy:
    """Expand the 9 output-aligned Pallas planes for every level whose
    shape the fused kernel supports (one small jitted dispatch per
    level).  Lets the HOST-built hierarchy feed the Pallas matvec on
    TPU — the device-built path expands inline, but its fused setup
    program costs a very large one-time server compile per new grid
    shape, which dominates cold starts above a few Mcells."""
    from .pallas_stencil import PallasStencil, supported

    levels = []
    for L in hier.levels:
        A = L.A
        if A.pallas is None and supported(A.shape, 4):
            A = StencilOperator(
                A.we, A.ws, A.wse, A.wne, A.diag,
                PallasStencil.from_operator(
                    A, with_init=A.shape[1] <= 4094), A.shard)
        levels.append(GeoMgLevel(A, L.inv_diag, L.lam_max))
    return GeoMgHierarchy(tuple(levels), hier.coarse_pinv,
                          hier.coarse_shape, hier.overcorrect)


def _coarsen_pen_np(p: np.ndarray) -> np.ndarray:
    """Host 2x2 patch sum of a diagonal penalty field (P^T diag(p) P)."""
    p = _pad_even(p)
    H, W = p.shape
    return p.reshape(H // 2, 2, W // 2, 2).sum(axis=(1, 3))


def build_geo_mg(S: StencilOperator = None, dtype=jnp.float32,
                 coarse_cells=256, max_levels=12, planes_np=None,
                 fine_op: StencilOperator = None,
                 fine_device_ops=None, pen_np=None) -> GeoMgHierarchy:
    """Build the hierarchy: ALL setup is host numpy (coarsening is a
    handful of reshape-sums), then the whole hierarchy crosses the host
    link as ONE flat f32 upload + ONE unpack dispatch.  Level 0's
    operator is the f32 fine operator — solvers reuse it instead of
    casting a separate copy (fine_op is accepted for API compat but no
    longer used).

    planes_np: optional host copies of the fine planes (avoids a
    device->host download when the caller built them on host anyway).
    pen_np: optional (H, W) diagonal penalty field (advanced grounds);
    added to every level's diagonal and coarsened by 2x2 patch sums —
    see _build_levels_device.  With fine_device_ops, the caller's fine
    diag must already include the penalty."""
    if planes_np is not None:
        we, ws, wse, wne = (np.asarray(p, np.float64) for p in planes_np[:4])
    else:
        we = np.asarray(S.we, np.float64)
        ws = np.asarray(S.ws, np.float64)
        wse = np.asarray(S.wse, np.float64)
        wne = np.asarray(S.wne, np.float64)
    pen = None if pen_np is None else np.asarray(pen_np, np.float64)

    np_dtype = np.dtype(jnp.dtype(dtype).name)
    chunks, shapes, lams = [], [], []
    while (we.shape[0] * we.shape[1] > coarse_cells and
           len(shapes) < max_levels and min(we.shape) >= 2):
        lvl = len(shapes)
        if not (lvl == 0 and fine_device_ops is not None):
            # level 0 is skipped from the upload when the caller
            # supplies device-resident fine ops (derived from the f64
            # operator already on device — the fine level is ~3/4 of
            # the hierarchy's bytes and the tunnel upload dominated
            # warm setup at 6M+ cells)
            diag = _np_diag(we, ws, wse, wne)
            if pen is not None:
                diag = diag + pen
            inv = np.where(diag > 0,
                           1.0 / np.where(diag == 0, 1.0, diag), 0.0)
            for a in (we, ws, wse, wne, diag, inv):
                chunks.append(np.asarray(a, np_dtype).ravel())
        shapes.append(we.shape)
        lams.append(_estimate_lam_max(we, ws, wse, wne, pen=pen))
        we, ws, wse, wne = _coarsen_planes(we, ws, wse, wne)
        if pen is not None:
            pen = _coarsen_pen_np(pen)

    dense = _dense_laplacian(we, ws, wse, wne)
    if pen is not None:
        dense[np.diag_indices_from(dense)] += _pad_even(pen)[
            :we.shape[0], :we.shape[1]].ravel()
    # benign identity on empty (all-inactive) coarse cells
    empty = dense.diagonal() == 0
    dense[empty, empty] = 1.0
    pinv = _sym_pinv(dense)
    chunks.append(np.asarray(pinv, np_dtype).ravel())
    flat = jnp.asarray(np.concatenate(chunks))   # the ONE upload
    # The piecewise-constant 2x2 prolongator overestimates coarse
    # stiffness ~2x per direction; scaling the coarse correction by
    # ~1.9 restores near-grid-independent rates (25 -> 8 CG iterations
    # at 250k cells in the tuning sweep).
    return _unpack_hierarchy(flat, tuple(shapes), tuple(lams),
                             we.shape, 1.9, fine_ops=fine_device_ops)


def _coarsen_planes_jnp(we, ws, wse, wne):
    """Device-side 2x2 Galerkin coarsening step — the jnp mirror of
    _coarsen_planes (same edge-parity routing), built from pads/slices
    so the whole hierarchy setup can run as a few device dispatches
    instead of host numpy passes over the fine grid."""
    H, W = we.shape
    if H % 2 or W % 2:
        pads = ((0, H % 2), (0, W % 2))
        we, ws, wse, wne = (jnp.pad(p, pads) for p in (we, ws, wse, wne))
        H, W = we.shape
    hc, wc = H // 2, W // 2

    def patch(ip, jp, p):
        return p[ip::2, jp::2][:hc, :wc]

    cE = patch(0, 1, we) + patch(1, 1, we) + patch(0, 1, wse) + \
        patch(1, 1, wne)
    cS = patch(1, 0, ws) + patch(1, 1, ws) + patch(1, 0, wse)
    cSE = patch(1, 1, wse)
    cNE = patch(0, 1, wne)
    # N edges from even-even NE entries land on the UPPER patch's S plane
    n_up = patch(0, 0, wne)
    cS = cS.at[:-1, :].add(n_up[1:, :])

    col = jnp.arange(wc)
    row = jnp.arange(hc)
    cE = jnp.where(col[None, :] == wc - 1, 0.0, cE)
    cS = jnp.where(row[:, None] == hc - 1, 0.0, cS)
    cSE = jnp.where((row[:, None] == hc - 1) | (col[None, :] == wc - 1),
                    0.0, cSE)
    cNE = jnp.where((row[:, None] == 0) | (col[None, :] == wc - 1),
                    0.0, cNE)
    return cE, cS, cSE, cNE


def _diag_from_planes_jnp(we, ws, wse, wne):
    from .stencil import _sh
    return (we + _sh(we[None], 0, 1)[0] +
            ws + _sh(ws[None], 1, 0)[0] +
            wse + _sh(wse[None], 1, 1)[0] +
            wne + _sh(wne[None], -1, 1)[0])


def _lam_device(we, ws, wse, wne, diag, inv, iters=12):
    """Device power iteration for rho(D^-1 A) (the jnp mirror of
    _estimate_lam_max; deterministic non-eigenvector start)."""
    from .stencil import StencilOperator as _S, stencil_matvec
    A = _S(we, ws, wse, wne, diag)
    H, W = diag.shape
    x = (jnp.sin(jnp.arange(H * W, dtype=diag.dtype) * 0.37)
         .reshape(1, H, W) + 0.01)
    x = x / jnp.sqrt(jnp.sum(x * x))

    def body(_, carry):
        x, lam = carry
        y = inv[None] * stencil_matvec(A, x)
        n = jnp.sqrt(jnp.sum(y * y))
        lam = jnp.where(n == 0, jnp.asarray(2.0, diag.dtype), n)
        return (y / (n + 1e-30), lam)

    _, lam = jax.lax.fori_loop(0, iters, body,
                               (x, jnp.asarray(2.0, diag.dtype)))
    return jnp.minimum(lam * 1.05, 2.0)


def _coarsen_pen_jnp(p):
    """2x2 patch sum of a diagonal (penalty) field — the exact Galerkin
    coarse diagonal P^T diag(p) P for the piecewise-constant 2x2
    prolongator."""
    H, W = p.shape
    if H % 2 or W % 2:
        p = jnp.pad(p, ((0, H % 2), (0, W % 2)))
    return jax.lax.reduce_window(p, jnp.asarray(0, p.dtype), jax.lax.add,
                                 (2, 2), (2, 2), "VALID")


@partial(jax.jit, static_argnames=("nlevels", "est_mask", "pal_mask"))
def _build_levels_device(we, ws, wse, wne, nlevels, est_mask, pal_mask,
                         pen=None):
    """The WHOLE hierarchy setup in ONE device dispatch: per-level
    coarsening, diagonals, Chebyshev lam estimates, and (when pal_mask
    says so) the nine output-aligned Pallas planes.  Eager per-plane ops
    here would each pay a host-tunnel roundtrip — fusing the build was
    worth ~2 s/job at 1M cells.

    pen: optional (H, W) diagonal penalty field (advanced-mode grounds,
    src/raster/advanced.jl:274-281's G + diag(g)).  It is ADDED to every
    level's diagonal (so the level operators are the Galerkin coarse
    versions of L + diag(pen)) and coarsened by 2x2 patch sums — the
    exact P^T diag(pen) P.  Without it the V-cycle preconditions the
    floating Laplacian, whose near-null constant mode the grounded
    operator does not share (measured: 81 CG iterations vs 10 at 1M
    cells)."""
    from .pallas_stencil import _expand_planes

    out, lams = [], []
    for lvl in range(nlevels):
        diag = _diag_from_planes_jnp(we, ws, wse, wne)
        if pen is not None:
            diag = diag + pen
        inv = jnp.where(diag > 0,
                        1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)
        lam = (_lam_device(we, ws, wse, wne, diag, inv)
               if est_mask[lvl] else jnp.asarray(2.0, diag.dtype))
        pal = pal_init = None
        if pal_mask[lvl]:
            from .pallas_stencil import _expand_planes_dinv
            pal = _expand_planes(we, ws, wse, wne, diag)
            pal_init = _expand_planes_dinv(we, ws, wse, wne, diag, inv)
        out.append((we, ws, wse, wne, diag, inv, pal, pal_init))
        lams.append(lam)
        we, ws, wse, wne = _coarsen_planes_jnp(we, ws, wse, wne)
        if pen is not None:
            pen = _coarsen_pen_jnp(pen)
    if pen is None:
        pen = jnp.zeros_like(we)
    # pack the per-level lams and the coarsest planes into ONE flat f64
    # array: the caller's two np.asarray fetches each paid a host-link
    # roundtrip (~40 ms on the tunnel)
    packed = jnp.concatenate(
        [jnp.stack(lams).astype(jnp.float64).ravel(),
         jnp.stack([we, ws, wse, wne, pen]).astype(jnp.float64).ravel()])
    return out, packed


def build_geo_mg_device(S32: StencilOperator, coarse_cells=256,
                        max_levels=12, expand_pallas=False,
                        pen=None) -> GeoMgHierarchy:
    """Hierarchy setup ON DEVICE from the (already uploaded) f32 fine
    operator: coarsening, diagonals, lam estimates and optional Pallas
    plane expansion all run as ONE jitted dispatch; only the per-level
    lams and the tiny coarsest planes (<= coarse_cells) round-trip to
    host (the dense pseudo-inverse builds there).  Replaces the host
    coarsening passes + flat re-upload of build_geo_mg on the
    single-device path (~0.5 s at 1M cells).

    Levels above 64k cells use the Gershgorin-safe lam = 2.0 exactly
    like the host build (_estimate_lam_max); smaller levels power-
    iterate on device."""
    shapes = []
    H, W = S32.shape
    while (H * W > coarse_cells and len(shapes) < max_levels and
           min(H, W) >= 2):
        shapes.append((H, W))
        H, W = -(-H // 2), -(-W // 2)

    est_mask = tuple(h * w <= 65536 for (h, w) in shapes)
    if expand_pallas:
        from .pallas_stencil import supported
        pal_mask = tuple(supported((h, w), 4) for (h, w) in shapes)
    else:
        pal_mask = (False,) * len(shapes)

    levels_raw, packed_dev = _build_levels_device(
        S32.we, S32.ws, S32.wse, S32.wne, len(shapes), est_mask, pal_mask,
        pen=pen)
    packed = np.asarray(packed_dev)           # the ONE tiny download
    lams = packed[:len(shapes)]

    from .pallas_stencil import PallasStencil
    levels = []
    for (we, ws, wse, wne, diag, inv, pal, pal_init), lam, (h, w) in zip(
            levels_raw, lams, shapes):
        pobj = (PallasStencil(pal, H=h, W=w, init_planes=pal_init)
                if pal is not None else None)
        levels.append(GeoMgLevel(
            StencilOperator(we, ws, wse, wne, diag, pobj), inv,
            float(lam)))

    if shapes:
        hc, wc = -(-shapes[-1][0] // 2), -(-shapes[-1][1] // 2)
    else:   # no coarsening ran: the "coarsest" planes are the fine ones
        hc, wc = S32.shape
    cwe, cws, cwse, cwne, cpen = packed[len(shapes):].reshape(5, hc, wc)
    dense = _dense_laplacian(cwe, cws, cwse, cwne)
    dense[np.diag_indices_from(dense)] += cpen.ravel()
    empty = dense.diagonal() == 0
    dense[empty, empty] = 1.0
    pinv = jnp.asarray(_sym_pinv(dense), S32.diag.dtype)
    return GeoMgHierarchy(tuple(levels), pinv, cwe.shape, 1.9)


def _restrict(r):
    """2x2 patch sum (P^T); pads odd dims with zero.

    lax.reduce_window maps onto the TPU's native pooling path.  The two
    rejected formulations, measured at (32, 1024, 1024) f32 inside a
    compiled V-cycle on v5e: reshape(B, H/2, 2, W/2, 2).sum pads the
    trailing dim-2 axis 2->128 under the T(8, 128) tiled layout (64x
    memory blowup, the 48M-cell OOM), and four stride-2 slice adds cost
    ~48 ms — over half the whole V-cycle — against ~0.5 ms for the
    pooling formulation (stride-2 windows defeat XLA's vectorized
    layout assignment; pooling does not)."""
    B, H, W = r.shape
    if H % 2 or W % 2:
        r = jnp.pad(r, ((0, 0), (0, H % 2), (0, W % 2)))
    return jax.lax.reduce_window(r, jnp.asarray(0, r.dtype), jax.lax.add,
                                 (1, 2, 2), (1, 2, 2), "VALID")


def _prolong(xc, H, W):
    """Piecewise-constant interpolation (P); crops padded dims.

    jnp.repeat on both grid axes: measured 0.26 ms at (32, 512, 512)
    f32 on v5e vs 2.77 ms for the interior-pad + three-shifted-adds
    formulation this replaces (BENCH_VCYCLE prolong_* rows) — current
    XLA lowers the repeat without the tiled-layout dim-2 temp that
    motivated the shift formulation in round 4."""
    up = jnp.repeat(jnp.repeat(xc, 2, axis=1), 2, axis=2)
    return up[:, :H, :W]


CHEB_DEGREE = 2


def _cheb_smooth(L: GeoMgLevel, b, x):
    """Chebyshev polynomial smoother of fixed degree on D^-1 A
    (Adams et al. recurrence); a symmetric, stronger alternative to
    damped Jacobi that needs no inner products — ideal for the batched
    device V-cycle."""
    lmax = L.lam_max
    lmin = lmax / 4.0
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma
    Dinv = L.inv_diag[None]

    pal0 = getattr(L.A, "pallas", None)
    if (x is None and CHEB_DEGREE == 2 and pal0 is not None and
            getattr(pal0, "init_planes", None) is not None):
        # the whole from-zero degree-2 smoother as ONE Pallas pass
        # (reads b + premultiplied planes, writes x) when supported
        from .pallas_stencil import cheb_init_supported, pallas_cheb_init
        if (cheb_init_supported(pal0.shape, b.shape[0]) and
                b.dtype == pal0.planes.dtype and
                b.shape[1:] == tuple(pal0.shape)):
            rho_new = 1.0 / (2.0 * sigma - rho)
            return pallas_cheb_init(
                pal0.init_planes, L.inv_diag, b,
                c=float(1.0 / theta), ca=float(rho_new * rho),
                cb=float(2.0 * rho_new / delta))

    if (x is not None and CHEB_DEGREE == 2 and pal0 is not None and
            getattr(pal0, "init_planes", None) is not None):
        # warm (post-)smoother as two fused passes: residual+init, then
        # the premultiplied-plane finish (pallas_stencil.py)
        from .pallas_stencil import (pallas_cheb_finish,
                                     pallas_residual_init,
                                     warm_smooth_supported)
        if (warm_smooth_supported(pal0.shape, b.shape[0]) and
                b.dtype == pal0.planes.dtype and
                b.shape[1:] == tuple(pal0.shape)):
            rho_new = 1.0 / (2.0 * sigma - rho)
            r0, x1 = pallas_residual_init(pal0, L.inv_diag, b, x,
                                          c=float(1.0 / theta))
            return pallas_cheb_finish(
                pal0.init_planes, L.inv_diag, r0, x1,
                c=float(1.0 / theta), ca=float(rho_new * rho),
                cb=float(2.0 * rho_new / delta))

    r = b if x is None else b - stencil_matvec(L.A, x)
    d = (1.0 / theta) * (Dinv * r)
    x = d if x is None else x + d

    # fused recurrence step (matvec + r/d/x updates in ONE HBM pass)
    # when the level carries Pallas planes at a supported shape; the
    # sharded hierarchy never does (shard_hierarchy strips pallas)
    pal = getattr(L.A, "pallas", None)
    use_fused = False
    if pal is not None:
        from .pallas_stencil import cheb_supported
        use_fused = (cheb_supported(pal.shape, b.shape[0]) and
                     b.dtype == pal.planes.dtype and
                     b.shape[1:] == tuple(pal.shape))
    for _ in range(CHEB_DEGREE - 1):
        rho_new = 1.0 / (2.0 * sigma - rho)
        ca = float(rho_new * rho)
        cb = float(2.0 * rho_new / delta)
        if use_fused:
            from .pallas_stencil import pallas_cheb_step
            r, d, x = pallas_cheb_step(pal, L.inv_diag, r, d, x,
                                       ca=ca, cb=cb)
        else:
            r = r - stencil_matvec(L.A, d)
            d = ca * d + cb * (Dinv * r)
            x = x + d
        rho = rho_new
    return x


def _vcycle(hier: GeoMgHierarchy, lvl: int, b):
    if lvl == len(hier.levels):
        B = b.shape[0]
        hc, wc = hier.coarse_shape
        flat = b.reshape(B, hc * wc)
        x = flat @ hier.coarse_pinv.T
        return x.reshape(B, hc, wc)
    L = hier.levels[lvl]
    x = _cheb_smooth(L, b, None)        # pre-smooth from zero
    # fused residual + restrict: the pre-smooth residual exists only to
    # be restricted, so the Pallas variant never writes it to HBM
    pal = getattr(L.A, "pallas", None)
    use_rr = False
    if pal is not None:
        from .pallas_stencil import rr_supported
        use_rr = (rr_supported(pal.shape, b.shape[0]) and
                  b.dtype == pal.planes.dtype and
                  b.shape[1:] == tuple(pal.shape))
    if use_rr:
        from .pallas_stencil import pallas_residual_restrict
        rc = pallas_residual_restrict(pal, b, x)
    else:
        rc = _restrict(b - stencil_matvec(L.A, x))
    xc = _vcycle(hier, lvl + 1, rc)
    # piecewise-constant-prolongator MG underestimates the correction;
    # a fixed over-correction factor restores grid-independent rates
    x = x + hier.overcorrect * _prolong(xc, b.shape[1], b.shape[2])
    x = _cheb_smooth(L, b, x)           # post-smooth
    return x


def geomg_apply(hier: GeoMgHierarchy, R):
    """Preconditioner application M^-1 R for the stencil CG."""
    return _vcycle(hier, 0, R)
