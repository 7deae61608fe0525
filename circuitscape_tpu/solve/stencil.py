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
    pallas: optional pre-expanded plane set (solve/pallas_stencil.py
            PallasStencil); when attached, stencil_matvec dispatches to
            the fused single-pass Pallas kernel at supported shapes
            (~2.6x the XLA formulation's sustained nnz/s on v5e).
    shard:  optional halo-extended per-shard plane set
            (parallel/mesh.py ShardStencil); when attached under a
            device mesh, stencil_matvec dispatches to the shard_map
            formulation (explicit ppermute halo exchange, per-shard
            Pallas on TPU) instead of GSPMD's auto-partitioned XLA ops.
    """

    we: jnp.ndarray
    ws: jnp.ndarray
    wse: jnp.ndarray
    wne: jnp.ndarray
    diag: jnp.ndarray
    pallas: object = None
    shard: object = None

    def tree_flatten(self):
        return (self.we, self.ws, self.wse, self.wne, self.diag,
                self.pallas, self.shard), ()

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


@jax.tree_util.register_pytree_node_class
class PolyProjector:
    """Polygon (short-circuit region) collapse for the stencil solve.

    The reference merges polygon cells into one graph node before
    building the Laplacian (src/raster/pairwise.jl:283-314 relabeling);
    the stencil operator cannot express merged nodes, so the collapse is
    applied as the orthogonal projector Pi = P (P^T P)^-1 P^T onto
    polygon-constant grid fields (P = cell->reduced-node incidence).
    Running CG with the operator Pi L Pi on range(Pi) solves the EXACT
    collapsed system P^T L P v = P^T b in the (P^T P)-weighted inner
    product — identical answers to the reference's merged-node graph,
    while the hot matvec stays the dense-shaped stencil kernel.

    Pi itself costs one small segment-sum + gather per application:
    seg maps each polygon cell to its polygon id (all other cells map to
    a trash slot whose inv_count is 0), so num_segments is the polygon
    count, not the node count.
    """

    def __init__(self, seg, inv_counts, nseg: int):
        self.seg = seg                # (H*W,) int32
        self.inv_counts = inv_counts  # (nseg,) f64; trash slot = 0.0
        self.nseg = nseg              # static

    def tree_flatten(self):
        return (self.seg, self.inv_counts), (self.nseg,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])


def build_poly_projector(nodemap: np.ndarray, shape=None):
    """PolyProjector from a nodemap whose merged (polygon) nodes cover
    more than one cell; None when the nodemap has no merged nodes.

    shape: padded (H, W) of the device operator when it exceeds the
    nodemap's (mesh padding); padded cells map to the trash slot."""
    active = nodemap > 0
    ids, counts = np.unique(nodemap[active], return_counts=True)
    shared = ids[counts > 1]
    if shared.size == 0:
        return None
    npoly = shared.size
    H, W = nodemap.shape
    Hp, Wp = shape if shape is not None else (H, W)
    nm = np.zeros((Hp, Wp), nodemap.dtype)
    nm[:H, :W] = nodemap
    flat = nm.ravel()
    pos = np.searchsorted(shared, flat)
    pos = np.clip(pos, 0, npoly - 1)
    is_poly = (shared[pos] == flat) & (flat > 0)
    seg = np.where(is_poly, pos, npoly).astype(np.int32)
    inv_counts = np.concatenate([1.0 / counts[counts > 1],
                                 np.zeros(1)]).astype(np.float64)
    return PolyProjector(jnp.asarray(seg), jnp.asarray(inv_counts),
                         int(npoly) + 1)


def poly_project(proj: PolyProjector, y: jnp.ndarray) -> jnp.ndarray:
    """Apply Pi to a (B, H, W) block: polygon cells take their polygon
    mean, all other cells pass through.

    proj.seg of shape (H*W,) applies one merge pattern to every column;
    shape (B, H*W) applies a PER-COLUMN pattern (the focal-regions
    pairwise path, where each pair merges its own two focal regions
    on top of the shared base polygons)."""
    B, H, W = y.shape
    flat = y.reshape(B, H * W)
    if proj.seg.ndim == 2:
        sums = jax.vmap(
            lambda r, s: jax.ops.segment_sum(r, s,
                                             num_segments=proj.nseg))(
            flat, proj.seg)
        means = sums * proj.inv_counts.astype(y.dtype)
        corr = jnp.take_along_axis(means, proj.seg, axis=1)
        is_poly = proj.seg < proj.nseg - 1
    else:
        sums = jax.vmap(
            lambda r: jax.ops.segment_sum(r, proj.seg,
                                          num_segments=proj.nseg))(flat)
        means = sums * proj.inv_counts.astype(y.dtype)[None]
        corr = jnp.take(means, proj.seg, axis=1)
        is_poly = (proj.seg < proj.nseg - 1)[None]
    return jnp.where(is_poly, corr, flat).reshape(B, H, W)


def poly_sum(proj: PolyProjector, y: jnp.ndarray) -> jnp.ndarray:
    """Polygon cells take their polygon SUM (broadcast to members);
    all other cells pass through.  Used for merged-node current maps.
    Handles per-column seg arrays like poly_project."""
    B, H, W = y.shape
    flat = y.reshape(B, H * W)
    if proj.seg.ndim == 2:
        sums = jax.vmap(
            lambda r, s: jax.ops.segment_sum(r, s,
                                             num_segments=proj.nseg))(
            flat, proj.seg)
        corr = jnp.take_along_axis(sums.astype(y.dtype), proj.seg, axis=1)
        is_poly = proj.seg < proj.nseg - 1
    else:
        sums = jax.vmap(
            lambda r: jax.ops.segment_sum(r, proj.seg,
                                          num_segments=proj.nseg))(flat)
        corr = jnp.take(sums.astype(y.dtype), proj.seg, axis=1)
        is_poly = (proj.seg < proj.nseg - 1)[None]
    return jnp.where(is_poly, corr, flat).reshape(B, H, W)


def build_poly_projector_rows(nodemaps, shape) -> PolyProjector:
    """Batched PolyProjector from one nodemap PER COLUMN (focal-regions
    pairwise: each pair merges its own focal regions).  All rows share
    one segment budget nseg = max polygon count + trash slot."""
    rows_seg, rows_inv, npolys = [], [], []
    Hp, Wp = shape
    per = []
    for nm in nodemaps:
        active = nm > 0
        ids, counts = np.unique(nm[active], return_counts=True)
        shared = ids[counts > 1]
        per.append((shared, counts[counts > 1]))
        npolys.append(shared.size)
    nseg = max(npolys) + 1 if npolys else 1
    for nm, (shared, counts) in zip(nodemaps, per):
        H, W = nm.shape
        full = np.zeros((Hp, Wp), nm.dtype)
        full[:H, :W] = nm
        flat = full.ravel()
        npoly = shared.size
        if npoly:
            pos = np.searchsorted(shared, flat)
            pos = np.clip(pos, 0, npoly - 1)
            is_poly = (shared[pos] == flat) & (flat > 0)
            seg = np.where(is_poly, pos, nseg - 1).astype(np.int32)
        else:
            seg = np.full(flat.shape, nseg - 1, np.int32)
        inv = np.zeros(nseg, np.float64)
        inv[:npoly] = 1.0 / counts
        rows_seg.append(seg)
        rows_inv.append(inv)
    return PolyProjector(jnp.asarray(np.stack(rows_seg)),
                         jnp.asarray(np.stack(rows_inv)), int(nseg))


@jax.jit
def _split_planes(stacked):
    return StencilOperator(stacked[0], stacked[1], stacked[2],
                           stacked[3], stacked[4])


def upload_stencil(planes_np, dtype=jnp.float64) -> StencilOperator:
    """Move 5 host planes to device as ONE stacked transfer + one split
    dispatch (per-plane uploads pay 5x the host-link latency)."""
    stacked = jnp.asarray(np.stack([np.asarray(p) for p in planes_np]),
                          dtype)
    return _split_planes(stacked)


def _pad_plane(a: np.ndarray, H: int, W: int) -> np.ndarray:
    out = np.zeros((H, W), a.dtype)
    out[:a.shape[0], :a.shape[1]] = a
    return out


def stencil_planes_np(gmap: np.ndarray, avg_res: bool, four_neighbors: bool):
    """Host-side plane construction; returns 5 numpy float64 arrays
    (we, ws, wse, wne, diag).  See stencil_from_gmap."""
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

    return we, ws, wse, wne, diag


def stencil_activity_stats(gmap: np.ndarray, four_neighbors: bool) -> int:
    """Fine-level nnz of the stencil Laplacian: 2*edges + number of
    active cells with at least one active neighbor.

    Lives next to stencil_planes_np so the adjacency rules (4/8
    neighbors, activity = gmap > 0) have exactly one definition; the
    stats layer (solve/prepare.py) consumes this for the sustained
    nnz/s metric."""
    act = np.asarray(gmap) > 0
    edges = (int(np.count_nonzero(act[:, :-1] & act[:, 1:])) +
             int(np.count_nonzero(act[:-1, :] & act[1:, :])))
    nbr = np.zeros_like(act)
    nbr[:, :-1] |= act[:, 1:]
    nbr[:, 1:] |= act[:, :-1]
    nbr[:-1, :] |= act[1:, :]
    nbr[1:, :] |= act[:-1, :]
    if not four_neighbors:
        edges += (int(np.count_nonzero(act[:-1, :-1] & act[1:, 1:])) +
                  int(np.count_nonzero(act[1:, :-1] & act[:-1, 1:])))
        nbr[:-1, :-1] |= act[1:, 1:]
        nbr[1:, 1:] |= act[:-1, :-1]
        nbr[1:, :-1] |= act[:-1, 1:]
        nbr[:-1, 1:] |= act[1:, :-1]
    return 2 * edges + int(np.count_nonzero(act & nbr))


def stencil_from_gmap(gmap: np.ndarray, avg_res: bool, four_neighbors: bool,
                      dtype=np.float32) -> StencilOperator:
    """Build the weight planes from a conductance map, with the same four
    edge-weight rules as graph/build.py (res_avg/cond_avg/weird_avg/
    weirder_avg; src/raster/pairwise.jl:364-367).

    Only valid when no polygons collapse nodes (the stencil is then
    exactly the graph).  Cells with gmap <= 0 take no edges.
    """
    planes = stencil_planes_np(gmap, avg_res, four_neighbors)
    to = lambda a: jnp.asarray(a, dtype)
    return StencilOperator(*(to(p) for p in planes))


def stencil_from_gmap_device(gmap, avg_res: bool, four_neighbors: bool,
                             dtype=jnp.float64) -> StencilOperator:
    """Device-side plane construction from an uploaded conductance map.

    Only the (H, W) gmap crosses the host->device link (4-8 MB at the
    1M-cell scale); everything else is computed on device.  Same weight
    rules as stencil_from_gmap.
    """
    g = jnp.asarray(gmap, dtype)
    act = g > 0

    if avg_res:
        f1 = lambda a, b: 2.0 / (1.0 / a + 1.0 / b)
        f2 = lambda a, b: 2.0 / (jnp.sqrt(2.0) * (1.0 / a + 1.0 / b))
    else:
        f1 = lambda a, b: (a + b) / 2.0
        f2 = lambda a, b: (a + b) / (2.0 * jnp.sqrt(2.0))

    def plane(dr, dc, fn):
        """Weight plane at the source cell for offset (dr, dc)."""
        gs = _sh(g[None], -dr, -dc)[0]        # neighbor value at source
        ms = _sh(act[None].astype(dtype), -dr, -dc)[0] > 0
        safe_g = jnp.where(g == 0, 1.0, g)
        safe_n = jnp.where(gs == 0, 1.0, gs)
        w = fn(safe_g, safe_n)
        return jnp.where(act & ms, w, 0.0)

    we = plane(0, 1, f1)
    ws = plane(1, 0, f1)
    if four_neighbors:
        wse = jnp.zeros_like(we)
        wne = jnp.zeros_like(we)
    else:
        wse = plane(1, 1, f2)
        wne = plane(-1, 1, f2)

    # diagonal = sum of incident edge weights (each plane contributes at
    # both endpoints)
    diag = (we + _sh(we[None], 0, 1)[0] +
            ws + _sh(ws[None], 1, 0)[0] +
            wse + _sh(wse[None], 1, 1)[0] +
            wne + _sh(wne[None], -1, 1)[0])
    return StencilOperator(we, ws, wse, wne, diag)


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

    When a Pallas plane set is attached (prepare_stencil_solver,
    single-device runs on TPU), supported shapes dispatch to the fused
    one-pass kernel instead — the decision is made at trace time from
    static shapes/dtypes, so each jitted program contains exactly one
    formulation.
    """
    shd = getattr(A, "shard", None)
    if shd is not None and x.shape[-2:] == A.diag.shape and \
            x.dtype == A.diag.dtype and \
            x.shape[0] % shd.mesh.shape["batch"] == 0:
        from ..parallel.mesh import shard_matvec
        return shard_matvec(shd, x)
    pal = getattr(A, "pallas", None)
    if pal is not None:
        from .pallas_stencil import pallas_matvec, supported
        if (supported(pal.shape, x.shape[0]) and
                x.dtype == pal.planes.dtype and
                x.shape[1:] == tuple(pal.shape)):
            return pallas_matvec(pal, x)
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


_stencil_matvec_jit = jax.jit(stencil_matvec)


@jax.jit
def _apply_op_jit(A, x, pen, proj=None):
    return _apply_op(A, x, pen, proj)


def stencil_node_currents(A: StencilOperator, V: jnp.ndarray,
                          cutoff=1e-8, proj=None,
                          out_dtype=None) -> jnp.ndarray:
    """Node current maps from voltage blocks, on device.

    Mirrors the reference's node current = max(inflow, outflow) with
    positive/negative branch splitting and the 1e-8*max branch cutoff
    (src/out.jl:178-290), expressed as shifted-plane arithmetic over
    (B, H, W) voltage blocks.  The cutoff max is taken per column over
    the whole grid (the reference takes it per component; differences
    affect only branches below 1e-8 of the maximum).

    Flow planes are RECOMPUTED in the accumulation pass instead of kept
    from the threshold pass — peak memory drops from ~11 (B, H, W)
    blocks to ~5, which is what lets maps-on chunks run at the same
    batch size as the solve itself.  `out_dtype=float32` additionally
    halves every block (the maps-on path writes f32 text anyway).
    """
    if out_dtype is not None and V.dtype != out_dtype:
        V = V.astype(out_dtype)
    dirs = []  # (dr, dc, weight_plane_at_j)
    dirs.append((0, 1, A.we))                        # E
    dirs.append((0, -1, _sh(A.we[None], 0, 1)[0]))   # W
    dirs.append((1, 0, A.ws))                        # S
    dirs.append((-1, 0, _sh(A.ws[None], 1, 0)[0]))   # N
    dirs.append((1, 1, A.wse))                       # SE
    dirs.append((-1, -1, _sh(A.wse[None], 1, 1)[0]))  # NW
    dirs.append((-1, 1, A.wne))                      # NE
    dirs.append((1, -1, _sh(A.wne[None], -1, 1)[0]))  # SW
    dirs = [(dr, dc, w.astype(V.dtype)) for dr, dc, w in dirs]

    # branch-current cutoff threshold per column (max |signed branch|)
    maxb = jnp.zeros(V.shape[0], V.dtype)
    for dr, dc, w in dirs:
        f = w[None] * (_sh(V, -dr, -dc) - V)
        maxb = jnp.maximum(maxb, jnp.max(jnp.abs(f), axis=(-2, -1)))
    thr = (cutoff * maxb)[:, None, None]

    inflow = jnp.zeros_like(V)
    outflow = jnp.zeros_like(V)
    for dr, dc, w in dirs:
        f = w[None] * (_sh(V, -dr, -dc) - V)
        f = jnp.where(jnp.abs(f) < thr, 0.0, f)
        inflow = inflow + jnp.maximum(f, 0.0)
        outflow = outflow + jnp.maximum(-f, 0.0)
    if proj is not None:
        # merged (polygon) nodes: the node current is the merged node's
        # TOTAL in/outflow, broadcast to every member cell (the reference
        # computes currents on the collapsed graph and writes
        # current[nodemap[cell]]).  Internal polygon edges carry zero
        # flow (equal voltages), so summing the per-cell flows over the
        # polygon gives exactly the merged node's external flows.
        inflow = poly_sum(proj, inflow)
        outflow = poly_sum(proj, outflow)
    return jnp.maximum(inflow, outflow)


def _apply_op(A, x, pen, proj=None):
    """Operator application with an optional per-column diagonal
    penalty field (B, H, W) — the batched-Dirichlet mechanism for
    advanced/one-to-all grounds — and an optional polygon projector
    (x is maintained in range(Pi); projecting the output keeps the
    iteration on the exact collapsed system)."""
    y = stencil_matvec(A, x)
    if pen is not None:
        y = y + pen * x
    if proj is not None:
        y = poly_project(proj, y)
    return y


def _make_prec_apply(A, prec, prec_apply, pen, proj=None):
    """Preconditioner application closure shared by the CG init and
    loop (they must apply the IDENTICAL operator for CG to be valid).

    With a penalty field, the preconditioner is the SPD combination
    M^-1 = P M0^-1 P + D_pen — the base V-cycle on the projection onto
    non-penalized cells plus exact diagonal inversion on penalized
    cells (P = mask projector, both terms SPD on complementary
    subspaces)."""
    if pen is not None:
        full_diag = A.diag[None] + pen
        inv_pen = jnp.where(full_diag > 0,
                            1.0 / jnp.where(full_diag == 0, 1.0, full_diag),
                            1.0)
    if prec_apply is None:
        inv_diag = jnp.where(A.diag > 0,
                             1.0 / jnp.where(A.diag == 0, 1.0, A.diag), 1.0)
        if pen is None:
            base = lambda r: inv_diag[None] * r
        else:
            base = lambda r: inv_pen * r
    elif pen is None:
        base = lambda r: prec_apply(prec, r)
    else:
        def base(r):
            r_in = jnp.where(pen > 0, 0.0, r)
            z = prec_apply(prec, r_in)
            return jnp.where(pen > 0, r * inv_pen, z)

    if proj is None:
        return base
    # Pi M Pi is SPD on range(Pi) (inputs are already in range(Pi), so
    # only the output projection is applied)
    return lambda r: poly_project(proj, base(r))


def _cg_state_init(A: StencilOperator, B: jnp.ndarray, prec=None,
                   prec_apply=None, pen=None, proj=None):
    Z = _make_prec_apply(A, prec, prec_apply, pen, proj)(B)
    R = B
    big = jnp.asarray(jnp.finfo(B.dtype).max, B.dtype)
    # rn2 (per-column ||R||^2) rides the state so neither the loop
    # condition nor the stall detector recomputes the reduction — a
    # full read pass over R per occurrence (~0.5 ms/iter at 1M x 32)
    return (jnp.zeros_like(B), R, Z, Z, jnp.sum(R * Z, axis=(-2, -1)),
            jnp.asarray(0), big, jnp.asarray(0),
            jnp.sum(R * R, axis=(-2, -1)))


_cg_state_init_jit = jax.jit(_cg_state_init, static_argnames=("prec_apply",))


def _cg_loop(A, B, state, tol, safe_bnorm, k_stop, itmax, prec=None,
             prec_apply=None, pen=None, proj=None):
    """while_loop running until convergence, stall, itmax, or k_stop
    (the per-device-call step budget for the chunked driver).

    prec/prec_apply: preconditioner state pytree + static apply
    callable (e.g. the geometric-multigrid V-cycle, solve/geomg.py);
    defaults to Jacobi."""
    apply_M = _make_prec_apply(A, prec, prec_apply, pen, proj)

    def not_done(carry):
        X, R, Z, P, rz, k, best, since, rn2 = carry
        resnorm = jnp.sqrt(rn2)
        worst = jnp.max(resnorm / safe_bnorm)
        # `since` detects stall at the f32 rounding floor; the `worst`
        # guard detects DIVERGENCE past it (once the recurrence hits the
        # floor, beta turns into amplified noise and the iterate can blow
        # up — observed with the Pallas matvec's rounding at 1M cells).
        # Both exits leave the outer f64 refinement to re-residualize.
        return jnp.logical_and(
            jnp.logical_and(jnp.logical_and(k < itmax, k < k_stop),
                            jnp.logical_and(since < 50, worst <= best * 8)),
            jnp.any(resnorm > tol))

    # fused matvec + partial pAp (one pass) when the plain operator is
    # in play; penalty/projector paths keep the composite apply
    pal = getattr(A, "pallas", None) if pen is None and proj is None \
        else None
    use_mvdot = False
    if pal is not None and getattr(A, "shard", None) is None:
        from .pallas_stencil import supported as _pal_ok
        d0 = B.shape  # (nrhs, H, W) template
        use_mvdot = (_pal_ok(pal.shape, d0[0]) and
                     B.dtype == pal.planes.dtype and
                     d0[1:] == tuple(pal.shape) and pal.W <= 4094)

    def body(carry):
        X, R, Z, P, rz, k, best, since, _ = carry
        if use_mvdot:
            from .pallas_stencil import pallas_matvec_pap
            AP, pAp = pallas_matvec_pap(pal, P)
        else:
            AP = _apply_op(A, P, pen, proj)
            pAp = jnp.sum(P * AP, axis=(-2, -1))
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        X = X + alpha[:, None, None] * P
        R = R - alpha[:, None, None] * AP
        # Periodic residual replacement: recompute the true residual so
        # the f32 recurrence cannot drift away from it (van der Vorst);
        # costs 1 extra matvec every 64 iterations.
        R = jax.lax.cond(
            (k + 1) % 64 == 0,
            lambda: B - _apply_op(A, X, pen, proj),
            lambda: R)
        Z = apply_M(R)
        rz_new = jnp.sum(R * Z, axis=(-2, -1))
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        P = Z + beta[:, None, None] * P
        rn2 = jnp.sum(R * R, axis=(-2, -1))
        worst = jnp.max(jnp.sqrt(rn2) / safe_bnorm)
        improved = worst < best * 0.999
        best = jnp.minimum(best, worst)
        since = jnp.where(improved, 0, since + 1)
        return (X, R, Z, P, rz_new, k + 1, best, since, rn2)

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
    X, R, Z, P, rz, iters, _, _, _ = _cg_loop(A, B, state, tol, safe_bnorm,
                                              itmax, itmax)
    relres = jnp.sqrt(jnp.sum((B - stencil_matvec(A, X)) ** 2,
                              axis=(-2, -1))) / safe_bnorm
    return X, relres, iters


@partial(jax.jit, static_argnames=("chunk", "prec_apply"))
def _cg_chunk(A, B, state, tol, safe_bnorm, chunk, itmax, prec=None,
              prec_apply=None, pen=None, proj=None):
    k0 = state[5]
    return _cg_loop(A, B, state, tol, safe_bnorm, k0 + chunk, itmax,
                    prec, prec_apply, pen, proj)


@partial(jax.jit)
def _true_relres(A, B, X, safe_bnorm, proj=None):
    R = B - _apply_op(A, X, None, proj)
    return jnp.sqrt(jnp.sum(R ** 2, axis=(-2, -1))) / safe_bnorm


def stencil_cg(A: StencilOperator, B: jnp.ndarray, rtol=1e-6,
               itmax=100_000, chunk=512, prec=None, prec_apply=None,
               pen=None, proj=None):
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

    state = _cg_state_init_jit(A, B, prec, prec_apply, pen, proj)
    k_prev = -1
    while True:
        state = _cg_chunk(A, B, state, tol, safe_bnorm, chunk, itmax,
                          prec, prec_apply, pen, proj)
        k = int(state[5])
        resnorm = np.sqrt(np.asarray(state[8]))
        # k == k_prev: the device loop refused to advance (stall at the
        # f32 floor or divergence guard) — the caller's outer refinement
        # takes over from the true residual
        if (k >= itmax or k == k_prev or
                not np.any(resnorm > np.asarray(tol))):
            break
        k_prev = k
    X = state[0]
    relres = _true_relres(A, B, X, safe_bnorm, proj)
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


def node_currents_np(planes, V: np.ndarray, cutoff=1e-8) -> np.ndarray:
    """Host (numpy) node currents from one (H, W) voltage map or a
    (B, H, W) block — the exact same max(inflow, outflow) /
    cutoff*max-branch semantics as stencil_node_currents.

    Purpose: the remote-tunnel TPU moves ~30 MB/s device->host, so a
    maps-on pairwise job is fetch-bound.  Fetching ONLY the voltage
    maps and deriving each pair's current map on the host (the host
    already holds the weight planes) halves the bytes on the wire; the
    per-map cost (~40 ms) rides the writer pool.  `planes` is the
    (we, ws, wse, wne, diag) tuple from stencil_planes_np, any float
    dtype (computation runs in V.dtype)."""
    squeeze = V.ndim == 2
    if squeeze:
        V = V[None]
    dt = V.dtype
    we, ws, wse, wne = (np.asarray(p, dt) for p in planes[:4])

    def sh(p, dr, dc):
        """out[i, j] = p[i + dr, j + dc], zero fill (matches _sh)."""
        out = np.zeros_like(p)
        H, W = p.shape[-2:]
        rs = slice(max(dr, 0), H + min(dr, 0))
        cs = slice(max(dc, 0), W + min(dc, 0))
        rd = slice(max(-dr, 0), H + min(-dr, 0))
        cd = slice(max(-dc, 0), W + min(-dc, 0))
        out[..., rd, cd] = p[..., rs, cs]
        return out

    dirs = [(0, 1, we), (0, -1, sh(we, 0, -1)),
            (1, 0, ws), (-1, 0, sh(ws, -1, 0)),
            (1, 1, wse), (-1, -1, sh(wse, -1, -1)),
            (-1, 1, wne), (1, -1, sh(wne, 1, -1))]

    flows = [w[None] * (sh(V, dr, dc) - V) for dr, dc, w in dirs]
    maxb = np.zeros(V.shape[0], dt)
    for f in flows:
        np.maximum(maxb, np.abs(f).max(axis=(-2, -1)), out=maxb)
    thr = (cutoff * maxb)[:, None, None]
    inflow = np.zeros_like(V)
    outflow = np.zeros_like(V)
    for f in flows:
        f = np.where(np.abs(f) < thr, 0, f)
        inflow += np.maximum(f, 0)
        outflow += np.maximum(-f, 0)
    out = np.maximum(inflow, outflow)
    return out[0] if squeeze else out


@partial(jax.jit, static_argnames=("H", "W", "b_pad"))
def _pairs_rhs(src_cells, dst_cells, H, W, b_pad):
    """Build the ±1 pair RHS block on device from index arrays (the only
    upload is a few hundred int32s)."""
    nb = src_cells.shape[0]
    rhs = jnp.zeros((b_pad, H, W), jnp.float64)
    cols = jnp.arange(nb)
    rhs = rhs.at[cols, src_cells[:, 0], src_cells[:, 1]].add(-1.0)
    rhs = rhs.at[cols, dst_cells[:, 0], dst_cells[:, 1]].add(1.0)
    return rhs


@partial(jax.jit)
def _extract_point_voltages(X, src_cells, point_cells):
    """Per-column normalized voltages at the focal cells, on device.

    Returns (vsrc-normalized values at point_cells (nb, npts),
    values at src (nb,))."""
    nb = X.shape[0]
    cols = jnp.arange(nb)
    vsrc = X[cols, src_cells[:, 0], src_cells[:, 1]]
    Vp = X[:, point_cells[:, 0], point_cells[:, 1]] - vsrc[:, None]
    return Vp, vsrc


# Per-pass relative tolerance of the f32 inner solves.  The f32 MG-CG
# recurrence has a rounding floor near 4e-6 relative at the 1M-cell
# scale, and PUSHING INTO the floor is hazardous: past it, beta becomes
# amplified noise and the iterate can diverge (observed: residual
# climbing from 4e-6 back to 1e0 within 20 iterations under the Pallas
# matvec's rounding).  Iterative refinement removes the hazard
# structurally — each inner pass stops ~25x above the floor and the f64
# outer recurrence closes the remaining gap, so no pass ever operates
# where f32 CG is unstable.
INNER_RTOL = 1e-4
MAX_PASSES = 6


@partial(jax.jit, static_argnames=("prec_apply", "itmax", "mesh"))
def _solve_pairs_fused(S64, A_lo, prec, prec_apply, sc, dc, point_cells,
                       rtol, itmax, mesh=None, proj=None):
    """The WHOLE mixed-precision pair solve as one device execution:
    RHS scatter, iterative refinement (f32 MG-CG inner passes at
    INNER_RTOL, f64 true-residual outer loop, additional passes only
    while a column is above rtol), final f64 residuals, and
    focal-voltage extraction — the host link sees one dispatch and one
    small packed fetch.  (Per-roundtrip latency on a remote-tunnel TPU
    is ~40ms; the ~25 roundtrips this replaces used to dominate the
    1M-cell job.)"""
    b_pad = sc.shape[0]
    H, W = S64.shape
    B64 = _pairs_rhs(sc, dc, H, W, b_pad)
    if proj is not None:
        # collapsed-system RHS: Pi b spreads the unit injection over the
        # focal node's polygon (= P D^-1 b_reduced, the exact reduced
        # RHS in this formulation)
        B64 = poly_project(proj, B64)
    if mesh is not None:
        # pin the canonical layout: pairs over 'batch', grid rows over
        # 'nodes' — GSPMD derives the halo exchanges and psums from here
        from jax.sharding import NamedSharding, PartitionSpec as _P
        B64 = jax.lax.with_sharding_constraint(
            B64, NamedSharding(mesh, _P("batch", "nodes", None)))
    # padded columns (src == dst) scatter to net-zero RHS already
    bnorm = jnp.sqrt(jnp.sum(B64 * B64, axis=(-2, -1)))
    safe_bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    tol64 = rtol * bnorm                       # absolute target, f64

    # bound each while_loop so one dispatch can't run unboundedly long
    # on a pathological problem (the chunked driver handles the rest)
    kcap = min(itmax, 2000)

    def one_pass(R64):
        R32 = R64.astype(jnp.float32)
        tol32 = jnp.maximum(tol64, INNER_RTOL *
                            jnp.sqrt(jnp.sum(R32 * R32, axis=(-2, -1)))
                            ).astype(jnp.float32)
        st = _cg_state_init(A_lo, R32, prec, prec_apply, None, proj)
        st = _cg_loop(A_lo, R32, st, tol32,
                      safe_bnorm.astype(jnp.float32), kcap, kcap,
                      prec, prec_apply, None, proj)
        return st[0].astype(jnp.float64), st[5]

    def refine_cond(carry):
        X, R, rel, iters, npass = carry
        return jnp.logical_and(npass < MAX_PASSES, jnp.any(rel > rtol))

    def refine_body(carry):
        X, R, rel, iters, npass = carry
        dX, it = one_pass(R)
        X = X + dX
        R = B64 - _apply_op(S64, X, None, proj)
        rel = jnp.sqrt(jnp.sum(R * R, axis=(-2, -1))) / safe_bnorm
        return (X, R, rel, iters + it, npass + 1)

    X0 = jnp.zeros_like(B64)
    rel0 = jnp.where(bnorm > 0, jnp.inf, 0.0)
    X, R, rel, iters, _ = jax.lax.while_loop(
        refine_cond, refine_body, (X0, B64, rel0, jnp.asarray(0), 0))
    Vp, _ = _extract_point_voltages(X, sc, point_cells)
    # one packed fetch: [rel (b_pad) | iters (1) | Vp (b_pad*npts)]
    packed = jnp.concatenate([
        rel, iters.astype(jnp.float64)[None],
        Vp.astype(jnp.float64).ravel()])
    return X, packed


def stencil_solve_pairs(S64: StencilOperator, src_cells: np.ndarray,
                        dst_cells: np.ndarray, rtol=1e-6, itmax=100_000,
                        prec=None, prec_apply=None, max_refine=4,
                        proj=None):
    """Device-resident mixed-precision pair solve.

    The RHS block is scattered on device from (row, col) index arrays;
    inner iterations run in f32 (chunked MG-CG); outer residuals and
    the solution accumulate in f64 ON DEVICE (plain f64 elementwise /
    stencil ops — no f64 while_loops).  Nothing larger than the index
    arrays and per-pair scalars crosses the host link.

    Returns (X (f64 device array, (b_pad, H, W)), rel (np, nb), iters).
    """
    nb = src_cells.shape[0]
    X, _, rel, iters = _fused_pair_solve(
        S64, src_cells, dst_cells, np.zeros((1, 2), np.int64),
        rtol, itmax, prec, prec_apply, max_refine, proj)
    return X, rel[:nb], iters


def stencil_solve_pairs_points(S64: StencilOperator, src_cells, dst_cells,
                               point_cells, rtol=1e-6, itmax=100_000,
                               prec=None, prec_apply=None, max_refine=4,
                               proj=None):
    """Pair solve + focal-voltage extraction in one device roundtrip.

    Returns (X (f64 device, (b_pad, H, W)), Vp (np, (nb, npts)) —
    src-normalized voltages at point_cells, rel (np, nb), iters)."""
    nb = src_cells.shape[0]
    X, Vp, rel, iters = _fused_pair_solve(
        S64, src_cells, dst_cells, point_cells, rtol, itmax, prec,
        prec_apply, max_refine, proj)
    return X, Vp[:nb], rel[:nb], iters


def _fused_pair_solve(S64, src_cells, dst_cells, point_cells, rtol, itmax,
                      prec, prec_apply, max_refine, proj=None):
    """Single-dispatch fused solve with a chunked-driver fallback for
    the (rare) case two refinement passes don't reach rtol."""
    from ..parallel.mesh import mesh_of

    H, W = S64.shape
    nb = src_cells.shape[0]
    b_pad = 1 << max(0, nb - 1).bit_length()
    mesh = mesh_of(S64.diag)
    if mesh is not None:
        bax = mesh.shape["batch"]
        b_pad = -(-b_pad // bax) * bax   # even shards over 'batch'
    sc_np = np.zeros((b_pad, 2), np.int32)
    dc_np = np.zeros((b_pad, 2), np.int32)
    sc_np[:nb] = src_cells
    dc_np[:nb] = dst_cells
    if proj is not None and proj.seg.ndim == 2 and \
            proj.seg.shape[0] != b_pad:
        # batched (per-column) projector: pad with all-trash rows so the
        # padded zero columns ride an identity projection
        extra = b_pad - proj.seg.shape[0]
        seg = jnp.concatenate([
            proj.seg,
            jnp.full((extra, proj.seg.shape[1]), proj.nseg - 1,
                     proj.seg.dtype)])
        inv = jnp.concatenate([
            proj.inv_counts,
            jnp.zeros((extra, proj.inv_counts.shape[1]),
                      proj.inv_counts.dtype)])
        proj = PolyProjector(seg, inv, proj.nseg)
    # padded columns: src == dst == (0,0) -> the ±1 scatter cancels and
    # the RHS column is exactly zero (rel = 0, never gates convergence)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P
        sh_b = NamedSharding(mesh, _P("batch", None))
        sc = jax.device_put(jnp.asarray(sc_np), sh_b)
        dc = jax.device_put(jnp.asarray(dc_np), sh_b)
        pc = jax.device_put(jnp.asarray(np.asarray(point_cells), jnp.int32),
                            NamedSharding(mesh, _P()))
    else:
        sc = jnp.asarray(sc_np)
        dc = jnp.asarray(dc_np)
        pc = jnp.asarray(np.asarray(point_cells), jnp.int32)
    npts = pc.shape[0]
    if prec is not None and getattr(prec, "levels", ()):
        A_lo = prec.levels[0].A   # the hierarchy's fine level IS f32 A
    else:
        A_lo = _to_dtype(S64, jnp.float32)

    X, packed = _solve_pairs_fused(S64, A_lo, prec, prec_apply, sc, dc,
                                   pc, rtol, itmax, mesh, proj)
    packed = np.asarray(packed)   # the one fetch
    rel = packed[:b_pad]
    total_iters = int(packed[b_pad])
    Vp = packed[b_pad + 1:].reshape(b_pad, npts)

    if not np.all(rel[:nb] <= rtol) and max_refine > 2:
        B = _pairs_rhs(sc, dc, H, W, b_pad)
        if proj is not None:
            B = poly_project(proj, B)
        bnorm = jnp.sqrt(jnp.sum(B * B, axis=(-2, -1)))
        safe_bnorm = np.asarray(jnp.where(bnorm == 0, 1.0, bnorm))
        R = B - _apply_op_jit(S64, X, None, proj)
        for _ in range(max_refine - 2):
            inner = np.clip(rtol / np.where(rel == 0, 1.0, rel),
                            INNER_RTOL, 0.05)
            dX, _, it = stencil_cg(A_lo, R.astype(jnp.float32), inner,
                                   itmax=itmax, prec=prec,
                                   prec_apply=prec_apply, proj=proj)
            X = X + dX.astype(jnp.float64)
            R = B - _apply_op_jit(S64, X, None, proj)
            rel = np.asarray(
                jnp.sqrt(jnp.sum(R * R, axis=(-2, -1)))) / safe_bnorm
            total_iters += int(it)
            if np.all(rel[:nb] <= rtol):
                break
        Vp = np.asarray(_extract_point_voltages(X, sc, pc)[0])
    return X, Vp, rel, total_iters


@partial(jax.jit, static_argnames=("H", "W"))
def _scatter_field(cells, vals, H, W):
    """(B, K, 2) cells + (B, K) values -> (B, H, W) field (zeros
    elsewhere; padding entries carry value 0)."""
    B = cells.shape[0]
    cols = jnp.arange(B)[:, None]
    return jnp.zeros((B, H, W), vals.dtype).at[
        cols, cells[..., 0], cells[..., 1]].add(vals)


def stencil_solve_advanced_batch(S64: StencilOperator, src_cells, src_vals,
                                 gnd_cells, gnd_vals, rtol=1e-6,
                                 itmax=100_000, prec=None, prec_apply=None,
                                 max_refine=4, proj=None,
                                 pen_in_prec=False, A_lo=None):
    """Batched advanced-mode solve: (G + diag(g)) v = s per column.

    Each column has its own sources (cells + strengths) and grounds
    (cells + conductances).  Infinite grounds are imposed by penalty:
    pass a huge conductance (see advanced_ground_penalty) — the solved
    voltage at those cells is O(1/penalty), matching the reference's
    row/col deletion (src/raster/advanced.jl:282-304) to far below the
    solve tolerance.  All scatters/solves/residuals stay on device;
    mixed precision as in stencil_solve_pairs.

    src_cells/gnd_cells: (B, K, 2) int arrays (pad with (0,0) + value 0)
    src_vals/gnd_vals:   (B, K) float64

    pen_in_prec: the hierarchy was built with the ground diagonal baked
    into every level (prepare_stencil_solver_from_gmap_pen) — its fine
    level IS the f32 (G + diag(g)) operator, so the inner CG runs with
    pen=None and the plain V-cycle preconditioner.  The f64 outer
    residual always applies S64 + pen explicitly either way.

    A_lo: explicit f32 inner operator.  Used by one-to-all, where the
    hierarchy bakes the SHARED penalty (all focal cells) but each
    column's exact operator needs its own per-column penalty on the
    BARE Laplacian — prec.levels[0].A would double-count.

    Returns (X (f64 device, (B, H, W)), rel (np, B), iters).
    """
    from ..parallel.mesh import mesh_of

    H, W = S64.shape
    nb_in = np.asarray(src_cells).shape[0]
    mesh = mesh_of(S64.diag)
    if mesh is not None:
        # pad the batch to even 'batch' shards (zero columns: rel = 0)
        bax = mesh.shape["batch"]
        b_pad = -(-nb_in // bax) * bax
        if b_pad != nb_in:
            def padb(a):
                a = np.asarray(a)
                return np.concatenate(
                    [a, np.zeros((b_pad - nb_in,) + a.shape[1:], a.dtype)])
            src_cells, src_vals = padb(src_cells), padb(src_vals)
            gnd_cells, gnd_vals = padb(gnd_cells), padb(gnd_vals)
    B_rhs = _scatter_field(jnp.asarray(src_cells, jnp.int32),
                           jnp.asarray(src_vals, jnp.float64), H, W)
    pen64 = _scatter_field(jnp.asarray(gnd_cells, jnp.int32),
                           jnp.asarray(gnd_vals, jnp.float64), H, W)
    if proj is not None:
        # collapsed-system RHS (caller passes per-cell values that sum
        # to the merged node's total, i.e. total/size per member cell —
        # already polygon-constant; Pi is a no-op on such fields but is
        # applied for safety with arbitrary callers)
        B_rhs = poly_project(proj, B_rhs)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P
        sh = NamedSharding(mesh, _P("batch", "nodes", None))
        B_rhs = jax.device_put(B_rhs, sh)
        pen64 = jax.device_put(pen64, sh)
    pen32 = pen64.astype(jnp.float32)

    if A_lo is None:
        if prec is not None and getattr(prec, "levels", ()):
            A_lo = prec.levels[0].A   # f32 fine level (pallas-ready)
        else:
            A_lo = _to_dtype(S64, jnp.float32)
    bnorm = jnp.sqrt(jnp.sum(B_rhs * B_rhs, axis=(-2, -1)))
    safe_bnorm = np.asarray(jnp.where(bnorm == 0, 1.0, bnorm))

    X = jnp.zeros_like(B_rhs)
    R = B_rhs
    total_iters = 0
    nb = B_rhs.shape[0]
    rel = np.full(nb, np.inf)
    for pass_i in range(max_refine):
        # floor-safe inner tolerances: never ask an f32 pass for more
        # than INNER_RTOL relative (see the INNER_RTOL note above)
        inner = max(rtol, INNER_RTOL) if pass_i == 0 else np.clip(
            rtol / np.where(rel == 0, 1.0, rel), INNER_RTOL, 0.05)
        dX, _, it = stencil_cg(A_lo, R.astype(jnp.float32), inner,
                               itmax=itmax, prec=prec,
                               prec_apply=prec_apply,
                               pen=None if pen_in_prec else pen32,
                               proj=proj)
        X = X + dX.astype(jnp.float64)
        R = B_rhs - _apply_op_jit(S64, X, pen64, proj)
        rel = np.asarray(
            jnp.sqrt(jnp.sum(R * R, axis=(-2, -1)))) / safe_bnorm
        total_iters += int(it)
        if np.all(rel <= rtol):
            break
    return X, rel[:nb_in], total_iters


def advanced_ground_penalty(S64: StencilOperator) -> float:
    """Penalty conductance standing in for an infinite (direct) ground:
    large enough that the residual ground voltage is far below the 1e-6
    solve target, small enough to stay well-conditioned in f32 after
    Jacobi scaling."""
    return 1e8 * float(jnp.max(S64.diag))


@partial(jax.jit, static_argnums=(1,))
def _to_dtype(A: StencilOperator, dtype) -> StencilOperator:
    """One-dispatch cast of all five planes (eager per-plane casts each
    pay a host roundtrip on a tunneled TPU)."""
    return StencilOperator(*(p.astype(dtype) for p in
                             (A.we, A.ws, A.wse, A.wne, A.diag)))
