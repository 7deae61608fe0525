"""Advanced-mode kernel: arbitrary source/ground configurations.

Parity reference: src/raster/advanced.jl:1-344 (AdvancedProblem,
compute_advanced_data, get_sources_and_grounds, resolve_conflicts,
advanced_kernel, multiple_solver, multiple_solve).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp

from .. import consts, cslog, out
from ..graph import build
from ..solve.dispatch import get_solver, SolverFailedError
from .flags import get_raster_flags


@dataclass
class AdvancedProblem:
    """src/raster/advanced.jl:1-15."""

    G: sp.spmatrix
    cc: list
    nodemap: np.ndarray
    polymap: np.ndarray
    hbmeta: object
    sources: np.ndarray
    grounds: np.ndarray
    source_map: np.ndarray
    finitegrounds: np.ndarray
    check_node: int
    src: int
    cellmap: np.ndarray
    solver: object


def raster_advanced(cfg, dtype=np.float64):
    """src/raster/advanced.jl:17-33."""
    from ..io.loaders import load_raster_data
    rasterdata = load_raster_data(cfg, dtype)
    flags = get_raster_flags(cfg)
    advanced_data = compute_advanced_data(rasterdata, flags, cfg, dtype)
    v, _ = advanced_kernel(advanced_data, flags, cfg)
    return v


def compute_advanced_data(data, flags, cfg, dtype=np.float64):
    """src/raster/advanced.jl:36-71."""
    nodemap = build.construct_node_map(data.cellmap, data.polymap)
    if data.polymap.size:
        A = build.construct_graph(data.cellmap, nodemap, flags.avg_res,
                                  flags.four_neighbors)
        G = build.laplacian(A)
        cc = build.components(G)
    else:
        # no polygons: the stencil IS the graph — defer the CSR build
        # (seconds of host time at 1M cells) exactly like the pairwise
        # fast path; the general path materializes on demand
        from .raster import LazyStencilGraph, _grid_components
        G = LazyStencilGraph(data.cellmap, nodemap, flags.avg_res,
                             flags.four_neighbors, dtype)
        cc = _grid_components(data.cellmap, nodemap, flags.four_neighbors)

    sources, grounds, finitegrounds = get_sources_and_grounds(
        data, flags, G, nodemap)

    solver = get_solver(cfg)
    return AdvancedProblem(G, cc, nodemap, data.polymap, data.hbmeta,
                           sources, grounds, data.source_map, finitegrounds,
                           -1, 0, data.cellmap, solver)


def get_sources_and_grounds(data, flags, G, nodemap):
    """src/raster/advanced.jl:73-80."""
    return _get_sources_and_grounds(data.source_map, data.ground_map,
                                    flags, G, nodemap)


def _get_sources_and_grounds(source_map, ground_map, flags, G, nodemap,
                             override_policy=None):
    """src/raster/advanced.jl:82-117."""
    policy = override_policy if override_policy else flags.policy
    n = G.shape[0]
    dtype = G.dtype
    sources = np.zeros(n, dtype)
    grounds = np.zeros(n, dtype)

    if flags.is_raster:
        si, sj = np.nonzero(source_map)
        for r, c in zip(si, sj):
            v = nodemap[r, c]
            if v != 0:
                sources[v - 1] += source_map[r, c]
        gi, gj = np.nonzero(ground_map)
        for r, c in zip(gi, gj):
            v = nodemap[r, c]
            if v != 0:
                grounds[v - 1] += ground_map[r, c]
    else:
        gm = ground_map.copy()
        if flags.grnd_file_is_res:
            # 1/0 -> inf marks a direct ground, as in the reference
            with np.errstate(divide="ignore"):
                gm[:, 1] = 1.0 / gm[:, 1]
        sources[source_map[:, 0].astype(np.int64) - 1] = source_map[:, 1]
        grounds[gm[:, 0].astype(np.int64) - 1] = gm[:, 1]

    return resolve_conflicts(sources, grounds, policy)


def resolve_conflicts(sources, grounds, policy):
    """src/raster/advanced.jl:119-149."""
    sources = np.asarray(sources).copy()
    grounds = np.asarray(grounds).copy()

    finitegrounds = np.where(grounds < np.inf, grounds, 0.0)
    if np.count_nonzero(finitegrounds) == 0:
        finitegrounds = np.asarray([-9999.0])

    conflicts = (sources != 0) & (grounds != 0)
    if conflicts.any():
        if policy == "rmvsrc":
            sources[conflicts] = 0
        elif policy == "rmvgnd":
            grounds[conflicts] = 0
        elif policy == "rmvall":
            sources[conflicts] = 0

    infgrounds = grounds == np.inf
    infconflicts = infgrounds & (sources > 0)
    grounds[infconflicts] = 0

    return sources, grounds, finitegrounds


def _advanced_device_fast(prob: AdvancedProblem, flags, cfg,
                          force_currents=False):
    """Device path for plain advanced mode (raster, no polygons).

    One batched stencil solve covers every qualifying component:
    finite grounds add their exact conductance to the diagonal, direct
    (infinite) grounds become penalty entries, sources in components
    without grounds are zeroed (those components are skipped by the
    reference, src/raster/advanced.jl:194).  Node currents include the
    finite-ground diagonal current terms (src/out.jl:193-202).

    Returns (volt_grid, outcurr) or None if preconditions fail.
    """
    import os

    import jax.numpy as jnp

    from .. import consts
    from ..solve.dispatch import SolverFailedError
    from ..solve.stencil import (advanced_ground_penalty,
                                 stencil_node_currents,
                                 stencil_solve_advanced_batch)

    if (not flags.is_raster or cfg.solver != "cg+amg" or
            prob.check_node != -1 or flags.is_onetoall or
            flags.is_alltoone):
        return None
    min_cells = int(os.environ.get("CS_ADVANCED_DEVICE_MIN", "40000"))
    if prob.cellmap.size < min_cells:
        return None

    nodemap = prob.nodemap
    H, W = nodemap.shape
    dtype = prob.G.dtype
    of = flags.outputflags

    cslog.info("advanced device fast path")
    n = prob.G.shape[0]
    rr, cc_ = np.nonzero(nodemap)
    node_ids = nodemap[rr, cc_]
    # member-cell count per node: per-cell source/ground values are the
    # merged node's total divided by its size, so polygon sums recover
    # the reference's merged-node totals exactly
    node_count = np.bincount(node_ids, minlength=n + 1).astype(np.float64)
    node_count[node_count == 0] = 1.0

    sources = np.asarray(prob.sources, np.float64)
    grounds = np.asarray(prob.grounds, np.float64)
    fg_sentinel = (prob.finitegrounds.size == 1 and
                   prob.finitegrounds[0] == -9999.0)
    finite = (np.zeros(n) if fg_sentinel
              else np.asarray(prob.finitegrounds, np.float64))

    # qualifying components: nonzero sources AND grounds
    # (src/raster/advanced.jl:194)
    comp_of_node = np.zeros(n + 1, np.int64)
    for ci, comp in enumerate(prob.cc):
        comp_of_node[np.asarray(comp)] = ci
    ncomp = len(prob.cc)
    # signed sums, exactly like the reference's skip test
    ssum = np.bincount(comp_of_node[1:], weights=sources, minlength=ncomp)
    with np.errstate(invalid="ignore"):
        gsum = np.bincount(comp_of_node[1:],
                           weights=np.where(np.isinf(grounds), 1.0, grounds),
                           minlength=ncomp)
    ok_comp = (ssum != 0) & (gsum != 0)
    keep = ok_comp[comp_of_node[np.arange(1, n + 1)]]
    src_vec = np.where(keep, sources, 0.0)
    if not np.any(src_vec):
        return None   # nothing to solve; let the general path decide

    inf_mask = np.isinf(grounds)
    inv_cnt = 1.0 / node_count[node_ids]

    # the ground diagonal as a per-cell field, with np.inf marking
    # direct grounds (resolved to the penalty scale inside prepare);
    # merged nodes spread their total over member cells (total/size)
    with np.errstate(invalid="ignore"):
        pen_spec = np.zeros((H, W))
        pen_spec[rr, cc_] = np.where(inf_mask, np.inf,
                                     finite)[node_ids - 1] * inv_cnt

    # pen-aware setup: the ground diagonal is baked into the hierarchy
    # (its absence made the V-cycle precondition the floating Laplacian
    # — 81 CG iterations vs 10 for pairwise at the same 1M grid)
    from ..timer import CSTIMER
    from ..solve.prepare import prepare_stencil_solver_from_gmap_pen
    with_pen = True
    with CSTIMER("prepare stencil solver (upload + MG setup)"):
        S64, prec, geomg_apply, _, pen_host = \
            prepare_stencil_solver_from_gmap_pen(
                prob.cellmap, flags.avg_res, flags.four_neighbors, pen_spec)
    if pen_host is None:   # mesh run: masked-preconditioner fallback
        with_pen = False
        penalty = advanced_ground_penalty(S64)
        pen_host = np.where(np.isinf(pen_spec), penalty, pen_spec)
    Hp, Wp = S64.shape
    from ..solve.stencil import build_poly_projector
    proj = (build_poly_projector(nodemap, S64.shape)
            if prob.polymap.size else None)

    src_grid = np.zeros((H, W))
    src_grid[rr, cc_] = src_vec[node_ids - 1] * inv_cnt

    sc = np.column_stack([rr, cc_])
    import time as _time

    from .. import stats
    _t0 = _time.perf_counter()
    with CSTIMER("batched pair solve"):
        X, rel, iters = stencil_solve_advanced_batch(
            S64,
            sc[None], src_grid[rr, cc_][None],
            sc[None], pen_host[rr, cc_][None],
            rtol=consts.CG_RTOL, itmax=consts.CG_ITMAX,
            prec=prec, prec_apply=geomg_apply, proj=proj,
            pen_in_prec=with_pen)
    stats.record_solve(X.shape, iters, _time.perf_counter() - _t0)
    if np.any(rel >= consts.RESIDUAL_GATE):
        raise SolverFailedError(
            f"advanced device solve residual {float(rel.max())} exceeds "
            f"tolerance {consts.RESIDUAL_GATE}")

    with CSTIMER("fetch maps"):
        # cast on device: the job's output dtype rides the (slow) link
        # instead of the solver's f64 (half the bytes at single)
        volt = np.asarray(X[0].astype(jnp.dtype(np.dtype(dtype).name)),
                          dtype)[:H, :W].copy()
    volt[nodemap == 0] = 0

    outcurr = np.zeros((H, W), dtype)
    if force_currents or of.write_cur_maps or of.write_cum_cur_map_only:
        with CSTIMER("node currents + reduce"):
            if fg_sentinel:
                ncur = stencil_node_currents(S64, X, proj=proj)[0]
            else:
                # finite-ground diagonal current terms (penalty cells
                # are the reference's deleted nodes — excluded)
                fin_grid = np.zeros((Hp, Wp))
                fin_grid[rr, cc_] = np.where(inf_mask, 0.0,
                                             finite)[node_ids - 1] * inv_cnt
                ncur = _node_currents_with_fg(S64, X, jnp.asarray(fin_grid),
                                              proj=proj)[0]
            outcurr = np.asarray(
                ncur.astype(jnp.dtype(np.dtype(dtype).name)),
                dtype)[:H, :W].copy()
        if of.write_cur_maps or of.write_cum_cur_map_only:
            with CSTIMER("write maps"):
                out.write_grid(outcurr.copy(), "", cfg, prob.hbmeta,
                               cellmap=prob.cellmap)
    if of.write_volt_maps:
        with CSTIMER("write maps"):
            out.write_grid(volt.copy(), "", cfg, prob.hbmeta,
                           cellmap=prob.cellmap, voltage=True)

    return volt, outcurr


def _node_currents_with_fg(S, V, fg_grid, proj=None):
    """Node currents including the finite-ground diagonal terms
    (src/out.jl:193-206): inflow += relu(-fg*v), outflow += relu(fg*v),
    node current = max of the two."""
    import jax.numpy as jnp

    from ..solve.stencil import _sh, poly_sum

    dirs = [(0, 1, S.we), (0, -1, _sh(S.we[None], 0, 1)[0]),
            (1, 0, S.ws), (-1, 0, _sh(S.ws[None], 1, 0)[0]),
            (1, 1, S.wse), (-1, -1, _sh(S.wse[None], 1, 1)[0]),
            (-1, 1, S.wne), (1, -1, _sh(S.wne[None], -1, 1)[0])]
    maxb = jnp.zeros(V.shape[0], V.dtype)
    flows = []
    for dr, dc, w in dirs:
        vn = _sh(V, -dr, -dc)
        f = w[None] * (vn - V)
        flows.append(f)
        maxb = jnp.maximum(maxb, jnp.max(jnp.abs(f), axis=(-2, -1)))
    thr = (1e-8 * maxb)[:, None, None]
    inflow = jnp.zeros_like(V)
    outflow = jnp.zeros_like(V)
    for f in flows:
        f = jnp.where(jnp.abs(f) < thr, 0.0, f)
        inflow = inflow + jnp.maximum(f, 0.0)
        outflow = outflow + jnp.maximum(-f, 0.0)
    fgv = fg_grid[None] * V
    inflow = inflow + jnp.maximum(-fgv, 0.0)
    outflow = outflow + jnp.maximum(fgv, 0.0)
    if proj is not None:
        inflow = poly_sum(proj, inflow)
        outflow = poly_sum(proj, outflow)
    return jnp.maximum(inflow, outflow)


def advanced_kernel(prob: AdvancedProblem, flags, cfg):
    """src/raster/advanced.jl:151-271."""
    fast = _advanced_device_fast(prob, flags, cfg)
    if fast is not None:
        return fast
    G = prob.G
    nodemap = prob.nodemap
    polymap = prob.polymap
    hbmeta = prob.hbmeta
    sources = prob.sources
    grounds = prob.grounds
    finitegrounds = prob.finitegrounds
    cellmap = prob.cellmap
    dtype = G.dtype

    of = flags.outputflags
    is_raster = flags.is_raster

    volt = np.zeros(nodemap.shape, dtype)
    solver_called = False
    voltages = np.zeros(G.shape[0], dtype)
    outvolt = out.alloc_map(hbmeta, dtype) if is_raster else None
    outcurr = out.alloc_map(hbmeta, dtype) if is_raster else np.zeros((0, 0), dtype)

    fg_sentinel = finitegrounds.size == 1 and finitegrounds[0] == -9999.0

    for c in prob.cc:
        c = np.sort(np.asarray(c))
        if prob.check_node != -1 and prob.check_node not in c:
            continue

        # row then column slice (np.ix_ on CSR densifies the index mesh)
        a_local = G.tocsr()[c - 1][:, c - 1].tocsr()
        s_local = sources[c - 1]
        g_local = grounds[c - 1]

        if s_local.sum() == 0 or g_local.sum() == 0:
            continue

        f_local = finitegrounds if fg_sentinel else finitegrounds[c - 1]

        v_comp = multiple_solver(cfg, prob.solver, a_local, s_local.copy(),
                                 g_local, f_local)
        voltages[c - 1] += v_comp
        solver_called = True

        local_nodemap = build.construct_local_node_map(nodemap, c, polymap)

        if of.write_volt_maps and is_raster:
            out.accum_voltages(outvolt, v_comp, local_nodemap, hbmeta)
        if of.write_cur_maps and is_raster:
            out.accum_currents(outcurr, v_comp, cfg, a_local, v_comp,
                               f_local, local_nodemap, hbmeta)

        if is_raster:
            mask = local_nodemap != 0
            volt[mask] = v_comp[local_nodemap[mask] - 1]

    name = "" if prob.src == 0 else f"_{int(prob.src)}"
    cd = _FullGraphData(G, cellmap, hbmeta)
    if of.write_volt_maps:
        if not is_raster:
            out.write_volt_maps(name, voltages, cd, flags, cfg)
        else:
            out.write_grid(outvolt, name, cfg, hbmeta, cellmap=cellmap,
                           voltage=True)

    if of.write_cur_maps or of.write_cum_cur_map_only:
        if not is_raster:
            out.write_cur_maps(name, voltages, cd, finitegrounds, flags,
                               cfg, None)
        else:
            out.write_grid(outcurr, name, cfg, hbmeta, cellmap=cellmap)

    if not is_raster:
        ids = np.arange(1, G.shape[0] + 1, dtype=dtype)
        return np.column_stack([ids, voltages]), outcurr

    if not solver_called:
        return -np.ones((1, 1), dtype), outcurr

    if flags.is_onetoall:
        idx = prob.source_map != 0
        vals = volt[idx] / prob.source_map[idx]
        # Julia's `val[1] ≈ 0` with default atol is exact equality
        if vals[0] == 0:
            return -np.ones((1, 1), dtype), outcurr
        return vals.reshape(-1, 1).astype(dtype), outcurr
    if flags.is_alltoone:
        return np.zeros((1, 1), dtype), outcurr

    return volt, outcurr


class _FullGraphData:
    """src/raster/advanced.jl:335-343 (FullGraph)."""

    def __init__(self, G, cellmap, hbmeta=None):
        self.matrix = G
        self.cc = np.arange(1, G.shape[0] + 1, dtype=np.int64)
        self.local_nodemap = np.zeros((0, 0), np.int64)
        self.hbmeta = hbmeta
        self.cellmap = cellmap


def multiple_solver(cfg, solver, a, sources, grounds, finitegrounds):
    """One simultaneous solve with finite/infinite grounds
    (src/raster/advanced.jl:274-305)."""
    asolve = a
    if finitegrounds[0] != -9999:
        asolve = a + sp.diags(finitegrounds)

    infgrounds = np.nonzero(grounds == np.inf)[0]
    keep = np.setdiff1d(np.arange(a.shape[0]), infgrounds)
    sources_kept = np.delete(sources, infgrounds)
    asolve = asolve.tocsr()[keep][:, keep]

    volt = multiple_solve(solver, asolve.tocsr(), sources_kept)

    voltages = np.zeros(a.shape[0], a.dtype)
    voltages[keep] = volt
    return voltages


def multiple_solve(solver, matrix, sources):
    """src/raster/advanced.jl:307-333."""
    ctx = solver.build(matrix, matrix.dtype)
    volt = ctx.solve(sources.reshape(-1, 1))[:, 0]
    snorm = np.linalg.norm(sources)
    if snorm > 0:
        res = np.linalg.norm(matrix @ volt - sources) / snorm
        if res >= consts.RESIDUAL_GATE:
            raise SolverFailedError(
                f"Advanced solve residual {res} exceeds tolerance")
    return volt
