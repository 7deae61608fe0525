"""Core pairwise kernel: all-pairs effective resistance over components.

Parity reference: src/core.jl:64-739 (single_ground_all_pairs, both solver
paths, shortcut optimization, get_num_pairs, smash_repeats!, voltmatrix
bookkeeping).

TPU re-design: the reference schedules one linear solve per focal pair
(threads for CG, batches of 1000 for CHOLMOD).  Here BOTH tiers batch:
all pair right-hand sides of a connected component form one (n, n_pairs)
block, solved by multi-RHS CG (one jitted while_loop) or one factorized
back-substitution.  Postprocessing (per-pair maps, cumulative current
reduction) runs over the batch axis without locks.
"""

from __future__ import annotations

import os as _os
from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp

from .. import consts, cslog, out
from ..checkpoint import Checkpoint
from ..graph.build import construct_local_node_map
from ..timer import CSTIMER


@dataclass
class ComponentData:
    """src/core.jl:24-30."""

    cc: np.ndarray
    matrix: sp.spmatrix
    local_nodemap: np.ndarray
    hbmeta: object
    cellmap: np.ndarray


@dataclass
class GraphProblem:
    """src/core.jl:10-22."""

    G: sp.spmatrix
    cc: list
    points: np.ndarray        # graph node id (1-based) per user point
    user_points: np.ndarray   # user point ids
    exclude_pairs: list       # list of (user_id, user_id) tuples
    nodemap: np.ndarray
    polymap: np.ndarray
    hbmeta: object
    cellmap: np.ndarray
    cum: out.Cumulative
    solver: object


def _focal_in_comp(fp, comp_sorted):
    """Boolean mask: which focal node ids lie in the (sorted) component.
    searchsorted instead of per-node set membership — components hold
    ~10^6 nodes at benchmark scale and the Python-set version dominated
    the host profile."""
    fp = np.asarray(fp, np.int64)
    comp_sorted = np.asarray(comp_sorted)
    if comp_sorted.size == 0:
        return np.zeros(fp.shape, bool)
    idx = np.searchsorted(comp_sorted, fp)
    idx_c = np.minimum(idx, comp_sorted.size - 1)
    return (idx < comp_sorted.size) & (comp_sorted[idx_c] == fp)


def _sub_focal(fp, comp_sorted):
    """Unique focal node ids inside the component, in first-occurrence
    order (the reference's `sub_fp` semantics)."""
    mask = _focal_in_comp(fp, comp_sorted)
    return list(dict.fromkeys(int(x) for x in np.asarray(fp)[mask]))


def get_num_pairs(ccs, fp, exclude_pairs, user_points=None):
    """Count pair solves (src/core.jl:537-561)."""
    if user_points is None:
        user_points = fp
    num = 0
    g2u = {int(fp[i]): int(user_points[i]) for i in range(len(fp))}
    for cc in ccs:
        sub_fp = _sub_focal(fp, np.sort(np.asarray(cc)))
        l = len(sub_fp)
        for ii in range(l):
            for jj in range(ii + 1, l):
                if (g2u.get(sub_fp[ii], sub_fp[ii]),
                        g2u.get(sub_fp[jj], sub_fp[jj])) in exclude_pairs:
                    continue
                num += 1
    return num


def get_num_pairs_shortcut(ccs, fp, exclude_pairs, user_points=None):
    """src/core.jl:563-587 — anchor-only pair count."""
    if user_points is None:
        user_points = fp
    num = 0
    g2u = {int(fp[i]): int(user_points[i]) for i in range(len(fp))}
    for cc in ccs:
        sub_fp = _sub_focal(fp, np.sort(np.asarray(cc)))
        if not sub_fp:
            continue
        pt1 = sub_fp[0]
        for jj in range(1, len(sub_fp)):
            if (g2u.get(pt1, pt1),
                    g2u.get(sub_fp[jj], sub_fp[jj])) in exclude_pairs:
                continue
            num += 1
    return num


def single_ground_all_pairs(prob: GraphProblem, flags, cfg, log=True):
    """Solve all focal-point pairs (src/core.jl:70-305, :312-515 unified)."""
    a = prob.G
    dtype = a.dtype
    points = prob.points
    exclude = set(prob.exclude_pairs)
    orig_pts = prob.user_points
    numpoints = len(points)
    of = flags.outputflags
    cum = prob.cum

    cslog.info("Graph has %s nodes, %s focal points and %s connected components",
               a.shape[0], numpoints, len(prob.cc))

    num_pairs = get_num_pairs(prob.cc, points, exclude, orig_pts)
    if log:
        cslog.info("Total number of pair solves = %s", num_pairs)

    resistances = -np.ones((numpoints, numpoints), dtype)
    voltmatrix = np.zeros((numpoints, numpoints), dtype)
    shortcut_res = -np.ones((numpoints, numpoints), dtype)

    ckpt = Checkpoint(getattr(cfg, "checkpoint_file", ""))
    done_pairs = ckpt.load(resistances, cum, voltmatrix)

    get_shortcut = (flags.is_raster and not of.write_volt_maps and
                    not of.write_cur_maps and not of.write_cum_cur_map_only and
                    not of.write_max_cur_maps and not exclude)
    if get_shortcut:
        cslog.info("Triggering resistance calculation shortcut")
        num_pairs = get_num_pairs_shortcut(prob.cc, points, exclude, orig_pts)
        cslog.info("Total number of pair solves has been reduced to %s", num_pairs)

    # TPU fast path: a raster without polygons is exactly a stencil, so
    # the whole grid solves as dense shifted-plane CG — all components
    # and all pairs in one batched device solve, no sparse submatrix
    # extraction.  Shortcut mode always takes it (polygons included —
    # the polygon collapse is applied as the PolyProjector, the exact
    # collapsed system); maps-on jobs take the device maps variant above
    # a size threshold when there are no polygons (tiny golden-corpus
    # problems keep the general reference-parity path).
    stencil_base = (flags.is_raster and not prob.solver.is_direct and
                    prob.cellmap.size > 0 and prob.nodemap.size > 0)
    if stencil_base and get_shortcut:
        _stencil_shortcut_solve(prob, flags, resistances, voltmatrix,
                                shortcut_res, dtype, ckpt, done_pairs,
                                max_par=getattr(cfg, "max_parallel", 0))
        ckpt.finish()
        resistances = shortcut_res
        np.fill_diagonal(resistances, 0)
        op = np.asarray(orig_pts, dtype)
        r = np.vstack([np.concatenate([np.zeros(1, dtype), op])[None, :],
                       np.column_stack([op, resistances])])
        out.save_resistances(r, cfg)
        return r

    maps_min = int(_os.environ.get("CS_PAIRWISE_DEVICE_MIN", "40000"))
    if stencil_base and prob.cellmap.size >= maps_min:
        _stencil_maps_solve(prob, flags, cfg, resistances, cum, exclude)
        np.fill_diagonal(resistances, 0)
        op = np.asarray(orig_pts, dtype)
        r = np.vstack([np.concatenate([np.zeros(1, dtype), op])[None, :],
                       np.column_stack([op, resistances])])
        out.save_resistances(r, cfg)
        return r

    for comp in prob.cc:
        comp = np.sort(np.asarray(comp))
        csub = _sub_focal(points, comp)
        if not csub:
            continue

        # row-slice then column-slice: scipy's np.ix_ path materializes
        # a dense (n, n) index mesh (TiB-scale at 1M nodes).  `a` may be
        # a LazyStencilGraph standing in for the CSR Laplacian.
        idx = comp - 1
        a_csr = a.materialize() if hasattr(a, "materialize") else a.tocsr()
        matrix = a_csr[idx][:, idx].tocsr().astype(dtype)

        if not prob.solver.is_direct:
            # Regularization (src/core.jl:161)
            eps = np.finfo(np.dtype(dtype)).eps
            matrix = matrix.copy()
            matrix.data = matrix.data + eps * np.linalg.norm(matrix.data)

        with CSTIMER("construct preconditioner/factorization"):
            ctx = prob.solver.build(matrix, dtype)
        with CSTIMER("construct local nodemap"):
            local_nodemap = construct_local_node_map(
                prob.nodemap, comp, prob.polymap)
        component_data = ComponentData(comp, matrix, local_nodemap,
                                       prob.hbmeta, prob.cellmap)

        def comp_index(node):
            k = np.searchsorted(comp, node)
            if k >= len(comp) or comp[k] != node:
                raise ValueError(f"Node {node} not found in component")
            return int(k)

        # Assemble the pair batch (src/core.jl:386-444 generalized)
        pair_list = []  # (comp_i, comp_j, [(c_i, c_j), ...])
        point_range = range(1) if get_shortcut else range(len(csub))
        for point_idx in point_range:
            src_node = csub[point_idx]
            comp_i = comp_index(src_node)
            src_indices = np.nonzero(points == src_node)[0]
            # zero resistance between focal points collapsed to one node
            for ii in range(len(src_indices)):
                for jj in range(ii + 1, len(src_indices)):
                    resistances[src_indices[ii], src_indices[jj]] = 0
                    resistances[src_indices[jj], src_indices[ii]] = 0
            for pair_idx in range(point_idx + 1, len(csub)):
                dst_node = csub[pair_idx]
                if src_node == dst_node:
                    continue
                comp_j = comp_index(dst_node)
                dst_indices = np.nonzero(points == dst_node)[0]
                combos = [(int(ci), int(cj))
                          for ci in src_indices for cj in dst_indices
                          if (int(orig_pts[ci]), int(orig_pts[cj])) not in exclude]
                if not combos:
                    continue
                if done_pairs and all(c in done_pairs for c in combos):
                    continue  # resumed from checkpoint
                pair_list.append((comp_i, comp_j, combos))

        if pair_list:
            n_local = matrix.shape[0]
            batch = (prob.solver.batch_size or len(pair_list))
            if True:   # (timer moved to the solve call: postprocess
                # has its own sections, so the stage split can't
                # double-count)
                for st in range(0, len(pair_list), batch):
                    chunk = pair_list[st:st + batch]
                    rhs = np.zeros((n_local, len(chunk)), dtype)
                    for col, (ci, cj, _) in enumerate(chunk):
                        rhs[ci, col] = -1
                        rhs[cj, col] = 1
                    with CSTIMER("solve and accumulate pairs"):
                        lhs = ctx.solve(rhs)
                        # normalize to the source (src/core.jl:466-472)
                        lhs = lhs - lhs[[ci for ci, _, _ in chunk],
                                        range(len(chunk))][None, :]
                    # network currents: all columns at once (vectorized
                    # branch/node currents + pooled file writes) instead
                    # of one postprocess per pair — the per-pair scatter
                    # adds were ~70% of the 100k-node benchmark job
                    batch_net = (not flags.is_raster and not get_shortcut)
                    if batch_net:
                        with CSTIMER("postprocess"):
                            out.network_batch_postprocess(
                                matrix, lhs, chunk, orig_pts, comp,
                                cum, flags, cfg)
                    for col, (ci, cj, combos) in enumerate(chunk):
                        voltages = lhs[:, col]
                        resistance = float(voltages[cj] - voltages[ci])
                        for (c_i, c_j) in combos:
                            resistances[c_i, c_j] = resistance
                            resistances[c_j, c_i] = resistance
                            output = _Output(points, voltages,
                                             (int(orig_pts[c_i]), int(orig_pts[c_j])),
                                             (ci, cj), resistance, c_j)
                            if batch_net:
                                if flags.outputflags.write_volt_maps:
                                    name = (f"_{output.orig_pts[0]}"
                                            f"_{output.orig_pts[1]}")
                                    with CSTIMER("postprocess"):
                                        out.write_volt_maps(
                                            name, voltages,
                                            component_data, flags, cfg)
                                continue
                            with CSTIMER("postprocess"):
                                postprocess(output, component_data, flags,
                                            _Shortcut(get_shortcut, voltmatrix,
                                                      shortcut_res),
                                            cfg, cum)
                        ckpt.mark(combos)
                    ckpt.save(resistances, cum, voltmatrix)

        if get_shortcut and csub:
            anchor_candidates = np.nonzero(points == csub[0])[0]
            if anchor_candidates.size == 0:
                raise ValueError(f"Focal point {csub[0]} not found in points list")
            anchor = int(anchor_candidates[0])
            update_shortcut_resistances(anchor,
                                        _Shortcut(True, voltmatrix, shortcut_res),
                                        resistances, points, comp)

    if get_shortcut:
        resistances = shortcut_res

    ckpt.finish()
    np.fill_diagonal(resistances, 0)

    # Pad with the user point ids (src/core.jl:299)
    op = np.asarray(orig_pts, dtype)
    r = np.vstack([np.concatenate([np.zeros(1, dtype), op])[None, :],
                   np.column_stack([op, resistances])])

    out.save_resistances(r, cfg)
    return r


@dataclass
class _Output:
    """src/core.jl:32-40 (cum carried separately)."""

    points: np.ndarray
    voltages: np.ndarray
    orig_pts: tuple
    comp_idx: tuple  # 0-based local indices
    resistance: float
    col: int         # 0-based index into points of the dst point


@dataclass
class _Shortcut:
    """src/core.jl:42-46."""

    get_shortcut_resistances: bool
    voltmatrix: np.ndarray
    shortcut_res: np.ndarray


def postprocess(output: _Output, component_data, flags, shortcut, cfg, cum):
    """src/core.jl:655-683."""
    if shortcut.get_shortcut_resistances:
        update_voltmatrix(shortcut, output, component_data)
        return

    name = f"_{output.orig_pts[0]}_{output.orig_pts[1]}"

    if flags.outputflags.write_volt_maps:
        out.write_volt_maps(name, output.voltages, component_data, flags, cfg)
    if (flags.outputflags.write_cur_maps or
            flags.outputflags.write_cum_cur_map_only or
            flags.outputflags.write_max_cur_maps or not flags.is_raster):
        out.write_cur_maps(name, output.voltages, component_data,
                           np.asarray([-9999.0]), flags, cfg, cum)


# device-chunk upper bound for the shortcut path (tests shrink this to
# force multi-chunk runs on tiny grids)
_shortcut_chunk_cap = 4096


def _stencil_shortcut_solve(prob, flags, resistances, voltmatrix,
                            shortcut_res, dtype, ckpt=None,
                            done_pairs=None, max_par=0):
    """Shortcut-mode pairwise resistances via the grid stencil operator.

    Solves the N-1 anchor pairs of EVERY connected component in one
    batched stencil CG (solve/stencil.py), then reconstructs the full
    pairwise matrix with the voltage-ratio shortcut
    (src/core.jl:137-146,685-739 semantics).
    """
    import jax.numpy as jnp

    from .. import consts
    from ..solve.dispatch import SolverFailedError
    from ..solve.stencil import (_extract_point_voltages,
                                 stencil_solve_pairs)

    points = prob.points
    nodemap = prob.nodemap
    H, W = nodemap.shape
    # Host builds the f64 planes once; one upload puts them on device
    # (row-sharded over the active mesh when >1 device is visible).
    # Work precision is f32 (cast on device); outer refinement residuals
    # run in plain f64 device ops (solve/stencil.py stencil_solve_pairs).
    with CSTIMER("prepare stencil solver (upload + MG setup)"):
        from ..solve.prepare import prepare_stencil_solver_from_gmap
        S64, prec, prec_apply, _ = prepare_stencil_solver_from_gmap(
            prob.cellmap, flags.avg_res, flags.four_neighbors)
    # polygon (short-circuit region) collapse as the exact projector
    # (solve/stencil.py PolyProjector); None when the nodemap is 1:1
    from ..solve.stencil import build_poly_projector
    proj = (build_poly_projector(nodemap, S64.shape)
            if prob.polymap.size else None)

    # invert the nodemap once: node id -> grid cell
    with CSTIMER("invert nodemap"):
        rr, cc_ = np.nonzero(nodemap)
        node_cell = np.zeros((int(nodemap.max()) + 1, 2), np.int64)
        node_cell[nodemap[rr, cc_]] = np.column_stack([rr, cc_])
        point_cells = node_cell[np.asarray(points)]   # (npts, 2)
        point_cells_dev = jnp.asarray(point_cells, jnp.int32)

    # Assemble anchor pairs per component
    jobs = []  # (comp_sorted, anchor_point_idx, [(src_node, dst_node, combos)])
    pair_cols = []  # flat: (src_cell, dst_cell)
    col_meta = []   # flat: (comp_id, src_node, dst_node)
    for comp_id, comp in enumerate(prob.cc):
        comp = np.sort(np.asarray(comp))
        csub = _sub_focal(points, comp)
        if not csub:
            continue
        src_node = csub[0]
        src_indices = np.nonzero(points == src_node)[0]
        for ii in range(len(src_indices)):
            for jj in range(ii + 1, len(src_indices)):
                resistances[src_indices[ii], src_indices[jj]] = 0
                resistances[src_indices[jj], src_indices[ii]] = 0
        anchor = int(src_indices[0])
        jobs.append((comp, anchor))
        for dst_node in csub[1:]:
            if done_pairs:
                dst_indices = np.nonzero(points == dst_node)[0]
                combos = [(int(ci), int(cj)) for ci in src_indices
                          for cj in dst_indices]
                if combos and all(c in done_pairs for c in combos):
                    continue  # resumed: resistances+voltmatrix restored
            pair_cols.append((node_cell[src_node], node_cell[dst_node]))
            col_meta.append((comp_id, src_node, dst_node, comp, anchor))

    if pair_cols:
        nb = len(pair_cols)
        # memory cap: ~8 live f64 (B, H, W) blocks under the
        # capacity-modeled budget (solve/dispatch.py
        # solve_chunk_budget), floored to a power of two because the
        # fused solve pads its batch UP to one (the old flat 4 GiB
        # budget chose step=5 -> b_pad=8 at 12M cells and OOM'd)
        from ..solve.dispatch import pow2_floor, solve_chunk_budget
        per_col = H * W * 8 * 8
        budget = solve_chunk_budget(H * W)
        step = max(1, min(_shortcut_chunk_cap, budget // max(per_col, 1)))
        if max_par > 0:
            # Circuitscape-4 `max_parallel` semantics on TPU: cap the
            # number of concurrent solves (batch width) per device chunk
            step = min(step, max_par)
        # pow2 floor AFTER the max_parallel clamp: the fused solve pads
        # its batch UP to a power of two, so a non-pow2 cap (e.g. 5)
        # floors down (->4) instead of padding past the budget (->8)
        step = pow2_floor(step)
        for s0 in range(0, nb, step):
            chunk = pair_cols[s0:s0 + step]
            bsz = len(chunk)
            src_cells = np.asarray([c[0] for c in chunk], np.int64)
            dst_cells = np.asarray([c[1] for c in chunk], np.int64)
            with CSTIMER("batched pair solve"):
                import time as _time

                from .. import stats
                from ..solve.dispatch import reraise_if_device_oom
                _t0 = _time.perf_counter()
                try:
                    X, relres, iters = stencil_solve_pairs(
                        S64, src_cells, dst_cells, rtol=consts.CG_RTOL,
                        itmax=consts.CG_ITMAX, prec=prec,
                        prec_apply=prec_apply, proj=proj)
                except Exception as e:
                    reraise_if_device_oom(e, S64.shape[0] * S64.shape[1],
                                          bsz)
                stats.record_solve(X.shape, iters,
                                   _time.perf_counter() - _t0)
            if np.any(relres >= consts.RESIDUAL_GATE):
                raise SolverFailedError(
                    f"CG solver did not converge: relative residual "
                    f"{float(relres.max())} exceeds tolerance "
                    f"{consts.RESIDUAL_GATE}")
            # Fetch ONLY the voltages at focal cells (nb x npts) — the
            # full grids never leave the device.
            sc_dev = jnp.asarray(
                np.concatenate([src_cells,
                                np.zeros((X.shape[0] - bsz, 2), np.int64)]),
                jnp.int32)
            Vp_dev, _ = _extract_point_voltages(X, sc_dev, point_cells_dev)
            Vp = np.asarray(Vp_dev)[:bsz]          # (bsz, npts)

            for col in range(bsz):
                comp_id, src_node, dst_node, comp, anchor = col_meta[s0 + col]
                dst_indices = np.nonzero(points == dst_node)[0]
                src_indices = np.nonzero(points == src_node)[0]
                # any point index mapping to dst_node reads the same value
                resistance = float(Vp[col, dst_indices[0]])
                in_comp = _focal_in_comp(points, comp)
                with np.errstate(divide="ignore", invalid="ignore"):
                    volt_col = 1.0 - Vp[col] / resistance
                for c_i in src_indices:
                    for c_j in dst_indices:
                        resistances[c_i, c_j] = resistance
                        resistances[c_j, c_i] = resistance
                        # voltmatrix column fill (update_voltmatrix
                        # semantics, vectorized over points)
                        sel = in_comp.copy()
                        sel[0] = False  # row 0 never filled (reference)
                        voltmatrix[sel, c_j] = volt_col[sel]
                if ckpt is not None and ckpt.enabled:
                    ckpt.mark([(int(ci), int(cj)) for ci in src_indices
                               for cj in dst_indices])
            if ckpt is not None:
                ckpt.save(resistances, None, voltmatrix)

    for comp, anchor in jobs:
        update_shortcut_resistances(anchor,
                                    _Shortcut(True, voltmatrix, shortcut_res),
                                    resistances, points, comp)


def _stencil_maps_solve(prob, flags, cfg, resistances, cum, exclude):
    """Maps-on pairwise via the stencil device path.

    All pairs of all components solve as one batched stencil system;
    per-pair current maps (node currents as shifted-plane inflow/outflow
    maxima) and voltage maps are computed on device, cumulative and max
    maps reduce over the batch axis on device, and per-pair files fetch
    one map each only when actually written."""
    import jax.numpy as jnp

    from .. import consts
    from ..checkpoint import Checkpoint
    from ..solve.dispatch import SolverFailedError
    from ..solve.stencil import (stencil_node_currents,
                                 stencil_solve_pairs)

    points = prob.points
    orig_pts = prob.user_points
    nodemap = prob.nodemap
    of = flags.outputflags
    dtype = resistances.dtype
    H, W = nodemap.shape

    cslog.info("pairwise device fast path (maps on)")
    from ..solve.prepare import prepare_stencil_solver_from_gmap
    S64, prec, geomg_apply, _ = prepare_stencil_solver_from_gmap(
        prob.cellmap, flags.avg_res, flags.four_neighbors)
    Hp, Wp = S64.shape   # >= (H, W) under a mesh; crop fetched maps
    from ..solve.stencil import build_poly_projector
    proj = (build_poly_projector(nodemap, S64.shape)
            if prob.polymap.size else None)

    rr, cc_ = np.nonzero(nodemap)
    node_cell = np.zeros((int(nodemap.max()) + 1, 2), np.int64)
    node_cell[nodemap[rr, cc_]] = np.column_stack([rr, cc_])

    # component label per cell (voltmaps are zero outside the pair's
    # component, matching create_voltage_map on the local nodemap)
    comp_label_of_node = np.zeros(int(nodemap.max()) + 1, np.int32)
    for ci, comp in enumerate(prob.cc):
        comp_label_of_node[np.asarray(comp)] = ci + 1
    labels_grid = np.zeros((Hp, Wp), np.int32)
    labels_grid[rr, cc_] = comp_label_of_node[nodemap[rr, cc_]]
    labels_dev = jnp.asarray(labels_grid)

    ckpt = Checkpoint(getattr(cfg, "checkpoint_file", ""))
    done_pairs = ckpt.load(resistances, cum)

    # all-pairs assembly across components (same semantics as the
    # general path: solve once per node pair, assign to all combos)
    pair_list = []
    for comp in prob.cc:
        comp = np.sort(np.asarray(comp))
        csub = _sub_focal(points, comp)
        for pi in range(len(csub)):
            src_node = csub[pi]
            src_indices = np.nonzero(points == src_node)[0]
            for ii in range(len(src_indices)):
                for jj in range(ii + 1, len(src_indices)):
                    resistances[src_indices[ii], src_indices[jj]] = 0
                    resistances[src_indices[jj], src_indices[ii]] = 0
            for pj in range(pi + 1, len(csub)):
                dst_node = csub[pj]
                if dst_node == src_node:
                    continue
                dst_indices = np.nonzero(points == dst_node)[0]
                combos = [(int(ci), int(cj))
                          for ci in src_indices for cj in dst_indices
                          if (int(orig_pts[ci]), int(orig_pts[cj]))
                          not in exclude]
                if not combos:
                    continue
                if done_pairs and all(c in done_pairs for c in combos):
                    continue
                pair_list.append((src_node, dst_node, combos))

    # per-pair map writing runs on a thread pool sized to the host: the
    # ASC body formatter is native (io/fastio.py) and releases the GIL,
    # so writes overlap each other and the device solve of the next
    # chunk (the reference serializes this behind IO_LOCK,
    # src/out.jl:505-530)
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    write_pair_files = (of.write_cur_maps and
                        not of.write_cum_cur_map_only)
    need_cur = (of.write_cur_maps or of.write_cum_cur_map_only or
                of.write_max_cur_maps)
    # Fetch reduction: a remote-tunnel TPU moves ~30 MB/s device->host
    # and the maps-on job is fetch-bound, so when per-pair current maps
    # are written the pipeline fetches ONLY the voltage maps and
    # derives each pair's currents on the host (node_currents_np) from
    # the weight planes it already holds — half the bytes on the wire,
    # and the per-map cost rides the writer pool.  Polygon jobs keep
    # the device path (poly_sum has no host twin).
    host_cur = write_pair_files and proj is None
    planes_np = None
    if host_cur:
        from ..solve.stencil import node_currents_np, stencil_planes_np
        planes_np = tuple(p.astype(np.float32) for p in
                          stencil_planes_np(prob.cellmap, flags.avg_res,
                                            flags.four_neighbors))
    need_volt_fetch = of.write_volt_maps or host_cur
    nodata = prob.hbmeta.nodata

    writer = ThreadPoolExecutor(max_workers=max(2, _os.cpu_count() or 2))
    # dedicated fetch thread: np.asarray on a jax array releases the
    # GIL for the duration of the device->host transfer, so the NEXT
    # chunk's solve dispatches while the previous chunk streams over
    # the (slow) host link.  (copy_to_host_async is NOT used: on the
    # axon remote backend it wedges the subsequent np.asarray.)
    fetcher = ThreadPoolExecutor(max_workers=1)
    pending = []            # write futures (files only, no results)
    inflight = deque()      # chunks whose device->host copy is streaming

    def _cur_task(vm, names):
        """One pair on a pool thread: currents from its voltage map,
        postprocess, write every combo's file; returns the map for the
        main-thread cum/max reduction.  Native path (io/fastio.py)
        releases the GIL; numpy fallback is semantics-identical."""
        from ..io import fastio
        cmap = fastio.node_currents_f32(planes_np, vm)
        if cmap is None:
            cmap = node_currents_np(planes_np, vm)
        if of.log_transform_maps:
            with np.errstate(divide="ignore", invalid="ignore"):
                cmap = np.where(cmap > 0, np.log10(cmap), nodata)
        if of.set_null_currents_to_nodata:
            cmap[prob.cellmap == 0] = nodata
        for name in names:
            out.write_grid(cmap, name, cfg, prob.hbmeta)
        return cmap

    def _drain_one():
        chunk, rvals_c, volt_fut, ncur_fut = inflight.popleft()
        with CSTIMER("fetch maps"):
            volt_h = volt_fut.result() if volt_fut is not None else None
            ncur_h = ncur_fut.result() if ncur_fut is not None else None
        cur_futs = []
        with CSTIMER("write maps"):
            for col, (src_node, dst_node, combos) in enumerate(chunk):
                resistance = float(rvals_c[col])
                names = []
                for (c_i, c_j) in combos:
                    resistances[c_i, c_j] = resistance
                    resistances[c_j, c_i] = resistance
                    names.append(
                        f"_{int(orig_pts[c_i])}_{int(orig_pts[c_j])}")
                for name in names:
                    if write_pair_files and not host_cur:
                        pending.append(writer.submit(
                            out.write_grid, ncur_h[col].copy(),
                            name, cfg, prob.hbmeta))
                    if of.write_volt_maps:
                        vm = volt_h[col].copy()
                        if of.set_null_voltages_to_nodata:
                            vm[prob.cellmap == 0] = nodata
                        pending.append(writer.submit(
                            out.write_grid, vm, name, cfg, prob.hbmeta,
                            voltage=True))
                if host_cur:
                    cur_futs.append((writer.submit(
                        _cur_task, volt_h[col], names), len(names)))
                ckpt.mark(combos)
        if cur_futs:
            # cum/max accumulate on the main thread IN SUBMISSION ORDER:
            # a deterministic lock-free reduction (the reference guards
            # this with Cumulative.lock, src/out.jl:100-107).  One
            # accumulation PER COMBO — duplicate focal ids at one node
            # solve once but accumulate once per user pair, exactly as
            # the reference's per-combo postprocess loop does.
            with CSTIMER("node currents + reduce"):
                for f, n_combo in cur_futs:
                    cmap = f.result()
                    cum.cum_curr += cmap.astype(dtype, copy=False) * n_combo
                    if of.write_max_cur_maps:
                        np.maximum(cum.max_curr, cmap, out=cum.max_curr)
        if ckpt.enabled:
            for f in pending:   # a saved chunk's maps must be on disk
                f.result()
            pending.clear()
            ckpt.save(resistances, cum)

    # maps path: per column also holds the normalized Xb, the f32
    # voltage fetch copy, and (device-currents jobs) the f32 ncur block.
    # Chunks cap at 32 even when HBM allows more: the fetch->currents->
    # format->write pipeline overlaps host work with the NEXT chunk's
    # transfer, and one giant chunk serializes the whole output stage
    # behind the whole solve (measured +20 s warm at 1M x 120 pairs).
    from ..solve.dispatch import pow2_floor, solve_chunk_budget
    per_col = H * W * 8 * 9
    # CS_MAPS_CHUNK_BYTES overrides the maps-path chunk budget
    # specifically; it falls back to CS_SHORTCUT_CHUNK_BYTES (the
    # historical shared knob) and then to the capacity model.
    budget = solve_chunk_budget(
        H * W, env_var=("CS_MAPS_CHUNK_BYTES"
                        if _os.environ.get("CS_MAPS_CHUNK_BYTES")
                        else "CS_SHORTCUT_CHUNK_BYTES"))
    step = max(1, min(32, budget // max(per_col, 1)))
    if getattr(cfg, "max_parallel", 0) > 0:
        step = min(step, cfg.max_parallel)
    step = pow2_floor(step)   # pow2 AFTER the clamp (batch pads up)
    try:
        for s0 in range(0, len(pair_list), step):
            chunk = pair_list[s0:s0 + step]
            bsz = len(chunk)
            src_cells = np.asarray([node_cell[p[0]] for p in chunk], np.int64)
            dst_cells = np.asarray([node_cell[p[1]] for p in chunk], np.int64)
            with CSTIMER("batched pair solve"):
                import time as _time

                from .. import stats
                from ..solve.dispatch import reraise_if_device_oom
                _t0 = _time.perf_counter()
                try:
                    X, rel, iters = stencil_solve_pairs(
                        S64, src_cells, dst_cells, rtol=consts.CG_RTOL,
                        itmax=consts.CG_ITMAX, prec=prec,
                        prec_apply=geomg_apply, proj=proj)
                except Exception as e:
                    reraise_if_device_oom(e, S64.shape[0] * S64.shape[1],
                                          bsz)
                stats.record_solve(X.shape, iters,
                                   _time.perf_counter() - _t0)
            if np.any(rel >= consts.RESIDUAL_GATE):
                raise SolverFailedError(
                    f"CG solver did not converge: relative residual "
                    f"{float(rel.max())} exceeds tolerance "
                    f"{consts.RESIDUAL_GATE}")
            Xb = X[:bsz]
            # normalize each column to its source cell (on device), keeping
            # cells outside the pair's component at zero
            cols = jnp.arange(bsz)
            scj = jnp.asarray(src_cells, jnp.int32)
            dcj = jnp.asarray(dst_cells, jnp.int32)
            vsrc = Xb[cols, scj[:, 0], scj[:, 1]]
            pair_label = labels_dev[scj[:, 0], scj[:, 1]]
            in_comp = labels_dev[None] == pair_label[:, None, None]
            Xb = jnp.where(in_comp, Xb - vsrc[:, None, None], 0.0)
            rvals = np.asarray(Xb[cols, dcj[:, 0], dcj[:, 1]])

            ncur = None
            if need_cur and not host_cur:
                with CSTIMER("node currents + reduce"):
                    # f32 node currents: half the HBM traffic and half
                    # the fetch bytes; the cum reduction runs in f64
                    ncur = stencil_node_currents(S64, Xb, proj=proj,
                                                 out_dtype=jnp.float32)
                    if of.log_transform_maps or of.set_null_currents_to_nodata:
                        # match process_grid! per-map postprocess on device
                        if of.log_transform_maps:
                            ncur = jnp.where(ncur > 0, jnp.log10(ncur), nodata)
                        if of.set_null_currents_to_nodata:
                            cmask_np = np.ones((Hp, Wp), bool)
                            cmask_np[:H, :W] = prob.cellmap == 0
                            ncur = jnp.where(jnp.asarray(cmask_np)[None],
                                             nodata, ncur)
                    # one accumulation PER COMBO (duplicate focal ids
                    # share a solve but each user pair accumulates, as
                    # in the reference's per-combo postprocess loop)
                    combo_n = jnp.asarray(
                        [len(c[2]) for c in chunk], jnp.float32)
                    cum.cum_curr += np.asarray(
                        jnp.einsum("b,bhw->hw", combo_n, ncur,
                                   preferred_element_type=jnp.float64),
                        dtype)[:H, :W]
                    if of.write_max_cur_maps:
                        np.maximum(cum.max_curr,
                                   np.asarray(jnp.max(ncur, axis=0),
                                              dtype)[:H, :W],
                                   out=cum.max_curr)
                if not write_pair_files:
                    ncur = None     # reductions done; nothing to fetch

            # Pipelined fetch: cast to f32 ON DEVICE (halves the tunnel
            # bytes; ~1e-7 relative rounding sits far below the 1e-6
            # output tolerance), start the device->host copy streaming,
            # and solve the NEXT chunk while it transfers.  Maps STAY
            # f32 on host: the ASC writer emits 9 significant digits
            # for f32 (exact round-trip) at ~2x the f64 throughput.
            volt32 = (Xb[:, :H, :W].astype(jnp.float32)
                      if need_volt_fetch else None)

            def _timed_fetch(dev):
                # wire time as seen by the fetcher thread; the drain's
                # "fetch maps" section measures only the residual WAIT
                with CSTIMER("fetch maps (wire)"):
                    return np.asarray(dev)

            volt_fut = (fetcher.submit(_timed_fetch, volt32)
                        if volt32 is not None else None)
            ncur_fut = (fetcher.submit(_timed_fetch, ncur[:, :H, :W])
                        if ncur is not None else None)
            inflight.append((chunk, rvals, volt_fut, ncur_fut))
            if len(inflight) >= 2:
                _drain_one()
        while inflight:
            _drain_one()
        with CSTIMER("write maps"):
            for f in pending:
                f.result()
            pending.clear()
    finally:
        writer.shutdown(wait=True)
        fetcher.shutdown(wait=True)
    ckpt.finish()


def update_shortcut_resistances(anchor, sc, resistances, points, comp):
    """Reconstruct all pairwise resistances from the anchor solves
    (src/core.jl:706-739, 0-based indices).

    Uses R2x = 2*R12*Vx + R1x - R12 where Vx is the normalized voltage
    at point x in the anchor->point2 solve."""
    voltmatrix = sc.voltmatrix
    shortcut = sc.shortcut_res
    check = _focal_in_comp(points, comp)  # comp arrives sorted
    l = resistances.shape[0]
    for pointx in range(l):
        if not check[pointx]:
            continue
        R1x = resistances[anchor, pointx]
        if R1x == -1:
            continue
        shortcut[pointx, anchor] = shortcut[anchor, pointx] = R1x
        for point2 in range(pointx, l):
            if not check[point2]:
                continue
            R12 = resistances[anchor, point2]
            if R12 == -1:
                continue
            if R1x != consts.RESISTANCE_INVALID:
                shortcut[anchor, point2] = shortcut[point2, anchor] = R12
                Vx = voltmatrix[pointx, point2]
                R2x = 2 * R12 * Vx + R1x - R12
                if shortcut[point2, pointx] != consts.RESISTANCE_INVALID:
                    shortcut[point2, pointx] = shortcut[pointx, point2] = R2x
            else:
                shortcut[pointx, :] = consts.RESISTANCE_INVALID
                shortcut[:, pointx] = consts.RESISTANCE_INVALID


def update_voltmatrix(shortcut, output, component_data):
    """src/core.jl:685-703 (0-based indices)."""
    voltmatrix = shortcut.voltmatrix
    c = output.points
    cc = component_data.cc
    voltages = output.voltages
    r = output.resistance
    j = output.col
    for i in range(1, len(c)):
        k = np.searchsorted(cc, c[i])
        if k < len(cc) and cc[k] == c[i]:
            v = voltages[k]
            voltmatrix[i, j] = 1 - v / r
