"""One-to-all / all-to-one scenario driver.

Parity reference: src/raster/onetoall.jl:1-194.  Each focal node becomes
one advanced solve (source at the node vs grounds at the rest, or the
inverse); solves are independent, so on TPU they batch/shard naturally.
Reference quirks are preserved deliberately (nodemap rebuilt from the
original polymap in the included-pairs branch, strengths indexed by loop
position) since the golden outputs encode them.
"""

from __future__ import annotations

import os

import numpy as np

from .. import cslog, out
from ..graph import build
from ..io.loaders import load_raster_data
from ..solve.dispatch import get_solver
from .advanced import (AdvancedProblem, _get_sources_and_grounds,
                       advanced_kernel)
from .flags import get_raster_flags
from .raster import prune_points


def raster_one_to_all(cfg, dtype=np.float64):
    """src/raster/onetoall.jl:1-11."""
    rasterdata = load_raster_data(cfg, dtype)
    flags = get_raster_flags(cfg)
    return onetoall_kernel(rasterdata, flags, cfg, dtype)


def prune_strengths(strengths, point_ids):
    """src/raster/onetoall.jl:182-194."""
    keep = np.isin(strengths[:, 0], point_ids)
    return strengths[keep]


def _onetoall_device_fast(data, flags, cfg, dtype):
    """Batched device path for one-to-all / all-to-one.

    Every focal node's advanced solve becomes one column of a single
    batched stencil system: its grounds are imposed as per-column
    diagonal penalties (solve/stencil.py stencil_solve_advanced_batch),
    so ALL focal-node solves of the whole job run as one device batch
    instead of the reference's one-task-per-point loop
    (src/raster/onetoall.jl:146-151).  Used when the raster has no
    polygons/regions/include-pairs (the stencil is exactly the graph).

    Returns the result matrix, or None when preconditions do not hold.
    """
    import jax.numpy as jnp

    from .. import consts
    from ..solve.dispatch import SolverFailedError
    from ..solve.stencil import (advanced_ground_penalty,
                                 stencil_node_currents,
                                 stencil_solve_advanced_batch)
    from ..graph import build

    strengths = data.strengths
    points_rc = data.points_rc
    gmap = data.cellmap
    hbmeta = data.hbmeta
    rows, cols, pts = points_rc

    if (not data.included_pairs.isempty() or cfg.solver != "cg+amg" or
            len(pts) != len(np.unique(pts))):
        return None
    min_cells = int(os.environ.get("CS_ONETOALL_DEVICE_MIN", "40000"))
    if gmap.size < min_cells:
        return None

    one_to_all = flags.is_onetoall
    use_var = strengths.size > 0
    of = flags.outputflags
    H, W = gmap.shape

    cslog.info("one-to-all device fast path: %s points in one batch",
               len(pts))

    # One-to-all: every column grounds all other focal nodes, so the
    # shared penalty field (penalty at every focal cell) is baked into
    # the hierarchy (prepare_stencil_solver_from_gmap_pen) and the
    # V-cycle preconditions the grounded operator.  All-to-one grounds
    # a SINGLE (different) cell per column — no penalty scheme
    # conditions that well (the floating-hierarchy masked scheme
    # measurably DIVERGED at 1M cells) — so those columns solve the
    # equivalent BALANCED FLOATING system instead: inject -total at
    # the ground cell, solve L x = s (the pairwise path's structure,
    # ~10 CG iterations), then pin v[ground] = 0 per component.  This
    # is the exact Dirichlet (infinite-ground) limit, with none of the
    # penalty's O(1/pen) residue.
    from ..timer import CSTIMER
    bake_pen = one_to_all and len(pts) > 1
    pen_host = None
    if bake_pen:
        pen_spec = np.zeros((H, W))
        pen_spec[np.asarray(rows) - 1, np.asarray(cols) - 1] = np.inf
        from ..solve.prepare import prepare_stencil_solver_from_gmap_pen
        with CSTIMER("prepare stencil solver (upload + MG setup)"):
            S64, prec, geomg_apply, _, pen_host = \
                prepare_stencil_solver_from_gmap_pen(
                    gmap, flags.avg_res, flags.four_neighbors, pen_spec)
    if pen_host is None:
        bake_pen = False
        from ..solve.prepare import prepare_stencil_solver_from_gmap
        with CSTIMER("prepare stencil solver (upload + MG setup)"):
            S64, prec, geomg_apply, _ = prepare_stencil_solver_from_gmap(
                gmap, flags.avg_res, flags.four_neighbors)
    A_lo = None
    if bake_pen:
        # each column's exact operator = bare Laplacian + its own
        # penalty field; prec.levels[0].A has the shared penalty baked
        # into its diagonal and would double-count
        import jax
        from ..solve.stencil import _to_dtype
        A_lo = _to_dtype(S64, np.float32)
        if (not os.environ.get("CS_NO_PALLAS") and
                jax.default_backend() == "tpu"):
            from ..solve.pallas_stencil import PallasStencil, supported
            if supported(A_lo.shape, 4):
                from ..solve.stencil import StencilOperator
                A_lo = StencilOperator(
                    A_lo.we, A_lo.ws, A_lo.wse, A_lo.wne, A_lo.diag,
                    PallasStencil.from_operator(A_lo))

    # nodemap with polygon (short-circuit region) merging, matching the
    # general path's graph build (src/raster/onetoall.jl:86-90); the
    # collapse solves via the PolyProjector on the stencil operator
    from ..solve.stencil import build_poly_projector
    if data.polymap.size:
        point_map = np.zeros(gmap.shape, np.int64)
        for x in range(len(pts)):
            point_map[rows[x] - 1, cols[x] - 1] = pts[x]
        newpoly = build.create_new_polymap(gmap, data.polymap, points_rc,
                                           0, 0, point_map)
        nodemap = build.construct_node_map(gmap, newpoly)
        proj = build_poly_projector(nodemap, S64.shape)
        # polygons can bridge spatially disjoint regions: use the merged
        # graph's components, not grid labeling
        a = build.construct_graph(gmap, nodemap, flags.avg_res,
                                  flags.four_neighbors)
        comps = build.components(a)
    else:
        from .raster import _grid_components
        nodemap = build.construct_node_map(gmap, np.zeros((0, 0), np.int64))
        proj = None
        comps = _grid_components(gmap, nodemap, flags.four_neighbors)
    node_of = [int(nodemap[rows[i] - 1, cols[i] - 1]) for i in range(len(pts))]
    if len(set(node_of)) != len(node_of):
        return None   # points merged into one node: general path handles
    comp_of = np.full(len(pts), -1)
    for ci, comp in enumerate(comps):
        cset = set(int(x) for x in comp)
        for i, node in enumerate(node_of):
            if node in cset:
                comp_of[i] = ci

    npts = len(pts)
    cells = np.column_stack([np.asarray(rows) - 1, np.asarray(cols) - 1])
    strength = np.ones(npts)
    if use_var:
        strength = strengths[:npts, 1].astype(np.float64)
    # all-to-one imposes its ground by the balanced-floating post-shift
    # and never needs the penalty scale (one device fetch saved)
    penalty = advanced_ground_penalty(S64) if one_to_all else 0.0

    active = np.ones(npts, bool)
    for i in range(npts):
        same_comp = (comp_of == comp_of[i]) & (comp_of >= 0)
        same_comp[i] = False
        if not same_comp.any():
            active[i] = False

    res = np.full(npts, -1.0)
    cum = out.initialize_cum_maps(gmap, of.write_max_cur_maps)
    idx_active = np.nonzero(active)[0]

    labels_dev = None
    if not one_to_all:
        # component label per cell (padded grid), for the all-to-one
        # post-shift masking
        import jax.numpy as _jnp
        Hp_, Wp_ = S64.shape
        lab = np.zeros((Hp_, Wp_), np.int32)
        rr_, cc2 = np.nonzero(nodemap)
        node_lab = np.zeros(int(nodemap.max()) + 1, np.int32)
        for ci_, comp_ in enumerate(comps):
            node_lab[np.asarray(comp_)] = ci_ + 1
        lab[rr_, cc2] = node_lab[nodemap[rr_, cc2]]
        labels_dev = _jnp.asarray(lab)

    # byte-budgeted focal-column chunks (same scheme as the pairwise
    # paths, drivers/core.py): ~8 live f64 (B, H, W) blocks per chunk,
    # so 1M cells x 1000 focal points fits 16 GB instead of
    # materializing all columns at once.  Ground/source tiles assemble
    # per chunk — (B, npts) not (npts, npts).  Reference iterates one
    # point at a time (src/raster/onetoall.jl:146-158).
    Hp, Wp = S64.shape
    from ..solve.dispatch import pow2_floor, solve_chunk_budget
    per_col = Hp * Wp * 8 * 8
    budget = solve_chunk_budget(Hp * Wp,
                                env_var="CS_ONETOALL_CHUNK_BYTES")
    step = max(1, min(4096, budget // max(per_col, 1)))
    if getattr(cfg, "max_parallel", 0) > 0:
        step = min(step, cfg.max_parallel)   # Circuitscape-4 key: cap
    # pow2 floor AFTER the max_parallel clamp: the fused solve pads the
    # batch UP to a power of two, so a non-pow2 cap (e.g. 5) must floor
    # down (->4), not pad past the budgeted width (->8)
    step = pow2_floor(step)
    arange = np.arange(npts)

    for s0 in range(0, idx_active.size, step):
        sel = idx_active[s0:s0 + step]
        bsz = len(sel)
        src_cells = np.zeros((bsz, npts, 2), np.int64)
        src_vals = np.zeros((bsz, npts), np.float64)
        gnd_cells = np.tile(cells[None], (bsz, 1, 1))
        gnd_vals = np.zeros((bsz, npts), np.float64)
        for k, i in enumerate(sel):
            if one_to_all:
                src_cells[k, 0] = cells[i]
                src_vals[k, 0] = strength[i]
                gnd_vals[k] = np.where(arange != i, penalty, 0.0)
            else:
                others = (comp_of == comp_of[i]) & (comp_of >= 0)
                others[i] = False
                src_cells[k] = cells
                vals = np.where(others, strength, 0.0)
                vals[i] = -vals.sum()      # balanced floating injection
                src_vals[k] = vals
                # no penalty: the ground is imposed by the post-shift

        import time as _time

        from .. import stats
        from ..solve.dispatch import reraise_if_device_oom
        _t0 = _time.perf_counter()
        try:
          with CSTIMER("batched pair solve"):
            X, rel, iters = stencil_solve_advanced_batch(
                S64, src_cells, src_vals, gnd_cells, gnd_vals,
                rtol=consts.CG_RTOL, itmax=consts.CG_ITMAX,
                prec=prec, prec_apply=geomg_apply, proj=proj,
                A_lo=A_lo)
        except Exception as e:
            reraise_if_device_oom(e, Hp * Wp, bsz)
        stats.record_solve(X.shape, iters, _time.perf_counter() - _t0)
        if np.any(rel >= consts.RESIDUAL_GATE):
            raise SolverFailedError(
                f"one-to-all device solve residual {float(rel.max())} "
                f"exceeds tolerance {consts.RESIDUAL_GATE}")

        # per-point results
        own = jnp.asarray(cells[sel], jnp.int32)
        if not one_to_all:
            # pin each column's ground cell to 0 within its component
            # (a constant shift changes no flow; masking other
            # components keeps their map values at the reference's 0)
            shifts = X[jnp.arange(bsz), own[:, 0], own[:, 1]]
            col_lab = jnp.asarray(
                np.asarray([comp_of[i] + 1 for i in sel], np.int32))
            X = jnp.where(labels_dev[None] == col_lab[:, None, None],
                          X - shifts[:, None, None], 0.0)
        vals = np.asarray(X[jnp.arange(bsz), own[:, 0], own[:, 1]])
        for k, i in enumerate(sel):
            if one_to_all:
                v = vals[k] / strength[i]
                res[i] = -1.0 if v == 0 else v
            else:
                res[i] = 0.0

        if of.write_cur_maps or of.write_cum_cur_map_only:
            with CSTIMER("node currents + reduce"):
                ncur = stencil_node_currents(S64, X, proj=proj)
                if of.write_cur_maps:
                    cum.cum_curr += np.asarray(jnp.sum(ncur, axis=0))[:H, :W]
                    if of.write_max_cur_maps:
                        np.maximum(cum.max_curr,
                                   np.asarray(jnp.max(ncur, axis=0))[:H, :W],
                                   out=cum.max_curr)
            with CSTIMER("write maps"):
                for k, i in enumerate(sel):
                    out.write_grid(np.asarray(ncur[k], dtype)[:H, :W],
                                   f"_{int(pts[i])}", cfg, hbmeta,
                                   cellmap=gmap)
        if of.write_volt_maps:
            with CSTIMER("write maps"):
                for k, i in enumerate(sel):
                    out.write_grid(np.asarray(X[k], dtype)[:H, :W],
                                   f"_{int(pts[i])}", cfg, hbmeta,
                                   cellmap=gmap, voltage=True)

    if of.write_cur_maps or of.write_cum_cur_map_only:
        out.write_cum_maps(cum, gmap, cfg, hbmeta, of.write_max_cur_maps,
                           of.write_cum_cur_map_only)

    return np.column_stack([np.asarray(pts, dtype), res.astype(dtype)])


def onetoall_kernel(data, flags, cfg, dtype=np.float64):
    """src/raster/onetoall.jl:13-167."""
    fast = _onetoall_device_fast(data, flags, cfg, dtype)
    if fast is not None:
        return fast
    strengths = data.strengths
    included_pairs = data.included_pairs
    points_rc = data.points_rc
    gmap = data.cellmap
    polymap = data.polymap
    hbmeta = data.hbmeta

    use_variable_strengths = strengths.size > 0
    use_included_pairs = not included_pairs.isempty()
    mode = 0 if included_pairs.mode == "include" else 1
    one_to_all = flags.is_onetoall

    if use_included_pairs:
        prune_points(points_rc, included_pairs.point_ids)
        if use_variable_strengths:
            strengths = prune_strengths(strengths, included_pairs.point_ids)

    # Construct point map
    point_map = np.zeros(gmap.shape, np.int64)
    rows, cols, pts = points_rc
    for x in range(len(pts)):
        point_map[rows[x] - 1, cols[x] - 1] = pts[x]

    points_unique = list(dict.fromkeys(int(p) for p in pts))

    newpoly = build.create_new_polymap(gmap, polymap, points_rc, 0, 0,
                                       point_map)
    nodemap = build.construct_node_map(gmap, newpoly)
    a = build.construct_graph(gmap, nodemap, flags.avg_res,
                              flags.four_neighbors)
    cc = build.components(a)
    G = build.laplacian(a)
    cslog.info("There are %s points and %s connected components",
               a.shape[0], len(cc))

    cum = out.initialize_cum_maps(gmap, flags.outputflags.write_max_cur_maps)

    point_ids = included_pairs.point_ids
    num_points_to_solve = len(points_unique)
    res = np.zeros(num_points_to_solve, dtype)
    original_point_map = point_map.copy()
    unique_point_map = np.zeros(gmap.shape, np.int64)
    strength_map_base = (np.zeros(gmap.shape, dtype)
                         if use_variable_strengths else np.zeros((0, 0), dtype))

    for i in points_unique:
        ind = int(np.nonzero(pts == i)[0][0])
        unique_point_map[rows[ind] - 1, cols[ind] - 1] = pts[ind]

    def solve_point(i):
        point_map = original_point_map.copy()
        strength_map = strength_map_base.copy()
        local_newpoly = newpoly
        local_nodemap = nodemap
        stren = strengths[i, 1] if use_variable_strengths else 1
        cslog.info("Solving point %s of %s", i + 1, num_points_to_solve)
        n = points_unique[i]

        if use_included_pairs:
            for j in range(len(point_ids)):
                if i != j and included_pairs.include_pairs[i, j] == mode:
                    point_map[point_map == point_ids[j]] = 0
            local_newpoly = build.create_new_polymap(
                gmap, polymap, points_rc, 0, 0, point_map)
            # reference quirk: nodemap rebuilt from the ORIGINAL polymap
            # (src/raster/onetoall.jl:90)
            local_nodemap = build.construct_node_map(gmap, polymap)

        if use_variable_strengths:
            tmp = np.array([point_map[rows[x] - 1, cols[x] - 1]
                            for x in range(len(rows))])
            _strengths = strengths.copy()
            _strengths[tmp == 0, 1] = 1
            for x in range(len(rows)):
                strength_map[rows[x] - 1, cols[x] - 1] = _strengths[x, 1]

        if point_map.sum() == n:
            return -1, None

        T = dtype
        if one_to_all:
            source_map = np.where(unique_point_map == n, T(stren), T(0))
            ground_map = np.where(point_map == n, 0, point_map).astype(T)
            ground_map = np.where(ground_map > 0, np.inf, ground_map)
        else:
            if use_variable_strengths:
                source_map = np.where(unique_point_map == n, T(0),
                                      strength_map).astype(T)
            else:
                source_map = np.where(unique_point_map != 0, T(1), T(0))
                source_map = np.where(point_map == n, T(0), source_map)
            ground_map = np.where(point_map == n, np.inf, T(0))

        check_node = int(local_nodemap[rows[i] - 1, cols[i] - 1])

        policy = "rmvgnd" if one_to_all else "rmvsrc"
        sources, grounds, finite_grounds = _get_sources_and_grounds(
            source_map, ground_map, flags, G, local_nodemap, policy)

        solver = get_solver(cfg)
        advanced_data = AdvancedProblem(G, cc, local_nodemap, local_newpoly,
                                        hbmeta, sources, grounds, source_map,
                                        finite_grounds, check_node, n, gmap,
                                        solver)
        v, curr = advanced_kernel(advanced_data, flags, cfg)
        return v.flat[0], curr

    results = [solve_point(i) for i in range(num_points_to_solve)]

    # Deterministic reduction over per-point current maps
    for i, (r_i, curr) in enumerate(results):
        res[i] = r_i
        if curr is None:
            continue
        cum.cum_curr += curr
        if flags.outputflags.write_max_cur_maps:
            np.maximum(cum.max_curr, curr, out=cum.max_curr)

    of = flags.outputflags
    if of.write_cur_maps or of.write_cum_cur_map_only:
        out.write_cum_maps(cum, gmap, cfg, hbmeta, of.write_max_cur_maps,
                           of.write_cum_cur_map_only)

    return np.column_stack([np.asarray(points_unique, dtype), res])
