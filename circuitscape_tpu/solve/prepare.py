"""Shared setup for the stencil device paths (shortcut / maps-on
pairwise, advanced, one-to-all): host weight planes -> device operator
+ geo-MG hierarchy, mesh-aware.

When more than one device is visible (parallel/mesh.py active_mesh),
the operator's grid rows are padded to a shard multiple and placed
row-sharded over the 'nodes' mesh axis, and the MG hierarchy's fine
levels shard the same way — the batched solves then run under GSPMD
with halo exchanges over ICI, replacing the reference's per-solve
thread pool (src/core.jl:268-272).  Padding rows carry zero weights
(inactive cells), so they never affect the solution; callers crop any
fetched full-grid maps back to the returned original shape.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .stencil import (StencilOperator, _split_planes, _to_dtype,
                      stencil_from_gmap_device)
from .geomg import build_geo_mg, build_geo_mg_device, geomg_apply


def _kernel_name(lv):
    ss = getattr(lv.A, "shard", None)
    if ss is not None:
        return ("shard_map+pallas" if ss.pal is not None
                else "shard_map+xla")
    return "pallas" if lv.A.pallas is not None else "xla"


_planes_from_gmap_j = jax.jit(stencil_from_gmap_device,
                              static_argnums=(1, 2))


def prepare_stencil_solver_from_gmap(gmap, avg_res, four_neighbors,
                                     use_mg=True):
    """Single-device fast setup: upload the (H, W) conductance map and
    build the 5 stencil planes ON DEVICE (stencil_from_gmap_device).

    Only ~8 MB/Mcell crosses the host->device link instead of the
    ~40 MB/Mcell of five pre-built f64 planes — on the tunneled TPU the
    plane upload alone was ~1.1 s of a 2.4 s warm 1M-cell job.  Mesh
    and large-grid (host MG build) configurations fall back to the
    host-plane path, which needs the numpy planes anyway."""
    import os

    from ..parallel.mesh import active_mesh
    from .stencil import stencil_planes_np

    gmap = np.asarray(gmap)
    H0, W0 = gmap.shape
    dev_max = int(os.environ.get("CS_DEVICE_MG_MAX", "1200000"))
    mesh = active_mesh(H0 * W0)
    if mesh is not None:
        stream_min = int(os.environ.get("CS_STREAM_BUILD_MIN", "4000000"))
        if gmap.size > stream_min:
            # huge mesh grids: shard-local streamed host build — host
            # RSS scales with cells/shard, not cells (docs/capacity.md)
            return prepare_stencil_solver_streamed(
                gmap, avg_res, four_neighbors, mesh, use_mg)
        return prepare_stencil_solver(
            stencil_planes_np(gmap, avg_res, four_neighbors), use_mg)
    if gmap.size > dev_max:
        # Large single-device grids: the fused DEVICE hierarchy build's
        # one-time server compile grows with shape (~23 min at 7040^2),
        # so the hierarchy still coarsens on HOST — but the f64
        # operator builds on device from the small gmap upload, and the
        # hierarchy's fine level (3/4 of its bytes) derives on device
        # from that operator instead of riding the tunnel.  Upload at
        # 6M cells: ~470 MB (5 f64 planes + full f32 hierarchy) down
        # to ~105 MB (gmap + coarse levels + pinv) — the tunnel upload
        # was the bulk of warm setup (~15.7 s of a 23 s warm job).
        return _prepare_large_single(gmap, avg_res, four_neighbors,
                                     use_mg)

    qh = qw = 128   # shape bucketing, as prepare_stencil_solver
    Hp = -(-H0 // qh) * qh
    Wp = -(-W0 // qw) * qw
    g = np.zeros((Hp, Wp), np.float64)
    g[:H0, :W0] = np.where(gmap > 0, gmap, 0.0)
    S64 = _planes_from_gmap_j(jnp.asarray(g), bool(avg_res),
                              bool(four_neighbors))

    prec = prec_apply = None
    if use_mg and Hp * Wp > 4096:
        expand = (not os.environ.get("CS_NO_PALLAS") and
                  jax.default_backend() == "tpu")
        prec = build_geo_mg_device(_to_dtype(S64, jnp.float32),
                                   expand_pallas=expand)
        prec_apply = geomg_apply

    # north-star bookkeeping from the host activity pattern (the planes
    # themselves never visit the host); adjacency rules live in
    # solve/stencil.py next to the plane builder so they can't diverge
    from .stencil import stencil_activity_stats

    from .. import stats
    stats.record(fine_nnz=stencil_activity_stats(g, four_neighbors),
                 cells=Hp * Wp,
                 mg_kernels=[_kernel_name(lv)
                             for lv in getattr(prec, "levels", ())] or
                            ["xla-jacobi"])
    return S64, prec, prec_apply, (H0, W0)


def prepare_stencil_solver_from_gmap_pen(gmap, avg_res, four_neighbors,
                                         pen_spec):
    """Pen-aware setup for advanced-mode solves: the ground diagonal is
    BAKED INTO the MG hierarchy (coarsened per level, see
    geomg._build_levels_device) instead of bolted onto a floating-
    Laplacian V-cycle as a masked diagonal fix-up.

    pen_spec: (H0, W0) float64 host field of per-cell ground
    conductances; np.inf marks a direct (infinite) ground, resolved to
    advanced_ground_penalty(S64).

    Returns (S64, prec, prec_apply, (H0, W0), pen_host) where pen_host
    is the resolved (H0, W0) float64 penalty field whose values the
    caller must use for the operator's diagonal term (scatter into the
    outer-residual pen64), or None when the active configuration (mesh
    runs) does not support baking — the caller then falls back to the
    masked-preconditioner scheme.

    When pen_host is not None, prec.levels[0].A's diagonal already
    contains the penalty: the inner CG must apply THAT operator with
    pen=None (solve/stencil.py stencil_solve_advanced_batch)."""
    import os

    from ..parallel.mesh import active_mesh
    from .geomg import attach_pallas_planes
    from .stencil import (advanced_ground_penalty, stencil_activity_stats,
                          stencil_planes_np)
    from .. import stats

    gmap = np.asarray(gmap)
    H0, W0 = gmap.shape
    if active_mesh(H0 * W0) is not None:
        # mesh runs fall back to the masked-preconditioner scheme (the
        # sharded hierarchy does not thread the penalty yet).  Known
        # limitation: with a SINGLE direct ground at megacell scale the
        # masked floating-hierarchy scheme converges poorly (see the
        # all-to-one balanced-floating reformulation in
        # drivers/onetoall.py); multi-ground advanced jobs — the
        # common case — are unaffected.
        S64, prec, prec_apply, shape0 = prepare_stencil_solver(
            stencil_planes_np(gmap, avg_res, four_neighbors))
        return S64, prec, prec_apply, shape0, None

    qh = qw = 128
    Hp = -(-H0 // qh) * qh
    Wp = -(-W0 // qw) * qw
    g = np.zeros((Hp, Wp), np.float64)
    g[:H0, :W0] = np.where(gmap > 0, gmap, 0.0)
    S64 = _planes_from_gmap_j(jnp.asarray(g), bool(avg_res),
                              bool(four_neighbors))

    penalty = advanced_ground_penalty(S64)   # one tiny scalar fetch
    pen_host = np.where(np.isinf(pen_spec), penalty,
                        np.asarray(pen_spec, np.float64))
    pen_pad = np.zeros((Hp, Wp), np.float64)
    pen_pad[:H0, :W0] = pen_host

    expand = (not os.environ.get("CS_NO_PALLAS") and
              jax.default_backend() == "tpu")
    dev_max = int(os.environ.get("CS_DEVICE_MG_MAX", "1200000"))
    A32 = _to_dtype(S64, jnp.float32)
    pen32 = jnp.asarray(pen_pad, jnp.float32)
    if g.size <= dev_max:
        prec = build_geo_mg_device(A32, expand_pallas=expand, pen=pen32)
    else:
        planes = stencil_planes_np(g, avg_res, four_neighbors)
        prec = build_geo_mg(
            planes_np=planes, pen_np=pen_pad,
            fine_device_ops=(A32.we, A32.ws, A32.wse, A32.wne,
                             A32.diag + pen32))
        if expand:
            prec = attach_pallas_planes(prec)

    stats.record(fine_nnz=stencil_activity_stats(g, four_neighbors),
                 cells=Hp * Wp,
                 mg_kernels=[_kernel_name(lv) for lv in prec.levels])
    return S64, prec, geomg_apply, (H0, W0), pen_host


def _prepare_large_single(gmap, avg_res, four_neighbors, use_mg=True):
    """Host-coarsened hierarchy + device-built operator + device-derived
    fine level, for single-device grids above CS_DEVICE_MG_MAX."""
    import os

    from .. import stats
    from .geomg import attach_pallas_planes, build_geo_mg
    from .stencil import stencil_activity_stats, stencil_planes_np

    H0, W0 = gmap.shape
    qh = qw = 128
    Hp = -(-H0 // qh) * qh
    Wp = -(-W0 // qw) * qw
    g = np.zeros((Hp, Wp), np.float64)
    g[:H0, :W0] = np.where(gmap > 0, gmap, 0.0)

    S64 = _planes_from_gmap_j(jnp.asarray(g), bool(avg_res),
                              bool(four_neighbors))

    prec = prec_apply = None
    if use_mg:
        planes = stencil_planes_np(g, avg_res, four_neighbors)
        A32 = _to_dtype(S64, jnp.float32)
        prec = build_geo_mg(planes_np=planes,
                            fine_device_ops=(A32.we, A32.ws, A32.wse,
                                             A32.wne, A32.diag))
        if (not os.environ.get("CS_NO_PALLAS") and
                jax.default_backend() == "tpu"):
            prec = attach_pallas_planes(prec)
        prec_apply = geomg_apply

    stats.record(fine_nnz=stencil_activity_stats(g, four_neighbors),
                 cells=Hp * Wp,
                 mg_kernels=[_kernel_name(lv)
                             for lv in getattr(prec, "levels", ())] or
                            ["xla-jacobi"])
    return S64, prec, prec_apply, (H0, W0)


def _row_sharded_from_slabs(mesh, shape, slabs_of, specs):
    """Assemble ('nodes', None)-sharded global arrays from per-shard
    host slabs WITHOUT ever materializing the full arrays on the host.

    slabs_of(k) -> dict name -> numpy slab for row-shard k (rows
    [k*hs, (k+1)*hs)); specs: [(name, dtype), ...].  Each row-shard is
    computed ONCE; every addressable device in that row group (batch
    columns replicate) receives its per-array buffer.  Returns dict
    name -> global jax array."""
    sh = NamedSharding(mesh, P("nodes", None))
    idx_map = sh.addressable_devices_indices_map(shape)
    hs = shape[0] // mesh.shape["nodes"]
    by_shard: dict = {}
    for dev, idx in idx_map.items():
        by_shard.setdefault((idx[0].start or 0) // hs, []).append(dev)
    bufs = {name: {} for name, _ in specs}
    for k in sorted(by_shard):
        slabs = slabs_of(k)
        for name, dtype in specs:
            a = np.ascontiguousarray(slabs[name], dtype)
            for dev in by_shard[k]:
                bufs[name][dev] = jax.device_put(a, dev)
    out = {}
    dev_order = list(idx_map.keys())
    for name, _ in specs:
        out[name] = jax.make_array_from_single_device_arrays(
            shape, sh, [bufs[name][d] for d in dev_order])
    return out


def prepare_stencil_solver_streamed(gmap, avg_res, four_neighbors,
                                    mesh, use_mg=True):
    """Mesh setup with a SHARD-LOCAL host build: each 'nodes' shard's
    row slab of the weight planes is computed from the corresponding
    gmap rows (one halo row each side) and shipped straight to its
    device — the full fine planes never exist host-side.  Host RSS
    therefore scales with cells/shard + the level-1-and-down pyramid
    (~1/3 of fine) instead of the ~720 B/cell of the materialized
    build (BENCH_CAPACITY round 4: 75.7 GB at 105M cells).

    The fine MG level streams the same way (f32 casts of the slabs);
    level 1 coarsens per slab (geomg._coarsen_planes_slab, with the
    cross-slab NE carry) into full-but-quarter-size planes, from which
    the rest of the hierarchy builds exactly as build_geo_mg."""
    import math

    from ..parallel.mesh import build_shard_stencil
    from .geomg import (GeoMgHierarchy, GeoMgLevel, _coarsen_planes_slab,
                        _np_diag, build_geo_mg)
    from .stencil import stencil_activity_stats, stencil_planes_np

    gmap = np.asarray(gmap, np.float64)
    H0, W0 = gmap.shape
    nsh = mesh.shape["nodes"]
    qh = math.lcm(128, nsh * 8)
    Hp = -(-H0 // qh) * qh
    Wp = -(-W0 // 128) * 128
    hs = Hp // nsh

    def g_rows(r0, r1):
        """Padded gmap rows [r0, r1) as a fresh (r1-r0, Wp) block."""
        out = np.zeros((r1 - r0, Wp))
        lo, hi = max(r0, 0), min(r1, H0)
        if hi > lo:
            out[lo - r0:hi - r0, :W0] = np.where(
                gmap[lo:hi] > 0, gmap[lo:hi], 0.0)
        return out

    names = ("we", "ws", "wse", "wne", "diag")
    build_mg = use_mg and Hp * Wp > 4096
    # level-1 planes accumulate during the same slab sweep
    hc, wc = Hp // 2, Wp // 2
    cplanes = [np.zeros((hc, wc)) for _ in range(4)] if build_mg else None

    def slabs_of(k):
        """All per-shard arrays for rows [k*hs, (k+1)*hs) in one shot."""
        r0, r1 = k * hs, (k + 1) * hs
        g = g_rows(r0 - 1, r1 + 1)     # one halo row each side
        planes = [p[1:-1] for p in
                  stencil_planes_np(g, avg_res, four_neighbors)]
        out = dict(zip(names, planes))
        if build_mg:
            d = planes[4]
            out["inv"] = np.where(d > 0,
                                  1.0 / np.where(d == 0, 1.0, d), 0.0)
            for i, name in enumerate(names):
                out[name + "32"] = planes[i]   # cast by spec dtype
            cE, cS, cSE, cNE, carry = _coarsen_planes_slab(
                planes[0], planes[1], planes[2], planes[3],
                first=(k == 0), last=(k == nsh - 1))
            c0 = k * (hs // 2)
            cplanes[0][c0:c0 + hs // 2] = cE
            cplanes[1][c0:c0 + hs // 2] = cS
            cplanes[2][c0:c0 + hs // 2] = cSE
            cplanes[3][c0:c0 + hs // 2] = cNE
            if k > 0:
                cplanes[1][c0 - 1] += carry
        return out

    specs = [(n, np.float64) for n in names]
    if build_mg:
        specs += [(n + "32", np.float32) for n in names]
        specs += [("inv", np.float32)]
    dev = _row_sharded_from_slabs(mesh, (Hp, Wp), slabs_of, specs)
    S64 = StencilOperator(dev["we"], dev["ws"], dev["wse"],
                          dev["wne"], dev["diag"])

    prec = prec_apply = None
    if build_mg:
        dev32 = {n: dev[n + "32"] for n in names}
        inv32 = dev["inv"]

        # levels 1..coarse build exactly like the materialized path
        rest = build_geo_mg(planes_np=tuple(cplanes) +
                            (_np_diag(*cplanes),))
        from ..parallel.mesh import shard_hierarchy
        rest = shard_hierarchy(mesh, rest)
        fine = GeoMgLevel(
            StencilOperator(dev32["we"], dev32["ws"], dev32["wse"],
                            dev32["wne"], dev32["diag"]),
            inv32, 2.0)
        prec = GeoMgHierarchy((fine,) + rest.levels, rest.coarse_pinv,
                              rest.coarse_shape, rest.overcorrect)
        # fine-level shard_map matvec (halo exchange + per-shard Pallas)
        ss = build_shard_stencil(mesh, prec.levels[0].A)
        if ss is not None:
            lv0 = prec.levels[0]
            import os as _os2
            if _os2.environ.get("CS_KEEP_FINE_PLANES"):
                w4 = (lv0.A.we, lv0.A.ws, lv0.A.wse, lv0.A.wne)
            else:
                # the shard matvec reads ss.ext, never the plain fine
                # weight planes — tiny placeholders reclaim ~16 B/cell
                # of (virtual-mesh) memory; diag stays (shape checks +
                # preconditioner fallbacks read it)
                z = jnp.zeros((1, 1), lv0.A.diag.dtype)
                w4 = (z, z, z, z)
            A0 = StencilOperator(*w4, lv0.A.diag, None, ss)
            prec = GeoMgHierarchy(
                (GeoMgLevel(A0, lv0.inv_diag, lv0.lam_max),) +
                prec.levels[1:], prec.coarse_pinv, prec.coarse_shape,
                prec.overcorrect)
        prec_apply = geomg_apply

    from .. import stats
    # activity stats straight off the (unpadded) gmap: padding cells
    # are inactive and add no edges, so the nnz is identical
    stats.record(fine_nnz=stencil_activity_stats(gmap, four_neighbors),
                 cells=Hp * Wp,
                 mg_kernels=[_kernel_name(lv)
                             for lv in getattr(prec, "levels", ())] or
                            ["xla-jacobi"])
    return S64, prec, prec_apply, (H0, W0)


def prepare_stencil_solver(planes, use_mg=True):
    """planes: 5 host numpy float64 planes (we, ws, wse, wne, diag).

    Returns (S64, prec, prec_apply, (H0, W0)) where S64 is the f64
    device operator (possibly row-padded + row-sharded), prec the geo-MG
    hierarchy (f32; None for tiny grids, where Jacobi-CG wins), and
    (H0, W0) the ORIGINAL grid shape for cropping fetched maps.
    """
    import math

    from ..parallel.mesh import active_mesh, shard_hierarchy

    H0, W0 = planes[0].shape
    mesh = active_mesh(H0 * W0)
    # Shape bucketing: pad both grid dims to 128-cell quanta so nearby
    # problem shapes compile to ONE executable (a 990x1013 job and a
    # 1000x1000 job both run the 1024x1024 programs — XLA compiles per
    # static shape, and cold-start compile dominated first-run wall
    # clock).  Padded cells carry zero weights (inactive), so they are
    # inert through the solve, and every caller crops fetched maps back
    # to the original shape.  Bonus: every MG level becomes a multiple
    # of 128 as long as it divides, so coarsening never hits odd dims
    # near the top of the hierarchy.
    qh = qw = 128
    if mesh is not None:
        # also make the fine level AND the first 3 coarse levels split
        # evenly over 'nodes' (each MG level halves the row count)
        qh = math.lcm(qh, mesh.shape["nodes"] * 8)
    Hp = -(-H0 // qh) * qh
    Wp = -(-W0 // qw) * qw
    if (Hp, Wp) != (H0, W0):
        planes = [np.pad(np.asarray(p), ((0, Hp - H0), (0, Wp - W0)))
                  for p in planes]

    stacked = np.stack([np.asarray(p, np.float64) for p in planes])
    dev = jnp.asarray(stacked)
    if mesh is not None:
        dev = jax.device_put(dev, NamedSharding(mesh, P(None, "nodes", None)))
    S64 = _split_planes(dev)

    prec = prec_apply = None
    if use_mg and planes[0].size > 4096:
        if mesh is not None:
            # sharded runs build on host and place levels explicitly;
            # the fine level (where the bytes are) gets the shard_map
            # halo-exchange matvec so each shard can run the fused
            # Pallas kernel — GSPMD alone cannot partition Pallas calls
            prec = shard_hierarchy(mesh, build_geo_mg(planes_np=planes))
            from ..parallel.mesh import build_shard_stencil
            from .geomg import GeoMgHierarchy, GeoMgLevel
            if prec.levels:
                lv0 = prec.levels[0]
                ss = build_shard_stencil(mesh, lv0.A)
                if ss is not None:
                    A0 = StencilOperator(lv0.A.we, lv0.A.ws, lv0.A.wse,
                                         lv0.A.wne, lv0.A.diag, None, ss)
                    prec = GeoMgHierarchy(
                        (GeoMgLevel(A0, lv0.inv_diag, lv0.lam_max),) +
                        prec.levels[1:], prec.coarse_pinv,
                        prec.coarse_shape, prec.overcorrect)
        else:
            import os
            expand = (not os.environ.get("CS_NO_PALLAS") and
                      jax.default_backend() == "tpu")
            dev_max = int(os.environ.get("CS_DEVICE_MG_MAX", "1200000"))
            if planes[0].size <= dev_max:
                # single device, bench-scale grids: the whole hierarchy
                # (and, on TPU, the fused-kernel plane sets) builds on
                # device in one dispatch from the uploaded fine planes
                prec = build_geo_mg_device(_to_dtype(S64, jnp.float32),
                                           expand_pallas=expand)
            else:
                # larger grids build on host: the fused device-build
                # program's one-time server compile grows with grid
                # shape (~23 min at 7040^2) and dominated cold starts,
                # while numpy coarsening is seconds and uploads ~6
                # B/cell; Pallas planes expand per level afterwards
                from .geomg import attach_pallas_planes
                prec = build_geo_mg(planes_np=planes)
                if expand:
                    prec = attach_pallas_planes(prec)
        prec_apply = geomg_apply

    # north-star bookkeeping (BASELINE.json: sustained nnz/s + %SOL):
    # fine nnz from the host planes, kernel choice per MG level
    from .. import stats
    edges = sum(int(np.count_nonzero(p)) for p in planes[:4])
    stats.record(fine_nnz=2 * edges + int(np.count_nonzero(planes[4])),
                 cells=Hp * Wp,
                 mg_kernels=[_kernel_name(lv)
                             for lv in getattr(prec, "levels", ())] or
                            ["xla-jacobi"])
    return S64, prec, prec_apply, (H0, W0)
