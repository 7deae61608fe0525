"""Raster pairwise scenario driver.

Parity reference: src/raster/pairwise.jl:14-269 (raster_pairwise, the
no-polygons and per-pair-polygons paths, exclude-pair generation).
"""

from __future__ import annotations

import numpy as np

from .. import cslog, out
from ..graph import build
from ..io.loaders import load_raster_data
from ..solve.dispatch import get_solver
from ..timer import CSTIMER
from .core import GraphProblem, single_ground_all_pairs
from .flags import get_raster_flags


def raster_pairwise(cfg, dtype=np.float64):
    """src/raster/pairwise.jl:14-30."""
    with CSTIMER("load raster data"):
        rasterdata = load_raster_data(cfg, dtype)
    flags = get_raster_flags(cfg)

    pts = rasterdata.points_rc[2]
    pt_file_contains_polygons = len(pts) != len(np.unique(pts))
    if pt_file_contains_polygons:
        return _pt_file_polygons_path(rasterdata, flags, cfg, dtype)
    return _pt_file_no_polygons_path(rasterdata, flags, cfg, dtype)


def _pt_file_no_polygons_path(rasterdata, flags, cfg, dtype):
    """src/raster/pairwise.jl:55-69."""
    with CSTIMER("construct graph"):
        graphdata = compute_graph_data_no_polygons(rasterdata, flags, cfg, dtype)
    with CSTIMER("solve pairwise resistances"):
        r = single_ground_all_pairs(graphdata, flags, cfg)

    of = flags.outputflags
    if of.write_cur_maps or of.write_cum_cur_map_only:
        with CSTIMER("write cumulative current maps"):
            out.write_cum_maps(graphdata.cum, rasterdata.cellmap, cfg,
                               rasterdata.hbmeta, of.write_max_cur_maps,
                               of.write_cum_cur_map_only)
    return r


def _pt_file_polygons_path(rasterdata, flags, cfg, dtype):
    """Per-pair graph rebuild when the point file contains focal regions
    (src/raster/pairwise.jl:72-135)."""
    gmap = rasterdata.cellmap
    points_rc = rasterdata.points_rc
    included_pairs = rasterdata.included_pairs
    if included_pairs.isempty():
        exclude_pairs = []
    else:
        exclude_pairs = generate_exclude_pairs(points_rc, included_pairs)

    cum = out.initialize_cum_maps(gmap, flags.outputflags.write_max_cur_maps)

    pts = list(dict.fromkeys(int(p) for p in points_rc[2]))
    npts = len(pts)
    resistances = -np.ones((npts, npts), dtype)

    n = npts * (npts - 1) // 2
    cslog.info("Total number of pair solves = %s", n)
    exclude_set = set(exclude_pairs)

    k = 1
    for i in range(npts):
        for j in range(i + 1, npts):
            pt1, pt2 = pts[i], pts[j]
            cslog.info("Solving pair %s of %s", k, n)
            k += 1
            if (pt1, pt2) in exclude_set or (pt2, pt1) in exclude_set:
                continue
            graphdata = compute_graph_data_polygons(
                rasterdata, flags, pt1, pt2, cum, cfg, dtype)
            pairwise_resistance = single_ground_all_pairs(
                graphdata, flags, cfg, log=False)
            resistances[i, j] = resistances[j, i] = pairwise_resistance[1, 2]

    np.fill_diagonal(resistances, 0)
    parr = np.asarray(pts, dtype)
    r = np.vstack([np.concatenate([np.zeros(1, dtype), parr])[None, :],
                   np.column_stack([parr, resistances])])

    of = flags.outputflags
    if of.write_cur_maps or of.write_cum_cur_map_only:
        out.write_cum_maps(cum, gmap, cfg, rasterdata.hbmeta,
                           of.write_max_cur_maps, of.write_cum_cur_map_only)

    out.save_resistances(r, cfg)
    return r


def compute_graph_data_polygons(rasterdata, flags, pt1, pt2, cum, cfg, dtype):
    """src/raster/pairwise.jl:148-190."""
    gmap = rasterdata.cellmap
    polymap = rasterdata.polymap
    points_rc = rasterdata.points_rc
    hbmeta = rasterdata.hbmeta

    newpoly = build.create_new_polymap(gmap, polymap, points_rc, pt1, pt2)
    nodemap = build.construct_node_map(gmap, newpoly)
    a = build.construct_graph(gmap, nodemap, flags.avg_res,
                              flags.four_neighbors)
    G = build.laplacian(a)
    cc = build.components(a)

    pts = points_rc[2]
    x = int(np.nonzero(pts == pt1)[0][0])
    y = int(np.nonzero(pts == pt2)[0][0])
    c1 = nodemap[points_rc[0][x] - 1, points_rc[1][x] - 1]
    c2 = nodemap[points_rc[0][y] - 1, points_rc[1][y] - 1]
    points = np.asarray([c1, c2], np.int64)

    solver = get_solver(cfg)
    return GraphProblem(G, cc, points, np.asarray([pt1, pt2], np.int64),
                        [], nodemap, newpoly, hbmeta, gmap, cum, solver)


class LazyStencilGraph:
    """Deferred CSR Laplacian for the raster stencil fast path.

    When the whole job runs on the stencil operator (no polygons), the
    general sparse matrix is never needed — building it for a 1M-cell
    raster costs seconds of host time.  This stands in for prob.G and
    materializes the real Laplacian only if a non-stencil code path
    asks for it."""

    def __init__(self, cellmap, nodemap, avg_res, four_neighbors, dtype):
        self._cellmap = cellmap
        self._nodemap = nodemap
        self._avg_res = avg_res
        self._four = four_neighbors
        n = int(nodemap.max())
        self.shape = (n, n)
        self.dtype = np.dtype(dtype)
        self._mat = None

    def materialize(self):
        if self._mat is None:
            a = build.construct_graph(self._cellmap, self._nodemap,
                                      self._avg_res, self._four)
            self._mat = build.laplacian(a).astype(self.dtype)
        return self._mat

    def __getitem__(self, key):
        return self.materialize()[key]


def _grid_components(cellmap, nodemap, four_neighbors):
    """Connected components of the active-cell grid via ndimage labeling
    (equivalent to components of the stencil graph, at a fraction of the
    sparse-matrix cost).  Grouping is one argsort over the active cells —
    a per-label boolean scan costs O(ncells) PER component, which
    dominated multi-megacell jobs with thousands of small islands."""
    from scipy import ndimage
    structure = (np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
                 if four_neighbors else np.ones((3, 3), np.int64))
    labels, nlab = ndimage.label(cellmap > 0, structure=structure)
    active = nodemap > 0
    lab_flat = labels[active]
    nodes_flat = nodemap[active]
    order = np.argsort(lab_flat, kind="stable")
    sorted_labs = lab_flat[order]
    sorted_nodes = nodes_flat[order]
    bounds = np.searchsorted(sorted_labs, np.arange(1, nlab + 2))
    comps = [np.sort(sorted_nodes[bounds[i]:bounds[i + 1]])
             for i in range(nlab) if bounds[i + 1] > bounds[i]]
    comps.sort(key=lambda c: c[0] if len(c) else 0)
    return comps


def compute_graph_data_no_polygons(data, flags, cfg, dtype):
    """src/raster/pairwise.jl:192-238."""
    cellmap = data.cellmap
    polymap = data.polymap
    points_rc = data.points_rc

    nodemap = build.construct_node_map(cellmap, polymap)
    # Stencil-eligible jobs (no polygons, iterative tier) defer the
    # sparse Laplacian: the device solve only needs the weight planes.
    if polymap.size == 0 and cfg.solver == "cg+amg":
        G = LazyStencilGraph(cellmap, nodemap, flags.avg_res,
                             flags.four_neighbors, dtype)
        cc = _grid_components(cellmap, nodemap, flags.four_neighbors)
    else:
        G = build.construct_graph(cellmap, nodemap, flags.avg_res,
                                  flags.four_neighbors)
        G = build.laplacian(G)
        cc = build.components(G)

    if not data.included_pairs.isempty():
        exclude_pairs = generate_exclude_pairs(points_rc, data.included_pairs)
    else:
        exclude_pairs = []

    points = np.asarray(
        [nodemap[r - 1, c - 1]
         for r, c in zip(points_rc[0], points_rc[1])], np.int64)

    cum = out.initialize_cum_maps(cellmap,
                                  flags.outputflags.write_max_cur_maps)
    solver = get_solver(cfg)

    return GraphProblem(G, cc, points, np.asarray(points_rc[2], np.int64),
                        exclude_pairs, nodemap, polymap, data.hbmeta,
                        cellmap, cum, solver)


def generate_exclude_pairs(points_rc, included_pairs):
    """src/raster/pairwise.jl:240-269.  In include mode, also prunes
    points_rc in place to the listed ids."""
    exclude = []
    mat = included_pairs.include_pairs
    point_ids = included_pairs.point_ids

    if included_pairs.mode == "include":
        prune_points(points_rc, point_ids)
        for j in range(mat.shape[1]):
            for i in range(mat.shape[0]):
                if mat[i, j] == 0 and mat[j, i] == 0:
                    exclude.append((int(point_ids[i]), int(point_ids[j])))
    else:
        for j in range(mat.shape[1]):
            for i in range(mat.shape[0]):
                if mat[i, j] == 1 and mat[j, i] == 1:
                    exclude.append((int(point_ids[i]), int(point_ids[j])))
    return exclude


def prune_points(points_rc, point_ids):
    """Keep only focal points listed in point_ids, in place
    (src/raster/onetoall.jl:169-180)."""
    keep = np.isin(points_rc[2], point_ids)
    for k in range(3):
        arr = points_rc[k]
        pruned = arr[keep]
        # in-place resize semantics: caller holds the tuple, so rebuild
        arr.resize(pruned.shape, refcheck=False)
        arr[:] = pruned
