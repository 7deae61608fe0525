"""Network (edge-list graph) scenario drivers.

Parity reference: src/network/pairwise.jl:1-93, src/network/advanced.jl:1-51.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from .. import cslog, out
from ..graph import build
from ..io.loaders import get_network_data
from ..solve.dispatch import get_solver
from .advanced import AdvancedProblem, advanced_kernel, get_sources_and_grounds
from .core import GraphProblem, single_ground_all_pairs
from .flags import get_network_flags


def _pick_network_solver(cfg, n_nodes: int):
    """Solver tier for a network (edge-list) job.

    Arbitrary sparse graphs have no stencil structure, so the iterative
    tier runs the general ELL SA-AMG path — but at direct-tier sizes the
    native supernodal Cholesky (native/cholesky.cpp) factors a network
    Laplacian in under a second and back-substitutes every pair column
    in one batch, an order of magnitude faster than CG per RHS.  The
    reference picks its solver tier freely per job (src/core.jl:74-94);
    here network cg+amg jobs up to CS_NETWORK_DIRECT_MAX nodes
    (default 2M) route to the direct tier when the native library is
    available.  Set CS_NETWORK_DIRECT_MAX=0 to always honor cfg.solver.
    """
    import os

    solver = get_solver(cfg)
    if solver.is_direct:
        return solver
    limit = int(os.environ.get("CS_NETWORK_DIRECT_MAX", "2000000"))
    if 0 < n_nodes <= limit:
        from ..solve.native_chol import native_available
        if native_available():
            cslog.info("Network tier: routing to native direct solver "
                       "(%s nodes <= CS_NETWORK_DIRECT_MAX)", n_nodes)
            from ..solve.dispatch import DirectSolver
            return DirectSolver(cfg)
    return solver


def _assemble(coords, dtype):
    i, j, v = coords
    if np.any(i < 1) or np.any(j < 1):
        raise ValueError("Indices no good")
    m = int(max(i.max(), j.max()))
    A = sp.coo_matrix((v.astype(dtype), (i - 1, j - 1)), shape=(m, m)).tocsr()
    A = (A + A.T).tocsr()
    A.sum_duplicates()
    return A


def network_pairwise(cfg, dtype=np.float64):
    """src/network/pairwise.jl:4-29."""
    networkdata = get_network_data(cfg, dtype)
    flags = get_network_flags(cfg)
    graphdata = compute_graph_data(networkdata, cfg, dtype)
    ret = single_ground_all_pairs(graphdata, flags, cfg)

    if flags.outputflags.write_cur_maps:
        cum = graphdata.cum
        node_arr = np.column_stack([
            np.arange(1, len(cum.cum_node_curr) + 1, dtype=dtype),
            cum.cum_node_curr])
        coords = np.asarray(cum.coords, dtype)
        branch_arr = np.column_stack([coords[:, 0], coords[:, 1],
                                      cum.cum_branch_curr])
        out.write_currents(node_arr, branch_arr, "_cum", cfg)

    return ret


def compute_graph_data(data, cfg, dtype=np.float64):
    """src/network/pairwise.jl:31-65."""
    A = _assemble(data.coords, dtype)
    cc = build.components(A)
    cslog.info("Graph has %s nodes and %s connected components",
               A.shape[0], len(cc))
    G = build.laplacian(A)

    solver = _pick_network_solver(cfg, A.shape[0])
    cum = out.initialize_cum_vectors(data.coords, G.shape[0])

    empty_i = np.zeros((0, 0), np.int64)
    return GraphProblem(G, cc, data.fp.astype(np.int64),
                        data.fp.astype(np.int64), [], empty_i, empty_i,
                        None, np.zeros((0, 0), dtype), cum, solver)


def network_advanced(cfg, dtype=np.float64):
    """src/network/advanced.jl:1-51."""
    data = get_network_data(cfg, dtype)
    flags = get_network_flags(cfg)
    advanced_data = compute_advanced_data_network(data, flags, cfg, dtype)
    v, _ = advanced_kernel(advanced_data, flags, cfg)
    return v


def compute_advanced_data_network(data, flags, cfg, dtype=np.float64):
    """src/network/advanced.jl:22-51."""
    A = _assemble(data.coords, dtype)
    cc = build.components(A)
    cslog.info("Graph has %s nodes and %s connected components",
               A.shape[0], len(cc))
    G = build.laplacian(A)

    solver = _pick_network_solver(cfg, A.shape[0])
    sources, grounds, finite_grounds = get_sources_and_grounds(
        data, flags, G, np.zeros((0, 0), np.int64))

    empty_i = np.zeros((0, 0), np.int64)
    return AdvancedProblem(G, cc, empty_i, empty_i, None, sources, grounds,
                           np.zeros((0, 0), dtype), finite_grounds, -1, 0,
                           np.zeros((0, 0), dtype), solver)
