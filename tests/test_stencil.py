"""Stencil operator + Pallas kernel unit tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from circuitscape_tpu.graph.build import (construct_graph, construct_node_map,
                                          laplacian)
from circuitscape_tpu.solve.stencil import (stencil_cg, stencil_from_gmap,
                                            stencil_matvec, stencil_matvec_np,
                                            stencil_solve_pairs)


@pytest.mark.parametrize("avg_res", [False, True])
@pytest.mark.parametrize("four", [True, False])
def test_matvec_matches_sparse(avg_res, four):
    rng = np.random.default_rng(0)
    g = rng.uniform(0.5, 3, (7, 9))
    g[rng.random((7, 9)) < 0.25] = 0
    nm = construct_node_map(g, np.zeros((0, 0), np.int64))
    L = laplacian(construct_graph(g, nm, avg_res, four)).toarray()
    S = stencil_from_gmap(g, avg_res, four, np.float64)

    x = rng.standard_normal((3, 7, 9))
    x[:, g <= 0] = 0
    y = np.asarray(stencil_matvec(S, jnp.asarray(x)))

    mask = nm != 0
    order = nm[mask] - 1
    for b in range(3):
        xs = np.zeros(L.shape[0])
        xs[order] = x[b][mask]
        ys = L @ xs
        assert np.abs(y[b][mask] - ys[order]).max() < 1e-12


def test_matvec_np_matches_device():
    rng = np.random.default_rng(1)
    g = rng.uniform(0.5, 3, (12, 15))
    S = stencil_from_gmap(g, False, False, np.float64)
    x = rng.standard_normal((2, 12, 15))
    a = np.asarray(stencil_matvec(S, jnp.asarray(x)))
    b = stencil_matvec_np(S, x)
    assert np.abs(a - b).max() < 1e-12


def test_solve_pairs_device_resident():
    rng = np.random.default_rng(2)
    g = rng.uniform(0.5, 3, (40, 40))
    S = stencil_from_gmap(g, False, False, np.float64)
    src = np.array([[0, 0], [5, 5], [10, 3]])
    dst = np.array([[30, 30], [20, 25], [35, 12]])
    X, rel, iters = stencil_solve_pairs(S, src, dst)
    assert np.all(rel < 1e-6)
    Xn = np.asarray(X)
    # resistance positive and symmetric-ish sanity
    for k in range(3):
        r = Xn[k, dst[k][0], dst[k][1]] - Xn[k, src[k][0], src[k][1]]
        assert r > 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_geomg_spd_on_heterogeneous_grids(seed):
    """SPD guard for the geo-MG preconditioner (VERDICT r1 item 9).

    With the fixed coarse over-correction (overcorrect=1.9) the V-cycle
    must remain a symmetric positive-definite operator even on
    pathological grids (conductance spread 1e-6..1e6, near-disconnected
    strips), or CG silently loses its convergence guarantee.  Checks
    (a) symmetry <Mx, y> == <x, My> on random vectors, (b) positivity
    <x, Mx> > 0, and (c) the preconditioned solve actually converges.
    """
    from circuitscape_tpu.solve.geomg import build_geo_mg, geomg_apply
    from circuitscape_tpu.solve.stencil import stencil_planes_np

    rng = np.random.default_rng(seed)
    H = W = 96
    # log-uniform spread over 12 decades + a near-disconnecting strip
    g = 10.0 ** rng.uniform(-6, 6, (H, W))
    g[H // 2, : W - 2] = 1e-6
    g[rng.random((H, W)) < 0.05] = 0.0
    planes = stencil_planes_np(g, False, False)
    prec = build_geo_mg(planes_np=planes)
    assert prec.overcorrect == pytest.approx(1.9)

    def M(v):
        return np.asarray(geomg_apply(prec, jnp.asarray(v, jnp.float32)),
                          np.float64)

    x = rng.standard_normal((2, H, W)).astype(np.float32)
    y = rng.standard_normal((2, H, W)).astype(np.float32)
    x[:, g <= 0] = 0
    y[:, g <= 0] = 0
    Mx, My = M(x), M(y)
    for b in range(2):
        lhs = float(np.sum(Mx[b] * y[b]))
        rhs = float(np.sum(x[b] * My[b]))
        scale = max(abs(lhs), abs(rhs), 1e-30)
        assert abs(lhs - rhs) / scale < 1e-4, "V-cycle is not symmetric"
        assert float(np.sum(x[b] * Mx[b])) > 0, "V-cycle not positive"

    # (c) convergence: a unit pair solve through the production entry
    from scipy.ndimage import label
    lab, _ = label(g > 0, structure=np.ones((3, 3)))
    main = np.argmax(np.bincount(lab.ravel())[1:]) + 1
    cells = np.argwhere(lab == main)
    src = cells[:1]
    dst = cells[-1:]
    X, rel, iters = stencil_solve_pairs(
        stencil_from_gmap(g, False, False, np.float64), src, dst,
        rtol=1e-6, prec=prec, prec_apply=geomg_apply)
    assert np.all(rel < 1e-4), f"PCG failed on pathological grid: {rel}"


def test_device_mg_build_matches_host():
    """build_geo_mg_device (one-dispatch on-device hierarchy setup) must
    produce the same Galerkin hierarchy as the host numpy build — same
    level shapes, same coarsened planes, same coarse pseudo-inverse,
    lam estimates close to the host power iteration (different start
    vectors, same spectrum)."""
    import jax.numpy as jnp
    from circuitscape_tpu.solve.geomg import (GeoMgHierarchy, GeoMgLevel,
                                              build_geo_mg,
                                              build_geo_mg_device,
                                              geomg_apply)
    from circuitscape_tpu.solve.stencil import (StencilOperator,
                                                stencil_planes_np)

    rng = np.random.default_rng(0)
    g = rng.uniform(0.5, 3.0, (213, 187))
    g[rng.random((213, 187)) < 0.1] = 0
    planes = stencil_planes_np(g, False, False)
    h_host = build_geo_mg(planes_np=planes)
    S32 = StencilOperator(*(jnp.asarray(p, jnp.float32) for p in planes))
    h_dev = build_geo_mg_device(S32)

    assert len(h_host.levels) == len(h_dev.levels)
    for Lh, Ld in zip(h_host.levels, h_dev.levels):
        for nm in ("we", "ws", "wse", "wne", "diag"):
            d = np.abs(np.asarray(getattr(Lh.A, nm)) -
                       np.asarray(getattr(Ld.A, nm))).max()
            assert d < 1e-3, (nm, d)
    assert np.abs(np.asarray(h_host.coarse_pinv) -
                  np.asarray(h_dev.coarse_pinv)).max() < 1e-6

    # lam estimates agree with the host power iteration, and the
    # lam-matched V-cycle applications agree to f32 precision
    for Lh, Ld in zip(h_host.levels, h_dev.levels):
        assert abs(Lh.lam_max - Ld.lam_max) < 0.1, (Lh.lam_max, Ld.lam_max)
    h2 = GeoMgHierarchy(
        tuple(GeoMgLevel(Lh.A, Lh.inv_diag, Ld.lam_max)
              for Lh, Ld in zip(h_host.levels, h_dev.levels)),
        h_host.coarse_pinv, h_host.coarse_shape, h_host.overcorrect)
    x = jnp.asarray(rng.standard_normal((3, 213, 187)), jnp.float32)
    a = np.asarray(geomg_apply(h2, x))
    b = np.asarray(geomg_apply(h_dev, x))
    assert np.abs(a - b).max() / np.abs(a).max() < 1e-5

    # and the device-built hierarchy still preconditions a solve
    from scipy.ndimage import label
    from circuitscape_tpu.solve.stencil import stencil_solve_pairs
    S64 = StencilOperator(*(jnp.asarray(p, jnp.float64) for p in planes))
    lab, _ = label(g > 0, structure=np.ones((3, 3)))
    main = np.argmax(np.bincount(lab.ravel())[1:]) + 1
    cells = np.argwhere(lab == main)
    X, rel, it = stencil_solve_pairs(S64, cells[:1], cells[-1:],
                                     rtol=1e-6, prec=h_dev,
                                     prec_apply=geomg_apply)
    assert np.all(rel < 1e-4)


@pytest.mark.skipif(not __import__("os").environ.get("CS_TPU_TESTS"),
                    reason="real-TPU test; set CS_TPU_TESTS=1")
def test_pallas_matvec_real_tpu():
    """Non-interpret Pallas kernel on the actual chip (VERDICT r1 item
    2).  Runs in a subprocess because this suite pins JAX to CPU."""
    import subprocess
    import sys

    code = """
import numpy as np, jax, jax.numpy as jnp
from circuitscape_tpu.solve.stencil import stencil_from_gmap, stencil_matvec
from circuitscape_tpu.solve.pallas_stencil import PallasStencil, pallas_matvec
rng = np.random.default_rng(0)
H, W, B = 512, 512, 8
g = rng.uniform(0.5, 3.0, (H, W)); g[rng.random((H, W)) < 0.1] = 0.0
S = stencil_from_gmap(g, False, False, jnp.float32)
P = PallasStencil.from_operator(S)
x = jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32)
y = pallas_matvec(P, x)
yr = jax.jit(stencil_matvec)(S, x)
err = float(jnp.max(jnp.abs(y - yr))) / float(jnp.max(jnp.abs(yr)))
assert err < 1e-5, err
print("TPU_PALLAS_OK", err)
"""
    env = dict(__import__("os").environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600,
                         cwd=__import__("os").path.dirname(
                             __import__("os").path.dirname(
                                 __import__("os").path.abspath(__file__))))
    assert "TPU_PALLAS_OK" in out.stdout, out.stderr[-2000:]


def test_pallas_matvec_interpret():
    from circuitscape_tpu.solve.pallas_stencil import (PallasStencil,
                                                       pallas_matvec,
                                                       supported)
    rng = np.random.default_rng(3)
    H, W, B = 300, 384, 8
    g = rng.uniform(0.5, 3, (H, W))
    g[rng.random((H, W)) < 0.2] = 0
    S = stencil_from_gmap(g, False, False, np.float32)
    assert supported((H, W), B)
    P = PallasStencil.from_operator(S)
    x = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))
    y_ref = stencil_matvec(S, x)
    y_pl = pallas_matvec(P, x, interpret=True)
    rel = float(jnp.max(jnp.abs(y_pl - y_ref))) / float(jnp.max(jnp.abs(y_ref)))
    assert rel < 1e-5


def test_pallas_matvec_interpret_wide():
    """Column-tiled kernel path (W > 4094, VERDICT r3 item 4): the
    tiled variant must agree with the XLA matvec at a width the
    single-slab kernel cannot handle."""
    from circuitscape_tpu.solve.pallas_stencil import (PallasStencil,
                                                       pallas_matvec,
                                                       supported)
    rng = np.random.default_rng(5)
    H, W, B = 64, 4200, 4
    g = rng.uniform(0.5, 3, (H, W))
    g[rng.random((H, W)) < 0.2] = 0
    S = stencil_from_gmap(g, False, False, np.float32)
    assert supported((H, W), B)
    P = PallasStencil.from_operator(S)
    assert P.shape == (H, W)
    x = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))
    y_ref = stencil_matvec(S, x)
    y_pl = pallas_matvec(P, x, interpret=True)
    rel = (float(jnp.max(jnp.abs(y_pl - y_ref))) /
           float(jnp.max(jnp.abs(y_ref))))
    assert rel < 1e-5


def test_poly_projector_matches_collapsed_laplacian():
    """CG with Pi L Pi (PolyProjector) must reproduce the EXACT
    collapsed-graph solve the reference gets by merging polygon nodes
    (src/raster/pairwise.jl:283-314): compare against a direct sparse
    solve of P^T L P."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from circuitscape_tpu.graph import build
    from circuitscape_tpu.solve.stencil import (build_poly_projector,
                                                poly_project,
                                                stencil_from_gmap,
                                                stencil_solve_pairs)

    rng = np.random.default_rng(9)
    H = W = 40
    g = rng.uniform(0.5, 3.0, (H, W))
    g[rng.random((H, W)) < 0.05] = 0.0
    poly = np.zeros((H, W), np.int64)
    poly[5:9, 10:15] = 1
    poly[25:31, 30:33] = 2
    poly[g <= 0] = 0
    gmap = np.where(g > 0, g, 0.0)

    nodemap = build.construct_node_map(gmap, poly)
    proj = build_poly_projector(nodemap)
    assert proj is not None

    # reference collapsed system: sparse Laplacian on merged node ids
    a = build.construct_graph(gmap, nodemap, False, False)
    L = build.laplacian(a).tocsr()

    # pick src inside polygon 1, dst a plain cell
    src_cell = (6, 12)
    dst_cell = (35, 5)
    assert poly[src_cell] == 1 and poly[dst_cell] == 0
    src_node = int(nodemap[src_cell]) - 1
    dst_node = int(nodemap[dst_cell]) - 1

    n = L.shape[0]
    b = np.zeros(n)
    b[src_node] -= 1.0
    b[dst_node] += 1.0
    eps = np.finfo(np.float64).eps
    Lr = (L + sp.identity(n) * (eps * np.linalg.norm(L.data))).tocsc()
    v_ref = spla.spsolve(Lr, b)
    r_ref = v_ref[dst_node] - v_ref[src_node]

    S = stencil_from_gmap(gmap, False, False, np.float64)
    X, rel, iters = stencil_solve_pairs(
        S, np.asarray([src_cell]), np.asarray([dst_cell]), rtol=1e-8,
        proj=proj)
    Xn = np.asarray(X[0])
    r_dev = Xn[dst_cell] - Xn[src_cell]
    assert abs(r_dev - r_ref) < 1e-5, (r_dev, r_ref)
    # solution constant over each polygon
    for pid in (1, 2):
        vals = Xn[poly == pid]
        assert np.ptp(vals[np.asarray(gmap[poly == pid]) > 0]) < 1e-9


def test_poly_project_is_projection():
    from circuitscape_tpu.graph import build
    from circuitscape_tpu.solve.stencil import (build_poly_projector,
                                                poly_project)
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    H = W = 24
    gmap = rng.uniform(0.5, 3.0, (H, W))
    poly = np.zeros((H, W), np.int64)
    poly[3:7, 3:9] = 1
    nodemap = build.construct_node_map(gmap, poly)
    proj = build_poly_projector(nodemap)
    y = jnp.asarray(rng.standard_normal((3, H, W)))
    py = poly_project(proj, y)
    ppy = poly_project(proj, py)
    assert np.allclose(np.asarray(py), np.asarray(ppy))       # idempotent
    # symmetric in the grid inner product
    z = jnp.asarray(rng.standard_normal((3, H, W)))
    lhs = float(jnp.sum(poly_project(proj, y) * z))
    rhs = float(jnp.sum(y * poly_project(proj, z)))
    assert abs(lhs - rhs) < 1e-9 * max(1.0, abs(lhs))


def test_device_oom_reraise_capacity_hint():
    """An opaque device OOM surfaces as a SolverFailedError carrying the
    capacity model (docs/capacity.md), not a runtime allocation dump."""
    import pytest
    from circuitscape_tpu.solve.dispatch import (SolverFailedError,
                                                 reraise_if_device_oom)
    oom = RuntimeError("RESOURCE_EXHAUSTED: Ran out of memory in memory "
                       "space hbm. Used 18.57G of 15.75G hbm.")
    with pytest.raises(SolverFailedError) as ei:
        reraise_if_device_oom(oom, 49_562_500, 4)
    m = str(ei.value)
    assert "49562500-cell" in m and "CS_SHORTCUT_CHUNK_BYTES" in m
    assert "capacity" in m

    other = ValueError("something else")
    with pytest.raises(ValueError):
        reraise_if_device_oom(other, 100, 1)


def test_device_planes_match_host():
    """stencil_from_gmap_device == stencil_planes_np for all four
    weight-rule combinations, NODATA holes included (the production
    prepare_stencil_solver_from_gmap path uploads the gmap and builds
    planes on device; src/raster/pairwise.jl:364-367 weight rules)."""
    import jax.numpy as jnp

    from circuitscape_tpu.solve.stencil import (stencil_from_gmap_device,
                                                stencil_planes_np)

    rng = np.random.default_rng(7)
    g = rng.uniform(0.5, 3.0, (23, 31))
    g[rng.random(g.shape) < 0.2] = 0.0      # inactive holes
    for avg_res in (False, True):
        for four in (False, True):
            host = stencil_planes_np(g, avg_res, four)
            dev = stencil_from_gmap_device(jnp.asarray(g), avg_res, four,
                                           dtype=jnp.float64)
            for hp, dp, name in zip(host,
                                    (dev.we, dev.ws, dev.wse, dev.wne,
                                     dev.diag),
                                    ("we", "ws", "wse", "wne", "diag")):
                np.testing.assert_allclose(
                    np.asarray(dp), hp, rtol=1e-13, atol=1e-13,
                    err_msg=f"{name} avg_res={avg_res} four={four}")


def test_prepare_from_gmap_matches_prepare(monkeypatch):
    """The gmap fast path returns the same operator + a working
    hierarchy as the host-plane path."""
    import jax

    from circuitscape_tpu.solve.prepare import (
        prepare_stencil_solver, prepare_stencil_solver_from_gmap)
    from circuitscape_tpu.solve.stencil import stencil_planes_np

    rng = np.random.default_rng(3)
    g = rng.uniform(0.5, 3.0, (90, 70))
    g[rng.random(g.shape) < 0.1] = 0.0
    monkeypatch.setenv("CS_DISABLE_MESH", "1")
    Sa, preca, _, shp_a = prepare_stencil_solver(
        stencil_planes_np(g, False, False))
    Sb, precb, _, shp_b = prepare_stencil_solver_from_gmap(
        g, False, False)
    assert shp_a == shp_b == (90, 70)
    assert Sa.shape == Sb.shape
    np.testing.assert_allclose(np.asarray(Sb.diag), np.asarray(Sa.diag),
                               rtol=1e-13, atol=1e-13)
    assert (preca is None) == (precb is None)
    if preca is not None:
        assert len(preca.levels) == len(precb.levels)


def test_node_currents_np_matches_device():
    """Host node-current computation (fetch-reduction path) must equal
    the device stencil_node_currents bit-for-bit in semantics."""
    from circuitscape_tpu.solve.stencil import (node_currents_np,
                                                stencil_from_gmap,
                                                stencil_node_currents,
                                                stencil_planes_np)
    rng = np.random.default_rng(11)
    H, W, B = 60, 52, 5
    g = rng.uniform(0.5, 3, (H, W))
    g[rng.random((H, W)) < 0.15] = 0
    planes = stencil_planes_np(g, False, False)
    S = stencil_from_gmap(g, False, False, np.float64)
    V = rng.standard_normal((B, H, W))
    nc_dev = np.asarray(stencil_node_currents(S, jnp.asarray(V)))
    nc_np = node_currents_np(planes, V)
    np.testing.assert_allclose(nc_np, nc_dev, rtol=1e-12, atol=1e-12)
    # f32 path (what the maps pipeline uses)
    nc32 = node_currents_np(planes, V.astype(np.float32))
    assert np.abs(nc32 - nc_dev).max() < 1e-5 * max(1, np.abs(nc_dev).max())
    # 4-neighbor rule
    p4 = stencil_planes_np(g, True, True)
    S4 = stencil_from_gmap(g, True, True, np.float64)
    nc4_dev = np.asarray(stencil_node_currents(S4, jnp.asarray(V)))
    nc4_np = node_currents_np(p4, V)
    np.testing.assert_allclose(nc4_np, nc4_dev, rtol=1e-12, atol=1e-12)


def test_node_currents_native_matches_np():
    """Native csio_node_currents_f32 (io/fastio.py) vs the numpy
    reference implementation: identical semantics on f32 maps."""
    from circuitscape_tpu.io import fastio
    from circuitscape_tpu.solve.stencil import (node_currents_np,
                                                stencil_planes_np)
    if fastio.load() is None:
        pytest.skip("native fastio unavailable")
    rng = np.random.default_rng(17)
    for four in (False, True):
        H, W = 83, 61
        g = rng.uniform(0.5, 3, (H, W))
        g[rng.random((H, W)) < 0.12] = 0
        planes = tuple(p.astype(np.float32)
                       for p in stencil_planes_np(g, False, four))
        V = rng.standard_normal((H, W)).astype(np.float32)
        a = node_currents_np(planes, V)
        b = fastio.node_currents_f32(planes, V)
        assert b is not None
        np.testing.assert_allclose(b, a, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("shape", [(128, 384), (64, 4200)])
def test_pallas_cheb_step_interpret(shape):
    """Fused Chebyshev step (matvec + r/d/x updates in one pass) vs the
    unfused XLA ops, both layouts (single-slab and column-tiled)."""
    from circuitscape_tpu.solve.pallas_stencil import (PallasStencil,
                                                       cheb_supported,
                                                       pallas_cheb_step)
    rng = np.random.default_rng(9)
    H, W = shape
    B = 3    # odd: exercises CBBLK=1
    g = rng.uniform(0.5, 3, (H, W))
    g[rng.random((H, W)) < 0.15] = 0
    S = stencil_from_gmap(g, False, False, np.float32)
    P = PallasStencil.from_operator(S)
    assert cheb_supported((H, W), B)
    diag = np.asarray(S.diag)
    dinv = np.where(diag > 0, 1.0 / np.where(diag == 0, 1, diag),
                    0.0).astype(np.float32)
    r = rng.standard_normal((B, H, W)).astype(np.float32)
    d = rng.standard_normal((B, H, W)).astype(np.float32)
    x = rng.standard_normal((B, H, W)).astype(np.float32)
    ca, cb = 0.37, 1.21

    rj, dj, xj = (jnp.asarray(a) for a in (r, d, x))
    r2, d2, x2 = pallas_cheb_step(P, jnp.asarray(dinv), rj, dj, xj,
                                  ca=ca, cb=cb, interpret=True)

    t = np.asarray(stencil_matvec(S, dj))
    r_ref = r - t
    d_ref = ca * d + cb * (dinv[None] * r_ref)
    x_ref = x + d_ref
    scale = max(np.abs(r_ref).max(), np.abs(d_ref).max(),
                np.abs(x_ref).max())
    assert np.abs(np.asarray(r2) - r_ref).max() < 1e-5 * scale
    assert np.abs(np.asarray(d2) - d_ref).max() < 1e-5 * scale
    assert np.abs(np.asarray(x2) - x_ref).max() < 1e-5 * scale


def test_solve_chunk_budget_capacity_model(monkeypatch):
    """Chunk budgets scale with free HBM after fixed residency, honor
    the env override, and floor chunk widths to powers of two
    (solve/dispatch.py; the fused solve pads batches UP to one)."""
    from circuitscape_tpu.solve import dispatch as dp

    monkeypatch.delenv("CS_SHORTCUT_CHUNK_BYTES", raising=False)
    cells_1m, cells_12m = 1 << 20, 3584 * 3584
    b1 = dp.solve_chunk_budget(cells_1m)
    b12 = dp.solve_chunk_budget(cells_12m)
    assert b1 > b12 > 0                      # fixed bytes grow with cells
    assert b1 <= dp.HBM_USABLE_BYTES
    # a 12M-cell job must still get MULTIPLE f64 columns (the flat
    # 2 GiB budget gave 2; the capacity model gives >= 8)
    assert b12 // (cells_12m * 64) >= 8

    monkeypatch.setenv("CS_SHORTCUT_CHUNK_BYTES", "12345")
    assert dp.solve_chunk_budget(cells_1m) == 12345

    assert [dp.pow2_floor(n) for n in (1, 2, 3, 5, 8, 13, 31, 32)] == \
        [1, 2, 2, 4, 8, 8, 16, 32]


def test_prepare_large_single_matches_host_path(monkeypatch):
    """The large-grid single-device setup (device operator from gmap +
    host-coarsened hierarchy with a device-derived fine level) must
    produce the same operator and a hierarchy equivalent to the pure
    host path (solve/prepare.py _prepare_large_single)."""
    import jax.numpy as jnp

    from circuitscape_tpu.solve.prepare import (
        _prepare_large_single, prepare_stencil_solver)
    from circuitscape_tpu.solve.stencil import (stencil_planes_np,
                                                stencil_solve_pairs)

    rng = np.random.default_rng(5)
    g = rng.uniform(0.5, 3.0, (130, 140))
    g[rng.random(g.shape) < 0.1] = 0.0
    monkeypatch.setenv("CS_DISABLE_MESH", "1")
    # force the host hierarchy branch in the reference path (otherwise
    # small grids build the hierarchy on device, a different — equally
    # valid — rounding of every level)
    monkeypatch.setenv("CS_DEVICE_MG_MAX", "0")

    Sh, ph, ah, shp_h = prepare_stencil_solver(
        stencil_planes_np(g, False, False))
    Sl, pl_, al, shp_l = _prepare_large_single(g, False, False)
    assert shp_h == shp_l == (130, 140)
    np.testing.assert_allclose(np.asarray(Sl.diag), np.asarray(Sh.diag),
                               rtol=1e-13, atol=1e-13)
    assert len(ph.levels) == len(pl_.levels)
    # fine level: device-derived f32 (f32-summed diag) vs host f64-
    # summed-then-cast — a few ulp of rounding, irrelevant to the
    # preconditioner
    np.testing.assert_allclose(
        np.asarray(pl_.levels[0].A.diag), np.asarray(ph.levels[0].A.diag),
        rtol=1e-6, atol=0)
    np.testing.assert_allclose(
        np.asarray(pl_.levels[0].inv_diag),
        np.asarray(ph.levels[0].inv_diag), rtol=1e-6, atol=0)
    # coarse levels ride the upload in both paths: identical
    np.testing.assert_array_equal(np.asarray(pl_.levels[1].A.we),
                                  np.asarray(ph.levels[1].A.we))
    assert pl_.levels[1].lam_max == ph.levels[1].lam_max
    # and the solve converges to the same answers through both setups
    # (focal cells picked inside the dominant 8-connected component)
    from scipy.ndimage import label
    lab, _n = label(g > 0, structure=np.ones((3, 3), int))
    main = np.argmax(np.bincount(lab[lab > 0]))
    act = np.argwhere(lab == main)
    pts = act[[10, len(act) // 2, -10]]
    sc, dc = pts[[0, 0]], pts[[1, 2]]
    Xh, relh, _ = stencil_solve_pairs(Sh, sc, dc, prec=ph, prec_apply=ah)
    Xl, rell, _ = stencil_solve_pairs(Sl, sc, dc, prec=pl_, prec_apply=al)
    assert relh.max() <= 1e-6 and rell.max() <= 1e-6
    np.testing.assert_allclose(np.asarray(Xl[:2]), np.asarray(Xh[:2]),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("B", [1, 2, 4, 8])
def test_round5_fused_kernels_interpret(B):
    """Interpret-mode differentials for the round-5 fused kernels at
    several batch-block widths (matvec+pAp, residual+restrict,
    from-zero smoother, two-pass warm smoother) against the XLA
    formulations."""
    import jax.numpy as jnp

    from circuitscape_tpu.solve.geomg import (CHEB_DEGREE, GeoMgLevel,
                                              _cheb_smooth, _restrict)
    from circuitscape_tpu.solve.pallas_stencil import (
        PallasStencil, cheb_init_supported, pallas_cheb_finish,
        pallas_cheb_init, pallas_matvec_pap, pallas_residual_init,
        pallas_residual_restrict, rr_supported, warm_smooth_supported)
    from circuitscape_tpu.solve.stencil import (StencilOperator,
                                                stencil_from_gmap,
                                                stencil_matvec)

    rng = np.random.default_rng(11)
    H, W = 128, 256
    g = rng.uniform(0.5, 2.0, (H, W))
    g[rng.random((H, W)) < 0.1] = 0.0
    S = stencil_from_gmap(g, False, False, jnp.float32)
    P = PallasStencil.from_operator(S, with_init=True)
    inv = jnp.where(S.diag > 0,
                    1.0 / jnp.where(S.diag == 0, 1.0, S.diag), 0.0)
    x = jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32)
    yref = stencil_matvec(S, x)

    assert rr_supported((H, W), B)
    assert cheb_init_supported((H, W), B)
    assert warm_smooth_supported((H, W), B)

    y, pap = pallas_matvec_pap(P, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(pap), np.asarray(jnp.sum(x * yref, axis=(-2, -1))),
        rtol=1e-5)

    rc = pallas_residual_restrict(P, b, x, interpret=True)
    rcref = _restrict(b - yref)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(rcref),
                               rtol=0, atol=2e-4)

    # smoother coefficients for lam_max = 2.0 (the production default)
    assert CHEB_DEGREE == 2
    lmax = 2.0
    lmin = lmax / 4.0
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma
    rho_new = 1.0 / (2.0 * sigma - rho)
    c = float(1.0 / theta)
    ca = float(rho_new * rho)
    cb = float(2.0 * rho_new / delta)

    # XLA-reference smoother (no pallas attached)
    A_plain = StencilOperator(S.we, S.ws, S.wse, S.wne, S.diag)
    L = GeoMgLevel(A_plain, inv, lmax)

    x0 = pallas_cheb_init(P.init_planes, inv, b, c=c, ca=ca, cb=cb,
                          interpret=True)
    ref0 = _cheb_smooth(L, b, None)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(ref0),
                               rtol=0, atol=2e-4)

    r0, x1 = pallas_residual_init(P, inv, b, x, c=c, interpret=True)
    x2 = pallas_cheb_finish(P.init_planes, inv, r0, x1, c=c, ca=ca,
                            cb=cb, interpret=True)
    ref2 = _cheb_smooth(L, b, x)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(ref2),
                               rtol=0, atol=2e-4)
