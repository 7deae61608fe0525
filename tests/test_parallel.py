"""Multi-device sharding tests on the 8-virtual-CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def mesh8():
    from circuitscape_tpu.parallel.mesh import make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(8)


def test_mesh_axes(mesh8):
    assert set(mesh8.shape.keys()) == {"nodes", "batch"}
    assert mesh8.shape["nodes"] * mesh8.shape["batch"] == 8


def test_sharded_cg_matches_single_device(mesh8):
    from circuitscape_tpu.parallel.mesh import (pad_to_mesh,
                                                sharded_stencil_cg)
    from circuitscape_tpu.solve.stencil import (StencilOperator,
                                                stencil_cg_device,
                                                stencil_from_gmap)
    rng = np.random.default_rng(0)
    g = rng.uniform(0.5, 3.0, (64, 64))
    S = stencil_from_gmap(g, False, False, np.float32)

    B = np.zeros((8, 64, 64), np.float32)
    for k in range(8):
        r1, c1, r2, c2 = rng.integers(0, 64, 4)
        B[k, r1, c1] += -1
        B[k, r2, c2] += 1

    X1, rel1, it1 = stencil_cg_device(S, jnp.asarray(B), itmax=2000)

    planes = [pad_to_mesh(np.asarray(p), mesh8)
              for p in (S.we, S.ws, S.wse, S.wne, S.diag)]
    Sp = StencilOperator(*(jnp.asarray(p) for p in planes))
    Bp = jnp.asarray(pad_to_mesh(B, mesh8))
    with mesh8:
        X8, rel8, it8 = sharded_stencil_cg(mesh8, Sp, Bp, itmax=2000)

    a = np.asarray(X1)
    b = np.asarray(X8)[:, :64, :64]
    # solutions may differ by a per-column constant on the singular
    # Laplacian; compare after removing the mean over active cells
    a = a - a.mean(axis=(1, 2), keepdims=True)
    b = b - b.mean(axis=(1, 2), keepdims=True)
    assert np.max(np.abs(a - b)) < 1e-3


def test_sharded_mg_pair_solve_matches_single_device(mesh8, monkeypatch):
    """The PRODUCTION fused pair solve (geo-MG V-cycle + mixed-precision
    refinement) under GSPMD on 8 devices must match the single-device
    answer on a 256x256 grid (VERDICT r1 item 1)."""
    from circuitscape_tpu.solve.prepare import prepare_stencil_solver
    from circuitscape_tpu.solve.stencil import (stencil_planes_np,
                                                stencil_solve_pairs_points)

    rng = np.random.default_rng(3)
    g = rng.uniform(0.5, 3.0, (256, 256))
    g[rng.random((256, 256)) < 0.05] = 0.0   # holes
    planes = stencil_planes_np(g, False, False)

    # restrict focal picks to the largest connected component (pair RHS
    # across components would be inconsistent)
    from scipy.ndimage import label
    lab, nlab = label(g > 0, structure=np.ones((3, 3)))
    main = np.argmax(np.bincount(lab.ravel())[1:]) + 1

    def pick_cells(n):
        cells = []
        while len(cells) < n:
            r, c = rng.integers(0, 256, 2)
            if lab[r, c] == main:
                cells.append((r, c))
        return np.asarray(cells, np.int64)

    src = pick_cells(5)
    dst = pick_cells(5)
    pts = pick_cells(4)

    # single-device reference
    monkeypatch.setenv("CS_DISABLE_MESH", "1")
    S1, prec1, apply1, _ = prepare_stencil_solver(planes)
    _, Vp1, rel1, _ = stencil_solve_pairs_points(
        S1, src, dst, pts, rtol=1e-8, prec=prec1, prec_apply=apply1)
    assert np.all(rel1 < 1e-6)

    # 8-device sharded run through the same production entry point
    monkeypatch.delenv("CS_DISABLE_MESH")
    monkeypatch.setenv("CS_FORCE_MESH", "1")
    S8, prec8, apply8, (H0, W0) = prepare_stencil_solver(planes)
    assert (H0, W0) == (256, 256)
    from circuitscape_tpu.parallel.mesh import mesh_of
    assert mesh_of(S8.diag) is not None, "operator must be mesh-sharded"
    _, Vp8, rel8, _ = stencil_solve_pairs_points(
        S8, src, dst, pts, rtol=1e-8, prec=prec8, prec_apply=apply8)
    assert np.all(rel8 < 1e-6)

    assert np.max(np.abs(Vp1 - Vp8)) < 1e-5


def test_sharded_advanced_batch_matches_single_device(mesh8, monkeypatch):
    """Batched advanced solves (penalty grounds) under GSPMD == single
    device, including the batch-padding to even 'batch' shards."""
    from circuitscape_tpu.solve.prepare import prepare_stencil_solver
    from circuitscape_tpu.solve.stencil import (advanced_ground_penalty,
                                                stencil_planes_np,
                                                stencil_solve_advanced_batch)

    rng = np.random.default_rng(11)
    g = rng.uniform(0.5, 3.0, (128, 128))
    planes = stencil_planes_np(g, False, False)

    nb = 3  # deliberately NOT a multiple of the batch axis
    K = 2
    src_cells = rng.integers(0, 128, (nb, K, 2))
    src_vals = rng.uniform(0.5, 2.0, (nb, K))
    gnd_cells = rng.integers(0, 128, (nb, K, 2))

    def run():
        S, prec, apply_, _ = prepare_stencil_solver(planes)
        gnd_vals = np.full((nb, K), advanced_ground_penalty(S))
        # rtol=1e-7: the 1e8-scale penalty grounds amplify f32 rounding
        # in the inner passes, so ~1e-6 true relres is the reliable
        # floor here (production runs rtol=1e-6, gate 1e-4) — asking
        # for 1e-8 made the assert hinge on rounding luck
        X, rel, _ = stencil_solve_advanced_batch(
            S, src_cells, src_vals, gnd_cells, gnd_vals,
            rtol=1e-7, prec=prec, prec_apply=apply_)
        assert np.all(rel < 1e-5)
        return np.asarray(X)[:nb, :128, :128]

    monkeypatch.setenv("CS_DISABLE_MESH", "1")
    X1 = run()
    monkeypatch.delenv("CS_DISABLE_MESH")
    monkeypatch.setenv("CS_FORCE_MESH", "1")
    X8 = run()
    assert np.max(np.abs(X1 - X8)) < 1e-5


def test_pad_to_mesh_shapes(mesh8):
    from circuitscape_tpu.parallel.mesh import pad_to_mesh
    plane = np.ones((63, 17))
    p = pad_to_mesh(plane, mesh8)
    assert p.shape[0] % mesh8.shape["nodes"] == 0
    block = np.ones((5, 63, 17))
    b = pad_to_mesh(block, mesh8)
    assert b.shape[0] % mesh8.shape["batch"] == 0
    assert b.shape[1] % mesh8.shape["nodes"] == 0


def test_shard_map_matvec_matches_single_device(mesh8):
    """The shard_map halo-exchange matvec (parallel/mesh.py
    ShardStencil) must reproduce the single-device stencil matvec
    exactly: the halo rows arriving by ppermute replace the zero-pad
    boundary reads at shard seams."""
    from circuitscape_tpu.parallel.mesh import build_shard_stencil
    from circuitscape_tpu.solve.stencil import (StencilOperator,
                                                stencil_from_gmap,
                                                stencil_matvec)
    rng = np.random.default_rng(3)
    H, W, B = 128, 96, 8
    g = rng.uniform(0.5, 3.0, (H, W))
    g[rng.random((H, W)) < 0.1] = 0.0
    S = stencil_from_gmap(g, False, False, jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32)
    y_ref = np.asarray(stencil_matvec(S, x))

    ss = build_shard_stencil(mesh8, S, want_pallas=False)
    assert ss is not None
    S2 = StencilOperator(S.we, S.ws, S.wse, S.wne, S.diag, None, ss)
    for f in (stencil_matvec, jax.jit(stencil_matvec)):
        y = np.asarray(f(S2, x))
        err = np.abs(y - y_ref).max() / np.abs(y_ref).max()
        assert err < 1e-6, f"shard_map matvec rel err {err}"


def test_shard_stencil_attached_in_production_prepare(mesh8, monkeypatch):
    """prepare_stencil_solver under a mesh must attach the shard_map
    formulation to the FINE MG level (the level carrying ~70% of the
    V-cycle bytes), and the solve through it must still converge to the
    single-device answer."""
    monkeypatch.setenv("CS_FORCE_MESH", "1")
    from circuitscape_tpu.solve.prepare import prepare_stencil_solver
    from circuitscape_tpu.solve.stencil import (stencil_planes_np,
                                                stencil_solve_pairs)
    rng = np.random.default_rng(5)
    g = rng.uniform(0.5, 3.0, (96, 96))
    planes = stencil_planes_np(g, False, False)
    S64, prec, prec_apply, _ = prepare_stencil_solver(planes)
    assert prec is not None
    assert prec.levels[0].A.shard is not None, \
        "fine level should carry the shard_map halo-exchange matvec"

    src = np.array([[3, 4], [10, 60]])
    dst = np.array([[90, 88], [50, 20]])
    X, rel, iters = stencil_solve_pairs(S64, src, dst, prec=prec,
                                        prec_apply=prec_apply)
    assert np.all(rel < 1e-6)

    monkeypatch.setenv("CS_DISABLE_MESH", "1")
    S1, prec1, papply1, _ = prepare_stencil_solver(planes)
    assert prec1.levels[0].A.shard is None
    X1, rel1, _ = stencil_solve_pairs(S1, src, dst, prec=prec1,
                                      prec_apply=papply1)
    a = np.asarray(X)[:2, :96, :96]   # batch is padded to mesh multiples
    b = np.asarray(X1)[:2, :96, :96]
    a = a - a.mean(axis=(1, 2), keepdims=True)
    b = b - b.mean(axis=(1, 2), keepdims=True)
    assert np.max(np.abs(a - b)) < 1e-4
