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


def test_pad_to_mesh_shapes(mesh8):
    from circuitscape_tpu.parallel.mesh import pad_to_mesh
    plane = np.ones((63, 17))
    p = pad_to_mesh(plane, mesh8)
    assert p.shape[0] % mesh8.shape["nodes"] == 0
    block = np.ones((5, 63, 17))
    b = pad_to_mesh(block, mesh8)
    assert b.shape[0] % mesh8.shape["batch"] == 0
    assert b.shape[1] % mesh8.shape["nodes"] == 0
