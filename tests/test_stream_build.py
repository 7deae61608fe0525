"""Shard-local streamed mesh build (solve/prepare.py
prepare_stencil_solver_streamed) vs the materialized build: identical
operator planes, identical hierarchy structure, matching solve answers.
"""

import numpy as np
import pytest

import jax

from circuitscape_tpu.parallel.mesh import make_mesh
from circuitscape_tpu.solve.prepare import (prepare_stencil_solver,
                                            prepare_stencil_solver_streamed)
from circuitscape_tpu.solve.stencil import (stencil_planes_np,
                                            stencil_solve_pairs)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(8)


def _mkmap(side=160, seed=3):
    rng = np.random.default_rng(seed)
    g = rng.uniform(0.5, 3.0, (side, side))
    g[rng.random((side, side)) < 0.10] = 0.0
    return g


@pytest.mark.parametrize("four", [False, True])
def test_streamed_matches_materialized(mesh8, four):
    g = _mkmap()
    S_s, prec_s, _, shape_s = prepare_stencil_solver_streamed(
        g, False, four, mesh8)
    S_m, prec_m, _, shape_m = prepare_stencil_solver(
        stencil_planes_np(g, False, four))
    assert shape_s == shape_m
    for name in ("we", "ws", "wse", "wne", "diag"):
        a = np.asarray(getattr(S_s, name))
        b = np.asarray(getattr(S_m, name))
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b, err_msg=name)
    assert len(prec_s.levels) == len(prec_m.levels)
    # level-1 planes came from the slab coarsener with the NE carry —
    # they must match the full-grid coarsening bit for bit
    for lv in range(1, len(prec_s.levels)):
        for name in ("we", "ws", "wse", "wne", "diag"):
            np.testing.assert_allclose(
                np.asarray(getattr(prec_s.levels[lv].A, name)),
                np.asarray(getattr(prec_m.levels[lv].A, name)),
                rtol=1e-6, atol=1e-12,
                err_msg=f"level {lv} {name}")


def test_streamed_solve_answers(mesh8):
    g = _mkmap(seed=5)
    S_s, prec_s, apply_s, _ = prepare_stencil_solver_streamed(
        g, False, False, mesh8)
    from scipy import ndimage
    lab, _ = ndimage.label(g > 0, structure=np.ones((3, 3)))
    main = np.argmax(np.bincount(lab.ravel())[1:]) + 1
    cells = np.argwhere(lab == main)
    X, rel, _ = stencil_solve_pairs(S_s, cells[:1], cells[-1:],
                                    rtol=1e-6, prec=prec_s,
                                    prec_apply=apply_s)
    assert np.all(rel < 1e-4)

    S_m, prec_m, apply_m, _ = prepare_stencil_solver(
        stencil_planes_np(g, False, False))
    Xm, relm, _ = stencil_solve_pairs(S_m, cells[:1], cells[-1:],
                                      rtol=1e-6, prec=prec_m,
                                      prec_apply=apply_m)
    v_s = np.asarray(X)[0, cells[-1][0], cells[-1][1]] - \
        np.asarray(X)[0, cells[0][0], cells[0][1]]
    v_m = np.asarray(Xm)[0, cells[-1][0], cells[-1][1]] - \
        np.asarray(Xm)[0, cells[0][0], cells[0][1]]
    assert abs(v_s - v_m) <= 1e-5 * max(1.0, abs(v_m))
