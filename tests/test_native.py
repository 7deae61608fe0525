"""Native C++ Cholesky tier: loud-failure guarantee + correctness.

VERDICT r1 item 5: the direct tier used to fall back to scipy silently;
CS_REQUIRE_NATIVE=1 must now make an unavailable native backend a hard
error, and the default build must actually load the native library.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from circuitscape_tpu.solve.dispatch import DirectContext


def _grid_laplacian(n_side, seed=0):
    rng = np.random.default_rng(seed)
    n = n_side * n_side
    rows, cols, vals = [], [], []
    for i in range(n_side):
        for j in range(n_side):
            a = i * n_side + j
            for di, dj in ((0, 1), (1, 0)):
                bi, bj = i + di, j + dj
                if bi < n_side and bj < n_side:
                    b = bi * n_side + bj
                    w = rng.uniform(0.5, 3.0)
                    rows += [a, b, a, b]
                    cols += [b, a, a, b]
                    vals += [-w, -w, w, w]
    return sp.csr_matrix((vals, (rows, cols)), shape=(n, n))


def test_native_backend_loads(monkeypatch):
    """With CS_REQUIRE_NATIVE set, DirectContext must use the native
    library (no silent scipy fallback)."""
    monkeypatch.setenv("CS_REQUIRE_NATIVE", "1")
    G = _grid_laplacian(12)
    ctx = DirectContext(G, np.float64)
    assert ctx._native is not None


def test_solver_registry_extension(tmp_path):
    """The registry is the plugin surface (parity with the reference's
    multiple-dispatch extension pattern, ext/CircuitscapePardisoExt.jl):
    a registered custom tier is reachable from compute() by name."""
    import circuitscape_tpu as cs
    from circuitscape_tpu.solve.dispatch import DirectSolver

    calls = {"n": 0}

    class TracingSolver(DirectSolver):
        name = "traced"

        def build(self, matrix, dtype):
            calls["n"] += 1
            return super().build(matrix, dtype)

    cs.register_solver("my_ext_solver", TracingSolver)

    hdr = ("ncols 5\nnrows 5\nxllcorner 0\nyllcorner 0\ncellsize 1\n"
           "NODATA_value -9999\n")
    (tmp_path / "cell.asc").write_text(hdr + "\n".join(["1 1 1 1 1"] * 5))
    pts = ["1 0 0 0 2"] + ["0 0 0 0 0"] * 4
    (tmp_path / "pts.asc").write_text(hdr + "\n".join(pts))
    d = {"data_type": "raster", "scenario": "pairwise",
         "habitat_file": str(tmp_path / "cell.asc"),
         "point_file": str(tmp_path / "pts.asc"),
         "output_file": str(tmp_path / "job.out"),
         "solver": "my_ext_solver"}
    r = cs.compute(d)
    assert calls["n"] > 0, "custom solver was not used"
    assert float(r[1, 2]) > 0


def test_supernodal_matches_scalar_engine(monkeypatch):
    """The BLAS-3 supernodal engine and the scalar up-looking engine
    must produce identical solutions (they share symbolics but use
    entirely different numeric phases)."""
    from circuitscape_tpu.solve.native_chol import NativeCholesky

    G = _grid_laplacian(30, seed=5)
    eps = np.finfo(np.float64).eps
    shifted = (G + sp.identity(G.shape[0]) * (10 * eps)).tocsc()
    n = G.shape[0]
    rng = np.random.default_rng(2)
    rhs = np.zeros((n, 4))
    for c in range(4):
        i, j = rng.choice(n, 2, replace=False)
        rhs[i, c], rhs[j, c] = 1.0, -1.0

    x_super = NativeCholesky(shifted).solve(rhs)
    monkeypatch.setenv("CS_CHOL_SCALAR", "1")
    x_scalar = NativeCholesky(shifted).solve(rhs)
    assert np.allclose(x_super - x_super[:1], x_scalar - x_scalar[:1],
                       atol=1e-8)


def test_chol_order_is_permutation():
    from circuitscape_tpu.solve.native_chol import NativeCholesky

    G = _grid_laplacian(25, seed=7)
    eps = np.finfo(np.float64).eps
    F = NativeCholesky((G + sp.identity(G.shape[0]) * (10 * eps)).tocsc())
    assert np.array_equal(np.sort(F.perm), np.arange(G.shape[0]))


def test_native_multi_rhs_matches_scipy():
    G = _grid_laplacian(16, seed=3)
    ctx = DirectContext(G, np.float64)
    n = G.shape[0]
    rng = np.random.default_rng(1)
    rhs = np.zeros((n, 5))
    for c in range(5):
        i, j = rng.integers(0, n, 2)
        rhs[i, c] += 1.0
        rhs[j, c] -= 1.0
    x = ctx.solve(rhs)
    eps = np.finfo(np.float64).eps
    shifted = G + sp.identity(n) * (10 * eps)
    ref = sp.linalg.spsolve(shifted.tocsc(), rhs)
    # the near-singular shift leaves the constant mode ill-determined;
    # voltages are only meaningful relative to a reference node
    assert np.allclose(x - x[0], ref - ref[0], atol=1e-8)
