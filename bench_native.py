"""Direct-tier benchmark: native C++ Cholesky vs scipy SuperLU.

Grid Laplacians (the Circuitscape case) at 100k/500k/1M nodes, shifted
by 10*eps like the production path (solve/dispatch.py); times the
factorization and a 32-RHS batched solve separately for each backend.

Measurement protocol (round-2 VERDICT item 5): the first solve after a
factorization pays one-time page faults on the RHS-transpose buffer and
the panel pages and is reported separately as `native_solve32_first_s`;
the steady-state number is the MEDIAN OF 5 subsequent solves (production
jobs back-substitute many batches per factorization, cholmod_batch_size
semantics).  Run this benchmark without a concurrent TPU process — the
round-2 warm>cold inversion was exactly that: both engines sharing the
2 host cores with a live tunnel process.

Writes BENCH_NATIVE.json and prints one JSON record per size.
"""

import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from circuitscape_tpu.solve.native_chol import NativeCholesky


def _note(m):
    print(m, file=sys.stderr, flush=True)


def grid_laplacian(side, seed=0):
    rng = np.random.default_rng(seed)
    n = side * side
    idx = np.arange(n).reshape(side, side)
    rows, cols, vals = [], [], []
    for a, b in ((idx[:, :-1].ravel(), idx[:, 1:].ravel()),
                 (idx[:-1, :].ravel(), idx[1:, :].ravel())):
        w = rng.uniform(0.5, 3.0, a.size)
        rows += [a, b]
        cols += [b, a]
        vals += [-w, -w]
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    A = A + sp.diags(-np.asarray(A.sum(axis=1)).ravel())
    eps = np.finfo(np.float64).eps
    return (A + sp.identity(n) * (10 * eps)).tocsc()


def bench_size(side, nrhs=32):
    n = side * side
    _note(f"building {side}x{side} laplacian ({n} nodes)")
    G = grid_laplacian(side)
    rng = np.random.default_rng(1)
    B = np.zeros((n, nrhs))
    for c in range(nrhs):
        i, j = rng.choice(n, 2, replace=False)
        B[i, c], B[j, c] = 1.0, -1.0

    rec = {"nodes": n, "nnz": int(G.nnz), "nrhs": nrhs}

    _note("  native factorize...")
    t0 = time.perf_counter()
    F = NativeCholesky(G)
    rec["native_factor_s"] = round(time.perf_counter() - t0, 3)
    rec["native_nnz_L"] = int(F.nnz_L)
    t0 = time.perf_counter()
    xn = F.solve(B)
    rec["native_solve32_first_s"] = round(time.perf_counter() - t0, 3)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        F.solve(B)
        ts.append(time.perf_counter() - t0)
    rec["native_solve32_s"] = round(float(np.median(ts)), 3)

    _note("  scipy splu...")
    t0 = time.perf_counter()
    lu = spla.splu(G)
    rec["scipy_factor_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    xs = lu.solve(B)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        xs = lu.solve(B)
        ts.append(time.perf_counter() - t0)
    rec["scipy_solve32_s"] = round(float(np.median(ts)), 3)

    # relative residuals (true accuracy, not cross-agreement: the
    # near-singular shift leaves the constant mode ill-determined)
    def relres(x):
        r = G @ x - B
        return float(np.linalg.norm(r) / np.linalg.norm(B))

    rec["native_relres"] = float(f"{relres(xn):.2e}")
    rec["scipy_relres"] = float(f"{relres(xs):.2e}")
    rec["native_total_s"] = round(
        rec["native_factor_s"] + rec["native_solve32_s"], 3)
    rec["scipy_total_s"] = round(
        rec["scipy_factor_s"] + rec["scipy_solve32_s"], 3)
    rec["speedup_vs_scipy"] = round(
        rec["scipy_total_s"] / rec["native_total_s"], 2)
    return rec


def main():
    sides = [int(s) for s in os.environ.get(
        "CS_NATIVE_SIZES", "316,707,1000").split(",")]
    records = []
    for side in sides:
        rec = bench_size(side)
        records.append(rec)
        print(json.dumps(rec), flush=True)
        with open("BENCH_NATIVE.json", "w") as f:
            json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
