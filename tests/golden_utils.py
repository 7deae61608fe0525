"""Golden-file comparison helpers mirroring the reference harness
(test/test_utils.jl): compute_with overrides, resistance checks with
sqrt(tol) elementwise, grid sum-of-squares checks, and the 0-based ->
1-based node-id shifts the goldens inherit from Python Circuitscape 4.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np

import circuitscape_tpu as cs

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def clean_output():
    outdir = os.path.join(DATA_DIR, "output")
    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir, exist_ok=True)


def compute_with(ini: str, solver: str = "", precision: str = "",
                 parallel: bool = False):
    """Parse a stock INI, round-trip through the dict form, override
    solver/precision (test/test_utils.jl:19-29)."""
    cfg = cs.parse_config(os.path.join(DATA_DIR, ini))
    d = cfg.to_dict()
    if solver:
        d["solver"] = solver
    if precision:
        d["precision"] = precision
    d["parallelize"] = "true" if parallel else "false"
    return cs.compute(d)


def readdlm(path):
    return np.loadtxt(path, ndmin=2)


def check_resistances(x, r, tol, label=""):
    """Elementwise |diff| <= sqrt(tol) (test/test_utils.jl:140-160)."""
    x = np.asarray(x, np.float64)
    r = np.asarray(r, np.float64)
    assert x.shape == r.shape, f"{label}: shape {x.shape} vs {r.shape}"
    bad = np.abs(x - r) > np.sqrt(tol)
    if bad.any():
        idx = np.argwhere(bad)[:10]
        msgs = [f"[{i},{j}] expected={x[i, j]} got={r[i, j]}"
                for i, j in idx]
        raise AssertionError(f"{label}: {bad.sum()} mismatches: " +
                             "; ".join(msgs))
    return True


def read_aagrid(path):
    return np.loadtxt(path, skiprows=6, ndmin=2)


def _shift_network_name(fname: str) -> str:
    """Golden network files use 0-based ids in their names
    (test/test_utils.jl:218-225)."""
    parts = fname.replace(".", "_").split("_")
    out = fname
    for p in parts:
        if p.isdigit():
            out = out.replace(f"_{p}", f"_{int(p) - 1}", 1)
    return out


def compare_all_output(stem: str, is_single=False):
    """Compare every generated output file against its golden
    (test/test_utils.jl:165-189): grids by sum of squares, network
    node/branch text by sorted-row sum of squares with +1 id shift."""
    tol = 1e-4 if is_single else 1e-6
    outdir = os.path.join(DATA_DIR, "output")
    verdir = os.path.join(DATA_DIR, "output_verify")
    gen = sorted(os.path.basename(p)
                 for p in glob.glob(os.path.join(outdir, f"{stem}_*")))

    for f in gen:
        if "_" not in f or "resistances" in f:
            continue
        if f.endswith("asc"):
            mine = read_aagrid(os.path.join(outdir, f))
            gold_path = os.path.join(verdir, f)
            assert os.path.exists(gold_path), f"no golden for generated {f}"
            gold = read_aagrid(gold_path)
            d2 = float(((mine - gold) ** 2).sum())
            assert d2 < tol, f"{f}: grid sum-sq diff {d2}"
        elif "Network" in f and f.endswith(".txt"):
            mine = readdlm(os.path.join(outdir, f))
            if f.startswith("mg"):
                gold = readdlm(os.path.join(verdir, f))
            else:
                gold = readdlm(os.path.join(verdir, _shift_network_name(f)))
            # goldens carry 0-based node ids in the data columns
            shift = 2 if "branch" in f else 1
            gold = gold.copy()
            gold[:, :shift] += 1
            a = mine[np.lexsort(mine.T[::-1])]
            b = gold[np.lexsort(gold.T[::-1])]
            assert a.shape == b.shape, f"{f}: {a.shape} vs {b.shape}"
            d2 = float(((a - b) ** 2).sum())
            assert d2 < tol, f"{f}: sum-sq diff {d2}"
