"""Extended benchmark suite: answers the full BASELINE.md table.

Every scenario runs end-to-end through the public compute() surface on
synthetic problems mirroring the reference's BigTests configuration
(uniform-random conductance, 10% NODATA, scattered focal points).

Per record: cold_s (first full run INCLUDING XLA compile — the real
first-job UX) and warm_s (second run, compiles cached), plus
vs_baseline ratios against the reference's published 20-core Xeon
timings (docs/src/benchmark/plot.jl:7-9) where a row exists.

Precision note: runs use precision=single for the map/IO layer, and the
solver always refines to a TRUE float64 relative residual <= 1e-6
(mixed-precision iterative refinement, solve/stencil.py) — the answers
meet the reference's double-precision tolerance even though the CG
iterations execute in f32 on the MXU/VPU.

Sizes/scenarios filter via env: CS_SUITE_SIZES="1000,2450,3465",
CS_SUITE_SCENARIOS="shortcut,maps,onetoall,advanced,network,provisioned,spmv".
Writes BENCH_SUITE.json.
"""

import functools
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# BASELINE.md rows: cells -> (julia CG+AMG seconds, julia CHOLMOD seconds)
BASELINES = {
    1_000_000: (106.40, 89.60),
    6_002_500: (1217.90, 543.06),
    12_006_225: (2337.55, 1124.28),
}
# grid sides: 1M / ~6M / ~12M cells
ALL_SIZES = [1000, 2450, 3465]


def _note(m):
    print(m, file=sys.stderr, flush=True)


def make_raster(d, rng, side, npts):
    g = rng.uniform(0.5, 3.0, (side, side))
    g[rng.random((side, side)) < 0.10] = -9999.0
    np.save(os.path.join(d, "cell.npy"), g)
    pts = np.zeros((side, side))
    placed = 0
    while placed < npts:
        r, c = rng.integers(0, side, 2)
        if g[r, c] > 0 and pts[r, c] == 0:
            placed += 1
            pts[r, c] = placed
    np.save(os.path.join(d, "pts.npy"), pts)
    return g, pts


STAGE_SECTIONS = {
    "setup_s": ("build stencil planes",
                "prepare stencil solver (upload + MG setup)",
                "invert nodemap", "construct local nodemap",
                "construct preconditioner/factorization"),
    "solve_s": ("batched pair solve", "solve and accumulate pairs"),
    "output_s": ("write maps", "fetch maps", "node currents + reduce",
                 "postprocess"),
}


def _job_stats():
    """North-star metrics + per-stage split of the job that just ran
    (VERDICT r2 items 2/6: compile/setup/solve/output visibility and
    BASELINE.json's sustained-nnz/s metric)."""
    from circuitscape_tpu import stats
    from circuitscape_tpu.timer import CSTIMER
    d = stats.finalize()
    rec = {}
    for k in ("cg_iters", "sustained_nnz_per_s",
              "fine_spmv_pct_of_hbm_roofline", "mg_kernels"):
        if k in d:
            rec[k] = d[k]
    total = CSTIMER.total("complete job")
    stages = {}
    for out_key, sections in STAGE_SECTIONS.items():
        s = sum(CSTIMER.total(name) for name in sections)
        if s:
            stages[out_key] = round(s, 3)
    if total:
        stages["total_s"] = round(total, 3)
        accounted = sum(v for k, v in stages.items() if k != "total_s")
        # remainder = IO load, graph build, python driver, and (cold
        # runs) XLA/server compile waits
        stages["other_s"] = round(total - accounted, 3)
    if stages:
        rec["stages"] = stages
    return rec


def run_cold_warm(name, cfg_dict):
    import circuitscape_tpu as cs
    times, stats_per_run = [], []
    for k in range(2):
        t0 = time.perf_counter()
        cs.compute(dict(cfg_dict))
        times.append(time.perf_counter() - t0)
        stats_per_run.append(_job_stats())
        _note(f"  {name} run{k}: {times[-1]:.2f}s")
    return times[0], times[1], stats_per_run


def guarded(records, fn):
    """Run one scenario; on failure record the error and keep going so
    one OOM/compile failure can't lose the rest of the table."""
    try:
        fn()
    except Exception as e:
        _note(f"  FAILED: {type(e).__name__}: {str(e)[:300]}")
        records.append({"scenario": "FAILED", "error":
                        f"{type(e).__name__}: {str(e)[:300]}"})
        _dump(records)


def bench_spmv_record():
    """Sustained SpMV nnz/s at the 1M-cell bench shape (in-jit loop so
    the tunnel dispatch latency doesn't pollute the number)."""
    import jax
    import jax.numpy as jnp
    from circuitscape_tpu.solve.stencil import (stencil_from_gmap,
                                                stencil_matvec)
    rng = np.random.default_rng(0)
    H = W = 1000
    B = 32
    g = rng.uniform(0.5, 3.0, (H, W))
    g[rng.random((H, W)) < 0.10] = 0.0
    S = stencil_from_gmap(g, False, False, jnp.float32)
    nnz = S.nnz
    x = jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32)
    K = 100

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(S, x, k):
        def body(i, x):
            y = stencil_matvec(S, x)
            s = jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)
            return y * s
        return jax.lax.fori_loop(0, k, body, x)

    loop(S, x, K).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        loop(S, x, K).block_until_ready()
        ts.append((time.perf_counter() - t0) / K)
    t = float(np.median(ts))
    return {"scenario": "spmv-kernel", "kernel": "xla-stencil",
            "cells": H * W, "batch": B, "nnz": nnz,
            "s_per_matvec": round(t, 6),
            "spmv_nnz_per_s": round(nnz * B / t, 0)}


def main():
    sizes = [int(s) for s in os.environ.get(
        "CS_SUITE_SIZES", "1000,2450,3465").split(",") if s]
    wanted = set(os.environ.get(
        "CS_SUITE_SCENARIOS",
        "shortcut,maps,cholmod,onetoall,advanced,network,provisioned,spmv").split(","))
    rng = np.random.default_rng(42)
    records = []
    if os.environ.get("CS_SUITE_APPEND") and os.path.exists(
            "BENCH_SUITE.json"):
        with open("BENCH_SUITE.json") as f:
            records = json.load(f)

    precision_note = ("single-precision inner iterations, refined to "
                      "true f64 relres <= 1e-6")

    if "shortcut" in wanted:
        def one_shortcut(side):
            with tempfile.TemporaryDirectory() as d:
                make_raster(d, rng, side, 32)
                cfg = {
                    "data_type": "raster", "scenario": "pairwise",
                    "habitat_file": f"{d}/cell.npy",
                    "habitat_map_is_resistances": "False",
                    "point_file": f"{d}/pts.npy",
                    "output_file": f"{d}/o.out",
                    "solver": "cg+amg", "precision": "single",
                    "suppress_messages": "True",
                }
                _note(f"pairwise-shortcut {side}x{side}")
                cold, warm, st = run_cold_warm("pairwise-shortcut", cfg)
                rec = {"scenario": "pairwise-shortcut",
                       "cells": side * side, "points": 32,
                       "cold_s": round(cold, 3), "warm_s": round(warm, 3),
                       "cold_run": st[0], "warm_run": st[1],
                       "note": precision_note}
                if side * side in BASELINES:
                    cg, chol = BASELINES[side * side]
                    rec["baseline_julia_cgamg_s"] = cg
                    rec["baseline_julia_cholmod_s"] = chol
                    rec["vs_cholmod_warm"] = round(chol / warm, 2)
                    rec["vs_cholmod_cold"] = round(chol / cold, 2)
                records.append(rec)
                _dump(records)

        for side in sizes:
            guarded(records, lambda side=side: one_shortcut(side))

    if "maps" in wanted:
        side = sizes[0]
        with tempfile.TemporaryDirectory() as d:
            g, pts = make_raster(d, rng, side, 32)
            pts16 = np.where(pts <= 16, pts, 0)
            np.save(f"{d}/pts16.npy", pts16)
            cfg = {
                "data_type": "raster", "scenario": "pairwise",
                "habitat_file": f"{d}/cell.npy",
                "habitat_map_is_resistances": "False",
                "point_file": f"{d}/pts16.npy",
                "output_file": f"{d}/o.out",
                "solver": "cg+amg", "precision": "single",
                "suppress_messages": "True",
                "write_cur_maps": "True", "write_max_cur_maps": "True",
                "write_volt_maps": "True",
            }
            _note(f"pairwise-maps {side}x{side}")
            cold, warm, st = run_cold_warm("pairwise-maps", cfg)
            cg, chol = BASELINES[1_000_000]
            records.append({"scenario": "pairwise-maps+volt+max",
                            "cells": side * side, "points": 16,
                            "cold_s": round(cold, 3),
                            "warm_s": round(warm, 3),
                            "cold_run": st[0], "warm_run": st[1],
                            # the reference's published 1M-cell numbers
                            # are the closest baseline (BigTests pairwise
                            # writes cumulative maps; per-pair map files
                            # are extra work on both sides)
                            "baseline_julia_cgamg_s": cg,
                            "vs_cgamg_warm": round(cg / warm, 2),
                            "note": precision_note})
            _dump(records)

    if "cholmod" in wanted:
        # direct tier end-to-end at 1M cells against the reference's
        # headline 89.6s CHOLMOD row (VERDICT r2 item 5) — the native
        # supernodal engine runs the factor + batched back-substitution
        def one_cholmod():
            side = 1000
            with tempfile.TemporaryDirectory() as d:
                make_raster(d, rng, side, 32)
                cfg = {
                    "data_type": "raster", "scenario": "pairwise",
                    "habitat_file": f"{d}/cell.npy",
                    "habitat_map_is_resistances": "False",
                    "point_file": f"{d}/pts.npy",
                    "output_file": f"{d}/o.out",
                    "solver": "cholmod", "precision": "double",
                    "suppress_messages": "True",
                }
                _note(f"pairwise-cholmod {side}x{side}")
                cold, warm, st = run_cold_warm("pairwise-cholmod", cfg)
                cg, chol = BASELINES[side * side]
                records.append({
                    "scenario": "pairwise-cholmod-direct",
                    "cells": side * side, "points": 32,
                    "cold_s": round(cold, 3), "warm_s": round(warm, 3),
                    "cold_run": st[0], "warm_run": st[1],
                    "baseline_julia_cholmod_s": chol,
                    "vs_cholmod_warm": round(chol / warm, 2),
                    "vs_cholmod_cold": round(chol / cold, 2),
                    "note": "native supernodal Cholesky "
                            "(native/cholesky.cpp), f64"})
                _dump(records)

        guarded(records, one_cholmod)

    if "onetoall" in wanted:
        side = sizes[0]
        with tempfile.TemporaryDirectory() as d:
            make_raster(d, rng, side, 32)
            cfg = {
                "data_type": "raster", "scenario": "one-to-all",
                "habitat_file": f"{d}/cell.npy",
                "habitat_map_is_resistances": "False",
                "point_file": f"{d}/pts.npy",
                "output_file": f"{d}/o.out",
                "solver": "cg+amg", "precision": "single",
                "suppress_messages": "True",
            }
            _note(f"one-to-all {side}x{side}")
            cold, warm, st = run_cold_warm("one-to-all", cfg)
            records.append({"scenario": "one-to-all", "cells": side * side,
                            "points": 32, "cold_s": round(cold, 3),
                            "warm_s": round(warm, 3),
                            "cold_run": st[0], "warm_run": st[1],
                            "note": precision_note})
            _dump(records)

    if "advanced" in wanted:
        side = sizes[0]
        with tempfile.TemporaryDirectory() as d:
            g, _ = make_raster(d, rng, side, 2)
            src = np.zeros((side, side))
            gnd = np.full((side, side), -9999.0)
            placed = 0
            while placed < 128:
                r, c = rng.integers(0, side, 2)
                if g[r, c] > 0 and src[r, c] == 0 and gnd[r, c] == -9999:
                    placed += 1
                    if placed <= 64:
                        src[r, c] = 1.0
                    else:
                        gnd[r, c] = 1.0 if placed % 2 else 0.0
            np.save(f"{d}/src.npy", src)
            np.save(f"{d}/gnd.npy", gnd)
            cfg = {
                "data_type": "raster", "scenario": "advanced",
                "habitat_file": f"{d}/cell.npy",
                "habitat_map_is_resistances": "False",
                "source_file": f"{d}/src.npy",
                "ground_file": f"{d}/gnd.npy",
                "ground_file_is_resistances": "False",
                "write_cur_maps": "True",
                "output_file": f"{d}/o.out",
                "solver": "cg+amg", "precision": "single",
                "suppress_messages": "True",
            }
            _note(f"advanced {side}x{side}")
            cold, warm, st = run_cold_warm("advanced", cfg)
            records.append({"scenario": "advanced+curmap",
                            "cells": side * side, "sources": 64,
                            "grounds": 64, "cold_s": round(cold, 3),
                            "warm_s": round(warm, 3),
                            "cold_run": st[0], "warm_run": st[1],
                            "note": precision_note})
            _dump(records)

    if "network" in wanted:
        with tempfile.TemporaryDirectory() as d:
            n = 100_000
            side = int(np.sqrt(n))
            i0 = np.arange(n)
            E = []
            for off in (1, side):
                m = i0 + off < n
                E.append(np.column_stack([i0[m], (i0 + off)[m]]))
            E = np.vstack(E)
            w = rng.uniform(0.5, 3.0, len(E))
            np.savetxt(f"{d}/net.txt",
                       np.column_stack([E[:, 0], E[:, 1], w]), fmt="%.6g")
            fp = rng.choice(n, 20, replace=False)
            np.savetxt(f"{d}/fp.txt", fp, fmt="%d")
            cfg = {
                "data_type": "network", "scenario": "pairwise",
                "habitat_file": f"{d}/net.txt",
                "habitat_map_is_resistances": "False",
                "point_file": f"{d}/fp.txt",
                "output_file": f"{d}/n.out",
                "solver": "cg+amg", "precision": "single",
                "suppress_messages": "True",
            }
            _note("network-pairwise (direct tier routing)")
            cold, warm, st = run_cold_warm("network-pairwise", cfg)
            records.append({"scenario": "network-pairwise", "nodes": n,
                            "edges": len(E), "points": 20, "pairs": 190,
                            "cold_s": round(cold, 3),
                            "warm_s": round(warm, 3),
                            "cold_run": st[0], "warm_run": st[1],
                            "note": "cg+amg jobs at direct-tier sizes "
                                    "route to the native supernodal "
                                    "Cholesky (CS_NETWORK_DIRECT_MAX)"})
            _dump(records)
            # honest comparison row: the same job forced onto the
            # iterative ELL SA-AMG tier
            os.environ["CS_NETWORK_DIRECT_MAX"] = "0"
            try:
                _note("network-pairwise (forced cg+amg tier)")
                cold2, warm2, st2 = run_cold_warm("network-amg", cfg)
                records.append({"scenario": "network-pairwise-amg-forced",
                                "nodes": n, "edges": len(E), "points": 20,
                                "pairs": 190, "cold_s": round(cold2, 3),
                                "warm_s": round(warm2, 3),
                                "cold_run": st2[0], "warm_run": st2[1],
                                "note": "CS_NETWORK_DIRECT_MAX=0 "
                                        "(routing disabled)"})
            finally:
                del os.environ["CS_NETWORK_DIRECT_MAX"]
            _dump(records)

    if "provisioned" in wanted:
        # VERDICT r4 item 6: measure the PROVISIONED-machine cold start
        # — caches warm (python -m circuitscape_tpu.warmup has run for
        # the shape bucket), then a FRESH process runs the job.  Also
        # records the bare backend-attach time of a fresh process,
        # which on the axon-tunneled TPU is a floor no cache removes.
        import subprocess

        repo = os.path.dirname(os.path.abspath(__file__))

        def _child(code):
            t0 = time.time()
            r = subprocess.run([sys.executable, "-c", code], cwd=repo,
                               capture_output=True, text=True)
            out = (r.stdout.strip().splitlines() or [""])[-1]
            return time.time() - t0, out, r.returncode

        attach_wall, attach_out, rc = _child(
            "import time; t0=time.time()\n"
            "import jax, jax.numpy as jnp\n"
            "jnp.ones((8,128)).sum().block_until_ready()\n"
            "print(round(time.time()-t0, 2))")
        attach_s = float(attach_out) if rc == 0 else None
        _note(f"backend attach: {attach_s}s")

        for side in sizes:
            with tempfile.TemporaryDirectory() as d:
                make_raster(d, rng, side, 32)
                job = repr({
                    "data_type": "raster", "scenario": "pairwise",
                    "habitat_file": f"{d}/cell.npy",
                    "habitat_map_is_resistances": "False",
                    "point_file": f"{d}/pts.npy",
                    "output_file": f"{d}/o.out",
                    "solver": "cg+amg", "precision": "single",
                    "suppress_messages": "True",
                })
                warm_wall, _, rc1 = _child(
                    "import sys; sys.path.insert(0, '.')\n"
                    "from circuitscape_tpu.warmup import warmup\n"
                    f"print(warmup({job}, points=32))")
                cold_wall, cold_out, rc2 = _child(
                    "import sys, time; sys.path.insert(0, '.')\n"
                    "import circuitscape_tpu as cs\n"
                    "t0 = time.time()\n"
                    f"cs.compute(dict({job}))\n"
                    "print(round(time.time()-t0, 2))")
                prov = float(cold_out) if rc2 == 0 else None
                _note(f"provisioned-cold {side}: warmup_wall "
                      f"{warm_wall:.0f}s, job {prov}s")
                rec = {"scenario": "provisioned-cold",
                       "cells": side * side, "points": 32,
                       "backend_attach_s": attach_s,
                       "warmup_wall_s": round(warm_wall, 1),
                       "provisioned_cold_s": prov,
                       "note": "fresh process after python -m "
                               "circuitscape_tpu.warmup; includes the "
                               "process's own backend attach"}
                if prov and side * side in BASELINES:
                    rec["baseline_julia_cholmod_s"] = \
                        BASELINES[side * side][1]
                    rec["vs_cholmod_provisioned_cold"] = round(
                        BASELINES[side * side][1] / prov, 2)
                records.append(rec)
                _dump(records)

    if "spmv" in wanted:
        _note("spmv-kernel")
        records.append(bench_spmv_record())
        _dump(records)

    for r in records:
        print(json.dumps(r))


def _dump(records):
    with open("BENCH_SUITE.json", "w") as f:
        json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
