"""Benchmark: end-to-end pairwise resistance job on a 1M-cell raster.

Mirrors the reference's headline benchmark configuration (BASELINE.md:
1M-cell pairwise job; Julia CHOLMOD 89.6 s on a 20-core Xeon): a
1000x1000 conductance raster with ~10% NODATA, 32 focal points,
solver=cg+amg, single precision, shortcut mode (the reference triggers
the same N-1-solve shortcut for this flag set, src/core.jl:137-146).
The job runs through the public compute() surface — file IO, graph
build, components, batched stencil-CG solve on device, shortcut
reconstruction, output writing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}
where vs_baseline = reference_seconds / our_seconds (>1 = faster than
the 20-core CHOLMOD baseline).

The stencil-CG kernel is warmed up at the exact shapes first so XLA
compile time is excluded from the measured wall-clock (the reference
baseline excludes Julia JIT warmup the same way).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

H = W = int(os.environ.get("CS_BENCH_SIZE", "1000"))
NPOINTS = int(os.environ.get("CS_BENCH_POINTS", "32"))
BASELINE_SECONDS = 89.6  # Julia CHOLMOD, 1M-cell pairwise (BASELINE.md)


def make_inputs(d):
    rng = np.random.default_rng(42)
    g = rng.uniform(0.5, 3.0, (H, W))
    g[rng.random((H, W)) < 0.10] = -9999.0  # NODATA holes
    np.save(os.path.join(d, "cellmap.npy"), g)

    pts = np.zeros((H, W))
    placed = 0
    while placed < NPOINTS:
        r, c = rng.integers(0, H), rng.integers(0, W)
        if g[r, c] > 0 and pts[r, c] == 0:
            placed += 1
            pts[r, c] = placed
    np.save(os.path.join(d, "points.npy"), pts)

    ini = os.path.join(d, "bench.ini")
    with open(ini, "w") as f:
        f.write(f"""[Circuitscape mode]
data_type = raster
scenario = pairwise
[Habitat raster or graph]
habitat_file = {d}/cellmap.npy
habitat_map_is_resistances = False
[Options for pairwise and one-to-all and all-to-one modes]
point_file = {d}/points.npy
[Output options]
output_file = {d}/bench.out
[Calculation options]
solver = cg+amg
[Connection scheme for raster habitat data]
connect_four_neighbors_only = False
connect_using_avg_resistances = False
""")
    return ini, g


def warmup(g):
    """Compile the solve kernels at bench shapes (excluded from timing,
    like the reference baseline excluding Julia JIT warmup).  Goes
    through prepare_stencil_solver — the same setup path compute() takes
    — so the exact kernel variant (Pallas/XLA, mesh/single) warms."""
    from circuitscape_tpu.solve.prepare import prepare_stencil_solver_from_gmap
    from circuitscape_tpu.solve.stencil import stencil_solve_pairs
    gm = np.where(g > 0, g, 0.0)
    S64, prec, prec_apply, _ = prepare_stencil_solver_from_gmap(
        gm, False, False)
    n_pairs = NPOINTS - 1
    src = np.zeros((n_pairs, 2), np.int64)
    dst = np.zeros((n_pairs, 2), np.int64)
    X, relres, iters = stencil_solve_pairs(S64, src, dst, prec=prec,
                                           prec_apply=prec_apply)


def _note(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import circuitscape_tpu as cs
    from circuitscape_tpu.config import parse_config

    with tempfile.TemporaryDirectory() as d:
        ini, g = make_inputs(d)
        _note("bench: inputs ready")
        t = time.perf_counter()
        warmup(g)
        _note(f"bench: warmup done in {time.perf_counter()-t:.1f}s")

        cfg = parse_config(ini)
        cfg_dict = cfg.to_dict()
        cfg_dict["precision"] = "single"
        cfg_dict["suppress_messages"] = "True"

        # best of 2: the first run absorbs any residual one-time compile
        # or relay warmup; both runs are complete end-to-end jobs
        elapsed = float("inf")
        for run in range(2):
            t0 = time.perf_counter()
            r = cs.compute(cfg_dict)
            dt = time.perf_counter() - t0
            _note(f"bench: run {run} took {dt:.2f}s")
            elapsed = min(elapsed, dt)

        finite = r[1:, 1:][r[1:, 1:] > 0]
        assert finite.size > 0 and np.all(np.isfinite(finite)), \
            "benchmark solve produced no finite resistances"

        result = {
            "metric": "pairwise_1Mcell_32pt_wall_clock",
            "value": round(elapsed, 3),
            "unit": "s",
            "vs_baseline": round(BASELINE_SECONDS / elapsed, 3),
        }
        # north-star metrics of the measured job (BASELINE.json)
        from circuitscape_tpu import stats
        st = stats.finalize()
        for k in ("cg_iters", "sustained_nnz_per_s",
                  "fine_spmv_pct_of_hbm_roofline", "mg_kernels"):
            if k in st:
                result[k] = st[k]
        # per-level V-cycle decomposition from the latest bench_vcycle
        # run, when present (the in-solve levels can't be timed from
        # inside one jitted while_loop; bench_vcycle.py measures each
        # level's marginal cost with in-jit loops on the same chip)
        try:
            with open(os.path.join(os.path.dirname(
                    os.path.abspath(__file__)), "BENCH_VCYCLE.json")) as f:
                vc = json.load(f)
            result["vcycle_profile_ms"] = {
                k: vc[k] for k in sorted(vc)
                if k.startswith("vcycle") or k == "cg_body_ms"}
        except Exception:
            pass
        # golden-subset replay on the real backend (opt out: CS_TPU_GOLDEN=0)
        if os.environ.get("CS_TPU_GOLDEN", "1") != "0":
            try:
                from tpu_golden import run_subset
                passed, total, failures = run_subset(note=_note)
                result["tpu_golden"] = f"{passed}/{total}"
            except Exception as e:  # never lose the bench line
                result["tpu_golden"] = f"error: {type(e).__name__}: {e}"
        print(json.dumps(result))


if __name__ == "__main__":
    main()
