"""48M-cell single-chip scale demonstration (BENCH_SCALE.json).

Mirrors the round-3 ad-hoc run (6930x6930, ~10% NODATA, 4 focal
points, shortcut pairwise, precision=single) so rounds are comparable;
appends a new record per run.  Usage: python bench_scale.py [side]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 6930
    rng = np.random.default_rng(7)
    import circuitscape_tpu as cs
    from circuitscape_tpu import stats

    with tempfile.TemporaryDirectory() as d:
        g = rng.uniform(0.5, 3.0, (side, side))
        g[rng.random((side, side)) < 0.10] = -9999.0
        np.save(os.path.join(d, "cell.npy"), g)
        pts = np.zeros((side, side))
        placed = 0
        while placed < 4:
            r, c = rng.integers(0, side, 2)
            if g[r, c] > 0 and pts[r, c] == 0:
                placed += 1
                pts[r, c] = placed
        np.save(os.path.join(d, "pts.npy"), pts)
        del g, pts

        cfg = {
            "data_type": "raster", "scenario": "pairwise",
            "habitat_file": f"{d}/cell.npy",
            "habitat_map_is_resistances": "False",
            "point_file": f"{d}/pts.npy",
            "output_file": f"{d}/o.out",
            "solver": "cg+amg", "precision": "single",
            "suppress_messages": "True",
        }
        times, st = [], []
        for k in range(2):
            t0 = time.perf_counter()
            r = np.asarray(cs.compute(dict(cfg)))
            times.append(round(time.perf_counter() - t0, 1))
            sd = stats.finalize()
            st.append({k2: sd[k2] for k2 in
                       ("cg_iters", "sustained_nnz_per_s", "mg_kernels")
                       if k2 in sd})
            print(f"run{k}: {times[-1]}s", file=sys.stderr, flush=True)
        finite = bool(np.all(np.isfinite(r[1:, 1:])))

    rec = {
        "scenario": "pairwise-shortcut",
        "cells": side * side,
        "grid": f"{side}x{side} (padded {-(-side // 128) * 128}^2)",
        "points": 4,
        "cold_s": times[0], "warm_s": times[1],
        "all_finite": finite,
        "chip": "1x TPU v5e (16 GB HBM)",
        "stats": st[1],
        "note": ("round-5: the fine level now runs the column-tiled "
                 "Pallas matvec + fused Chebyshev kernels at W=7040 "
                 "(solve/pallas_stencil.py, W > 4094 tiling) with the "
                 "repeat-based prolongation; cold includes one-time "
                 "server-side compiles at this shape"),
    }
    recs = []
    if os.path.exists("BENCH_SCALE.json"):
        with open("BENCH_SCALE.json") as f:
            recs = json.load(f)
    recs.append(rec)
    with open("BENCH_SCALE.json", "w") as f:
        json.dump(recs, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
