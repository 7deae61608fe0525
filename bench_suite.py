"""Extended benchmark suite: one job per scenario family, each run
end-to-end through compute() on synthetic problems, with per-stage
wall-clock.  Writes BENCH_SUITE.json (a list of records) and prints a
table.  `python bench.py` remains the driver's single-line headline
benchmark; this script is for broader evidence.

Scenarios:
  pairwise-shortcut   1M cells, 32 points, no maps (N-1 solve shortcut)
  pairwise-maps       1M cells, 16 points, cur+max+volt maps
  one-to-all          1M cells, 32 points
  advanced            1M cells, 64 sources, 64 grounds (mixed finite/direct)
  network-pairwise    100k-node edge list, 20 focal nodes
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SIZE = int(os.environ.get("CS_SUITE_SIZE", "1000"))


def _note(m):
    print(m, file=sys.stderr, flush=True)


def make_raster(d, rng, npts):
    H = W = SIZE
    g = rng.uniform(0.5, 3.0, (H, W))
    g[rng.random((H, W)) < 0.10] = -9999.0
    np.save(os.path.join(d, "cell.npy"), g)
    pts = np.zeros((H, W))
    placed = 0
    while placed < npts:
        r, c = rng.integers(0, H, 2)
        if g[r, c] > 0 and pts[r, c] == 0:
            placed += 1
            pts[r, c] = placed
    np.save(os.path.join(d, "pts.npy"), pts)
    return g, pts


def run(name, cfg_dict):
    import circuitscape_tpu as cs
    best = float("inf")
    for k in range(2):
        t0 = time.perf_counter()
        cs.compute(dict(cfg_dict))
        best = min(best, time.perf_counter() - t0)
        _note(f"  {name} run{k}: {time.perf_counter() - t0:.2f}s")
    return best


def main():
    rng = np.random.default_rng(42)
    records = []
    with tempfile.TemporaryDirectory() as d:
        g, pts = make_raster(d, rng, 32)
        base = {
            "data_type": "raster", "scenario": "pairwise",
            "habitat_file": f"{d}/cell.npy",
            "habitat_map_is_resistances": "False",
            "point_file": f"{d}/pts.npy",
            "output_file": f"{d}/o.out",
            "solver": "cg+amg", "precision": "single",
            "suppress_messages": "True",
        }

        _note("pairwise-shortcut")
        t = run("pairwise-shortcut", base)
        records.append({"scenario": "pairwise-shortcut",
                        "cells": SIZE * SIZE, "points": 32, "seconds": t})

        _note("pairwise-maps")
        cfgm = dict(base)
        cfgm.update({"write_cur_maps": "True", "write_max_cur_maps": "True",
                     "write_volt_maps": "True"})
        # fewer points: full n(n-1)/2 pair maps get written
        pts16 = np.where(pts <= 16, pts, 0)
        np.save(f"{d}/pts16.npy", pts16)
        cfgm["point_file"] = f"{d}/pts16.npy"
        t = run("pairwise-maps", cfgm)
        records.append({"scenario": "pairwise-maps+volt+max",
                        "cells": SIZE * SIZE, "points": 16, "seconds": t})

        _note("one-to-all")
        cfg1 = dict(base)
        cfg1["scenario"] = "one-to-all"
        t = run("one-to-all", cfg1)
        records.append({"scenario": "one-to-all", "cells": SIZE * SIZE,
                        "points": 32, "seconds": t})

        _note("advanced")
        src = np.zeros((SIZE, SIZE))
        gnd = np.full((SIZE, SIZE), -9999.0)
        placed = 0
        while placed < 128:
            r, c = rng.integers(0, SIZE, 2)
            if g[r, c] > 0 and src[r, c] == 0 and gnd[r, c] == -9999:
                placed += 1
                if placed <= 64:
                    src[r, c] = 1.0
                else:
                    gnd[r, c] = 1.0 if placed % 2 else 0.0
        np.save(f"{d}/src.npy", src)
        np.save(f"{d}/gnd.npy", gnd)
        cfga = dict(base)
        cfga.update({"scenario": "advanced", "source_file": f"{d}/src.npy",
                     "ground_file": f"{d}/gnd.npy",
                     "ground_file_is_resistances": "False",
                     "write_cur_maps": "True"})
        del cfga["point_file"]
        t = run("advanced", cfga)
        records.append({"scenario": "advanced+curmap", "cells": SIZE * SIZE,
                        "sources": 64, "grounds": 64, "seconds": t})

        _note("network-pairwise")
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
        cfgn = {
            "data_type": "network", "scenario": "pairwise",
            "habitat_file": f"{d}/net.txt",
            "habitat_map_is_resistances": "False",
            "point_file": f"{d}/fp.txt",
            "output_file": f"{d}/n.out",
            "solver": "cg+amg", "precision": "single",
            "suppress_messages": "True",
        }
        t = run("network-pairwise", cfgn)
        records.append({"scenario": "network-pairwise", "nodes": n,
                        "points": 20, "seconds": t})

    with open("BENCH_SUITE.json", "w") as f:
        json.dump(records, f, indent=1)
    for r in records:
        print(r)


if __name__ == "__main__":
    main()
