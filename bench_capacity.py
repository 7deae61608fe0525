"""Virtual-mesh capacity demonstration (VERDICT r3 item 9).

Runs a >= 100M-cell raster pairwise SHORTCUT job through the public
compute() surface on an 8-virtual-device CPU mesh (CS_FORCE_MESH=1,
xla_force_host_platform_device_count=8): the fixed operator + MG
hierarchy bytes shard over the 'nodes' axis exactly as they would over
an 8-chip v5e slice, so this validates the >1-chip capacity model of
docs/capacity.md (437M-cell regime) for CORRECTNESS AND CAPACITY —
speed is meaningless on shared-memory virtual devices.

Writes BENCH_CAPACITY.json: finite resistances, per-shard resident
bytes from the capacity model, wall times for the record.

Usage: python bench_capacity.py [side]   (default 10240 ~ 104.9M cells)
"""

import json
import os
import resource
import sys
import tempfile
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["CS_FORCE_MESH"] = "1"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    import jax
    jax.config.update("jax_platforms", "cpu")
    import circuitscape_tpu as cs
    from circuitscape_tpu.parallel.mesh import active_mesh

    mesh = active_mesh(side * side)
    assert mesh is not None and mesh.size == 8, mesh

    rng = np.random.default_rng(7)
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
        t0 = time.perf_counter()
        r = np.asarray(cs.compute(cfg))
        wall = time.perf_counter() - t0

    res = r[1:, 1:]
    finite = bool(np.all(np.isfinite(res))) and bool(np.all(res >= -1))
    solved = int(np.sum(res[np.triu_indices_from(res, 1)] > 0))
    # capacity model (docs/capacity.md): fixed bytes shard over 'nodes'
    qh = -(-side // 128) * 128
    cells_pad = qh * qh
    nodes_shards = mesh.shape["nodes"]
    fixed_per_shard_gb = cells_pad * 72 / nodes_shards / 2**30
    peak_rss_gb = (resource.getrusage(resource.RUSAGE_SELF).ru_maxrss /
                   2**20)
    rec = {
        "scenario": "capacity-demo-virtual-mesh",
        "cells": side * side,
        "grid": f"{side}x{side}",
        "points": 4,
        "mesh": {"nodes": int(mesh.shape["nodes"]),
                 "batch": int(mesh.shape["batch"])},
        "wall_s": round(wall, 1),
        "all_finite": finite,
        "pairs_solved": solved,
        "fixed_bytes_per_shard_gb": round(fixed_per_shard_gb, 2),
        "host_peak_rss_gb": round(peak_rss_gb, 1),
        "note": ("8-virtual-CPU-device mesh; validates the sharded "
                 "program + per-shard capacity at the >=100M-cell "
                 "scale (docs/capacity.md 'Beyond one chip').  Wall "
                 "time is NOT indicative: all shards timeshare 2 "
                 "physical cores."),
    }
    recs = []
    if os.path.exists("BENCH_CAPACITY.json"):
        with open("BENCH_CAPACITY.json") as f:
            recs = json.load(f)
    recs.append(rec)
    with open("BENCH_CAPACITY.json", "w") as f:
        json.dump(recs, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
