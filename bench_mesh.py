"""Weak-scaling benchmark of the sharded fused MG pair solve on a
virtual CPU mesh (VERDICT r3 item 8).

Real multi-chip hardware is unavailable in this environment, so this
measures the COLLECTIVE STRUCTURE, not ICI speed: for each device count
n in {1, 2, 4, 8} a fresh subprocess creates n virtual CPU devices
(xla_force_host_platform_device_count), row-shards the stencil operator
and MG hierarchy over a ('nodes','batch') mesh (CS_FORCE_MESH), and
runs the production fused pair solve (stencil_solve_pairs_points:
mixed-precision refinement + geo-MG V-cycle + ppermute halo exchange).

On shared-memory virtual devices every 'collective' is a memcpy, and
all n shards timeshare the same physical cores — so the expected curve
is FLAT-ISH wall-clock with per-device work dropping ~1/n (true weak
scaling would need n physical chips).  What the artifact demonstrates:
(a) the sharded program compiles and runs at every n, (b) answers match
the single-device run, (c) per-shard memory drops with n (the capacity
argument for the 437M-cell regime, docs/capacity.md).

Writes MULTICHIP_SCALE.json.  Usage: python bench_mesh.py [sizes..]
"""

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
import numpy as np
n_dev = int(sys.argv[1])
side = int(sys.argv[2])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           f" --xla_force_host_platform_device_count={n_dev}")
os.environ["JAX_PLATFORMS"] = "cpu"
if n_dev > 1:
    os.environ["CS_FORCE_MESH"] = "1"
else:
    os.environ["CS_DISABLE_MESH"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from circuitscape_tpu.solve.prepare import prepare_stencil_solver
from circuitscape_tpu.solve.stencil import (stencil_planes_np,
                                            stencil_solve_pairs_points)

rng = np.random.default_rng(0)
g = rng.uniform(0.5, 3.0, (side, side))
planes = stencil_planes_np(g, False, False)
B = 8
src = np.column_stack([rng.integers(1, side - 1, B),
                       rng.integers(1, side - 1, B)])
dst = np.column_stack([rng.integers(1, side - 1, B),
                       rng.integers(1, side - 1, B)])
pts = src[:4]

t0 = time.perf_counter()
S, prec, apply_, _ = prepare_stencil_solver(planes)
setup_s = time.perf_counter() - t0
_, Vp, rel, it = stencil_solve_pairs_points(
    S, src, dst, pts, rtol=1e-6, prec=prec, prec_apply=apply_)
t0 = time.perf_counter()
_, Vp, rel, it = stencil_solve_pairs_points(
    S, src, dst, pts, rtol=1e-6, prec=prec, prec_apply=apply_)
warm_s = time.perf_counter() - t0
from circuitscape_tpu.parallel.mesh import mesh_of
sharded = mesh_of(S.diag) is not None
shard_rows = (S.diag.shape[0] // n_dev) if sharded else S.diag.shape[0]
print(json.dumps({
    "n_devices": n_dev, "cells": side * side, "sharded": sharded,
    "setup_s": round(setup_s, 3), "warm_solve_s": round(warm_s, 3),
    "iters": int(it), "max_rel": float(np.max(rel)),
    "vp_checksum": float(np.sum(np.abs(Vp))),
    "per_shard_rows": int(shard_rows),
    "per_shard_operator_mb": round(
        5 * shard_rows * S.diag.shape[1] * 8 / 2**20, 1),
}))
"""


def main():
    sizes = [int(s) for s in (sys.argv[1:] or ["1024", "2048"])]
    here = os.path.dirname(os.path.abspath(__file__))
    child = os.path.join(here, "_bench_mesh_child.py")
    with open(child, "w") as f:
        f.write(CHILD)
    records = []
    try:
        for side in sizes:
            base_checksum = None
            for n in (1, 2, 4, 8):
                print(f"mesh bench: side={side} n_devices={n}",
                      file=sys.stderr, flush=True)
                out = subprocess.run(
                    [sys.executable, child, str(n), str(side)],
                    capture_output=True, text=True, timeout=3600, cwd=here)
                if out.returncode != 0:
                    records.append({"n_devices": n, "cells": side * side,
                                    "error": out.stderr[-400:]})
                    continue
                rec = json.loads(out.stdout.strip().splitlines()[-1])
                if base_checksum is None:
                    base_checksum = rec["vp_checksum"]
                rec["matches_single_device"] = bool(
                    abs(rec["vp_checksum"] - base_checksum) <=
                    1e-5 * max(1.0, abs(base_checksum)))
                records.append(rec)
                print(json.dumps(rec), file=sys.stderr, flush=True)
    finally:
        os.unlink(child)
        with open(os.path.join(here, "MULTICHIP_SCALE.json"), "w") as f:
            json.dump(records, f, indent=1)
    for r in records:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
