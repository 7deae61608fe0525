"""Collective-structure analysis of the sharded solve (VERDICT r4
item 8): why the virtual-mesh wall-clock curve flattens from 4 to 8
devices, measured in collective COUNTS AND BYTES rather than wall time
(wall time on an 8-virtual-device CPU mesh measures 2 physical cores
timesharing, not the program).

For each device count the production fused pair solve program is
compiled on a fresh virtual CPU mesh and its optimized HLO is scanned
for collectives; per-iteration byte volumes are derived from the
operand shapes.  Writes MULTICHIP_ANALYSIS.json; the interpretation
lives in MULTICHIP_NOTES.md.

Usage: python bench_mesh_analysis.py [side]
"""

import json
import os
import re
import subprocess
import sys

CHILD = r"""
import json, os, sys
import numpy as np
n_dev = int(sys.argv[1]); side = int(sys.argv[2])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           f" --xla_force_host_platform_device_count={n_dev}")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["CS_FORCE_MESH"] = "1"
os.environ["CS_MESH_SHAPE"] = f"{n_dev},1"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, ".")
import jax.numpy as jnp
from circuitscape_tpu.solve.prepare import prepare_stencil_solver
from circuitscape_tpu.solve.stencil import (stencil_planes_np,
                                            _solve_pairs_fused,
                                            _pairs_rhs)
from circuitscape_tpu.parallel.mesh import active_mesh

rng = np.random.default_rng(0)
g = rng.uniform(0.5, 3.0, (side, side))
S64, prec, prec_apply, _ = prepare_stencil_solver(
    stencil_planes_np(g, False, False))
mesh = active_mesh(side * side)
H, W = S64.shape
sc = jnp.asarray(np.array([[0, 0], [1, 1], [2, 2], [3, 3]], np.int32))
dc = jnp.asarray(np.array([[H-1, W-1], [H-2, W-2], [H-3, W-3],
                           [H-4, W-4]], np.int32))
pc = jnp.asarray(np.array([[0, 0], [H-1, W-1]], np.int32))
lowered = _solve_pairs_fused.lower(S64, prec.levels[0].A, prec,
                                   prec_apply, sc, dc, pc, 1e-6, 2000,
                                   mesh=mesh)
txt = lowered.compile().as_text()
ops = {}
for m in __import__("re").finditer(
        r"(\bcollective-permute\b|\ball-reduce\b|\ball-gather\b|"
        r"\ball-to-all\b|\breduce-scatter\b)", txt):
    ops[m.group(1)] = ops.get(m.group(1), 0) + 1
print(json.dumps({"n": n_dev, "collectives": ops}))
"""


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    out = []
    for n in (2, 4, 8):
        r = subprocess.run([sys.executable, "-c", CHILD, str(n), str(side)],
                           capture_output=True, text=True,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if line:
            rec = json.loads(line[-1])
        else:
            rec = {"n": n, "error": r.stderr[-500:]}
        B, H, W = 4, side, side
        # analytic per-CG-iteration comm model for the ('nodes'=n) mesh:
        #   halo exchange: 2 boundary rows of x per shard boundary per
        #     stencil application (matvec + V-cycle smoother/residual
        #     applications across sharded levels)
        #   psum: CG dots / norms reduce (B,) partials across shards
        rec["halo_bytes_per_matvec"] = 2 * B * W * 4
        rec["psum_bytes_per_dot"] = B * 4 * n
        rec["per_shard_rows"] = side // n
        out.append(rec)
        print(json.dumps(rec), flush=True)
    with open("MULTICHIP_ANALYSIS.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
