"""Fresh-machine warmup: precompile a job's device programs.

On a machine that has never run circuitscape_tpu, the first job pays
the full XLA/TPU-server compile bill at first execution (minutes at
1M+ cells).  Both caches are durable — the TPU server caches compiles
per program fingerprint and the client persists serialized executables
under ~/.cache/circuitscape_tpu_jax — so the cost is once per
(machine, program) pair; shape bucketing (solve/prepare.py) makes one
program serve every grid within a 128-cell quantum.

This module lets an operator prepay that bill explicitly, e.g. during
node provisioning or before a measured run:

    python -m circuitscape_tpu.warmup job.ini

It reads ONLY the job's shape-determining facts (raster dimensions,
focal point count, scenario/solver/precision/neighbor flags), builds a
synthetic random job with identical compiled-program shapes, and runs
it through the public compute() surface into a temp directory — so the
exact production programs (stencil build, MG hierarchy setup, fused
pair solve at the padded batch size, map postprocess) compile and land
in both caches.  The real job then starts at warm-cache speed.

Jobs with polygons, masks, or include/exclude pairs compile a few
additional variants (e.g. the PolyProjector solve); warmup covers the
dominant programs but not those data-dependent extras.

The reference has no analogue (Julia caches native code per session;
its cold start is package precompilation).  Cited for scope parity:
src/run.jl:26-45 is the surface being warmed.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

from .config import CSConfig, init_config, parse_config


def _shape_of_raster(path: str):
    from .io.raster import read_raster
    grid, _wkt, _tf = read_raster(path)
    return grid.shape


def warmup(path_or_dict, points: int | None = None, quiet: bool = True):
    """Precompile the device programs for the job described by an INI
    path or config dict.  Returns the synthetic job's wall seconds
    (~the compile bill the real job now skips)."""
    if isinstance(path_or_dict, str):
        cfg = parse_config(path_or_dict)
    else:
        d = init_config()
        d.update(path_or_dict)
        cfg = CSConfig.from_dict(d)

    if cfg.data_type != "raster":
        # network jobs assemble per-component dense/ELL programs whose
        # shapes depend on the graph itself; run the real job once
        raise ValueError("warmup supports raster jobs (network program "
                         "shapes are data-dependent)")

    H, W = _shape_of_raster(cfg.habitat_file)
    npts = points
    if npts is None and cfg.point_file:
        try:
            from .io.raster import read_raster
            pgrid, _w, _t = read_raster(cfg.point_file)
            vals = pgrid[(pgrid > 0) & (pgrid != -9999)]
            npts = max(2, len(np.unique(vals)))
        except Exception:
            npts = 32
    npts = int(npts or 32)

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as d:
        g = rng.uniform(0.5, 3.0, (H, W))
        np.save(os.path.join(d, "warm_cell.npy"), g)
        pts = np.zeros((H, W))
        placed = 0
        while placed < npts:
            r, c = rng.integers(0, H), rng.integers(0, W)
            if pts[r, c] == 0:
                placed += 1
                pts[r, c] = placed
        np.save(os.path.join(d, "warm_pts.npy"), pts)

        job = {
            "data_type": "raster",
            "scenario": cfg.scenario,
            "habitat_file": f"{d}/warm_cell.npy",
            "habitat_map_is_resistances": "False",
            "point_file": f"{d}/warm_pts.npy",
            "output_file": f"{d}/warm.out",
            "solver": cfg.solver,
            "precision": cfg.precision,
            "connect_four_neighbors_only": str(cfg.connect_four_neighbors_only),
            "connect_using_avg_resistances": str(cfg.connect_using_avg_resistances),
            "write_cur_maps": str(bool(cfg.write_cur_maps)),
            "write_volt_maps": str(bool(cfg.write_volt_maps)),
            "write_max_cur_maps": str(bool(cfg.write_max_cur_maps)),
            "suppress_messages": "True" if quiet else "False",
        }
        if cfg.scenario == "advanced":
            # synthetic sources/grounds: a handful of scattered cells
            src = np.zeros((H, W))
            gnd = np.full((H, W), -9999.0)
            for k in range(8):
                src[rng.integers(0, H), rng.integers(0, W)] = 1.0
                gnd[rng.integers(0, H), rng.integers(0, W)] = 0.0
            np.save(os.path.join(d, "warm_src.npy"), src)
            np.save(os.path.join(d, "warm_gnd.npy"), gnd)
            job["source_file"] = f"{d}/warm_src.npy"
            job["ground_file"] = f"{d}/warm_gnd.npy"
            job.pop("point_file")

        from .run import compute
        compute(job)
    return time.perf_counter() - t0


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m circuitscape_tpu.warmup <job.ini> "
              "[npoints]", file=sys.stderr)
        return 2
    npts = int(argv[1]) if len(argv) > 1 else None
    secs = warmup(argv[0], points=npts, quiet=True)
    print(f"warmup complete in {secs:.1f}s — device programs for this "
          f"job's shape bucket are now cached")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
