"""Differential test: focal-regions pairwise device path vs the
reference-parity per-pair host loop.

The reference rebuilds the full graph and solves once per pair when the
point file contains focal regions (src/raster/pairwise.jl:72-135).  The
device path solves all pairs as one batched stencil CG with a
per-column PolyProjector (drivers/raster.py _regions_device_path);
answers and maps must agree with the host loop.
"""

import glob
import os

import numpy as np
import pytest


def _make_job(d, rng, side=60):
    g = rng.uniform(0.5, 3.0, (side, side))
    g[rng.random((side, side)) < 0.15] = -9999.0
    pts = np.zeros((side, side))
    locs = [(5, 5), (side - 10, 8), (15, side - 14)]
    for k, (r, c) in enumerate(locs, start=1):
        g[r:r + 3, c:c + 3] = np.abs(g[r:r + 3, c:c + 3]) + 0.5
        pts[r:r + 3, c:c + 3] = k
    np.save(os.path.join(d, "cell.npy"), g)
    np.save(os.path.join(d, "pts.npy"), pts)


def _run(d, tag, min_cells, monkeypatch):
    import circuitscape_tpu as cs

    monkeypatch.setenv("CS_PAIRWISE_DEVICE_MIN", str(min_cells))
    cfg = {
        "data_type": "raster", "scenario": "pairwise",
        "habitat_file": f"{d}/cell.npy",
        "habitat_map_is_resistances": "False",
        "point_file": f"{d}/pts.npy",
        "output_file": f"{d}/{tag}.out",
        "solver": "cg+amg", "suppress_messages": "True",
        "write_cur_maps": "True", "write_volt_maps": "True",
        "write_max_cur_maps": "True",
    }
    return cs.compute(cfg)


def test_regions_device_matches_host(tmp_path, monkeypatch):
    d = str(tmp_path)
    _make_job(d, np.random.default_rng(7))
    r_dev = _run(d, "dev", 100, monkeypatch)            # force device path
    r_host = _run(d, "host", 10**9, monkeypatch)        # force host loop
    assert np.max(np.abs(r_dev - r_host)) < 1e-6

    for pat in ("cum_curmap", "max_curmap", "curmap_1_2", "curmap_1_3",
                "curmap_2_3", "voltmap_1_2"):
        fa = sorted(glob.glob(f"{d}/dev_*{pat}*"))
        fb = sorted(glob.glob(f"{d}/host_*{pat}*"))
        assert fa and fb, pat
        a = np.loadtxt(fa[0], skiprows=6)
        b = np.loadtxt(fb[0], skiprows=6)
        # device maps are fetched as f32; compare at map tolerance
        assert np.max(np.abs(a - b)) < 5e-6, pat


def test_regions_device_disconnected_pair(tmp_path, monkeypatch):
    """A pair of regions in different components stays -1 on both
    paths."""
    import circuitscape_tpu as cs

    d = str(tmp_path)
    side = 50
    g = np.full((side, side), 2.0)
    g[:, side // 2] = -9999.0   # split the grid into two islands
    pts = np.zeros((side, side))
    pts[4:6, 4:6] = 1
    pts[40:42, 40:42] = 2
    pts[20:22, 4:6] = 3
    np.save(f"{d}/cell.npy", g)
    np.save(f"{d}/pts.npy", pts)

    results = {}
    for tag, min_cells in (("dev", 100), ("host", 10**9)):
        monkeypatch.setenv("CS_PAIRWISE_DEVICE_MIN", str(min_cells))
        cfg = {
            "data_type": "raster", "scenario": "pairwise",
            "habitat_file": f"{d}/cell.npy",
            "habitat_map_is_resistances": "False",
            "point_file": f"{d}/pts.npy",
            "output_file": f"{d}/{tag}.out",
            "solver": "cg+amg", "suppress_messages": "True",
        }
        results[tag] = cs.compute(cfg)
    r_dev, r_host = results["dev"], results["host"]
    assert r_dev[1, 2] == -1 and r_host[1, 2] == -1   # 1 vs 2: cut apart
    assert r_dev[1, 3] > 0                            # 1 vs 3: same side
    assert np.max(np.abs(r_dev - r_host)) < 1e-6
