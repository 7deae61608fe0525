"""Device fast path for one-to-all / all-to-one: must agree with the
general (reference-parity) path on a medium synthetic problem."""

import os
import textwrap

import numpy as np
import pytest

import circuitscape_tpu as cs


def _job(tmp_path, scenario, write_maps=False):
    H = W = 80
    rng = np.random.default_rng(7)
    g = rng.uniform(0.5, 3.0, (H, W))
    g[rng.random((H, W)) < 0.05] = -9999
    hdr = (f"ncols {W}\nnrows {H}\nxllcorner 0\nyllcorner 0\n"
           f"cellsize 1\nNODATA_value -9999\n")
    (tmp_path / "cell.asc").write_text(
        hdr + "\n".join(" ".join(repr(float(v)) for v in row) for row in g))
    pts = np.zeros((H, W), int)
    placed = 0
    while placed < 6:
        r, c = rng.integers(0, H, 2)
        if g[r, c] > 0 and pts[r, c] == 0:
            placed += 1
            pts[r, c] = placed
    (tmp_path / "pts.asc").write_text(
        hdr + "\n".join(" ".join(str(v) for v in row) for row in pts))
    return {
        "data_type": "raster", "scenario": scenario,
        "habitat_file": str(tmp_path / "cell.asc"),
        "point_file": str(tmp_path / "pts.asc"),
        "output_file": str(tmp_path / "job.out"),
        "solver": "cg+amg",
        "write_cur_maps": "True" if write_maps else "False",
    }


@pytest.mark.parametrize("scenario", ["one-to-all", "all-to-one"])
def test_device_path_matches_general(tmp_path, monkeypatch, scenario):
    d = _job(tmp_path, scenario, write_maps=True)

    monkeypatch.setenv("CS_ONETOALL_DEVICE_MIN", "100000000")  # force off
    r_general = cs.compute(dict(d))
    cum_general = np.loadtxt(tmp_path / "job_cum_curmap.asc", skiprows=6)

    monkeypatch.setenv("CS_ONETOALL_DEVICE_MIN", "1")          # force on
    d["output_file"] = str(tmp_path / "job2.out")
    r_fast = cs.compute(dict(d))
    cum_fast = np.loadtxt(tmp_path / "job2_cum_curmap.asc", skiprows=6)

    assert np.allclose(np.asarray(r_general), np.asarray(r_fast),
                       atol=1e-5), (r_general, r_fast)
    assert ((cum_general - cum_fast) ** 2).sum() < 1e-6


@pytest.mark.parametrize("scenario", ["one-to-all", "all-to-one"])
def test_device_path_variable_strengths(tmp_path, monkeypatch, scenario):
    """VERDICT r1 item 7: the positional strengths indexing on the device
    path (drivers/onetoall.py strengths[:npts, 1]) vs the general path's
    per-point lookup — must agree, including the v/strength ratio in
    one-to-all mode (src/raster/onetoall.jl:104-125)."""
    d = _job(tmp_path, scenario, write_maps=True)
    # non-uniform strengths, one per focal point id (1..6)
    strengths = [(i, 0.5 + 0.75 * i) for i in range(1, 7)]
    (tmp_path / "strengths.txt").write_text(
        "\n".join(f"{i}\t{s}" for i, s in strengths) + "\n")
    d["use_variable_source_strengths"] = "True"
    d["variable_source_file"] = str(tmp_path / "strengths.txt")

    monkeypatch.setenv("CS_ONETOALL_DEVICE_MIN", "100000000")  # force off
    r_general = cs.compute(dict(d))
    cum_general = np.loadtxt(tmp_path / "job_cum_curmap.asc", skiprows=6)

    monkeypatch.setenv("CS_ONETOALL_DEVICE_MIN", "1")          # force on
    d["output_file"] = str(tmp_path / "job2.out")
    r_fast = cs.compute(dict(d))
    cum_fast = np.loadtxt(tmp_path / "job2_cum_curmap.asc", skiprows=6)

    assert np.allclose(np.asarray(r_general), np.asarray(r_fast),
                       atol=1e-5), (r_general, r_fast)
    assert ((cum_general - cum_fast) ** 2).sum() < 1e-6


@pytest.mark.parametrize("mode,pairs", [
    ("exclude", [(1, 4), (2, 5)]),
    ("include", [(1, 2), (1, 3), (2, 3), (4, 5), (5, 6), (4, 6), (1, 6)]),
])
def test_pairwise_maps_device_included_pairs(tmp_path, monkeypatch,
                                             mode, pairs):
    """VERDICT r1 item 7: include/exclude pairs flowing through
    _stencil_maps_solve (drivers/core.py) must match the general path —
    resistances keep -1 for excluded pairs and the cumulative map only
    accumulates solved pairs."""
    d = _job(tmp_path, "pairwise", write_maps=True)
    (tmp_path / "pairs.txt").write_text(
        f"mode\t{mode}\n" + "\n".join(f"{a}\t{b}" for a, b in pairs) + "\n")
    d["use_included_pairs"] = "True"
    d["included_pairs_file"] = str(tmp_path / "pairs.txt")

    monkeypatch.setenv("CS_PAIRWISE_DEVICE_MIN", "100000000")  # force off
    r_general = cs.compute(dict(d))
    cum_general = np.loadtxt(tmp_path / "job_cum_curmap.asc", skiprows=6)

    monkeypatch.setenv("CS_PAIRWISE_DEVICE_MIN", "1")          # force on
    d["output_file"] = str(tmp_path / "job2.out")
    r_fast = cs.compute(dict(d))
    cum_fast = np.loadtxt(tmp_path / "job2_cum_curmap.asc", skiprows=6)

    assert np.allclose(np.asarray(r_general), np.asarray(r_fast),
                       atol=1e-5), (r_general, r_fast)
    assert ((cum_general - cum_fast) ** 2).sum() < 1e-6


def test_pairwise_maps_device_matches_general(tmp_path, monkeypatch):
    """Maps-on pairwise device path must match the general path:
    resistances, cum/max maps, and per-pair current + voltage maps."""
    d = _job(tmp_path, "pairwise", write_maps=True)
    d["write_volt_maps"] = "True"
    d["write_max_cur_maps"] = "True"

    monkeypatch.setenv("CS_PAIRWISE_DEVICE_MIN", "100000000")  # force off
    r_general = cs.compute(dict(d))
    import glob
    files = sorted(os.path.basename(p)
                   for p in glob.glob(str(tmp_path / "job_*.asc")))
    ref = {f: np.loadtxt(tmp_path / f, skiprows=6) for f in files}

    monkeypatch.setenv("CS_PAIRWISE_DEVICE_MIN", "1")          # force on
    d["output_file"] = str(tmp_path / "jobd.out")
    r_fast = cs.compute(dict(d))
    assert np.allclose(np.asarray(r_general), np.asarray(r_fast), atol=1e-5)

    for f, a in ref.items():
        f2 = f.replace("job_", "jobd_")
        assert os.path.isfile(tmp_path / f2), f"missing {f2}"
        b = np.loadtxt(tmp_path / f2, skiprows=6)
        assert ((a - b) ** 2).sum() < 1e-6, f"{f}: {((a-b)**2).sum()}"


def test_advanced_device_matches_general(tmp_path, monkeypatch):
    """Advanced-mode device path: voltages + current map parity with
    the general path, including finite + direct grounds."""
    H = W = 80
    rng = np.random.default_rng(11)
    g = rng.uniform(0.5, 3.0, (H, W))
    g[rng.random((H, W)) < 0.05] = -9999
    hdr = (f"ncols {W}\nnrows {H}\nxllcorner 0\nyllcorner 0\n"
           f"cellsize 1\nNODATA_value -9999\n")
    (tmp_path / "cell.asc").write_text(
        hdr + "\n".join(" ".join(repr(float(v)) for v in row) for row in g))
    src = np.zeros((H, W))
    gnd = np.full((H, W), -9999.0)
    placed = 0
    while placed < 6:
        r, c = rng.integers(0, H, 2)
        if g[r, c] > 0 and src[r, c] == 0 and gnd[r, c] == -9999:
            placed += 1
            if placed <= 3:
                src[r, c] = placed
            elif placed <= 5:
                gnd[r, c] = 2.0        # finite ground (resistance)
            else:
                gnd[r, c] = 0.0001     # nearly direct ground
    (tmp_path / "src.asc").write_text(
        hdr + "\n".join(" ".join(repr(float(v)) for v in row) for row in src))
    (tmp_path / "gnd.asc").write_text(
        hdr + "\n".join(" ".join(repr(float(v)) for v in row) for row in gnd))
    d = {
        "data_type": "raster", "scenario": "advanced",
        "habitat_file": str(tmp_path / "cell.asc"),
        "source_file": str(tmp_path / "src.asc"),
        "ground_file": str(tmp_path / "gnd.asc"),
        "ground_file_is_resistances": "True",
        "output_file": str(tmp_path / "adv.out"),
        "solver": "cg+amg",
        "write_cur_maps": "True",
        "write_volt_maps": "True",
    }
    monkeypatch.setenv("CS_ADVANCED_DEVICE_MIN", "100000000")
    v1 = cs.compute(dict(d))
    cur1 = np.loadtxt(tmp_path / "adv_curmap.asc", skiprows=6)
    volt1 = np.loadtxt(tmp_path / "adv_voltmap.asc", skiprows=6)

    monkeypatch.setenv("CS_ADVANCED_DEVICE_MIN", "1")
    d["output_file"] = str(tmp_path / "advd.out")
    v2 = cs.compute(dict(d))
    cur2 = np.loadtxt(tmp_path / "advd_curmap.asc", skiprows=6)
    volt2 = np.loadtxt(tmp_path / "advd_voltmap.asc", skiprows=6)

    assert np.abs(np.asarray(v1) - np.asarray(v2)).max() < 1e-4
    assert ((cur1 - cur2) ** 2).sum() < 1e-6
    assert ((volt1 - volt2) ** 2).sum() < 1e-6


def _poly_file(tmp_path, seed=13):
    H = W = 80
    rng = np.random.default_rng(seed)
    g = np.loadtxt(tmp_path / "cell.asc", skiprows=6)
    poly = np.zeros((H, W), int)
    poly[10:16, 30:38] = 1
    poly[55:65, 8:11] = 2
    poly[63:65, 8:25] = 2
    poly[g <= 0] = 0
    hdr = (f"ncols {W}\nnrows {H}\nxllcorner 0\nyllcorner 0\n"
           f"cellsize 1\nNODATA_value -9999\n")
    (tmp_path / "poly.asc").write_text(
        hdr + "\n".join(" ".join(str(v) for v in row) for row in poly))
    return str(tmp_path / "poly.asc")


@pytest.mark.parametrize("scenario", ["pairwise", "one-to-all", "all-to-one"])
def test_device_path_polygons(tmp_path, monkeypatch, scenario):
    """Short-circuit regions through the device paths (PolyProjector,
    solve/stencil.py): resistances and cumulative maps must match the
    general merged-node path."""
    d = _job(tmp_path, scenario, write_maps=True)
    d["polygon_file"] = _poly_file(tmp_path)

    for var in ("CS_ONETOALL_DEVICE_MIN", "CS_PAIRWISE_DEVICE_MIN"):
        monkeypatch.setenv(var, "100000000")               # force off
    r_general = cs.compute(dict(d))
    cum_general = np.loadtxt(tmp_path / "job_cum_curmap.asc", skiprows=6)

    for var in ("CS_ONETOALL_DEVICE_MIN", "CS_PAIRWISE_DEVICE_MIN"):
        monkeypatch.setenv(var, "1")                       # force on
    d["output_file"] = str(tmp_path / "job2.out")
    r_fast = cs.compute(dict(d))
    cum_fast = np.loadtxt(tmp_path / "job2_cum_curmap.asc", skiprows=6)

    assert np.allclose(np.asarray(r_general), np.asarray(r_fast),
                       atol=1e-5), (r_general, r_fast)
    assert ((cum_general - cum_fast) ** 2).sum() < 1e-6


def test_advanced_device_polygons(tmp_path, monkeypatch):
    """Advanced mode with polygons: merged-node sources/grounds via the
    projector must match the general path (voltages + current map)."""
    H = W = 80
    rng = np.random.default_rng(21)
    g = rng.uniform(0.5, 3.0, (H, W))
    g[rng.random((H, W)) < 0.05] = -9999
    hdr = (f"ncols {W}\nnrows {H}\nxllcorner 0\nyllcorner 0\n"
           f"cellsize 1\nNODATA_value -9999\n")
    (tmp_path / "cell.asc").write_text(
        hdr + "\n".join(" ".join(repr(float(v)) for v in row) for row in g))
    poly = np.zeros((H, W), int)
    poly[20:26, 20:28] = 1
    poly[50:60, 60:63] = 2
    poly[g <= 0] = 0
    (tmp_path / "poly.asc").write_text(
        hdr + "\n".join(" ".join(str(v) for v in row) for row in poly))
    src = np.zeros((H, W))
    gnd = np.full((H, W), -9999.0)
    src[22, 23] = 2.5          # source inside polygon 1
    src[5, 5] = 1.0 if g[5, 5] > 0 else 0.0
    gnd[55, 61] = 1.5          # finite ground inside polygon 2
    gnd[70, 40] = 0.0          # direct ground (resistance 0)
    (tmp_path / "src.asc").write_text(
        hdr + "\n".join(" ".join(repr(float(v)) for v in row) for row in src))
    (tmp_path / "gnd.asc").write_text(
        hdr + "\n".join(" ".join(repr(float(v)) for v in row) for row in gnd))
    d = {
        "data_type": "raster", "scenario": "advanced",
        "habitat_file": str(tmp_path / "cell.asc"),
        "polygon_file": str(tmp_path / "poly.asc"),
        "source_file": str(tmp_path / "src.asc"),
        "ground_file": str(tmp_path / "gnd.asc"),
        "ground_file_is_resistances": "True",
        "output_file": str(tmp_path / "adv.out"),
        "solver": "cg+amg",
        "write_cur_maps": "True",
        "write_volt_maps": "True",
    }
    monkeypatch.setenv("CS_ADVANCED_DEVICE_MIN", "100000000")
    v1 = cs.compute(dict(d))
    cur1 = np.loadtxt(tmp_path / "adv_curmap.asc", skiprows=6)

    monkeypatch.setenv("CS_ADVANCED_DEVICE_MIN", "1")
    d["output_file"] = str(tmp_path / "advd.out")
    v2 = cs.compute(dict(d))
    cur2 = np.loadtxt(tmp_path / "advd_curmap.asc", skiprows=6)

    assert np.abs(np.asarray(v1) - np.asarray(v2)).max() < 1e-4
    assert ((cur1 - cur2) ** 2).sum() < 1e-6


@pytest.mark.parametrize("scenario", ["one-to-all", "all-to-one"])
def test_device_path_multichunk(tmp_path, monkeypatch, scenario):
    """VERDICT r3 item 5: the device path chunks focal columns under a
    byte budget.  A shrunken budget forces multiple chunks on a small
    grid; results (resistances, cum/max maps, per-point current maps)
    must match the single-chunk run exactly."""
    d = _job(tmp_path, scenario, write_maps=True)
    d["write_max_cur_maps"] = "True"
    monkeypatch.setenv("CS_ONETOALL_DEVICE_MIN", "1")

    r_one = cs.compute(dict(d))
    cum_one = np.loadtxt(tmp_path / "job_cum_curmap.asc", skiprows=6)
    max_one = np.loadtxt(tmp_path / "job_max_curmap.asc", skiprows=6)
    import glob
    per_point = sorted(os.path.basename(p) for p in
                       glob.glob(str(tmp_path / "job_curmap_*.asc")))
    assert per_point, "expected per-point current maps"
    maps_one = {f: np.loadtxt(tmp_path / f, skiprows=6) for f in per_point}

    # budget for ~2 columns -> 3 chunks of the 6 points
    monkeypatch.setenv("CS_ONETOALL_CHUNK_BYTES",
                       str(80 * 80 * 8 * 8 * 2))
    d["output_file"] = str(tmp_path / "jobc.out")
    r_chunked = cs.compute(dict(d))
    cum_chunked = np.loadtxt(tmp_path / "jobc_cum_curmap.asc", skiprows=6)
    max_chunked = np.loadtxt(tmp_path / "jobc_max_curmap.asc", skiprows=6)

    assert np.allclose(np.asarray(r_one), np.asarray(r_chunked), atol=1e-6)
    assert ((cum_one - cum_chunked) ** 2).sum() < 1e-8
    assert ((max_one - max_chunked) ** 2).sum() < 1e-8
    for f, a in maps_one.items():
        f2 = f.replace("job_", "jobc_")
        assert os.path.isfile(tmp_path / f2), f"missing {f2}"
        b = np.loadtxt(tmp_path / f2, skiprows=6)
        assert ((a - b) ** 2).sum() < 1e-8, f"{f}"
