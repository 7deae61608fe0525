"""Warmup utility: precompiles a job's device programs (fresh-machine
cold-start story; VERDICT r3 item 6)."""
import os

import numpy as np
import pytest


def _tiny_job(tmp_path, scenario="pairwise"):
    rng = np.random.default_rng(0)
    g = rng.uniform(0.5, 3, (40, 50))
    np.save(tmp_path / "c.npy", g)
    pts = np.zeros((40, 50))
    pts[3, 4], pts[10, 20], pts[30, 40] = 1, 2, 3
    np.save(tmp_path / "p.npy", pts)
    ini = tmp_path / "j.ini"
    ini.write_text(f"""[a]
data_type = raster
scenario = {scenario}
habitat_file = {tmp_path}/c.npy
point_file = {tmp_path}/p.npy
output_file = {tmp_path}/o.out
solver = cg+amg
suppress_messages = True
""")
    return str(ini)


def test_warmup_runs_same_shape_job(tmp_path):
    from circuitscape_tpu.warmup import warmup
    secs = warmup(_tiny_job(tmp_path))
    assert secs > 0
    # no stray outputs next to the real job's output_file
    assert not os.path.exists(tmp_path / "o_resistances.out")


def test_warmup_rejects_network(tmp_path):
    from circuitscape_tpu.warmup import warmup
    with pytest.raises(ValueError):
        warmup({"data_type": "network", "scenario": "pairwise",
                "habitat_file": "x", "output_file": "y"})


def test_warmup_cli_usage():
    from circuitscape_tpu.warmup import main
    assert main([]) == 2
