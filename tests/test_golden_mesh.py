"""Golden-corpus subset replayed on the 8-virtual-device mesh.

VERDICT r3 item 8: the sharded execution path (CS_FORCE_MESH=1,
parallel/mesh.py — row-sharded stencil operator with ppermute halo
exchange, batch-sharded RHS) must reproduce the reference goldens, not
just pass synthetic differentials.  The device fast paths are forced on
(CS_*_DEVICE_MIN=1) so the tiny corpus grids actually route through the
mesh-aware stencil solver.
"""

import numpy as np
import pytest

from golden_utils import (check_resistances, clean_output,
                          compare_all_output, compute_with, readdlm,
                          DATA_DIR)

TOL = 1e-6


@pytest.fixture(autouse=True)
def _mesh_env(in_data_dir, monkeypatch):
    clean_output()
    monkeypatch.setenv("CS_FORCE_MESH", "1")
    monkeypatch.setenv("CS_PAIRWISE_DEVICE_MIN", "1")
    monkeypatch.setenv("CS_ONETOALL_DEVICE_MIN", "1")
    yield


@pytest.mark.parametrize("i", [1, 2, 7, 14])
def test_raster_pairwise_mesh(i):
    r = compute_with(f"input/raster/pairwise/{i}/sgVerify{i}.ini",
                     solver="cg+amg")
    x = readdlm(f"{DATA_DIR}/output_verify/sgVerify{i}_resistances.out")
    check_resistances(x, r, TOL, label=f"sgVerify{i} (mesh)")
    compare_all_output(f"sgVerify{i}")


@pytest.mark.parametrize("i", [1, 6])
def test_raster_one_to_all_mesh(i):
    r = compute_with(f"input/raster/one_to_all/{i}/oneToAllVerify{i}.ini",
                     solver="cg+amg")
    x = readdlm(f"{DATA_DIR}/output_verify/oneToAllVerify{i}_resistances.out")
    check_resistances(x, r, TOL, label=f"oneToAllVerify{i} (mesh)")
    compare_all_output(f"oneToAllVerify{i}")


@pytest.mark.parametrize("i", [1])
def test_raster_all_to_one_mesh(i):
    r = compute_with(f"input/raster/all_to_one/{i}/allToOneVerify{i}.ini",
                     solver="cg+amg")
    x = readdlm(f"{DATA_DIR}/output_verify/allToOneVerify{i}_resistances.out")
    check_resistances(x, r, TOL, label=f"allToOneVerify{i} (mesh)")
    compare_all_output(f"allToOneVerify{i}")
