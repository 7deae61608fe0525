"""Golden-file regression suite, mirroring the reference's runtests
structure (test/runtests.jl:15-16): every scenario family runs against
both solver tiers and must reproduce identical numerics.
"""

import numpy as np
import pytest

from golden_utils import (check_resistances, clean_output, compare_all_output,
                          compute_with, readdlm, DATA_DIR)

SOLVERS = ["cg+amg", "cholmod"]
TOL = 1e-6


@pytest.fixture(autouse=True)
def _setup(in_data_dir):
    clean_output()
    yield


@pytest.mark.parametrize("solver", SOLVERS)
@pytest.mark.parametrize("i", [1, 2, 3])
def test_network_pairwise(solver, i):
    r = compute_with(f"input/network/sgNetworkVerify{i}.ini", solver=solver)
    x = readdlm(f"{DATA_DIR}/output_verify/sgNetworkVerify{i}_resistances.out")
    check_resistances(x[1:, 1:], r[1:, 1:], TOL,
                      label=f"sgNetworkVerify{i}")
    assert np.array_equal(x[1:, 0] + 1, r[1:, 0])
    compare_all_output(f"sgNetworkVerify{i}")


@pytest.mark.parametrize("solver", SOLVERS)
@pytest.mark.parametrize("i", [1, 2, 3])
def test_network_advanced(solver, i):
    r = compute_with(f"input/network/mgNetworkVerify{i}.ini", solver=solver)
    x = readdlm(f"{DATA_DIR}/output_verify/mgNetworkVerify{i}_voltages.txt")
    x = x.copy()
    x[:, 0] += 1
    check_resistances(x, r, TOL, label=f"mgNetworkVerify{i}")
    compare_all_output(f"mgNetworkVerify{i}")


@pytest.mark.parametrize("solver", SOLVERS)
@pytest.mark.parametrize("i", list(range(1, 18)))
def test_raster_pairwise(solver, i):
    r = compute_with(f"input/raster/pairwise/{i}/sgVerify{i}.ini",
                     solver=solver)
    x = readdlm(f"{DATA_DIR}/output_verify/sgVerify{i}_resistances.out")
    written = readdlm(f"{DATA_DIR}/output/sgVerify{i}_resistances.out")
    check_resistances(written, r, TOL, label=f"sgVerify{i} (written)")
    check_resistances(x, r, TOL, label=f"sgVerify{i} (verify)")
    compare_all_output(f"sgVerify{i}")


@pytest.mark.parametrize("solver", SOLVERS)
@pytest.mark.parametrize("i", list(range(1, 7)))
def test_raster_advanced(solver, i):
    compute_with(f"input/raster/advanced/{i}/mgVerify{i}.ini", solver=solver)
    compare_all_output(f"mgVerify{i}")


@pytest.mark.parametrize("solver", SOLVERS)
@pytest.mark.parametrize("i", list(range(1, 14)))
def test_raster_one_to_all(solver, i):
    r = compute_with(f"input/raster/one_to_all/{i}/oneToAllVerify{i}.ini",
                     solver=solver)
    x = readdlm(f"{DATA_DIR}/output_verify/oneToAllVerify{i}_resistances.out")
    check_resistances(x, r, TOL, label=f"oneToAllVerify{i}")
    compare_all_output(f"oneToAllVerify{i}")


@pytest.mark.parametrize("solver", SOLVERS)
@pytest.mark.parametrize("i", list(range(1, 13)))
def test_raster_all_to_one(solver, i):
    r = compute_with(f"input/raster/all_to_one/{i}/allToOneVerify{i}.ini",
                     solver=solver)
    x = readdlm(f"{DATA_DIR}/output_verify/allToOneVerify{i}_resistances.out")
    check_resistances(x, r, TOL, label=f"allToOneVerify{i}")
    compare_all_output(f"allToOneVerify{i}")


@pytest.mark.parametrize("solver", SOLVERS)
def test_single_precision_spot(solver):
    """Single precision end-to-end (reference tolerance tier:
    tol 1e-4, compared at sqrt -> 1e-2)."""
    r = compute_with("input/raster/pairwise/2/sgVerify2.ini",
                     solver=solver, precision="single")
    assert r.dtype == np.float32
    x = readdlm(f"{DATA_DIR}/output_verify/sgVerify2_resistances.out")
    check_resistances(x, r, 1e-4, label="sgVerify2-single")
    compare_all_output("sgVerify2", is_single=True)
