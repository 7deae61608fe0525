"""Unit tests mirroring the reference's internal suite
(test/internal.jl:1-221): node-map construction with polygons, polymap
merging, conflict policies, graph weight rules, analytic model problems,
error paths, and the Omniscape API smoke test.
"""

import numpy as np
import pytest

from circuitscape_tpu.graph.build import (construct_graph,
                                          construct_node_map,
                                          create_new_polymap, laplacian)
from circuitscape_tpu.drivers.advanced import resolve_conflicts
from circuitscape_tpu.io.raster import RasterMeta
from circuitscape_tpu.io.loaders import read_point_map
from circuitscape_tpu.utils import compute_omniscape_current

E = np.zeros((0, 0), np.int64)


def test_nodemap_no_polygons():
    gmap = np.array([[0, 1, 2], [2, 0, 0], [2, 0, 2]])
    nodemap = construct_node_map(gmap, E)
    assert np.array_equal(nodemap, [[0, 3, 4], [1, 0, 0], [2, 0, 5]])


def test_nodemap_polygons_1():
    gmap = np.array([[0, 1, 2], [2, 0, 0], [2, 0, 2]])
    polymap = np.array([[1, 0, 1], [2, 1, 0], [0, 0, 2]])
    nodemap = construct_node_map(gmap, polymap)
    assert np.array_equal(nodemap, [[4, 3, 4], [1, 4, 0], [2, 0, 1]])


def test_nodemap_polygons_2():
    gmap = np.array([[1, 0, 1], [0, 1, 0], [1, 0, 1]])
    polymap = np.array([[1, 0, 1], [0, 2, 0], [2, 0, 0]])
    nodemap = construct_node_map(gmap, polymap)
    assert np.array_equal(nodemap, [[1, 0, 1], [0, 2, 0], [2, 0, 3]])


def test_nodemap_polygons_3():
    polymap = np.array([[1., 2, 0, 0, 0],
                        [0, 0, 0, 0, 0],
                        [0, 0, 0, 0, 0],
                        [0, 0, 0, 0, 0],
                        [1, 0, 0, 0, 2]]).astype(np.int64)
    gmap = np.array([[0, 0, 0, 1.0, 1.0],
                     [0, 0, 0, 3.01, 2.0],
                     [1.0, 2.0, 2.0, 1.0, 1.0],
                     [1.0, 2.0, 2.0, 1.0, 1.0],
                     [1.0, 2.0, 2.0, 0, 1.0]])
    nodemap = construct_node_map(gmap, polymap)
    assert np.array_equal(nodemap, [[3, 18, 0, 10, 14],
                                    [0, 0, 0, 11, 15],
                                    [1, 4, 7, 12, 16],
                                    [2, 5, 8, 13, 17],
                                    [3, 6, 9, 0, 18]])


def test_create_new_polymap_merge(in_data_dir):
    import circuitscape_tpu as cs
    from circuitscape_tpu.io.loaders import load_raster_data
    cfg = cs.parse_config("input/raster/one_to_all/11/oneToAllVerify11.ini")
    r = load_raster_data(cfg)
    point_map = np.array([[1., 2, 0, 0, 0],
                          [0, 0, 0, 0, 0],
                          [3, 0, 0, 7, 0],
                          [4, 0, 0, 0, 0],
                          [1, 0, 0, 0, 2]]).astype(np.int64)
    merged = create_new_polymap(r.cellmap, r.polymap, r.points_rc, 0, 0,
                                point_map)
    assert np.array_equal(merged, [[1, 2, 0, 0, 0],
                                   [0, 0, 0, 0, 0],
                                   [12, 0, 0, 2, 0],
                                   [1, 0, 0, 0, 0],
                                   [1, 0, 0, 0, 2]])


@pytest.mark.parametrize("policy,exp_src,exp_gnd", [
    ("rmvgnd", [1, 0, 0], [0, 0, 0]),
    ("rmvsrc", [0, 0, 0], [1, 0, 0]),
    ("keepall", [1, 0, 0], [1, 0, 0]),
    ("rmvall", [0, 0, 0], [1, 0, 0]),
])
def test_resolve_conflicts(policy, exp_src, exp_gnd):
    s, g, f = resolve_conflicts(np.array([1., 0, 0]), np.array([1., 0, 0]),
                                policy)
    assert np.array_equal(s, exp_src)
    assert np.array_equal(g, exp_gnd)
    assert np.array_equal(f, [1, 0, 0])


def test_construct_graph_weight_rules():
    gmap = np.array([[0., 1, 2], [2, 0, 0], [2, 0, 2]])
    nodemap = np.array([[0, 3, 4], [1, 0, 0], [2, 0, 5]])

    cases = [
        (False, True, [[0, 2, 0, 0, 0], [2, 0, 0, 0, 0], [0, 0, 0, 1.5, 0],
                       [0, 0, 1.5, 0, 0], [0, 0, 0, 0, 0]]),
        (True, True, [[0, 2, 0, 0, 0], [2, 0, 0, 0, 0], [0, 0, 0, 4/3, 0],
                      [0, 0, 4/3, 0, 0], [0, 0, 0, 0, 0]]),
        (False, False, [[0, 2, 1.06066, 0, 0], [2, 0, 0, 0, 0],
                        [1.06066, 0, 0, 1.5, 0], [0, 0, 1.5, 0, 0],
                        [0, 0, 0, 0, 0]]),
        (True, False, [[0, 2, 0.942809, 0, 0], [2, 0, 0, 0, 0],
                       [0.942809, 0, 0, 4/3, 0], [0, 0, 4/3, 0, 0],
                       [0, 0, 0, 0, 0]]),
    ]
    for avg_res, four, expected in cases:
        A = construct_graph(gmap, nodemap, avg_res, four)
        assert ((A.toarray() - np.asarray(expected)) ** 2).sum() < 1e-6


def model_problem(s):
    """s x s all-ones grid Laplacian (test/test_utils.jl:31-37)."""
    cellmap = np.ones((s, s))
    nodemap = np.arange(1, s * s + 1).reshape(s, s, order="F")
    G = construct_graph(cellmap, nodemap, True, True)
    return laplacian(G)


def test_model_problem_2():
    exp = [[2., -1, -1, 0], [-1, 2, 0, -1], [-1, 0, 2, -1], [0, -1, -1, 2]]
    assert np.array_equal(model_problem(2).toarray(), exp)


def test_model_problem_3():
    L = model_problem(3).toarray()
    # interior node degree 4, edge 3, corner 2
    assert np.array_equal(np.diag(L), [2, 3, 2, 3, 4, 3, 2, 3, 2])
    assert np.allclose(L, L.T)
    assert np.allclose(L.sum(axis=0), 0)


def test_point_outside_map_raises():
    meta = RasterMeta(ncols=50, nrows=50, xllcorner=0.0, yllcorner=0.0,
                      cellsize=0.5, nodata=-9999.0, transform=(0.0,), wkt="")
    with pytest.raises(Exception, match="falls outside"):
        read_point_map(
            str(__file__).replace("test_internal.py", "data/samples.txt"),
            meta)


def test_no_cum_map_when_disabled(in_data_dir):
    """Issue 158 parity: no cumulative map written when
    write_cur_maps = False."""
    import os
    import circuitscape_tpu as cs
    cum_file = "output/sgVerify12_cum_curmap.asc"
    if os.path.isfile(cum_file):
        os.remove(cum_file)
    cs.compute("input/raster/pairwise/12/sgVerify12.ini")
    assert not os.path.isfile(cum_file)


def test_omniscape_api_smoke():
    conductance = np.array([[1., 5, 1], [2, 1, 1], [9, 1, 6]])
    source = np.array([[1., 0, 0], [0, 0, 0], [0, 1, 0]])
    ground = np.array([[0., 0, 1], [0, 0, 0], [0, 0, 0]])
    cs_cfg = {
        "ground_file_is_resistances": "True",
        "use_direct_grounds": "False",
        "output_file": "temp",
        "write_cum_cur_map_only": "False",
        "scenario": "Advanced",
        "suppress_messages": "True",
        "connect_four_neighbors_only": "False",
        "solver": "cholmod",
        "cholmod_batch_size": "1000",
        "data_type": "raster",
    }
    current = compute_omniscape_current(conductance, source, ground, cs_cfg)
    assert current.shape == (3, 3)
    assert np.all(np.isfinite(current))
    assert current.max() > 0
