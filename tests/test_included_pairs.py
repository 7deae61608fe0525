"""Include/exclude-pairs semantics (reference test/issue341.jl):
include-mode pruning, exclude mode, matrix format, and focal regions.
Inputs are generated inline into tmp_path, as in the reference.
"""

import os
import textwrap

import numpy as np
import pytest

import circuitscape_tpu as cs


def _write_grid(path, body, n=5):
    hdr = textwrap.dedent(f"""\
        ncols         {n}
        nrows         {n}
        xllcorner     0
        yllcorner     0
        cellsize      1
        NODATA_value  -9999
        """)
    path.write_text(hdr + textwrap.dedent(body))


def _write_ini(dirpath, pts="pts.asc", include="include.txt"):
    ini = dirpath / "job.ini"
    ini.write_text(textwrap.dedent(f"""\
        [Circuitscape mode]
        data_type = raster
        scenario = pairwise
        [Habitat raster or graph]
        habitat_file = {dirpath / 'cell.asc'}
        habitat_map_is_resistances = True
        [Options for pairwise and one-to-all and all-to-one modes]
        point_file = {dirpath / pts}
        use_included_pairs = True
        included_pairs_file = {dirpath / include}
        [Connection scheme for raster habitat data]
        connect_four_neighbors_only = True
        connect_using_avg_resistances = True
        [Output options]
        output_file = {dirpath / 'out.out'}
        [Calculation options]
        solver = cg+amg
        """))
    return str(ini)


def _ones_cell(dirpath, n=5):
    _write_grid(dirpath / "cell.asc", "\n".join(["1 " * n] * n) + "\n", n)


def test_include_mode_prunes_and_restricts(tmp_path):
    _ones_cell(tmp_path)
    _write_grid(tmp_path / "pts.asc", """\
        1 0 0 0 2
        0 0 0 0 0
        0 0 0 0 0
        0 0 0 0 0
        3 0 0 0 0
        """)
    (tmp_path / "include.txt").write_text("mode\tinclude\n1\t2\n")
    r = cs.compute(_write_ini(tmp_path))
    # only pair (1,2) included; point 3 pruned entirely
    assert r.shape == (3, 3)
    assert r[0, 1] == 1.0 and r[0, 2] == 2.0
    assert r[1, 2] > 0


def test_include_mode_focal_regions(tmp_path):
    _ones_cell(tmp_path, 6)
    _write_grid(tmp_path / "pts.asc", """\
        1 1 0 0 2 2
        0 0 0 0 0 0
        0 0 0 0 0 0
        0 0 0 0 0 0
        0 0 0 0 0 0
        3 0 0 0 0 0
        """, 6)
    (tmp_path / "include.txt").write_text("mode\tinclude\n1\t2\n")
    r = cs.compute(_write_ini(tmp_path))
    assert r.shape == (3, 3)
    assert r[1, 2] > 0


def test_exclude_mode(tmp_path):
    _ones_cell(tmp_path)
    _write_grid(tmp_path / "pts.asc", """\
        1 0 0 0 2
        0 0 0 0 0
        0 0 0 0 0
        0 0 0 0 0
        3 0 0 0 0
        """)
    (tmp_path / "include.txt").write_text("mode\texclude\n1\t3\n")
    r = cs.compute(_write_ini(tmp_path))
    assert r.shape == (4, 4)
    assert r[1, 2] > 0    # pair (1,2)
    assert r[2, 3] > 0    # pair (2,3)
    assert r[1, 3] == -1  # excluded pair (1,3)


def test_exclude_mode_multiple_pairs(tmp_path):
    _ones_cell(tmp_path)
    _write_grid(tmp_path / "pts.asc", """\
        1 0 0 0 2
        0 0 0 0 0
        0 0 0 0 0
        0 0 0 0 0
        3 0 0 0 4
        """)
    (tmp_path / "include.txt").write_text("mode\texclude\n1\t3\n2\t4\n")
    r = cs.compute(_write_ini(tmp_path))
    assert r.shape == (5, 5)
    assert r[1, 2] > 0 and r[1, 4] > 0 and r[2, 3] > 0 and r[3, 4] > 0
    assert r[1, 3] == -1 and r[2, 4] == -1


def test_exclude_mode_focal_regions(tmp_path):
    _ones_cell(tmp_path, 6)
    _write_grid(tmp_path / "pts.asc", """\
        1 1 0 0 2 2
        0 0 0 0 0 0
        0 0 0 0 0 0
        0 0 0 0 0 0
        0 0 0 0 0 0
        3 0 0 0 0 0
        """, 6)
    (tmp_path / "include.txt").write_text("mode\texclude\n1\t3\n")
    r = cs.compute(_write_ini(tmp_path))
    assert r.shape == (4, 4)
    assert r[1, 2] > 0 and r[2, 3] > 0
    assert r[1, 3] == -1
