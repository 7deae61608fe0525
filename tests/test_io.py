"""IO codec tests: ASC/TIFF round trips, gzip, sniffing, logging, timer."""

import gzip
import logging
import os

import numpy as np
import pytest

from circuitscape_tpu import consts, cslog
from circuitscape_tpu.io.raster import (get_raster_meta, guess_file_type,
                                        read_raster, write_aagrid,
                                        write_tiff)
from circuitscape_tpu.timer import Timer


def test_asc_round_trip(tmp_path):
    arr = np.arange(12, dtype=np.float64).reshape(3, 4) / 7
    arr[1, 2] = -9999
    transform = (2.0, 0.5, 0.0, 10.0, 0.0, -0.5)
    p = str(tmp_path / "a.asc")
    write_aagrid(p, arr, transform)
    back, wkt, tr = read_raster(p)
    assert np.allclose(back, arr)
    assert tr[0] == 2.0 and tr[1] == 0.5


def test_tiff_round_trip(tmp_path):
    arr = np.arange(20, dtype=np.float64).reshape(4, 5) * 1.5
    arr[0, 0] = -9999
    transform = (1.0, 2.0, 0.0, 8.0, 0.0, -2.0)
    p = str(tmp_path / "a.tif")
    write_tiff(p, arr, transform)
    back, wkt, tr = read_raster(p)
    assert np.allclose(back, arr)
    assert tr[1] == 2.0
    meta = get_raster_meta(back, wkt, tr)
    assert meta.cellsize == 2.0
    assert meta.nrows == 4 and meta.ncols == 5


def test_gzip_transparent(tmp_path):
    arr = np.ones((3, 3))
    p = str(tmp_path / "a.asc")
    write_aagrid(p, arr, (0, 1, 0, 3, 0, -1))
    gz = p + ".gz"
    with open(p, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    back, _, _ = read_raster(gz)
    assert np.allclose(back, arr)


def test_file_sniffing(tmp_path):
    (tmp_path / "grid.asc").write_text("ncols 3\nnrows 1\nxllcorner 0\n"
                                       "yllcorner 0\ncellsize 1\n"
                                       "NODATA_value -9999\n1 2 3\n")
    (tmp_path / "pairs.txt").write_text("mode include\n1 2\n")
    (tmp_path / "pairsmat.txt").write_text("min 0\nmax 100\n0 1 2\n")
    (tmp_path / "list.txt").write_text("1 0.5 0.5\n")
    np.save(tmp_path / "a.npy", np.ones((2, 2)))
    assert guess_file_type(str(tmp_path / "grid.asc")) == consts.FILE_TYPE_AAGRID
    assert guess_file_type(str(tmp_path / "pairs.txt")) == consts.FILE_TYPE_INCL_PAIRS
    assert guess_file_type(str(tmp_path / "pairsmat.txt")) == \
        consts.FILE_TYPE_INCL_PAIRS_AAGRID
    assert guess_file_type(str(tmp_path / "list.txt")) == consts.FILE_TYPE_TXTLIST
    assert guess_file_type(str(tmp_path / "a.npy")) == consts.FILE_TYPE_NPY


def test_npy_input(tmp_path):
    arr = np.random.default_rng(0).uniform(1, 2, (5, 6))
    np.save(tmp_path / "g.npy", arr)
    back, _, _ = read_raster(str(tmp_path / "g.npy"))
    assert np.allclose(back, arr)


def test_logging_suppress_and_ui_callback():
    from circuitscape_tpu.config import CSConfig
    captured = []
    cslog.ui_interface[0] = lambda msg, level: captured.append((msg, level))
    try:
        cfg = CSConfig(suppress_messages=True)
        cslog.update_logging(cfg)
        cslog.info("hello %s", "world")
        cslog.warn("danger")
        assert any("hello world" in m for m, lvl in captured)
        assert any(lvl == "warn" for m, lvl in captured)
    finally:
        cslog.ui_interface[0] = lambda msg, level: None


def test_log_file(tmp_path):
    from circuitscape_tpu.config import CSConfig
    logf = str(tmp_path / "run.log")
    cfg = CSConfig(log_file=logf)
    cslog.update_logging(cfg)
    cslog.info("to the file")
    for h in list(cslog.logger.handlers):
        h.flush()
    assert "to the file" in open(logf).read()


def test_timer_hierarchy():
    t = Timer()
    with t("outer"):
        with t("inner"):
            pass
        with t("inner"):
            pass
    table = t.table()
    assert "outer" in table and "inner" in table
    assert t.total("inner") >= 0
