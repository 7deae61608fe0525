"""Checkpoint/resume subsystem tests."""

import os
import textwrap

import numpy as np
import pytest

import circuitscape_tpu as cs
from circuitscape_tpu.solve import dispatch


def _setup_job(tmp_path, **extra):
    hdr = ("ncols         6\nnrows         6\nxllcorner     0\n"
           "yllcorner     0\ncellsize      1\nNODATA_value  -9999\n")
    (tmp_path / "cell.asc").write_text(hdr + "\n".join(["1 1 1 1 1 1"] * 6) + "\n")
    (tmp_path / "pts.asc").write_text(
        hdr + "1 0 0 0 0 2\n0 0 0 0 0 0\n0 0 0 0 0 0\n"
        "0 0 0 0 0 0\n0 0 0 0 0 0\n3 0 0 4 0 0\n")
    d = {
        "data_type": "raster", "scenario": "pairwise",
        "habitat_file": str(tmp_path / "cell.asc"),
        "point_file": str(tmp_path / "pts.asc"),
        "output_file": str(tmp_path / "job.out"),
        "write_cur_maps": "True",   # disables the shortcut -> general path
        "solver": "cholmod",
        "checkpoint_file": str(tmp_path / "job.ckpt.npz"),
    }
    d.update(extra)
    return d


def test_checkpoint_written_and_cleared(tmp_path):
    d = _setup_job(tmp_path)
    r = cs.compute(d)
    assert r.shape == (5, 5)
    # completed jobs clean up their checkpoint
    assert not os.path.exists(d["checkpoint_file"])


def test_resume_skips_completed_pairs(tmp_path, monkeypatch):
    d = _setup_job(tmp_path)
    r1 = cs.compute(d)

    # fabricate an interrupted run: resistances all solved, checkpoint
    # left on disk
    from circuitscape_tpu.checkpoint import Checkpoint
    ck = Checkpoint(d["checkpoint_file"])
    numpoints = 4
    res = np.asarray(r1[1:, 1:])
    ck.mark({(i, j) for i in range(numpoints) for j in range(i + 1, numpoints)})
    ck.save(res, None)
    assert os.path.exists(d["checkpoint_file"])

    calls = {"n": 0}
    orig = dispatch.DirectContext.solve

    def counting(self, rhs):
        calls["n"] += 1
        return orig(self, rhs)

    monkeypatch.setattr(dispatch.DirectContext, "solve", counting)
    r2 = cs.compute(d)
    assert calls["n"] == 0, "resume should not re-solve completed pairs"
    assert np.allclose(np.asarray(r1), np.asarray(r2))


def test_corrupt_checkpoint_ignored(tmp_path):
    d = _setup_job(tmp_path)
    with open(d["checkpoint_file"], "wb") as f:
        f.write(b"garbage")
    r = cs.compute(d)
    assert r.shape == (5, 5)
    assert np.all(np.asarray(r[1:, 1:]) >= 0)
