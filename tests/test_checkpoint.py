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


def test_shortcut_path_resume(tmp_path, monkeypatch):
    """The stencil shortcut device path must honor and update the
    checkpoint (VERDICT r1 item 7): a partially-completed shortcut run
    resumes without re-solving finished anchor pairs, and the resumed
    answer matches a clean run (resistances + voltmatrix restored)."""
    # shortcut mode: no maps requested, cg+amg
    d = _setup_job(tmp_path, write_cur_maps="False", solver="cg+amg")
    r1 = cs.compute(d)
    assert not os.path.exists(d["checkpoint_file"])

    # interrupt the first run after its first checkpoint save by
    # shrinking the device chunk and raising inside the chunk loop
    from circuitscape_tpu.drivers import core as core_mod
    from circuitscape_tpu.solve import stencil as stencil_mod

    orig_solve = stencil_mod.stencil_solve_pairs
    calls = {"n": 0}

    def exploding(*a, **k):
        calls["n"] += 1
        if calls["n"] > 1:
            raise KeyboardInterrupt("simulated kill")
        return orig_solve(*a, **k)

    # force 1-pair chunks so the kill lands mid-job
    monkeypatch.setattr(core_mod, "_shortcut_chunk_cap", 1, raising=False)
    monkeypatch.setattr(stencil_mod, "stencil_solve_pairs", exploding)
    monkeypatch.setattr(core_mod, "stencil_solve_pairs", exploding,
                        raising=False)
    with pytest.raises(KeyboardInterrupt):
        cs.compute(d)
    assert os.path.exists(d["checkpoint_file"]), \
        "interrupted shortcut run must leave a checkpoint"

    # resume: the remaining pairs solve, the finished ones are skipped
    monkeypatch.setattr(stencil_mod, "stencil_solve_pairs", orig_solve)
    monkeypatch.setattr(core_mod, "stencil_solve_pairs", orig_solve,
                        raising=False)
    r2 = cs.compute(d)
    assert np.allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
    assert not os.path.exists(d["checkpoint_file"])


def test_corrupt_checkpoint_ignored(tmp_path):
    d = _setup_job(tmp_path)
    with open(d["checkpoint_file"], "wb") as f:
        f.write(b"garbage")
    r = cs.compute(d)
    assert r.shape == (5, 5)
    assert np.all(np.asarray(r[1:, 1:]) >= 0)
