"""Per-job solver statistics (the BASELINE.json north-star metrics).

The reference reports progress as log lines only; BASELINE.json asks
for sustained nnz/s in the preconditioned solve and speed-of-light
accounting, so the device drivers record machine-readable stats here:
total CG iterations, fine-operator nnz, pure solve seconds, the kernel
(pallas/xla) used at each MG level, and the derived sustained nnz/s +
%-of-HBM-roofline for the fine-level SpMV.

Reset per job by run._run; read by bench_suite.py after each compute().
"""

from __future__ import annotations

import threading

_lock = threading.Lock()
JOB: dict = {}


def reset():
    with _lock:
        JOB.clear()


_ACCUM = {"cg_iters", "col_iters", "spmv_bytes", "solve_s", "factor_s"}


def record(**kw):
    """Merge stats; counter keys accumulate, others overwrite."""
    with _lock:
        for k, v in kw.items():
            if k in _ACCUM:
                JOB[k] = JOB.get(k, 0) + v
            else:
                JOB[k] = v


def record_solve(x_shape, iters: int, seconds: float):
    """Accumulate one batched device solve: x_shape = (B, H, W) of the
    device RHS block (padded batch), iters = device CG iterations."""
    b, h, w = x_shape
    record(cg_iters=int(iters), col_iters=int(b) * int(iters),
           spmv_bytes=int(iters) * (2 * int(b) + 9) * int(h) * int(w) * 4,
           solve_s=float(seconds))


# v5e (lite0): ~819 GB/s HBM.  The stencil SpMV streams x and y once
# per matvec plus the 9 weight planes (reused across the batch):
# bytes/matvec = (2*B + 9) * cells * 4 (f32).
HBM_BYTES_PER_S = 819e9


def spmv_roofline(cells: int, batch: int, dtype_bytes: int = 4):
    """Speed-of-light seconds per batched fine-level matvec."""
    return (2 * batch + 9) * cells * dtype_bytes / HBM_BYTES_PER_S


def finalize() -> dict:
    """Derived metrics from the raw counters; returns a copy.

    Drivers accumulate per solve chunk:
      cg_iters        device CG iterations (outer count, all passes)
      col_iters       sum over chunks of (batch columns x iterations)
      spmv_bytes      fine-level SpMV HBM traffic: per batched matvec
                      (2*B + 9) * cells * 4 bytes, times iterations
      solve_s         wall seconds inside the batched device solves
      fine_nnz        stored nonzeros of the fine operator (set once)
      cells           padded grid cells (set once)
      mg_kernels      per-MG-level kernel name list (set once)
    """
    with _lock:
        d = dict(JOB)
    nnz = d.get("fine_nnz", 0)
    solve_s = d.get("solve_s", 0.0)
    col_iters = d.get("col_iters", 0)
    spmv_bytes = d.get("spmv_bytes", 0)
    if col_iters and nnz and solve_s:
        # sustained nnz/s through the whole preconditioned solve
        # (counting fine-level nnz once per CG iteration per column; the
        # V-cycle's coarse work is the preconditioner's price, not nnz)
        d["sustained_nnz_per_s"] = round(nnz * col_iters / solve_s, 0)
    if spmv_bytes and solve_s:
        # share of the solve spent streaming the fine-level SpMV if it
        # ran at HBM speed-of-light — a lower bound on achieved %SOL
        # (each CG iteration also runs the V-cycle, ~2.4x more traffic)
        d["fine_spmv_pct_of_hbm_roofline"] = round(
            100.0 * (spmv_bytes / HBM_BYTES_PER_S) / solve_s, 1)
    return d
