"""Solver tiers and per-component solve contexts.

Parity reference: src/core.jl:48-94 (Solver type hierarchy, get_solver),
:636-653 (solve_linear_system with residual gates), ext/*.jl (the
extension tiers Pardiso/Accelerate, which here alias onto the two real
tiers since both were CPU direct-solver variants).

Tiers:
  cg+amg     -> batched PCG on device (JAX/XLA; smoothed-aggregation AMG
                preconditioner built per component, V-cycle applied on
                device; Jacobi until the hierarchy is built)
  cholmod    -> direct sparse Cholesky with batched multi-RHS solve
                (native C++ backend when built, scipy fallback otherwise)
  mklpardiso / accelerate -> accepted and mapped onto the direct tier,
                so reference .ini files keep working on TPU hosts.
"""

from __future__ import annotations

import os as _os

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from .. import cslog, consts
from .operators import ell_from_csr, pad_rhs
from .cg import cg_batched, jacobi_prec, jacobi_apply


class SolverFailedError(RuntimeError):
    pass


# Conservative usable HBM on the target chip (16 GB v5e minus XLA
# workspace/fragmentation headroom; docs/capacity.md "Ceilings").
# 10.5 GiB calibrated against the 48M-cell run: 11.5 allowed a second
# 3.2 GB RHS column there and the fused loop's temporaries tipped it
# over; 10.5 keeps that job at one column (which fits with room).
HBM_USABLE_BYTES = int(float(_os.environ.get("CS_HBM_USABLE_GB",
                                             "10.5")) * 2**30)


def solve_chunk_budget(cells: int,
                       env_var: str = "CS_SHORTCUT_CHUNK_BYTES") -> int:
    """Bytes available for per-RHS-column solve state on one chip.

    Capacity-modeled (docs/capacity.md) instead of a flat constant:
    usable HBM minus the job's fixed residency (f64 operator + f32 MG
    hierarchy + Pallas planes ~108 B/padded cell, +12 margin).  A flat
    2-4 GiB budget left >70% of the chip idle at 6M/12M cells and
    chunked the 12M pairwise batch to TWO columns per dispatch — 16
    serial chunks, each too narrow for the Pallas kernel's batch
    blocking.  The env override wins (tests force multi-chunk paths
    with tiny budgets)."""
    env = _os.environ.get(env_var)
    if env:
        return int(env)
    return max(cells, HBM_USABLE_BYTES - 120 * cells)


def pow2_floor(n: int) -> int:
    """Largest power of two <= n (chunk widths round UP to a power of
    two inside the fused pair solve, so sizing chunks at a power of two
    keeps allocated bytes equal to budgeted bytes)."""
    return 1 << (max(1, n).bit_length() - 1)


def reraise_if_device_oom(e: Exception, cells: int, batch: int):
    """Turn an opaque device OOM into an actionable capacity error.

    The single-chip capacity model (docs/capacity.md): the iterative
    grid tier holds ~72 B/cell of operator + MG hierarchy (plus 36
    B/cell of Pallas planes when W <= 4094) and ~48 B/cell per live RHS
    column of solve state.  When a job exceeds HBM, say so in those
    terms instead of surfacing the runtime's allocation dump."""
    msg = str(e)
    if not ("RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower()
            or "Out of memory" in msg):
        raise e
    op_gb = cells * 72 / 2**30
    col_gb = cells * 48 / 2**30
    raise SolverFailedError(
        f"device out of memory: the {cells}-cell grid needs "
        f"~{op_gb:.1f} GB for the operator + multigrid hierarchy and "
        f"~{col_gb:.2f} GB per concurrent RHS column "
        f"(batch={batch}).  Reduce the per-chunk batch with "
        f"CS_SHORTCUT_CHUNK_BYTES, coarsen the grid, or run on a "
        f"multi-chip mesh (rows shard across chips).  See "
        f"docs/capacity.md for the capacity model.") from e


class CGContext:
    """Per-component CG state: ELL operator + preconditioner on device.

    The AMG hierarchy (solve/amg.py) is attached when available;
    otherwise the Jacobi preconditioner is used.  Correctness only
    depends on the final residual, which is gated identically either way
    (src/core.jl:640-642).
    """

    def __init__(self, matrix: sp.spmatrix, dtype, use_amg=True,
                 rtol=consts.CG_RTOL, itmax=consts.CG_ITMAX):
        self.matrix = matrix.tocsr()
        self.dtype = dtype
        self.rtol = rtol
        self.itmax = itmax
        self.A = ell_from_csr(self.matrix, dtype)
        self.prec = None
        self.prec_apply = None
        # SA-AMG pays for its setup only past a few hundred nodes; tiny
        # component systems converge in a handful of Jacobi-CG iterations
        if use_amg and self.matrix.shape[0] >= 512:
            try:
                from .amg import build_amg, amg_apply
                self.prec = build_amg(self.matrix, self.A, dtype)
                self.prec_apply = amg_apply
            except Exception:
                cslog.warn("AMG setup failed; falling back to Jacobi CG")
                self.prec = None
        if self.prec is None:
            self.prec = jacobi_prec(self.A)
            self.prec_apply = jacobi_apply

    def max_batch(self) -> int:
        # keep the (n_pad, B) workspace under ~1 GiB
        per_col = self.A.n_pad * np.dtype(self.dtype).itemsize * 6
        return max(1, min(4096, (1 << 30) // max(per_col, 1)))

    def solve(self, rhs: np.ndarray) -> np.ndarray:
        """Solve for all columns of rhs (n, B); returns (n, B)."""
        import time as _time

        from .. import stats
        _t0 = _time.perf_counter()
        n, B = rhs.shape
        out = np.empty((n, B), self.dtype)
        step = self.max_batch()
        for s in range(0, B, step):
            block = np.asarray(rhs[:, s:s + step], np.dtype(self.dtype))
            # bucket the batch axis to powers of two to bound jit variants
            b_pad = 1 << max(0, (block.shape[1] - 1)).bit_length()
            rp = pad_rhs(block, self.A.n_pad)
            if b_pad != block.shape[1]:
                rp = np.concatenate(
                    [rp, np.zeros((self.A.n_pad, b_pad - block.shape[1]),
                                  rp.dtype)], axis=1)
            X, relres, iters = cg_batched(
                self.A, jnp.asarray(rp), self.prec,
                prec_apply=self.prec_apply, rtol=self.rtol, itmax=self.itmax)
            stats.record(cg_iters=int(iters),
                         col_iters=int(iters) * block.shape[1])
            relres = np.asarray(relres)[:block.shape[1]]
            bad = relres >= consts.RESIDUAL_GATE
            # ignore all-zero RHS columns (trivially converged)
            nz = np.linalg.norm(block, axis=0) > 0
            if np.any(bad & nz):
                worst = float(relres[bad & nz].max())
                raise SolverFailedError(
                    f"CG solver did not converge: relative residual {worst} "
                    f"exceeds tolerance {consts.RESIDUAL_GATE}")
            out[:, s:s + block.shape[1]] = np.asarray(X)[:n, :block.shape[1]]
        stats.record(fine_nnz=self.matrix.nnz,
                     solve_s=_time.perf_counter() - _t0)
        return out


class DirectContext:
    """Direct sparse Cholesky factorization context.

    Factors G + 10*eps*I once (src/core.jl:519-523) and back-substitutes
    batched multi-RHS blocks (src/core.jl:446-493).  Uses the native C++
    backend (native/cholesky.cpp) when compiled, else scipy's SuperLU.
    """

    def __init__(self, matrix: sp.spmatrix, dtype):
        import time as _time

        from .. import stats
        _t0 = _time.perf_counter()
        self.dtype = dtype
        self.matrix = matrix.tocsr().astype(dtype)
        eps = np.finfo(np.dtype(dtype)).eps
        shifted = (self.matrix +
                   sp.identity(matrix.shape[0], dtype=dtype) * (10 * eps))
        self._native = None
        try:
            from .native_chol import NativeCholesky
            self._native = NativeCholesky(shifted)
            stats.record(fine_nnz=self.matrix.nnz,
                         factor_nnz_L=int(self._native.nnz_L),
                         factor_s=_time.perf_counter() - _t0)
        except Exception as e:
            import os
            if os.environ.get("CS_REQUIRE_NATIVE"):
                raise RuntimeError(
                    "native Cholesky backend unavailable and "
                    f"CS_REQUIRE_NATIVE is set: {e}") from e
            cslog.warn("native Cholesky backend unavailable (%s); "
                       "falling back to scipy SuperLU", e)
            self._lu = spla.splu(shifted.tocsc().astype(np.float64))

    def solve(self, rhs: np.ndarray) -> np.ndarray:
        import time as _time

        from .. import stats
        _t0 = _time.perf_counter()
        if self._native is not None:
            lhs = self._native.solve(np.asarray(rhs, self.dtype))
        else:
            lhs = self._lu.solve(np.asarray(rhs, np.float64)).astype(self.dtype)
        stats.record(solve_s=_time.perf_counter() - _t0)
        if lhs.ndim == 1:
            lhs = lhs[:, None]
        # per-column residual gate (src/core.jl:646-653).  einsum
        # column norms: np.linalg.norm(..., axis=0) materializes an
        # abs() copy and cost ~2s of the 1M-cell direct job; the
        # einsum form is a single fused pass (~0.05s).
        rhs2 = np.asarray(rhs, self.dtype).reshape(lhs.shape)
        r = self.matrix @ lhs
        r -= rhs2
        rnorm = np.sqrt(np.einsum("ij,ij->j", rhs2, rhs2))
        resid = np.sqrt(np.einsum("ij,ij->j", r, r))
        rel = resid / np.where(rnorm == 0, 1.0, rnorm)
        bad = (rel >= consts.RESIDUAL_GATE) & (rnorm > 0)
        if np.any(bad):
            col = int(np.argmax(bad))
            raise SolverFailedError(
                f"Direct solver residual {rel[col]} exceeds tolerance "
                f"{consts.RESIDUAL_GATE} for column {col}")
        return lhs


class AMGSolver:
    name = "cg+amg"
    is_direct = False

    def __init__(self, cfg=None):
        self.batch_size = 0  # unlimited; CG blocks internally

    def build(self, matrix, dtype):
        return CGContext(matrix, dtype)


class DirectSolver:
    name = "cholmod"
    is_direct = True

    def __init__(self, cfg):
        self.batch_size = cfg.cholmod_batch_size

    def build(self, matrix, dtype):
        return DirectContext(matrix, dtype)


# --------------------------------------------------------------------------
# Solver registry — the extension surface.
#
# The reference exposes its solver tiers to plugins via multiple-dispatch
# overrides of construct_cholesky_factor / solve_linear_system
# (ext/CircuitscapePardisoExt.jl:6,31-45); the Python equivalent is this
# registry: external code registers a factory under a solver name and any
# INI with `solver = <name>` routes through it.  A factory is a callable
# cfg -> solver object with .name, .is_direct, .batch_size and
# .build(matrix, dtype) -> context exposing .solve(rhs: (n, B)) -> (n, B).
# --------------------------------------------------------------------------

_SOLVER_REGISTRY: dict = {}


def register_solver(name: str, factory, message: str = None) -> None:
    """Register (or override) a solver tier under `name`."""
    _SOLVER_REGISTRY[name.lower()] = (factory, message)


register_solver("cg+amg", AMGSolver, "Solver used: AMG accelerated by CG")
register_solver("cholmod", DirectSolver, "Solver used: CHOLMOD")
# reference extension tiers were both CPU direct-solver variants; their
# spellings stay valid and route to the direct tier
register_solver("mklpardiso", DirectSolver, "Solver used: Pardiso")
register_solver("accelerate", DirectSolver,
                "Solver used: Apple Accelerate")


def get_solver(cfg):
    """src/core.jl:74-94 (registry-backed)."""
    entry = _SOLVER_REGISTRY.get(str(cfg.solver).lower())
    if entry is None:
        raise ValueError(f"Unknown solver: {cfg.solver}")
    factory, message = entry
    if message:
        cslog.info(message)
    return factory(cfg)
