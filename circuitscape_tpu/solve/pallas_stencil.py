"""Pallas TPU kernel for the stencil Laplacian matvec.

The XLA formulation (solve/stencil.py stencil_matvec) lowers to ~17
pad/slice multiply-adds that XLA fuses into several HBM passes; this
kernel performs y = L x in ONE main pass per operand: each grid step
DMAs a halo'd slab of x from HBM into VMEM, applies all eight neighbor
contributions in-register, and writes the y slab.  Weight planes flow
through the normal block pipeline; because the grid iterates batch
fastest, their blocks are reused across batch steps without re-fetch.

Mosaic constraints shape the design (discovered on real-TPU compiles):
`tpu.dynamic_rotate` rejects unaligned row counts and `tpu.concatenate`
rejects mixed sublane offsets, so the kernel contains NO shifts and NO
concats — only STATIC slices.  Instead, the input x is pre-padded with
one zero row/column on each side (plus zero rows to a ROWS multiple),
so each of the nine neighbor reads x[g+dr, j+dc] is a static slice of
the halo'd VMEM slab, and the zero padding reproduces the operator's
zero-fill boundary semantics exactly.  Every weight the kernel needs is
pre-expanded AT BUILD TIME to its output-aligned copy (e.g. the West
term -we[g, j-1]*x[g, j-1] uses the pre-shifted plane
we_w[g, j] = we[g, j-1]), so plane reads never shift either:

  y[g,j] = diag*x[g,j]
         - we   *x[g,  j+1] - we_w  *x[g,  j-1]     (E, W)
         - ws   *x[g+1,j  ] - ws_up *x[g-1,j  ]     (S, N)
         - wse  *x[g+1,j+1] - wse_uw*x[g-1,j-1]     (SE, NW)
         - wne  *x[g-1,j+1] - wne_dw*x[g+1,j-1]     (NE, SW)
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import StencilOperator

BBLK = 4     # batch columns per grid step (VMEM budgets assume this)


def _bblk_for(B: int) -> int:
    """Batch columns per grid step for a batch of B: 4 when it divides,
    else the largest of 2/1 that does.  Capacity-limited chunked jobs
    run B=1 (e.g. the 48M-cell single-chip row), and a hard
    B %% 4 == 0 gate silently dropped them to the XLA matvec."""
    for c in (4, 2, 1):
        if B % c == 0:
            return c
    return 1

# Wide grids (W > 4094) tile the column dimension: fixed (rows, ctile)
# whose VMEM footprint is W-independent.  Each column tile DMAs a
# 128-lane-aligned superset of its +-1 column halo (offset k*ctile,
# width ctile+256), so every neighbor read stays a static slice.
CTILE = 2048
CROWS = 16


def _ctile_for(W: int) -> int:
    """Column tile for a wide (W > 4094) grid: the largest 128-multiple
    <= CTILE that divides the 128-padded width EXACTLY, if one exists
    >= 512 — zero column padding (a fixed 2048 tile padded W=7040 to
    8192, and the +16%% on every padded temporary inside the CG loop
    tipped the 48M-cell single-chip job out of HBM).  Falls back to
    CTILE (with padding) when no such divisor exists."""
    w128 = -(-W // 128) * 128
    n = w128 // 128
    for t in range(min(n, CTILE // 128), 3, -1):
        if n % t == 0:
            return t * 128
    return CTILE


def _pick_rows(W: int) -> int:
    """Largest row-slab height whose VMEM footprint (9 double-buffered
    plane blocks + double-buffered out block + 2-slot halo scratch +
    Mosaic compute temporaries for the 9-term accumulation) stays well
    under the 16 MB scoped-vmem limit.  Returns 0 if no slab height
    fits — the caller must fall back to the XLA matvec.  (The temporary
    term and the 8 MB budget were calibrated against a real-chip
    compile failure: at W=2450, rows=32 the compiler reported an
    18.1 MB scoped allocation against the naive 10 MB estimate.)"""
    Wp2 = -(-(W + 2) // 128) * 128
    for rows in (128, 64, 32, 16, 8):
        vmem = (9 * 2 * rows * W * 4 +              # plane blocks
                2 * BBLK * rows * W * 4 +           # out blocks
                2 * BBLK * (rows + 16) * Wp2 * 4 +  # halo scratch x2
                4 * BBLK * rows * W * 4)            # accumulation temps
        if vmem <= 8 * 2**20:
            return rows
    return 0


def _halo_dma_double_buffered(src_hbm, xs, sem, *, rows, tiled, bblk,
                              ctile=CTILE):
    """Start/await the halo'd x-slab DMA with two VMEM slots.

    The manual halo copy is the one transfer Mosaic's block pipeline
    can't schedule for us; a serial start->wait per grid step leaves the
    DMA latency on the critical path (measured ~6 us/step at 1M cells —
    the kernel ran at ~16% of HBM speed-of-light).  Instead each step
    issues the NEXT step's copy into the other slot before computing,
    so the transfer overlaps this step's compute exactly like the
    pipelined plane/out blocks.  Returns the current step's slab ref.

    Grid order is batch-fastest: step = (((i) * NK + k) * NJ + j) in
    tiled mode, i * NJ + j otherwise."""
    i = pl.program_id(0)
    if tiled:
        k = pl.program_id(1)
        j = pl.program_id(2)
        nk, nj = pl.num_programs(1), pl.num_programs(2)
        step = (i * nk + k) * nj + j
        nsteps = pl.num_programs(0) * nk * nj
    else:
        k = 0
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        step = i * nj + j
        nsteps = pl.num_programs(0) * nj
    # dynamic scratch/semaphore indices must be STRONG int32: weak
    # Python-int arithmetic promotes to i64 under x64 and Mosaic's
    # convert-element-type lowering recurses on scalar i64 (observed as
    # RecursionError at compile on the real chip)
    slot = jax.lax.rem(step, np.int32(2))

    def src_for(ii, kk, jj):
        # halo'd slab: rows [ii*rows, ii*rows + rows + 16) of the padded
        # input (x row g lives at padded row g+8, so the slab is 8-row
        # aligned in both offset and height — a Mosaic DMA-slice
        # requirement).  In tiled mode the slab additionally selects
        # columns [kk*ctile, kk*ctile + ctile + 256): a 128-aligned
        # offset/width containing the +-1 column halo (x col c lives at
        # padded col c+128).
        if tiled:
            return src_hbm.at[pl.ds(jj * bblk, bblk),
                              pl.ds(ii * rows, rows + 16),
                              pl.ds(kk * ctile, ctile + 256)]
        return src_hbm.at[pl.ds(jj * bblk, bblk),
                          pl.ds(ii * rows, rows + 16)]

    @pl.when(step == 0)
    def _():
        pltpu.make_async_copy(src_for(i, k, j),
                              xs.at[slot], sem.at[slot]).start()

    @pl.when(step + 1 < nsteps)
    def _():
        one, zero = np.int32(1), np.int32(0)
        jn = j + one
        wrapj = jn == nj
        jj = jnp.where(wrapj, zero, jn)
        if tiled:
            kn = jnp.where(wrapj, k + one, k + zero)
            wrapk = kn == nk
            kk = jnp.where(wrapk, zero, kn)
            ii = jnp.where(wrapk, i + one, i + zero)
        else:
            kk = zero
            ii = jnp.where(wrapj, i + one, i + zero)
        other = one - slot
        pltpu.make_async_copy(src_for(ii, kk, jj),
                              xs.at[other], sem.at[other]).start()

    pltpu.make_async_copy(src_for(i, k, j),
                          xs.at[slot], sem.at[slot]).wait()
    return xs[slot]


def _kernel(xp_hbm, ps, y_ref, xs, sem, *, rows, tiled, bblk=BBLK,
            ctile=CTILE):
    b = _halo_dma_double_buffered(xp_hbm, xs, sem, rows=rows,
                                  tiled=tiled, bblk=bblk, ctile=ctile)
    # b: (BBLK, rows+16, Wp2 | CTILE+256); ps: (9, rows, W) stacked
    # planes in PLANE_ORDER — one operand instead of nine keeps the
    # per-grid-step descriptor work off the critical path
    W = y_ref.shape[2]
    choff = 128 if tiled else 1     # slab column of output column 0

    def at(dr, dc):
        """x[g+dr, j+dc] as a static slice (output-aligned)."""
        return b[:, 8 + dr:8 + dr + rows, choff + dc:choff + dc + W]

    (we, we_w, ws, ws_up, wse, wse_uw, wne, wne_dw, diag) = (
        ps[t] for t in range(9))
    y = diag[None] * at(0, 0)
    y -= we[None] * at(0, 1) + we_w[None] * at(0, -1)
    y -= ws[None] * at(1, 0) + ws_up[None] * at(-1, 0)
    y -= wse[None] * at(1, 1) + wse_uw[None] * at(-1, -1)
    y -= wne[None] * at(-1, 1) + wne_dw[None] * at(1, -1)
    y_ref[:] = y


@jax.tree_util.register_pytree_node_class
class PallasStencil:
    """Pre-expanded plane set for the Pallas matvec: all eight neighbor
    weights shifted to output-aligned copies, stacked into ONE
    (9, Hp, Wp) array in PLANE_ORDER, rows padded to a ROWS multiple,
    at build time (once per solve — the per-iteration matvec touches
    only x).  A single stacked operand replaces nine separate plane
    operands in the pallas_call: the kernel grid spends ~7 us/step of
    fixed bookkeeping that scales with operand count."""

    def __init__(self, planes, H=None, W=None, init_planes=None):
        self.planes = planes          # (9, Hp, Wp), PLANE_ORDER
        self.init_planes = init_planes   # (9, Hp, Wp) Dinv-premultiplied
        self.H = H if H is not None else planes.shape[1]
        self.W = W if W is not None else planes.shape[2]

    def tree_flatten(self):
        return ((self.planes, self.init_planes), (self.H, self.W))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], H=aux[0], W=aux[1],
                   init_planes=children[1])

    @property
    def shape(self):
        return (self.H, self.W)

    @classmethod
    def from_operator(cls, S: StencilOperator,
                      with_init=False) -> "PallasStencil":
        H, W = S.diag.shape
        init = None
        if with_init:
            inv = jnp.where(S.diag > 0,
                            1.0 / jnp.where(S.diag == 0, 1.0, S.diag),
                            0.0)
            init = _expand_planes_dinv(S.we, S.ws, S.wse, S.wne, S.diag,
                                       inv)
        return cls(_expand_planes(S.we, S.ws, S.wse, S.wne, S.diag),
                   H=H, W=W, init_planes=init)


PLANE_ORDER = ("we", "we_w", "ws", "ws_up", "wse", "wse_uw",
               "wne", "wne_dw", "diag")


@jax.jit
def _expand_planes(we, ws, wse, wne, diag):
    """All nine output-aligned planes in ONE device dispatch (eager
    per-plane pads/concats cost a ~40 ms host roundtrip each on a
    tunneled TPU — 15+ dispatches per hierarchy level added seconds to
    every job)."""
    H, W = diag.shape
    # pad to a 128-row multiple so every _pick_rows choice divides;
    # wide grids also pad columns to the CTILE quantum for the
    # column-tiled kernel (padding weights are zero => zero terms)
    Hp = pl.cdiv(H, 128) * 128
    ct = _ctile_for(W)
    Wp = pl.cdiv(W, ct) * ct if W > 4094 else W

    def padH(p):
        return jnp.pad(p, ((0, Hp - H), (0, Wp - W)))

    def up(p):   # p[r] <- p[r-1]
        return jnp.concatenate([jnp.zeros_like(p[:1]), p[:-1]], axis=0)

    def dn(p):   # p[r] <- p[r+1]
        return jnp.concatenate([p[1:], jnp.zeros_like(p[:1])], axis=0)

    def west(p):  # p[:, j] <- p[:, j-1]
        return jnp.concatenate([jnp.zeros_like(p[:, :1]), p[:, :-1]],
                               axis=1)

    we, ws, wse, wne, diag = (padH(we), padH(ws), padH(wse), padH(wne),
                              padH(diag))
    return jnp.stack([we, west(we), ws, up(ws), wse, west(up(wse)),
                      wne, west(dn(wne)), diag])


# --- fused Chebyshev smoother step --------------------------------------
#
# One V(1,1) geo-MG cycle spends most of its fine-level HBM traffic in
# the Chebyshev recurrence: r' = r - L d; d' = ca*d + cb*Dinv*r';
# x' = x + d'.  Expressed as XLA ops that is a Pallas matvec plus ~5
# unfused full-grid elementwise passes; this kernel performs the whole
# step in ONE pass per operand (reads r, d, x + planes, writes
# r', d', x').  Measured V-cycle apply at (32, 1024, 1024) f32 drops
# ~17.4 ms -> ~10 ms (solve/geomg.py _cheb_smooth dispatches here).
#
# Batch blocking is CBBLK=2 (CBBLK=1 for odd batches) — the three
# in/out streams triple the VMEM of the matvec kernel, so the batch
# tile shrinks to fit the same 8 MB budget.

def _cheb_rows(W: int, cbblk: int) -> int:
    """Row-slab height for the cheb kernel at width W (0 = no fit)."""
    Wp2 = -(-(W + 2) // 128) * 128
    for rows in (32, 16, 8):
        vmem = (10 * 2 * rows * W * 4 +            # planes + dinv
                2 * 2 * cbblk * rows * W * 4 +     # r, x in
                3 * 2 * cbblk * rows * W * 4 +     # r', d', x' out
                2 * cbblk * (rows + 16) * Wp2 * 4 +  # d halo scratch x2
                4 * cbblk * rows * W * 4)          # compute temps
        if vmem <= 8 * 2**20:
            return rows
    return 0


def _cheb_kernel(dp_hbm, r_ref, x_ref, ps, dinv, ro_ref, do_ref, xo_ref,
                 ds, sem, *, rows, tiled, cbblk, ca, cb, ctile=CTILE):
    b = _halo_dma_double_buffered(dp_hbm, ds, sem, rows=rows,
                                  tiled=tiled, bblk=cbblk, ctile=ctile)
    W = ro_ref.shape[2]
    choff = 128 if tiled else 1

    def at(dr, dc):
        return b[:, 8 + dr:8 + dr + rows, choff + dc:choff + dc + W]

    (we, we_w, ws, ws_up, wse, wse_uw, wne, wne_dw, diag) = (
        ps[t] for t in range(9))
    t = diag[None] * at(0, 0)
    t -= we[None] * at(0, 1) + we_w[None] * at(0, -1)
    t -= ws[None] * at(1, 0) + ws_up[None] * at(-1, 0)
    t -= wse[None] * at(1, 1) + wse_uw[None] * at(-1, -1)
    t -= wne[None] * at(-1, 1) + wne_dw[None] * at(1, -1)
    r_new = r_ref[:] - t
    d_new = ca * at(0, 0) + cb * (dinv[:][None] * r_new)
    ro_ref[:] = r_new
    do_ref[:] = d_new
    xo_ref[:] = x_ref[:] + d_new


def cheb_supported(S_shape, B) -> bool:
    H, W = S_shape
    if H < 64 or B < 1:
        return False
    if W <= 4094:
        return _cheb_rows(W, 2 if B % 2 == 0 else 1) > 0
    return True          # column-tiled variant, fixed footprint


@functools.partial(jax.jit, static_argnames=("ca", "cb", "interpret"))
def pallas_cheb_step(P: PallasStencil, dinv: jnp.ndarray, r: jnp.ndarray,
                     d: jnp.ndarray, x: jnp.ndarray, ca: float, cb: float,
                     interpret: bool = False):
    """(r - L d, ca*d + cb*Dinv*(r - L d), x + d') in one fused pass.

    dinv is the level's (H, W) inverse diagonal (zero on empty cells).
    ca/cb are the Chebyshev recurrence constants — python floats, baked
    in at trace time (they derive from the static lam_max)."""
    B, H, W = r.shape
    Hp, Wplanes = P.planes.shape[1:]
    cbblk = 2 if B % 2 == 0 else 1
    zero = np.int32(0)

    dinv_p = jnp.pad(dinv, ((0, Hp - H), (0, Wplanes - W)))
    padHW = lambda a: jnp.pad(a, ((0, 0), (0, Hp - H), (0, Wplanes - W)))

    if W > 4094:
        rows = CROWS
        ct = _ctile_for(W)
        Wp = Wplanes
        dp = jnp.pad(d, ((0, 0), (8, Hp - H + 8), (128, 128 + Wp - W)))
        rp, xp = padHW(r), padHW(x)
        grid = (Hp // rows, Wp // ct, B // cbblk)
        plane_spec = pl.BlockSpec((rows, ct), lambda i, k, j: (i, k),
                                  memory_space=pltpu.VMEM)
        planes_spec = pl.BlockSpec((9, rows, ct),
                                   lambda i, k, j: (zero, i, k),
                                   memory_space=pltpu.VMEM)
        io_spec = pl.BlockSpec((cbblk, rows, ct),
                               lambda i, k, j: (j, i, k),
                               memory_space=pltpu.VMEM)
        scratch = pltpu.VMEM((2, cbblk, rows + 16, ct + 256), r.dtype)
        out_sh = jax.ShapeDtypeStruct((B, Hp, Wp), r.dtype)
        tiled = True
    else:
        Wp2 = pl.cdiv(W + 2, 128) * 128
        rows = _cheb_rows(W, cbblk)
        dp = jnp.pad(d, ((0, 0), (8, Hp - H + 8), (1, Wp2 - W - 1)))
        rp, xp = padHW(r), padHW(x)
        grid = (Hp // rows, B // cbblk)
        plane_spec = pl.BlockSpec((rows, W), lambda i, j: (i, zero),
                                  memory_space=pltpu.VMEM)
        planes_spec = pl.BlockSpec((9, rows, W),
                                   lambda i, j: (zero, i, zero),
                                   memory_space=pltpu.VMEM)
        io_spec = pl.BlockSpec((cbblk, rows, W), lambda i, j: (j, i, zero),
                               memory_space=pltpu.VMEM)
        scratch = pltpu.VMEM((2, cbblk, rows + 16, Wp2), r.dtype)
        out_sh = jax.ShapeDtypeStruct((B, Hp, W), r.dtype)
        tiled = False

    ro, do, xo = pl.pallas_call(
        functools.partial(_cheb_kernel, rows=rows, tiled=tiled,
                          cbblk=cbblk, ca=ca, cb=cb,
                          ctile=_ctile_for(W) if tiled else CTILE),
        out_shape=(out_sh, out_sh, out_sh),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # d, manual halo DMA
            io_spec, io_spec,                    # r, x
            planes_spec,                         # 9 stacked planes
            plane_spec,                          # dinv
        ],
        out_specs=(io_spec, io_spec, io_spec),
        scratch_shapes=[scratch, pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(dp, rp, xp, P.planes, dinv_p)
    return ro[:, :H, :W], do[:, :H, :W], xo[:, :H, :W]


def supported(S_shape, B) -> bool:
    H, W = S_shape
    if H < 64 or B < 1:
        return False
    if W <= 4094:
        return _pick_rows(W) > 0
    # column-tiled kernel: fixed (CROWS, CTILE) footprint, any width
    return True


# --- fused from-zero Chebyshev pre-smoother -----------------------------
#
# The V-cycle's pre-smooth starts from x = 0:
#   d1 = (1/theta) Dinv b;  r1 = b - L d1;  x = d1 + ca*d1 + cb*Dinv*r1
# As XLA + the generic fused step that is a Dinv pass plus a full
# matvec+update pass over d1.  Keyed on L(Dinv b) being expressible
# with PRE-MULTIPLIED planes (w~_delta[j] = w_delta[j] * Dinv[j+delta],
# diag~ = diag*Dinv), the whole pre-smooth becomes ONE pass that reads
# only b (halo'd), the 9 premultiplied planes, and Dinv, and writes x.

@jax.jit
def _expand_planes_dinv(we, ws, wse, wne, diag, inv):
    """The nine output-aligned planes of L premultiplied by the SHIFTED
    inverse diagonal: stacking[t][j] = plane_t[j] * Dinv[j+delta_t]
    (diag slot: diag[j]*Dinv[j])."""
    H, W = diag.shape
    Hp = pl.cdiv(H, 128) * 128
    ct = _ctile_for(W)
    Wp = pl.cdiv(W, ct) * ct if W > 4094 else W

    def padH(p):
        return jnp.pad(p, ((0, Hp - H), (0, Wp - W)))

    def up(p):
        return jnp.concatenate([jnp.zeros_like(p[:1]), p[:-1]], axis=0)

    def dn(p):
        return jnp.concatenate([p[1:], jnp.zeros_like(p[:1])], axis=0)

    def west(p):
        return jnp.concatenate([jnp.zeros_like(p[:, :1]), p[:, :-1]],
                               axis=1)

    def east(p):
        return jnp.concatenate([p[:, 1:], jnp.zeros_like(p[:, :1])],
                               axis=1)

    we, ws, wse, wne, diag, inv = map(padH, (we, ws, wse, wne, diag, inv))
    # neighbor Dinv at the source cell for each term's read offset
    return jnp.stack([
        we * east(inv),              # E  reads x[j, +1]
        west(we) * west(inv),        # W  reads x[j, -1]
        ws * dn(inv),                # S  reads x[+1, j]
        up(ws) * up(inv),            # N  reads x[-1, j]
        wse * dn(east(inv)),         # SE reads x[+1, +1]
        west(up(wse)) * up(west(inv)),   # NW reads x[-1, -1]
        wne * up(east(inv)),         # NE reads x[-1, +1]
        west(dn(wne)) * dn(west(inv)),   # SW reads x[+1, -1]
        diag * inv,                  # center
    ])


def _cheb_init_kernel(bp_hbm, ps, dinv, x_ref, xs, sem, *, rows, c, ca,
                      cb, bblk=BBLK):
    blk = _halo_dma_double_buffered(bp_hbm, xs, sem, rows=rows,
                                    tiled=False, bblk=bblk)
    W = x_ref.shape[2]

    def at(dr, dc):
        return blk[:, 8 + dr:8 + dr + rows, 1 + dc:1 + dc + W]

    (wE, wW, wS, wN, wSE, wNW, wNE, wSW, dd) = (ps[t] for t in range(9))
    b = at(0, 0)
    # L (Dinv b) via the premultiplied planes
    ldb = dd[None] * b
    ldb -= wE[None] * at(0, 1) + wW[None] * at(0, -1)
    ldb -= wS[None] * at(1, 0) + wN[None] * at(-1, 0)
    ldb -= wSE[None] * at(1, 1) + wNW[None] * at(-1, -1)
    ldb -= wNE[None] * at(-1, 1) + wSW[None] * at(1, -1)
    r1 = b - c * ldb
    iv = dinv[:][None]
    x_ref[:] = (1.0 + ca) * c * (iv * b) + cb * (iv * r1)


def cheb_init_supported(S_shape, B) -> bool:
    H, W = S_shape
    return (H >= 64 and B >= 1 and W <= 4094 and _pick_rows(W) > 0)


@functools.partial(jax.jit, static_argnames=("c", "ca", "cb",
                                             "interpret"))
def pallas_cheb_init(init_planes: jnp.ndarray, dinv: jnp.ndarray,
                     b: jnp.ndarray, c: float, ca: float, cb: float,
                     interpret: bool = False) -> jnp.ndarray:
    """Degree-2 Chebyshev smoother from x = 0 in ONE pass: returns
    x = (1+ca)*c*Dinv b + cb*Dinv (b - c*L Dinv b)."""
    B, H, W = b.shape
    Hp, Wplanes = init_planes.shape[1:]
    zero = np.int32(0)
    Wp2 = pl.cdiv(W + 2, 128) * 128
    rows = _pick_rows(W)
    bp = jnp.pad(b, ((0, 0), (8, Hp - H + 8), (1, Wp2 - W - 1)))
    dinv_p = jnp.pad(dinv, ((0, Hp - H), (0, Wplanes - W)))
    bblk = _bblk_for(B)
    grid = (Hp // rows, B // bblk)
    planes_spec = pl.BlockSpec((9, rows, W),
                               lambda i, j: (zero, i, zero),
                               memory_space=pltpu.VMEM)
    dinv_spec = pl.BlockSpec((rows, W), lambda i, j: (i, zero),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bblk, rows, W), lambda i, j: (j, i, zero),
                            memory_space=pltpu.VMEM)
    x = pl.pallas_call(
        functools.partial(_cheb_init_kernel, rows=rows, c=c, ca=ca,
                          cb=cb, bblk=bblk),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W), b.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # b, manual halo DMA
            planes_spec,
            dinv_spec,
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, bblk, rows + 16, Wp2), b.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(bp, init_planes, dinv_p)
    return x[:, :H, :W]


# --- fused warm (post-)smoother: two passes ------------------------------
#
# The degree-2 smoother FROM x (the V-cycle post-smooth) needs two
# stencil applications (r0 = b - L x, then L d1).  Two fused passes:
#   pass 1 (residual+init): r0 = b - L x;  x1 = x + c*Dinv*r0
#   pass 2 (finish):        r1 = r0 - c*L(Dinv r0)   [premult planes]
#                           x2 = x1 + ca*c*Dinv*r0 + cb*Dinv*r1
# replacing a matvec + subtract + the generic 3-in/3-out fused step
# (4.3 ms -> ~2.5 ms at 1M x 32).

def _smooth_rows(W: int) -> int:
    """Row-slab height for the two warm-smoother kernels (0 = no fit);
    sized for the heavier pass (9 planes + 2 streamed ins + 2 outs)."""
    Wp2 = -(-(W + 2) // 128) * 128
    for rows in (64, 32, 16):
        vmem = (9 * 2 * rows * W * 4 +               # plane blocks
                2 * 2 * rows * W * 4 +               # dinv + b/x1 in
                2 * 2 * BBLK * rows * W * 4 +        # two out streams
                2 * BBLK * (rows + 16) * Wp2 * 4 +   # halo scratch x2
                5 * BBLK * rows * W * 4)             # compute temps
        if vmem <= 8 * 2**20:
            return rows
    return 0


def warm_smooth_supported(S_shape, B) -> bool:
    H, W = S_shape
    return (H >= 64 and B >= 1 and W <= 4094 and _smooth_rows(W) > 0)


def _res_init_kernel(xp_hbm, b_ref, ps, dinv, r_ref, x1_ref, xs, sem, *,
                     rows, c, bblk=BBLK):
    blk = _halo_dma_double_buffered(xp_hbm, xs, sem, rows=rows,
                                    tiled=False, bblk=bblk)
    W = r_ref.shape[2]

    def at(dr, dc):
        return blk[:, 8 + dr:8 + dr + rows, 1 + dc:1 + dc + W]

    (we, we_w, ws, ws_up, wse, wse_uw, wne, wne_dw, diag) = (
        ps[t] for t in range(9))
    x = at(0, 0)
    y = diag[None] * x
    y -= we[None] * at(0, 1) + we_w[None] * at(0, -1)
    y -= ws[None] * at(1, 0) + ws_up[None] * at(-1, 0)
    y -= wse[None] * at(1, 1) + wse_uw[None] * at(-1, -1)
    y -= wne[None] * at(-1, 1) + wne_dw[None] * at(1, -1)
    r = b_ref[:] - y
    r_ref[:] = r
    x1_ref[:] = x + c * (dinv[:][None] * r)


def _cheb_fin_kernel(rp_hbm, x1_ref, ps, dinv, x2_ref, xs, sem, *,
                     rows, c, ca, cb, bblk=BBLK):
    blk = _halo_dma_double_buffered(rp_hbm, xs, sem, rows=rows,
                                    tiled=False, bblk=bblk)
    W = x2_ref.shape[2]

    def at(dr, dc):
        return blk[:, 8 + dr:8 + dr + rows, 1 + dc:1 + dc + W]

    (wE, wW, wS, wN, wSE, wNW, wNE, wSW, dd) = (ps[t] for t in range(9))
    r0 = at(0, 0)
    ldr = dd[None] * r0
    ldr -= wE[None] * at(0, 1) + wW[None] * at(0, -1)
    ldr -= wS[None] * at(1, 0) + wN[None] * at(-1, 0)
    ldr -= wSE[None] * at(1, 1) + wNW[None] * at(-1, -1)
    ldr -= wNE[None] * at(-1, 1) + wSW[None] * at(1, -1)
    r1 = r0 - c * ldr
    iv = dinv[:][None]
    x2_ref[:] = x1_ref[:] + ca * c * (iv * r0) + cb * (iv * r1)


def _warm_specs(P, shape3, rows, bblk):
    B, H, W = shape3
    Hp = P.planes.shape[1]
    zero = np.int32(0)
    planes_spec = pl.BlockSpec((9, rows, W),
                               lambda i, j: (zero, i, zero),
                               memory_space=pltpu.VMEM)
    dinv_spec = pl.BlockSpec((rows, W), lambda i, j: (i, zero),
                             memory_space=pltpu.VMEM)
    io_spec = pl.BlockSpec((bblk, rows, W), lambda i, j: (j, i, zero),
                           memory_space=pltpu.VMEM)
    return Hp, planes_spec, dinv_spec, io_spec


@functools.partial(jax.jit, static_argnames=("c", "interpret"))
def pallas_residual_init(P: PallasStencil, dinv, b, x, c: float,
                         interpret: bool = False):
    """(b - L x, x + c*Dinv*(b - L x)) in one pass."""
    B, H, W = x.shape
    rows = _smooth_rows(W)
    bblk = _bblk_for(B)
    Hp, planes_spec, dinv_spec, io_spec = _warm_specs(P, x.shape, rows,
                                                      bblk)
    Wp2 = pl.cdiv(W + 2, 128) * 128
    xp = jnp.pad(x, ((0, 0), (8, Hp - H + 8), (1, Wp2 - W - 1)))
    bp = jnp.pad(b, ((0, 0), (0, Hp - H), (0, 0)))
    dinv_p = jnp.pad(dinv, ((0, Hp - H), (0, 0)))
    out_sh = jax.ShapeDtypeStruct((B, Hp, W), x.dtype)
    r, x1 = pl.pallas_call(
        functools.partial(_res_init_kernel, rows=rows, c=c, bblk=bblk),
        out_shape=(out_sh, out_sh),
        grid=(Hp // rows, B // bblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), io_spec,
                  planes_spec, dinv_spec],
        out_specs=(io_spec, io_spec),
        scratch_shapes=[pltpu.VMEM((2, bblk, rows + 16, Wp2), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(xp, bp, P.planes, dinv_p)
    return r[:, :H, :W], x1[:, :H, :W]


@functools.partial(jax.jit, static_argnames=("c", "ca", "cb",
                                             "interpret"))
def pallas_cheb_finish(init_planes, dinv, r0, x1, c: float, ca: float,
                       cb: float, interpret: bool = False):
    """x1 + ca*c*Dinv*r0 + cb*Dinv*(r0 - c*L(Dinv r0)) in one pass."""
    B, H, W = r0.shape
    rows = _smooth_rows(W)
    bblk = _bblk_for(B)
    Hp = init_planes.shape[1]
    zero = np.int32(0)
    planes_spec = pl.BlockSpec((9, rows, W),
                               lambda i, j: (zero, i, zero),
                               memory_space=pltpu.VMEM)
    dinv_spec = pl.BlockSpec((rows, W), lambda i, j: (i, zero),
                             memory_space=pltpu.VMEM)
    io_spec = pl.BlockSpec((bblk, rows, W), lambda i, j: (j, i, zero),
                           memory_space=pltpu.VMEM)
    Wp2 = pl.cdiv(W + 2, 128) * 128
    rp = jnp.pad(r0, ((0, 0), (8, Hp - H + 8), (1, Wp2 - W - 1)))
    x1p = jnp.pad(x1, ((0, 0), (0, Hp - H), (0, 0)))
    dinv_p = jnp.pad(dinv, ((0, Hp - H), (0, 0)))
    x2 = pl.pallas_call(
        functools.partial(_cheb_fin_kernel, rows=rows, c=c, ca=ca,
                          cb=cb, bblk=bblk),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W), r0.dtype),
        grid=(Hp // rows, B // bblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), io_spec,
                  planes_spec, dinv_spec],
        out_specs=io_spec,
        scratch_shapes=[pltpu.VMEM((2, bblk, rows + 16, Wp2), r0.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(rp, x1p, init_planes, dinv_p)
    return x2[:, :H, :W]


# --- fused residual + restrict ------------------------------------------
#
# The V-cycle's pre-smooth residual exists only to be restricted:
# rc = restrict(b - L x).  Computing r with the matvec kernel and
# restricting in XLA writes the full-size r to HBM and reads it back
# (~2 full passes); this kernel consumes the residual in VMEM and
# writes only the quarter-size coarse block.

def _rr_rows(W: int) -> int:
    """Row-slab height for the residual+restrict kernel (0 = no fit).
    Streams one more full-size block (b) than the matvec kernel and a
    quarter-size output."""
    Wp2 = -(-(W + 2) // 128) * 128
    for rows in (64, 32, 16):
        vmem = (9 * 2 * rows * W * 4 +               # plane blocks
                2 * BBLK * rows * W * 4 +            # b blocks
                2 * BBLK * (rows // 2) * (W // 2) * 4 +  # out blocks
                2 * BBLK * (rows + 16) * Wp2 * 4 +   # halo scratch x2
                5 * BBLK * rows * W * 4)             # compute temps
        if vmem <= 8 * 2**20:
            return rows
    return 0


def rr_supported(S_shape, B) -> bool:
    H, W = S_shape
    return (H >= 64 and B >= 1 and H % 2 == 0 and
            W % 256 == 0 and W <= 4094 and _rr_rows(W) > 0)


def _rr_kernel(xp_hbm, b_ref, ps, ec_ref, er_ref, rc_ref, xs, sem, *,
               rows, bblk=BBLK):
    blk = _halo_dma_double_buffered(xp_hbm, xs, sem, rows=rows,
                                    tiled=False, bblk=bblk)
    W = b_ref.shape[2]

    def at(dr, dc):
        return blk[:, 8 + dr:8 + dr + rows, 1 + dc:1 + dc + W]

    (we, we_w, ws, ws_up, wse, wse_uw, wne, wne_dw, diag) = (
        ps[t] for t in range(9))
    r = b_ref[:] - diag[None] * at(0, 0)
    r += we[None] * at(0, 1) + we_w[None] * at(0, -1)
    r += ws[None] * at(1, 0) + ws_up[None] * at(-1, 0)
    r += wse[None] * at(1, 1) + wse_uw[None] * at(-1, -1)
    r += wne[None] * at(-1, 1) + wne_dw[None] * at(1, -1)
    # 2x2 patch sum via 0/1 selector matmuls on the MXU: Mosaic has no
    # stride-2 slice (gather is 2D-only and shape-preserving), but the
    # pair-sum IS a contraction — Er @ r pairs sublanes, and lane pairs
    # contract 256-lane input tiles to 128-lane output tiles with one
    # small (256, 128) selector, so every store stays 128-aligned.
    # Total MXU work ~0.3 ms per fine V-cycle at 1M x 32.
    ec = ec_ref[:]          # (256, 128) lane-pair selector
    er = er_ref[:]          # (rows//2, rows) sublane-pair selector
    # HIGHEST precision: the default MXU path truncates f32 operands to
    # bf16 (measured 6e-3 relative error in the restricted residual)
    hp = jax.lax.Precision.HIGHEST
    for k in range(r.shape[0]):
        q = jnp.dot(er, r[k], preferred_element_type=jnp.float32,
                    precision=hp)
        for t in range(W // 256):
            rc_ref[k, :, t * 128:(t + 1) * 128] = jnp.dot(
                q[:, t * 256:(t + 1) * 256], ec,
                preferred_element_type=jnp.float32, precision=hp)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_residual_restrict(P: PallasStencil, b: jnp.ndarray,
                             x: jnp.ndarray,
                             interpret: bool = False) -> jnp.ndarray:
    """restrict(b - L x) for (B, H, W) blocks in one pass; H, W even.
    Output is (B, H//2, W//2)."""
    B, H, W = x.shape
    Hp, Wplanes = P.planes.shape[1:]
    zero = np.int32(0)
    Wp2 = pl.cdiv(W + 2, 128) * 128
    rows = _rr_rows(W)
    xp = jnp.pad(x, ((0, 0), (8, Hp - H + 8), (1, Wp2 - W - 1)))
    bp = jnp.pad(b, ((0, 0), (0, Hp - H), (0, 0)))
    bblk = _bblk_for(B)
    grid = (Hp // rows, B // bblk)
    # 0/1 pair-sum selectors (see _rr_kernel)
    ec = jnp.zeros((256, 128), x.dtype).at[
        jnp.arange(256), jnp.arange(256) // 2].set(1.0)
    er = jnp.zeros((rows // 2, rows), x.dtype).at[
        jnp.arange(rows) // 2, jnp.arange(rows)].set(1.0)
    planes_spec = pl.BlockSpec((9, rows, W),
                               lambda i, j: (zero, i, zero),
                               memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((bblk, rows, W), lambda i, j: (j, i, zero),
                          memory_space=pltpu.VMEM)
    ec_spec = pl.BlockSpec((256, 128), lambda i, j: (zero, zero),
                           memory_space=pltpu.VMEM)
    er_spec = pl.BlockSpec((rows // 2, rows), lambda i, j: (zero, zero),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bblk, rows // 2, W // 2),
                            lambda i, j: (j, i, zero),
                            memory_space=pltpu.VMEM)
    rc = pl.pallas_call(
        functools.partial(_rr_kernel, rows=rows, bblk=bblk),
        out_shape=jax.ShapeDtypeStruct((B, Hp // 2, W // 2), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x, manual halo DMA
            b_spec,
            planes_spec,
            ec_spec,
            er_spec,
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, bblk, rows + 16, Wp2), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, bp, P.planes, ec, er)
    return rc[:, :H // 2, :]


# --- fused matvec + partial pAp dot -------------------------------------
#
# The CG loop needs pAp = sum(P * (L P)) right after the matvec; as XLA
# ops that is one extra full read pass over P and AP.  This variant of
# the matvec kernel also emits per-(slab, batch-block) partial dots,
# reduced by a tiny XLA sum over the slab axis.

def _mv_dot_kernel(xp_hbm, ps, y_ref, pp_ref, xs, sem, *, rows, tiled,
                   bblk=BBLK):
    b = _halo_dma_double_buffered(xp_hbm, xs, sem, rows=rows,
                                  tiled=tiled, bblk=bblk)
    W = y_ref.shape[2]
    choff = 128 if tiled else 1

    def at(dr, dc):
        return b[:, 8 + dr:8 + dr + rows, choff + dc:choff + dc + W]

    (we, we_w, ws, ws_up, wse, wse_uw, wne, wne_dw, diag) = (
        ps[t] for t in range(9))
    xc = at(0, 0)
    y = diag[None] * xc
    y -= we[None] * at(0, 1) + we_w[None] * at(0, -1)
    y -= ws[None] * at(1, 0) + ws_up[None] * at(-1, 0)
    y -= wse[None] * at(1, 1) + wse_uw[None] * at(-1, -1)
    y -= wne[None] * at(-1, 1) + wne_dw[None] * at(1, -1)
    y_ref[:] = y
    # per-step partials land in an (8, 128) tile-aligned slot per grid
    # step (sub-tile dynamic stores crash the Mosaic layout pass); the
    # caller sums slots and strips the padding
    # keep every intermediate a plain 2D tile (1D values and small
    # (bblk, N) shapes crash or mis-relayout Mosaic's layout pass):
    # reduce each batch slice separately to a (1, 1); partials land at
    # rows 0..bblk-1, lane 0 of the slot
    prod = y * xc
    acc = jnp.zeros((8, 128), y.dtype)
    for k in range(prod.shape[0]):
        t = jnp.sum(prod[k], axis=1, keepdims=True)   # (rows, 1)
        t = jnp.sum(t, axis=0, keepdims=True)         # (1, 1)
        acc = acc + jnp.pad(t, ((k, 7 - k), (0, 127)))
    pp_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_matvec_pap(P: PallasStencil, x: jnp.ndarray,
                      interpret: bool = False):
    """(L x, per-column x . L x) in one pass; same support envelope as
    pallas_matvec (non-tiled widths)."""
    B, H, W = x.shape
    Hp, Wplanes = P.planes.shape[1:]
    zero = np.int32(0)
    Wp2 = pl.cdiv(W + 2, 128) * 128
    rows = _pick_rows(W)
    bblk = _bblk_for(B)
    xp = jnp.pad(x, ((0, 0), (8, Hp - H + 8), (1, Wp2 - W - 1)))
    grid = (Hp // rows, B // bblk)
    planes_spec = pl.BlockSpec((9, rows, W),
                               lambda i, j: (zero, i, zero),
                               memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bblk, rows, W), lambda i, j: (j, i, zero),
                            memory_space=pltpu.VMEM)
    n_i = Hp // rows
    n_j = B // bblk
    pp_spec = pl.BlockSpec((8, 128), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    y, pp = pl.pallas_call(
        functools.partial(_mv_dot_kernel, rows=rows, tiled=False,
                          bblk=bblk),
        out_shape=(jax.ShapeDtypeStruct((B, Hp, W), x.dtype),
                   jax.ShapeDtypeStruct((n_i * 8, n_j * 128), x.dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            planes_spec,
        ],
        out_specs=(out_spec, pp_spec),
        scratch_shapes=[
            pltpu.VMEM((2, bblk, rows + 16, Wp2), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, P.planes)
    # slot (i, j) holds its partials at rows 0..bblk-1, lane 0
    parts = pp.reshape(n_i, 8, n_j, 128)[:, :bblk, :, 0]   # (n_i, bblk, n_j)
    return y[:, :H, :W], parts.sum(axis=0).T.reshape(B)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_matvec(P: PallasStencil, x: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """y = L x for x (B, H, W) using the fused Pallas kernel."""
    B, H, W = x.shape
    Hp, Wplanes = P.planes.shape[1:]
    bblk = _bblk_for(B)

    # index maps return int32 explicitly: under x64 a python `0` would
    # become an i64 constant, which Mosaic cannot legalize
    zero = np.int32(0)

    if W > 4094:
        # column-tiled: fixed (CROWS, CTILE) blocks, W-independent VMEM.
        # 128 halo columns each side (x col c -> padded col c+128) give
        # 128-aligned DMA offsets that contain the +-1 column halo.
        rows = CROWS
        ct = _ctile_for(W)
        Wp = Wplanes                       # ct multiple (expand)
        xp = jnp.pad(x, ((0, 0), (8, Hp - H + 8), (128, 128 + Wp - W)))
        grid = (Hp // rows, Wp // ct, B // bblk)
        planes_spec = pl.BlockSpec((9, rows, ct),
                                   lambda i, k, j: (zero, i, k),
                                   memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((bblk, rows, ct),
                                lambda i, k, j: (j, i, k),
                                memory_space=pltpu.VMEM)
        scratch = pltpu.VMEM((2, bblk, rows + 16, ct + 256), x.dtype)
        out_shape = jax.ShapeDtypeStruct((B, Hp, Wp), x.dtype)
        tiled = True
    else:
        # 8 zero halo rows on top (8-row DMA alignment), zero rows to
        # the slab extent below, one zero halo column on the left and
        # zeros to a 128-lane multiple on the right (lane DMA
        # alignment): boundary reads fall into padding, not OOB
        Wp2 = pl.cdiv(W + 2, 128) * 128
        rows = _pick_rows(W)
        xp = jnp.pad(x, ((0, 0), (8, Hp - H + 8), (1, Wp2 - W - 1)))
        grid = (Hp // rows, B // bblk)
        planes_spec = pl.BlockSpec((9, rows, W),
                                   lambda i, j: (zero, i, zero),
                                   memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((bblk, rows, W), lambda i, j: (j, i, zero),
                                memory_space=pltpu.VMEM)
        scratch = pltpu.VMEM((2, bblk, rows + 16, Wp2), x.dtype)
        out_shape = jax.ShapeDtypeStruct((B, Hp, W), x.dtype)
        tiled = False

    y = pl.pallas_call(
        functools.partial(_kernel, rows=rows, tiled=tiled, bblk=bblk,
                          ctile=_ctile_for(W) if tiled else CTILE),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x, manual halo DMA
            planes_spec,                         # 9 stacked planes
        ],
        out_specs=out_spec,
        scratch_shapes=[
            scratch,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, P.planes)
    return y[:, :H, :W]
