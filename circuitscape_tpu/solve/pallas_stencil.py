"""Pallas TPU kernel for the stencil Laplacian matvec.

The XLA formulation (solve/stencil.py stencil_matvec) lowers to ~17
pad/slice multiply-adds that XLA fuses into several HBM passes; this
kernel performs y = L x in ONE pass per operand: each grid step DMAs a
halo'd row-slab of x from HBM into VMEM, applies all eight neighbor
contributions in-register, and writes the y slab.  Weight planes flow
through the normal block pipeline; because the grid iterates batch
fastest, their blocks are reused across batch steps without re-fetch.

To keep every plane access row-aligned with the output slab (so only x
needs halo rows), the operator is pre-expanded with row-shifted copies:
  ws_up[r]  = ws[r-1]   (north coupling),
  wse_up[r] = wse[r-1]  (northwest transpose),
  wne_dn[r] = wne[r+1]  (southwest transpose).

Math per output row g (W-axis shifts zero-fill in-register):
  y[g] = diag[g]*x[g]
       - we[g]*x[g]>>E - (we[g]*x[g])>>W
       - ws[g]*x[g+1] - ws_up[g]*x[g-1]
       - wse[g]*x[g+1]>>E - (wse_up[g]*x[g-1])>>W
       - wne[g]*x[g-1]>>E - (wne_dn[g]*x[g+1])>>W
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import StencilOperator

ROWS = 128   # output row-slab height per grid step
BBLK = 4     # batch columns per grid step


def _shift_e(a):
    """a[..., j] <- a[..., j+1], zero-filled last column."""
    return jnp.concatenate([a[..., 1:], jnp.zeros_like(a[..., :1])], axis=-1)


def _shift_w_(a):
    """a[..., j] <- a[..., j-1], zero-filled first column."""
    return jnp.concatenate([jnp.zeros_like(a[..., :1]), a[..., :-1]], axis=-1)


def _kernel(x_hbm, we, ws, ws_up, wse, wse_up, wne, wne_dn, diag,
            y_ref, xs, sem):
    i = pl.program_id(0)       # row slab
    j = pl.program_id(1)       # batch block
    H = x_hbm.shape[1]

    d0 = i * ROWS - 1                      # first desired (halo) row
    start = jnp.clip(d0, 0, H - (ROWS + 2))
    delta = d0 - start                     # in [-1, ROWS+1]

    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(j * BBLK, BBLK), pl.ds(start, ROWS + 2)],
        xs,
        sem,
    )
    cp.start()
    cp.wait()

    block = xs[:]                          # (BBLK, ROWS+2, W)
    block = pltpu.roll(block, -delta, axis=1)
    # zero rows whose global index g = d0 + r is outside [0, H)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, block.shape, 1)
    g = row_ids + d0
    block = jnp.where((g >= 0) & (g < H), block, 0.0)

    up = block[:, :-2]                     # x[g-1]
    mid = block[:, 1:-1]                   # x[g]
    dn = block[:, 2:]                      # x[g+1]

    wE = we[:][None]
    wS = ws[:][None]
    wSu = ws_up[:][None]
    wSE = wse[:][None]
    wSEu = wse_up[:][None]
    wNE = wne[:][None]
    wNEd = wne_dn[:][None]

    y = diag[:][None] * mid
    y -= wE * _shift_e(mid) + _shift_w_(wE * mid)
    y -= wS * dn + wSu * up
    y -= wSE * _shift_e(dn) + _shift_w_(wSEu * up)
    y -= wNE * _shift_e(up) + _shift_w_(wNEd * dn)
    y_ref[:] = y


@jax.tree_util.register_pytree_node_class
class PallasStencil:
    """Pre-expanded plane set for the Pallas matvec."""

    def __init__(self, we, ws, ws_up, wse, wse_up, wne, wne_dn, diag):
        (self.we, self.ws, self.ws_up, self.wse, self.wse_up, self.wne,
         self.wne_dn, self.diag) = (we, ws, ws_up, wse, wse_up, wne,
                                    wne_dn, diag)

    def tree_flatten(self):
        return ((self.we, self.ws, self.ws_up, self.wse, self.wse_up,
                 self.wne, self.wne_dn, self.diag), ())

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.diag.shape

    @classmethod
    def from_operator(cls, S: StencilOperator) -> "PallasStencil":
        def up(p):
            return jnp.concatenate([jnp.zeros_like(p[:1]), p[:-1]], axis=0)

        def dn(p):
            return jnp.concatenate([p[1:], jnp.zeros_like(p[:1])], axis=0)

        return cls(S.we, S.ws, up(S.ws), S.wse, up(S.wse), S.wne,
                   dn(S.wne), S.diag)


def supported(S_shape, B) -> bool:
    H, W = S_shape
    return H >= ROWS + 2 and W <= 4096 and B % BBLK == 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_matvec(P: PallasStencil, x: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """y = L x for x (B, H, W) using the fused Pallas kernel."""
    B, H, W = x.shape
    grid = (pl.cdiv(H, ROWS), B // BBLK)

    plane_spec = pl.BlockSpec((ROWS, W), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x, manual halo DMA
            plane_spec, plane_spec, plane_spec, plane_spec,
            plane_spec, plane_spec, plane_spec, plane_spec,
        ],
        out_specs=pl.BlockSpec((BBLK, ROWS, W), lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BBLK, ROWS + 2, W), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, P.we, P.ws, P.ws_up, P.wse, P.wse_up, P.wne, P.wne_dn, P.diag)
