"""Multi-chip scale-out: shard the solve over a jax device Mesh.

Replaces what a multi-node reference would have used MPI for
(SURVEY.md §5.8): the grid's row axis shards across the 'nodes' mesh
axis (XLA inserts halo exchanges / collective-permutes for the
shifted-plane stencil reads over ICI) and the pair-batch axis shards
across the 'batch' axis (embarrassingly parallel, the analogue of the
reference's cholmod_batch_size knob, src/config.jl:29).  CG dot
products become psums — annotate shardings, jit, let XLA place the
collectives (the scaling-book recipe).
"""

from __future__ import annotations

import math
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solve.stencil import StencilOperator, stencil_cg_device

# Grids below this many cells stay single-device by default: at small
# sizes the halo-exchange latency exceeds the per-chip compute saved
# (override with CS_MESH_MIN_CELLS / force with CS_FORCE_MESH=1).
MESH_MIN_CELLS = 65536

_MESH_CACHE: dict = {}


def active_mesh(ncells: int | None = None) -> Mesh | None:
    """The production mesh, or None for single-device execution.

    Auto-enables when more than one accelerator device is visible —
    the TPU answer to the reference's thread pool (src/core.jl:268-272):
    grid rows shard over 'nodes' (stencil halo exchange over ICI), the
    RHS batch over 'batch' (independent pair solves)."""
    if os.environ.get("CS_DISABLE_MESH"):
        return None
    try:
        n = len(jax.devices())
    except Exception:
        return None
    if n < 2:
        return None
    if not os.environ.get("CS_FORCE_MESH"):
        min_cells = int(os.environ.get("CS_MESH_MIN_CELLS",
                                       str(MESH_MIN_CELLS)))
        if ncells is not None and ncells < min_cells:
            return None
    if n not in _MESH_CACHE:
        _MESH_CACHE[n] = make_mesh(n)
    return _MESH_CACHE[n]


def mesh_of(arr) -> Mesh | None:
    """Recover the mesh an array was sharded over (None when the array
    is unsharded/single-device).  Lets the solve layer make the
    batch-sharding decision consistent with how the operator was
    placed, with no extra plumbing."""
    sh = getattr(arr, "sharding", None)
    if isinstance(sh, NamedSharding) and sh.mesh.size > 1 and \
            "nodes" in sh.mesh.axis_names:
        return sh.mesh
    return None


def make_mesh(n_devices: int | None = None) -> Mesh:
    """Create a ('nodes', 'batch') mesh over the available devices.

    Factorizes n as (rows, cols) with rows the largest power-of-two
    divisor <= sqrt(n), so both the grid-row axis and the RHS batch
    axis shard.  CS_MESH_SHAPE="R,C" overrides the factorization —
    capacity-bound jobs want all devices on 'nodes' (R=n, C=1) so the
    operator's fixed bytes divide by n with no batch-replication."""
    devs = jax.devices()
    n = n_devices or len(devs)
    env = os.environ.get("CS_MESH_SHAPE")
    if env:
        rows, cols = (int(v) for v in env.split(","))
        if rows * cols != n:
            raise ValueError(
                f"CS_MESH_SHAPE={env} does not match {n} devices")
    else:
        rows = 1
        for r in range(int(math.isqrt(n)), 0, -1):
            if n % r == 0:
                rows = r
                break
        cols = n // rows
    mesh_devs = mesh_utils.create_device_mesh((rows, cols), devs[:n])
    return Mesh(mesh_devs, ("nodes", "batch"))


def shard_stencil(mesh: Mesh, A: StencilOperator) -> StencilOperator:
    """Place the weight planes row-sharded over the 'nodes' axis."""
    sh = NamedSharding(mesh, P("nodes", None))
    return StencilOperator(*(jax.device_put(p, sh) for p in
                             (A.we, A.ws, A.wse, A.wne, A.diag)))


def shard_rhs(mesh: Mesh, B: jnp.ndarray) -> jnp.ndarray:
    """RHS blocks (nrhs, H, W): pairs over 'batch', grid rows over
    'nodes'."""
    return jax.device_put(B, NamedSharding(mesh, P("batch", "nodes", None)))


def shard_hierarchy(mesh: Mesh, hier):
    """Place a geo-MG hierarchy on the mesh: fine levels whose row count
    divides evenly (and is worth splitting) shard over 'nodes'; coarse
    levels and the dense coarse pseudo-inverse replicate.  Replicating
    the small levels keeps the V-cycle's coarse work collective-free
    (the scaling-book recipe: shard where the bytes are)."""
    from ..solve.geomg import GeoMgHierarchy, GeoMgLevel

    rows = mesh.shape["nodes"]
    sh_rows = NamedSharding(mesh, P("nodes", None))
    rep = NamedSharding(mesh, P())
    levels = []
    for L in hier.levels:
        H = L.A.diag.shape[0]
        sh = sh_rows if (H % rows == 0 and H // rows >= 8) else rep
        A = StencilOperator(*(jax.device_put(p, sh) for p in
                              (L.A.we, L.A.ws, L.A.wse, L.A.wne, L.A.diag)))
        levels.append(GeoMgLevel(A, jax.device_put(L.inv_diag, sh),
                                 L.lam_max))
    pinv = jax.device_put(hier.coarse_pinv, rep)
    return GeoMgHierarchy(tuple(levels), pinv, hier.coarse_shape,
                          hier.overcorrect)


def sharded_stencil_cg(mesh: Mesh, A: StencilOperator, B, rtol=1e-6,
                       itmax=100_000):
    """Batched stencil CG over the mesh.

    The stencil matvec's row-shifted reads become halo exchanges over
    ICI; reductions over (H, W) become psums.  GSPMD derives all of it
    from the input shardings — the loop body is identical to the
    single-chip path (solve/stencil.py).
    """
    A = shard_stencil(mesh, A)
    B = shard_rhs(mesh, B)
    out_sh = (NamedSharding(mesh, P("batch", "nodes", None)),
              NamedSharding(mesh, P("batch")),
              NamedSharding(mesh, P()))
    fn = jax.jit(stencil_cg_device, static_argnames=("itmax",),
                 out_shardings=out_sh)
    return fn(A, B, rtol, itmax=itmax)


@jax.tree_util.register_pytree_node_class
class ShardStencil:
    """Halo-extended per-shard stencil for the shard_map matvec.

    GSPMD can partition the XLA shifted-plane matvec automatically, but
    it cannot partition the fused Pallas kernel (no partitioning rule),
    so sharded runs used to silently lose the fastest kernel.  This
    carries everything the manual-collective formulation needs:

    ext:  5 planes of GLOBAL shape (nsh*(Hl+2), W), 'nodes'-sharded —
          each shard's rows with one halo row from each neighbor shard
          (ppermute'd once at setup; planes are solve-invariant).
    pal:  optional stacked (9, ...) output-aligned Pallas planes per
          shard (pre-
          expanded from ext at setup), same global stacking.
    mesh/nsh/h_local: static layout facts (mesh objects are hashable).

    The per-matvec exchange is then just TWO rows of x per shard
    boundary (ppermute over ICI), and each shard runs the SAME
    single-device kernel — Pallas on TPU — on its extended block.
    """

    def __init__(self, ext, pal, mesh, nsh, h_local):
        self.ext = ext          # tuple of 5 arrays
        self.pal = pal          # stacked (9, Hl, W) array or None
        self.mesh = mesh
        self.nsh = nsh
        self.h_local = h_local  # rows per shard WITHOUT halo

    def tree_flatten(self):
        return (self.ext, self.pal), (self.mesh, self.nsh, self.h_local)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


def build_shard_stencil(mesh: Mesh, A: StencilOperator,
                        want_pallas: bool | None = None):
    """ShardStencil for A (planes 'nodes'-shardable); None when the row
    count doesn't split evenly over the mesh."""
    nsh = mesh.shape["nodes"]
    H, W = A.shape
    if H % nsh or (H // nsh) < 8:
        return None
    fwd = [(i, i + 1) for i in range(nsh - 1)]
    bwd = [(i + 1, i) for i in range(nsh - 1)]
    rows = P("nodes", None)

    def ext_one(p):
        up = jax.lax.ppermute(p[-1:], "nodes", fwd)    # neighbor above
        dn = jax.lax.ppermute(p[:1], "nodes", bwd)     # neighbor below
        return jnp.concatenate([up, p, dn], axis=0)

    def prolog(we, ws, wse, wne, diag):
        return tuple(ext_one(p) for p in (we, ws, wse, wne, diag))

    planes = tuple(jax.device_put(p, NamedSharding(mesh, rows))
                   for p in (A.we, A.ws, A.wse, A.wne, A.diag))
    ext = jax.jit(jax.shard_map(prolog, mesh=mesh, in_specs=(rows,) * 5,
                                out_specs=(rows,) * 5))(*planes)

    pal = None
    if want_pallas is None:
        want_pallas = (not os.environ.get("CS_NO_PALLAS") and
                       jax.default_backend() == "tpu")
    if want_pallas:
        from ..solve.pallas_stencil import _expand_planes, supported
        h_ext = H // nsh + 2
        if supported((h_ext, W), 4) and A.diag.dtype == jnp.float32:
            # stacked (9, Hl, W) per shard; 'nodes' shards the row dim
            pal = jax.jit(jax.shard_map(
                lambda *ps: _expand_planes(*ps), mesh=mesh,
                in_specs=(rows,) * 5,
                out_specs=P(None, "nodes", None)))(*ext)
    return ShardStencil(tuple(ext), pal, mesh, nsh, H // nsh)


def shard_matvec(ss: ShardStencil, x: jnp.ndarray) -> jnp.ndarray:
    """y = L x with manual halo exchange: per matvec each shard
    ppermutes its boundary rows of x to its neighbors, then runs the
    single-device stencil kernel (Pallas when available) on its
    (Hl+2)-row extended block and drops the halo rows of y."""
    from ..solve.stencil import StencilOperator as _S, stencil_matvec
    mesh, nsh = ss.mesh, ss.nsh
    fwd = [(i, i + 1) for i in range(nsh - 1)]
    bwd = [(i + 1, i) for i in range(nsh - 1)]
    rows = P("nodes", None)
    xspec = P("batch", "nodes", None)
    h_ext = ss.h_local + 2
    W = x.shape[-1]
    b_local = x.shape[0] // mesh.shape["batch"]

    use_pal = False
    if ss.pal is not None:
        from ..solve.pallas_stencil import supported
        use_pal = (supported((h_ext, W), b_local) and
                   x.dtype == ss.ext[4].dtype)

    def body(we, ws, wse, wne, diag, *rest):
        xs = rest[-1]
        up = jax.lax.ppermute(xs[:, -1:], "nodes", fwd)
        dn = jax.lax.ppermute(xs[:, :1], "nodes", bwd)
        xe = jnp.concatenate([up, xs, dn], axis=1)
        if use_pal:
            from ..solve.pallas_stencil import PallasStencil, pallas_matvec
            ye = pallas_matvec(PallasStencil(rest[0], H=h_ext), xe)
        else:
            ye = stencil_matvec(_S(we, ws, wse, wne, diag), xe)
        return ye[:, 1:-1]

    operands = ss.ext + ((ss.pal,) if use_pal else ()) + (x,)
    pal_specs = (P(None, "nodes", None),) if use_pal else ()
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-
    # axes annotation, so the replication checker rejects it on TPU
    return jax.shard_map(body, mesh=mesh,
                         in_specs=(rows,) * 5 + pal_specs + (xspec,),
                         out_specs=xspec, check_vma=False)(*operands)


def pad_to_mesh(arr: np.ndarray, mesh: Mesh) -> np.ndarray:
    """Pad leading (row) and trailing (batch) dims to multiples of the
    mesh axis sizes so shards are equal."""
    rows = mesh.shape["nodes"]
    batch = mesh.shape["batch"]
    if arr.ndim == 3:  # (B, H, W) solve block
        Bp = -(-arr.shape[0] // batch) * batch
        H = -(-arr.shape[1] // rows) * rows
        pads = [(0, Bp - arr.shape[0]), (0, H - arr.shape[1]), (0, 0)]
    else:              # (H, W) weight plane
        H = -(-arr.shape[0] // rows) * rows
        pads = [(0, H - arr.shape[0]), (0, 0)]
    return np.pad(arr, pads)
