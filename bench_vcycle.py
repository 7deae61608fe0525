"""Per-op decomposition of the MG-CG iteration on the real chip.

Times each constituent of the preconditioned CG loop body with in-jit
fori loops (single-op timings through the tunnel are useless: ~30-40 ms
roundtrip floor per dispatch).  Two repeat counts cancel the fixed
dispatch cost: ms = (t(N2) - t(N1)) / (N2 - N1).

Usage: python bench_vcycle.py [side] [batch]   (default 1024 32)
Writes BENCH_VCYCLE.json and prints the table.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")

from circuitscape_tpu.solve.stencil import (StencilOperator, _to_dtype,
                                            stencil_matvec)
from circuitscape_tpu.solve import geomg
from circuitscape_tpu.solve.geomg import (_cheb_smooth, _prolong, _restrict,
                                          _vcycle, build_geo_mg_device,
                                          geomg_apply)
from circuitscape_tpu.solve.prepare import prepare_stencil_solver_from_gmap


def timed(fn, arg_thunk, n=32):
    """Per-call ms of fn: wall of an n-iteration in-jit fori loop minus
    the wall of the empty (n=0) loop, min of 3 repeats.

    Shape-changing fns are kept alive across iterations by feeding the
    output's SUM back into the carry (a single scalar read lets XLA
    dead-code-eliminate all but one output element; the sum forces the
    full computation at the cost of one cheap fused reduction)."""

    def loop(k):
        @jax.jit
        def run(x):
            def body(_, c):
                y = fn(c)
                if y.shape != c.shape:
                    return c * (1.0 + 1e-30 * jnp.sum(y))
                return y
            return lax.fori_loop(0, k, body, x)
        return run

    r0, rn = loop(0), loop(n)
    x = arg_thunk()
    for attempt in range(3):   # transient tunnel errors: retry
        try:
            jax.block_until_ready(r0(x))
            jax.block_until_ready(rn(x))   # compile + warm
            t0s, tns = [], []
            for _ in range(3):
                t = time.perf_counter()
                jax.block_until_ready(r0(x))
                t0s.append(time.perf_counter() - t)
                t = time.perf_counter()
                jax.block_until_ready(rn(x))
                tns.append(time.perf_counter() - t)
            return (min(tns) - min(t0s)) / n * 1e3
        except Exception as e:
            print(f"[retry {attempt}: {str(e)[:80]}]", flush=True)
            time.sleep(10)
    return float("nan")


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    rng = np.random.default_rng(0)
    gmap = rng.uniform(0.5, 2.0, (side, side))
    S64, prec, prec_apply, _ = prepare_stencil_solver_from_gmap(
        gmap, False, False)
    A32 = prec.levels[0].A
    H, W = A32.shape
    shape = (B, H, W)

    def rand():
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    res = {"side": side, "batch": B,
           "levels": [tuple(map(int, L.A.shape)) for L in prec.levels],
           "backend": jax.default_backend()}

    X0 = rand()

    # --- primitive ops ------------------------------------------------
    class Res(dict):
        def __setitem__(self, k, v):
            if isinstance(v, float):
                v = round(v, 3)
            print(f"{k}: {v}", flush=True)
            dict.__setitem__(self, k, v)

    res = Res(res)

    res["matvec_fine_ms"] = timed(
        lambda x: stencil_matvec(A32, x), rand)
    L0 = prec.levels[0]
    res["cheb_smooth_zero_ms"] = timed(
        lambda b: _cheb_smooth(L0, b, None), rand)
    res["cheb_smooth_warm_ms"] = timed(
        lambda x: _cheb_smooth(L0, X0, x), rand)
    res["restrict_ms"] = timed(_restrict, rand)
    Hc, Wc = -(-H // 2), -(-W // 2)

    def randc():
        return jnp.asarray(rng.standard_normal((B, Hc, Wc)), jnp.float32)

    res["prolong_shift_ms"] = timed(lambda xc: _prolong(xc, H, W), randc)

    def prolong_conv(xc):
        k = jnp.ones((1, 1, 2, 2), xc.dtype)
        y = lax.conv_transpose(xc[:, None], k, strides=(2, 2),
                               padding="VALID", dimension_numbers=
                               ("NCHW", "OIHW", "NCHW"))
        return y[:, 0, :H, :W]

    res["prolong_convT_ms"] = timed(prolong_conv, randc)

    def prolong_repeat(xc):
        y = jnp.repeat(jnp.repeat(xc, 2, axis=1), 2, axis=2)
        return y[:, :H, :W]

    res["prolong_repeat_ms"] = timed(prolong_repeat, randc)

    def prolong_add(xc):
        return X0 + 1.9 * _prolong(xc, H, W)

    res["prolong_add_shift_ms"] = timed(prolong_add, randc)

    # --- V-cycle, whole and truncated --------------------------------
    res["vcycle_ms"] = timed(lambda b: _vcycle(prec, 0, b), rand)

    # per-level marginal cost: run the cycle starting at level k on a
    # level-k-sized block
    for k in range(1, len(prec.levels)):
        hk, wk = prec.levels[k].A.shape

        def randk(hk=hk, wk=wk):
            return jnp.asarray(rng.standard_normal((B, hk, wk)),
                               jnp.float32)

        res[f"vcycle_from_lvl{k}_ms"] = timed(
            lambda b, k=k: _vcycle(prec, k, b), randk)

    # coarse pinv apply
    hc, wc = prec.coarse_shape

    def randp():
        return jnp.asarray(rng.standard_normal((B, hc, wc)), jnp.float32)

    res["coarse_pinv_ms"] = timed(
        lambda b: (b.reshape(B, hc * wc) @ prec.coarse_pinv.T
                   ).reshape(B, hc, wc), randp)

    # --- CG pieces ----------------------------------------------------
    def cg_dots(p):
        ap = stencil_matvec(A32, p)
        pap = jnp.sum(p * ap, axis=(-2, -1))
        alpha = 1.0 / (pap + 1.0)
        x = X0 + alpha[:, None, None] * p
        r = X0 - alpha[:, None, None] * ap
        rn = jnp.sum(r * r, axis=(-2, -1))
        return x + r + rn[:, None, None]

    res["matvec_dots_axpys_ms"] = timed(cg_dots, rand)

    def dots_only(p):
        pap = jnp.sum(p * X0, axis=(-2, -1))
        return p + pap[:, None, None]

    res["one_dot_ms"] = timed(dots_only, rand)

    def full_body(p):
        ap = stencil_matvec(A32, p)
        pap = jnp.sum(p * ap, axis=(-2, -1))
        alpha = 1.0 / (pap + 1.0)
        x = X0 + alpha[:, None, None] * p
        r = X0 - alpha[:, None, None] * ap
        z = geomg_apply(prec, r)
        rz = jnp.sum(r * z, axis=(-2, -1))
        beta = rz / (rz + 1.0)
        return z + beta[:, None, None] * p

    res["cg_body_ms"] = timed(full_body, rand)

    for k, v in res.items():
        if k.endswith("_ms"):
            res[k] = round(v, 3)
    print(json.dumps(res, indent=1))
    with open("BENCH_VCYCLE.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
