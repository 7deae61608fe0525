"""SpMV kernel shootout on the real TPU: XLA stencil_matvec vs the
fused Pallas kernel (solve/pallas_stencil.py), at bench-relevant shapes.

Each kernel is applied K times inside ONE jitted fori_loop (with a
cheap renormalization so values stay finite), so the measured time is
device compute, not the host-tunnel roundtrip latency (~40 ms/dispatch
on a remote TPU, which would otherwise dominate a single ~1 ms matvec).

Prints one JSON line per shape with sustained nnz/s — the BASELINE.json
north-star metric.  Used to decide which kernel the CG loop ships with
(VERDICT r1 item 2).
"""

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

K = 100  # matvecs per timed dispatch


def _loop(matvec, op, x, k):
    def body(i, x):
        y = matvec(op, x)
        # renormalize so repeated application can't overflow f32
        s = jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)
        return y * s
    return jax.lax.fori_loop(0, k, body, x)


def _time_kernel(matvec, op, x, iters=5):
    fn = jax.jit(functools.partial(_loop, matvec), static_argnames=("k",))
    fn(op, x, K).block_until_ready()   # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(op, x, K).block_until_ready()
        ts.append((time.perf_counter() - t0) / K)
    return float(np.median(ts))


def main():
    from circuitscape_tpu.solve.stencil import (stencil_from_gmap,
                                                stencil_matvec)
    from circuitscape_tpu.solve.pallas_stencil import (PallasStencil,
                                                       pallas_matvec,
                                                       supported)

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    # (7040, 7040, 4) exercises the column-tiled W > 4094 kernel at the
    # 48M-cell bench shape (VERDICT r4 item 2: real-chip differential)
    for H, W, B in [(1000, 1000, 32), (2000, 2000, 32), (1024, 1024, 8),
                    (7040, 7040, 4)]:
        rng = np.random.default_rng(0)
        g = rng.uniform(0.5, 3.0, (H, W))
        g[rng.random((H, W)) < 0.10] = 0.0
        S = stencil_from_gmap(g, False, False, jnp.float32)
        nnz = S.nnz
        x = jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32)

        t_xla = _time_kernel(stencil_matvec, S, x)
        row = {"shape": f"{H}x{W}x{B}", "nnz": nnz,
               "xla_s_per_matvec": round(t_xla, 6),
               "xla_nnz_per_s": round(nnz * B / t_xla, 0)}

        if supported((H, W), B):
            P = PallasStencil.from_operator(S)
            try:
                t_pal = _time_kernel(
                    lambda p, v: pallas_matvec(p, v), P, x)
                row["pallas_s_per_matvec"] = round(t_pal, 6)
                row["pallas_nnz_per_s"] = round(nnz * B / t_pal, 0)
                row["winner"] = "pallas" if t_pal < t_xla else "xla"
            except Exception as e:
                row["pallas_error"] = f"{type(e).__name__}: {e}"[:300]
        else:
            row["pallas_error"] = "unsupported shape"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
