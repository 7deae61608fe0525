"""SpMV kernel shootout on the real TPU: XLA stencil_matvec vs the
fused Pallas kernel (solve/pallas_stencil.py), at bench-relevant shapes.

Prints one JSON line per (kernel, shape) with sustained nnz/s — the
BASELINE.json north-star metric.  Used to decide which kernel the CG
loop ships with (VERDICT r1 item 2).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _time(fn, *args, iters=30):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        fn(*args).block_until_ready()   # warmup/compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        out = out[0] if isinstance(out, tuple) else out
        out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from circuitscape_tpu.solve.stencil import (stencil_from_gmap,
                                                stencil_matvec)
    from circuitscape_tpu.solve.pallas_stencil import (PallasStencil,
                                                       pallas_matvec,
                                                       supported)

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    results = []
    for H, W, B in [(1000, 1000, 32), (2000, 2000, 32), (1024, 1024, 8)]:
        rng = np.random.default_rng(0)
        g = rng.uniform(0.5, 3.0, (H, W))
        g[rng.random((H, W)) < 0.10] = 0.0
        S = stencil_from_gmap(g, False, False, jnp.float32)
        nnz = S.nnz
        x = jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32)

        mv = jax.jit(stencil_matvec)
        t_xla = _time(mv, S, x)
        row = {"shape": f"{H}x{W}x{B}", "nnz": nnz,
               "xla_s": round(t_xla, 6),
               "xla_nnz_per_s": round(nnz * B / t_xla, 0)}

        if supported((H, W), B):
            P = PallasStencil.from_operator(S)
            try:
                t_pal = _time(pallas_matvec, P, x)
                row["pallas_s"] = round(t_pal, 6)
                row["pallas_nnz_per_s"] = round(nnz * B / t_pal, 0)
                row["winner"] = "pallas" if t_pal < t_xla else "xla"
            except Exception as e:
                row["pallas_error"] = f"{type(e).__name__}: {e}"[:300]
        else:
            row["pallas_error"] = "unsupported shape"
        results.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
