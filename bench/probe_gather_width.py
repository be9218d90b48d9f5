"""TPU probe: per-row cost of narrow (8-lane) vs 128-lane-table gathers at
the v3 march's real geometry-fetch shapes.

Round-1 microbench: rows of 4-8 f32 gather at 0.08-0.19 Grows/s vs 0.374
for 128-f32 rows — and XLA pads the gathered minor dim to 128 lanes either
way, so the RESULT buffer is the same size. If the wide-TABLE form takes
the fast path, padding `geom` [n, 8] → [n, 128] (+147 MB HBM at the
headline ray count) buys the same rows at ~2-4× the rate. The v3 march
issues ~cap_c + cap_h ≈ 8M such rows per frame.

Run ALONE on the TPU:  python bench/probe_gather_width.py
"""
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    n = 294912          # headline ray capacity (0.55 bucket + align)
    m = 5_767_168       # ~cap_c at ck=0.63 (chunk-rounded)
    reps = 64           # gathers per dispatch; amortizes relay RTT

    key = jax.random.PRNGKey(0)
    table8 = jax.random.normal(key, (n, 8), jnp.float32)
    table128 = jnp.pad(table8, ((0, 0), (0, 120)))
    idx = jnp.sort(jax.random.randint(jax.random.PRNGKey(1), (m,), 0, n))

    def bench(name, fn):
        f = jax.jit(fn)
        np.asarray(jax.block_until_ready(f(idx)))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(idx))  # 1-element result forces completion
            ts.append((time.perf_counter() - t0) * 1e3)
        med = statistics.median(ts)
        per_row = med / reps / m * 1e6
        print(f"{name}: {med:.1f} ms/{reps} gathers → {per_row:.2f} ns/row "
              f"({m/ (med/reps) / 1e6:.0f} Mrows/s)  all={[round(t,1) for t in ts]}",
              flush=True)

    def narrow(ix):
        acc = jnp.float32(0.0)
        def body(i, a):
            g = jnp.take(table8, (ix + i) % n, axis=0,
                         indices_are_sorted=False)
            return a + g[0, 0] + g[-1, -1]
        return jax.lax.fori_loop(0, reps, body, acc)

    def wide(ix):
        acc = jnp.float32(0.0)
        def body(i, a):
            g = jnp.take(table128, (ix + i) % n, axis=0,
                         indices_are_sorted=False)[:, :8]
            return a + g[0, 0] + g[-1, -1]
        return jax.lax.fori_loop(0, reps, body, acc)

    bench("narrow  [n,   8] table", narrow)
    bench("wide    [n, 128] table", wide)


if __name__ == "__main__":
    main()
