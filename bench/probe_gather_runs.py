"""TPU probe: does XLA gather coalesce DUPLICATE (run-structured) indices?

The march's dense fetches have natural index runs: consecutive steps of a
steep ray fall in the same brick row (the row id repeats ~K times before
moving on). If the gather unit (or its cache) makes repeated rows cheaper
than distinct rows, enlarging the brick span (512-lane rows, y-major for
the large noise) multiplies the run length and cuts the dense phase with
ZERO software machinery. If repeats cost the same as distinct rows, only
software dedup (group-fetch + exception compaction) can exploit runs.

Index dists are hash-scrambled iota (no threefry, no sort — keeps the
remote compile fast): `random` (all-distinct pseudo-random), `runsK`
(pseudo-random base row per group of K, repeated K times).

Run ALONE on the TPU:  python bench/probe_gather_runs.py [width]
"""

import sys
import time


def bench(fn, args, reps=3):
    # Host scalar readback each rep: through the axon relay,
    # block_until_ready alone under-reports (async pipelining).
    float(fn(*args))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n_rows = 327_680
    n_idx = 8_388_608
    reps_in_jit = 8

    @jax.jit
    def make_dists():
        iota = jnp.arange(n_idx, dtype=jnp.uint32)
        h = (iota * jnp.uint32(2654435761)) % jnp.uint32(n_rows)
        out = {"random": h.astype(jnp.int32)}
        for k in (2, 4, 8):
            base = (jnp.arange(n_idx // k, dtype=jnp.uint32)
                    * jnp.uint32(2246822519)) % jnp.uint32(n_rows)
            out[f"runs{k}"] = jnp.repeat(base, k).astype(jnp.int32)
        return out

    t0 = time.perf_counter()
    dists = jax.block_until_ready(make_dists())
    print(f"dists built in {time.perf_counter() - t0:.1f}s", flush=True)

    @jax.jit
    def take(table, idx):
        acc = jnp.float32(0.0)
        for _ in range(reps_in_jit):
            rows = jnp.take(table, idx, axis=0)
            s = jnp.sum(rows)  # consume ALL lanes so XLA can't narrow the gather
            acc = acc + s
            idx = jnp.abs(idx + (s.astype(jnp.int32) & 1)) % n_rows
        return acc

    @jax.jit
    def make_table():
        iota = jnp.arange(n_rows * width, dtype=jnp.uint32)
        return ((iota * jnp.uint32(374761393)) % jnp.uint32(65536)
                ).astype(jnp.float32).reshape(n_rows, width)

    table = jax.block_until_ready(make_table())
    print(f"table {n_rows}x{width}, {n_idx} gathers x{reps_in_jit} in-jit",
          flush=True)
    for name, idx in dists.items():
        dt = bench(take, (table, idx))
        per_row = dt / (n_idx * reps_in_jit) * 1e9
        gbs = n_idx * reps_in_jit * width * 4 / dt / 1e9
        print(f"w={width:4d} {name:8s}: {per_row:6.2f} ns/row  "
              f"{gbs:7.1f} GB/s", flush=True)

    # Small-table variant: does gather rate improve when the whole table is
    # cache/VMEM-sized (512 KB)? If yes, two-level redistribution schemes
    # (fetch unique rows once, re-gather from a small buffer) become viable.
    n_small = 1024
    small = jax.block_until_ready(
        jax.jit(lambda t: t[:n_small].copy())(table))
    idx_small = jax.block_until_ready(
        jax.jit(lambda i: i % n_small)(dists["random"]))
    dt = bench(take, (small, idx_small))
    per_row = dt / (n_idx * reps_in_jit) * 1e9
    print(f"w={width:4d} small1k  : {per_row:6.2f} ns/row", flush=True)


if __name__ == "__main__":
    main()
