"""TPU probe: XLA gather throughput vs index LOCALITY and row width.

Run ALONE on the TPU. Question: is the ~3.5 ns/row in-context gather rate
(192 GB/s ≈ 23% of v5e HBM peak) limited by DRAM row-buffer misses on
random rows — i.e. would Morton-ordering the brick table (spatially close
bricks → close table rows) speed up the march's dense phase?

Everything (table + index distributions) is generated ON DEVICE — the axon
relay uploads at ~1 MB/s, so host-built arrays would dominate wall time.
Index DISTRIBUTION is data, not shape: all variants share one executable
per (table, width) pair, so compile cost stays bounded.
"""

import sys
import time


def bench(fn, args, reps=3):
    import jax

    out = jax.block_until_ready(fn(*args))  # compile
    del out
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    # One row-width per invocation (argv[1], default 128): the remote-compile
    # helper makes fresh jit signatures expensive (20-60+ s each); this keeps
    # it to 2 per run (make_dists + take).
    import jax
    import jax.numpy as jnp

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n_rows = 327_680  # 40 MB at 128 lanes — the large-noise table scale
    n_idx = 8_388_608  # 8M gathers per pass
    reps_in_jit = 8  # dependent passes inside jit → amortize dispatch

    key = jax.random.PRNGKey(0)
    k_tab, k_rand, k_base, k_off = jax.random.split(key, 4)

    @jax.jit
    def make_dists():
        iota = (jnp.arange(n_idx, dtype=jnp.int32) % n_rows)
        rand = jax.random.randint(k_rand, (n_idx,), 0, n_rows, jnp.int32)
        base = jax.random.randint(k_base, (n_idx // 128,), 0, n_rows // 512,
                                  jnp.int32)
        local = (jnp.repeat(base, 128) * 512
                 + jax.random.randint(k_off, (n_idx,), 0, 512, jnp.int32)
                 ) % n_rows
        sort128 = jnp.sort(rand.reshape(-1, 128), axis=1).reshape(-1)
        srt = jnp.sort(rand)
        return {"iota": iota, "random": rand, "local512": local,
                "sort128": sort128, "sorted": srt}

    t0 = time.perf_counter()
    dists = jax.block_until_ready(make_dists())
    print(f"dists built in {time.perf_counter() - t0:.1f}s")
    sys.stdout.flush()

    @jax.jit
    def take(table, idx):
        # 8 dependent passes: each gather's sum perturbs the next
        # indices (prevents CSE).
        acc = jnp.float32(0.0)
        for _ in range(reps_in_jit):
            rows = jnp.take(table, idx, axis=0)
            s = jnp.sum(rows[:, :1])
            acc = acc + s
            idx = jnp.abs(idx + (s.astype(jnp.int32) & 1)) % n_rows
        return acc

    table = jax.block_until_ready(
        jax.random.normal(k_tab, (n_rows, width), jnp.float32))
    print(f"table {n_rows}x{width}, {n_idx} gathers x{reps_in_jit} in-jit")
    sys.stdout.flush()
    for name, idx in dists.items():
        dt = bench(take, (table, idx))
        per_row = dt / (n_idx * reps_in_jit) * 1e9
        gbs = n_idx * reps_in_jit * width * 4 / dt / 1e9
        print(f"w={width:4d} {name:8s}: {per_row:6.2f} ns/row  "
              f"{gbs:7.1f} GB/s")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
