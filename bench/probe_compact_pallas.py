"""TPU probe: Pallas streaming compaction vs the XLA _compact_indices at
frame scale (42M samples, 8.4M capacity). Run ALONE on the TPU."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cloudscape_tpu.models.march_fast import _compact_indices
    from cloudscape_tpu.ops.compact_pallas import compact_indices_pallas

    NB, LANES = 327680, 128
    total = NB * LANES
    cap = 8388608

    @jax.jit
    def make():
        k = jnp.arange(total, dtype=jnp.uint32).reshape(NB, LANES)
        h = (k * jnp.uint32(2654435761) >> 16).astype(jnp.float32) / 65536.0
        return h < 0.15

    mask = jax.block_until_ready(make())

    @jax.jit
    def xla(m):
        idx, rank = _compact_indices(m.reshape(-1), cap, total,
                                     return_rank=True)
        return idx.sum(), rank.sum()

    @jax.jit
    def pal(m):
        idx, rank = compact_indices_pallas(m, cap, total)
        return idx.sum(), rank.sum()

    # Correctness on the real chip first.
    ix, rx = jax.jit(lambda m: _compact_indices(
        m.reshape(-1), cap, total, return_rank=True))(mask)
    ip, rp = jax.jit(lambda m: compact_indices_pallas(m, cap, total))(mask)
    same_idx = bool(jnp.array_equal(ix, ip))
    same_rank = bool(
        jnp.array_equal(jnp.where(mask.reshape(-1), rx, 0),
                        jnp.where(mask.reshape(-1), rp.reshape(-1), 0)))
    print(f"idx equal: {same_idx}  rank equal (masked): {same_rank}",
          flush=True)

    def timed(fn, reps=6):
        np.asarray(jax.block_until_ready(fn(mask)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jax.block_until_ready(fn(mask)))
            ts.append((time.perf_counter() - t0) * 1e3)
        return sorted(ts)[len(ts) // 2], [round(t) for t in ts]

    ms, all_ms = timed(xla)
    print(f"XLA compact   : {ms:.1f} ms  {all_ms}", flush=True)
    ms, all_ms = timed(pal)
    print(f"pallas compact: {ms:.1f} ms  {all_ms}", flush=True)


if __name__ == "__main__":
    main()
