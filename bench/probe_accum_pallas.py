"""TPU probe: Pallas accumulation kernel vs the XLA form at frame scale.
Run ALONE on the TPU."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cloudscape_tpu.ops.accum_pallas import (
        BLOCK, STEPS, accumulate_pallas, accumulate_reference,
    )

    n = 327680

    @jax.jit
    def make():
        k = jnp.arange(n * STEPS, dtype=jnp.uint32).reshape(n, STEPS)
        h = (k * jnp.uint32(2654435761) >> 16).astype(jnp.float32) / 65536.0
        A = jnp.where(h < 0.1, -h, 0.0)
        cd3 = -h * 0.5
        hf = (k % jnp.uint32(997)).astype(jnp.float32) / 997.0
        ph = jnp.broadcast_to(
            ((k[:, :1] % jnp.uint32(31)).astype(jnp.float32) / 31.0),
            (n, STEPS)).astype(jnp.float32)
        scal = jnp.arange(12, dtype=jnp.float32).reshape(1, 12) / 12.0
        return A, cd3, hf, ph + 0.01, scal

    args = jax.block_until_ready(make())

    def timed(fn, reps=6):
        np.asarray(jax.block_until_ready(fn(*args)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jax.block_until_ready(fn(*args)))
            ts.append((time.perf_counter() - t0) * 1e3)
        return sorted(ts)[len(ts) // 2], [round(t) for t in ts]

    ref = jax.jit(accumulate_reference)
    pal = jax.jit(lambda *a: accumulate_pallas(*a))

    a = np.asarray(jax.block_until_ready(ref(*args)))
    b = np.asarray(jax.block_until_ready(pal(*args)))
    print(f"max abs diff vs XLA form: {np.abs(a - b).max():.2e}", flush=True)

    ms, all_ms = timed(ref)
    print(f"XLA accum  (full readback): {ms:.1f} ms  {all_ms}", flush=True)
    ms, all_ms = timed(pal)
    print(f"pallas accum (full readback): {ms:.1f} ms  {all_ms}", flush=True)

    # Scalar readback: the [n, 4] result is 5.2 MB and the axon relay moves
    # ~30-40 MB/s — a full readback IS ~150 ms of the measurement.
    refs = jax.jit(lambda *a: accumulate_reference(*a).sum())
    pals = jax.jit(lambda *a: accumulate_pallas(*a).sum())
    ms, all_ms = timed(refs)
    print(f"XLA accum  (scalar readback): {ms:.1f} ms  {all_ms}", flush=True)
    ms, all_ms = timed(pals)
    print(f"pallas accum (scalar readback): {ms:.1f} ms  {all_ms}",
          flush=True)


if __name__ == "__main__":
    main()
