"""TPU probe: isolate phase-3 accumulation and _compact_indices costs.

Phase-3's HBM roofline is ~2 ms (≈6 plane reads of [314k, 128] f32); the
in-frame estimate was ~180 ms — find out where that factor goes.
Run ALONE on the TPU.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cloudscape_tpu.models.march_fast import _compact_indices, _pad_blocks
    from cloudscape_tpu.ops import math as m

    N, STEPS, CHUNK = 327680, 128, 32768  # chunk-aligned, as in the kernel
    lss = 39.0625

    @jax.jit
    def make():
        k = jnp.arange(N * STEPS, dtype=jnp.uint32).reshape(N, STEPS)
        h = (k * jnp.uint32(2654435761) >> 16).astype(jnp.float32) / 65536.0
        t = jnp.where(h < 0.1, h, 0.0)
        cd = h * 2.0
        hf = (k % jnp.uint32(997)).astype(jnp.float32) / 997.0
        ss = jnp.full((N,), 123.4, jnp.float32)
        phase = jnp.full((N,), 0.3, jnp.float32)
        above = jnp.ones((N,), bool)
        return t, cd, hf, ss, phase, above

    args = jax.block_until_ready(make())
    t, cd, hf, ss, phase, above = args

    def accum_chunk(blk):
        tc, cdc, hfc, ssc, phasec, abovec = blk
        dt = jnp.exp(-0.05 * tc * ssc[:, None])
        t_prefix = jnp.concatenate(
            [jnp.ones_like(dt[:, :1]), jnp.cumprod(dt, axis=1)[:, :-1]],
            axis=1)
        beers = jnp.exp(-0.05 * cdc * lss * 3.0)
        powder = 1.0 - jnp.exp(-0.05 * cdc * lss * 6.0)
        beers_total = jnp.where(tc > 0.0, 2.0 * beers * powder, 0.0)
        sm = m.smoothstep(0.0, 1.0, hfc)
        bt_phase = beers_total * phasec[:, None]
        shared = t_prefix * (1.0 - dt) * (tc / jnp.maximum(1e-7, tc))
        L = []
        for c in range(3):
            ambient_c = 0.1 + (0.3 - 0.1) * sm
            L.append(jnp.sum(shared * (ambient_c + bt_phase * 0.7), axis=1))
        alpha = jnp.clip(1.0 - jnp.prod(dt, axis=1), 0.0, 1.0)
        out = jnp.stack([L[0], L[1], L[2], alpha], axis=-1)
        return jnp.where(abovec[..., None], out, 0.0)

    @jax.jit
    def accum(t, cd, hf, ss, phase, above):
        return jax.lax.map(accum_chunk, (
            _pad_blocks(t, CHUNK, jnp.float32(0.0)),
            _pad_blocks(cd, CHUNK, jnp.float32(0.0)),
            _pad_blocks(hf, CHUNK, jnp.float32(0.0)),
            _pad_blocks(ss, CHUNK, jnp.float32(1.0)),
            _pad_blocks(phase, CHUNK, jnp.float32(0.0)),
            _pad_blocks(above, CHUNK, jnp.bool_(False)),
        )).reshape(-1, 4)[:N]

    @jax.jit
    def accum_nocumprod(t, cd, hf, ss, phase, above):
        """Same traffic, cumprod/prod replaced by a plain running multiply
        chain of 2 ops — isolates the cumulative-op lowering cost."""
        def chunkfn(blk):
            tc, cdc, hfc, ssc, phasec, abovec = blk
            dt = jnp.exp(-0.05 * tc * ssc[:, None])
            fake_prefix = dt * 0.5 + 0.1
            beers = jnp.exp(-0.05 * cdc * lss * 3.0)
            powder = 1.0 - jnp.exp(-0.05 * cdc * lss * 6.0)
            beers_total = jnp.where(tc > 0.0, 2.0 * beers * powder, 0.0)
            sm = m.smoothstep(0.0, 1.0, hfc)
            bt_phase = beers_total * phasec[:, None]
            shared = fake_prefix * (1.0 - dt) * (tc / jnp.maximum(1e-7, tc))
            L = [jnp.sum(shared * ((0.1 + 0.2 * sm) + bt_phase * 0.7), axis=1)
                 for _ in range(3)]
            alpha = jnp.clip(1.0 - jnp.sum(dt, axis=1) * 0.001, 0.0, 1.0)
            out = jnp.stack([L[0], L[1], L[2], alpha], axis=-1)
            return jnp.where(abovec[..., None], out, 0.0)

        return jax.lax.map(chunkfn, (
            _pad_blocks(t, CHUNK, jnp.float32(0.0)),
            _pad_blocks(cd, CHUNK, jnp.float32(0.0)),
            _pad_blocks(hf, CHUNK, jnp.float32(0.0)),
            _pad_blocks(ss, CHUNK, jnp.float32(1.0)),
            _pad_blocks(phase, CHUNK, jnp.float32(0.0)),
            _pad_blocks(above, CHUNK, jnp.bool_(False)),
        )).reshape(-1, 4)[:N]

    @jax.jit
    def accum_nomap(t, cd, hf, ss, phase, above):
        """Full-size single expression (no lax.map chunking) — does XLA fuse
        the elementwise passes without the explicit chunk loop?"""
        return accum_chunk((t, cd, hf, ss, phase, above))

    @jax.jit
    def compact(t):
        mask = (t > 0.0).reshape(-1)
        return _compact_indices(mask, 10092544, N * STEPS).sum()

    @jax.jit
    def compact8(t):
        mask = (t > 0.0).reshape(-1)
        return _compact_indices(mask, 8388608, N * STEPS).sum()

    def timed(fn, *a, reps=5):
        np.asarray(jax.block_until_ready(fn(*a)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jax.block_until_ready(fn(*a)))
            ts.append((time.perf_counter() - t0) * 1e3)
        return sorted(ts)[len(ts) // 2], [round(x) for x in ts]

    for name, fn, a in (("accum", accum, args),
                        ("accum_nocumprod", accum_nocumprod, args),
                        ("accum_nomap", accum_nomap, args),
                        ("compact_42M_cap10M", compact, (t,)),
                        ("compact_42M_cap8M", compact8, (t,))):
        ms, all_ms = timed(fn, *a)
        print(f"{name}: {ms:.0f} ms  {all_ms}", flush=True)


if __name__ == "__main__":
    main()
