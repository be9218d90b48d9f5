"""Tile-scale kernel crossover probe (VERDICT r3 #2/#4).

At the reference's serving operating point one dispatch is a ~96² tile
(`cloud_sky/cloud_sky.gd:83,111`). The capacity machinery (prepass, ray
select, compactions, scatters) has a fixed per-dispatch cost, so there is
a ray count below which the machinery costs more than the dense gather
rows it removes. This probe measures that crossover to set
`engine.V3_TILE_MIN_RAYS`: at hemisphere grids of 96², 192², 384² × 128
steps it times

- dense   : march_tile_dense (zero machinery — 4 gather rows/sample),
- v2      : march_bricks_v2, capacity 0.5, no cull (the engine tile path),
- v2cull  : march_bricks_v2 + precomputed priority window, bucket 0.5
            (the engine's tile_cull path, prio computed outside the loop),
- v3      : march_bricks_v3 with measured auto-policy buckets.

Timing: K dispatches fused in ONE executable (fori_loop, the input
perturbed by the carry so XLA cannot hoist the body) + one scalar
readback — the ~50-55 ms relay RTT amortizes below ~7 ms/call.

Run ALONE on the TPU (never concurrently with any other TPU process).
"""

from __future__ import annotations

import json
import time

import numpy as np

STEPS = 128


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cloudscape_tpu.models import atmosphere
    from cloudscape_tpu.models.density import MarchParams
    from cloudscape_tpu.models.march_fast import (
        BrickPack, build_cone_cache, cull_priority_map, march_bricks_v2,
        march_bricks_v3, march_tile_dense, v3_auto_policy,
    )
    from cloudscape_tpu.models.packs import reference_noise_pack
    from cloudscape_tpu.ops.octmap import texel_directions

    noise = reference_noise_pack()
    bricks = BrickPack.from_noise(noise)
    tlut = atmosphere.transmittance_lut()
    sun = np.array([0.3, 0.4, -0.85])
    sun /= np.linalg.norm(sun)
    sky = atmosphere.sky_lut(tlut, jnp.asarray(sun, jnp.float32))
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]), detailed_pos=np.array([0.4, 0.2]),
        weather_pos=np.array([0.01, 0.02]), time=12.5, cloud_coverage=0.35,
        light_direction=sun, ground_color=np.array([0.27, 0.19, 0.027]),
    )
    cone = jax.block_until_ready(jax.jit(
        lambda p: build_cone_cache(p, bricks, 6, res=(32, 512, 512),
                                   chunk=65536))(params))

    def timed_loop(fn, dirs, K):
        """K fused calls in one executable; carry-perturbed input defeats
        loop-invariant hoisting; median of 3 windows, per-call ms."""

        @jax.jit
        def loop(d, p, c):
            def body(i, acc):
                d2 = d * (1.0 + acc * 1e-30)
                return acc + fn(d2, p, c)[0, 0, 0]

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        np.asarray(loop(dirs, params, cone))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(dirs, params, cone))
            ts.append((time.perf_counter() - t0) * 1e3)
        return sorted(ts)[1] / K

    for size, K in ((96, 8), (192, 8), (384, 4)):
        dirs = texel_directions(size)
        n = size * size
        ch = min(n, 16384)

        ms = timed_loop(
            lambda d, p, c: march_tile_dense(d, p, bricks, sky, steps=STEPS,
                                             chunk=ch, cone_cache=c),
            dirs, K)
        print(json.dumps({"size": size, "kernel": "dense", "n_rays": n,
                          "ms_per_call": round(ms, 2)}), flush=True)

        ms = timed_loop(
            lambda d, p, c: march_bricks_v2(d, p, bricks, sky, steps=STEPS,
                                            chunk=ch, capacity_frac=0.5,
                                            cone_cache=c),
            dirs, K)
        print(json.dumps({"size": size, "kernel": "v2_cap0.5", "n_rays": n,
                          "ms_per_call": round(ms, 2)}), flush=True)

        if size == 96:
            # The engine's tile_cull dispatch: priority precomputed per
            # cycle (zero prepass in the loop), bucket 0.5.
            prio, _ = cull_priority_map(dirs, params, bricks, steps=STEPS,
                                        ray_stride=2)
            prio = jax.block_until_ready(prio)
            ms = timed_loop(
                lambda d, p, c: march_bricks_v2(
                    d, p, bricks, sky, steps=STEPS, chunk=ch,
                    capacity_frac=0.5, cone_cache=c, ray_keep_frac=0.5,
                    cull_prio=prio),
                dirs, K)
            print(json.dumps({"size": size, "kernel": "v2_cull0.5",
                              "n_rays": n, "ms_per_call": round(ms, 2)}),
                  flush=True)

        rk, ck, hk, cf, hf = v3_auto_policy(dirs, params, bricks,
                                            steps=STEPS)
        ms = timed_loop(
            lambda d, p, c: march_bricks_v3(
                d, p, bricks, sky, steps=STEPS, chunk=min(n, 32768),
                cell_keep_frac=ck, hot_keep_frac=hk, cone_cache=c,
                ray_keep_frac=rk, ray_stride=2),
            dirs, K)
        print(json.dumps({"size": size, "kernel": "v3_auto", "n_rays": n,
                          "ms_per_call": round(ms, 2), "ray_keep": rk,
                          "cell_keep": ck, "hot_keep": hk}), flush=True)


if __name__ == "__main__":
    main()
