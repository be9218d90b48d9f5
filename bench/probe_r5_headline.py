"""Round-5 headline A/Bs (VERDICT r4 #4): bf16 brick tables re-run
(the round-2 verdict — a 50% dense-phase LOSS — predates v3's cell gate,
which runs the dense streams on ~1/3 the rows; the conversion-ALU vs
row-issue balance may have flipped), chunk-size ladder for the live
streams, and the post-Pallas-segscan phase split (stages 8/9/0).

One process, one claim: every variant is a fresh executable (~20-60 s
remote compile each — budget accordingly). Run ALONE on the TPU.
"""

from __future__ import annotations

import importlib.util
import os
import statistics
import sys
import time

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "bench_root",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "bench.py"),
)
B = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(B)

WIDTH, HEIGHT, STEPS = B.WIDTH, B.HEIGHT, B.STEPS
CONE_RES = B.CONE_RES


def _median(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts), [round(t, 1) for t in ts]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cloudscape_tpu.models import atmosphere
    from cloudscape_tpu.models.density import MarchParams
    from cloudscape_tpu.models.march_fast import (
        BrickPack, build_cone_cache, march_bricks_v3, v3_auto_policy,
    )
    from cloudscape_tpu.models.packs import reference_noise_pack

    which = sys.argv[1:] or ["base", "chunk64", "bf16", "stages"]

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
    dirs = jnp.asarray(B.hemisphere_dirs(WIDTH, HEIGHT))
    rk, ck, hk, _, _ = v3_auto_policy(dirs, params, bricks, steps=STEPS)
    print(f"policy rk={rk} ck={ck} hk={hk}", flush=True)
    cone = jax.block_until_ready(jax.jit(
        lambda p: build_cone_cache(p, bricks, 6, res=CONE_RES, chunk=65536)
    )(params))

    def make(bp, chunk, dbg=0):
        return jax.jit(lambda d, p, c: march_bricks_v3(
            d, p, bp, sky, steps=STEPS, chunk=chunk, cell_keep_frac=ck,
            hot_keep_frac=hk, cone_cache=c, ray_keep_frac=rk, ray_stride=2,
            debug_stage=dbg))

    base_out = None
    if "base" in which:
        f = make(bricks, 32768)
        base_out = np.asarray(jax.block_until_ready(f(dirs, params, cone)))
        ms, all_ = _median(lambda: np.asarray(f(dirs, params, cone)[0, 0]))
        print(f"base f32/chunk32768: {ms:.1f} ms {all_}", flush=True)

    if "chunk64" in which:
        f = make(bricks, 65536)
        np.asarray(jax.block_until_ready(f(dirs, params, cone)))
        ms, all_ = _median(lambda: np.asarray(f(dirs, params, cone)[0, 0]))
        print(f"f32/chunk65536: {ms:.1f} ms {all_}", flush=True)

    if "bf16" in which:
        bricks16 = BrickPack.from_noise(noise, dtype=jnp.bfloat16)
        f = make(bricks16, 32768)
        out = np.asarray(jax.block_until_ready(f(dirs, params, cone)))
        ms, all_ = _median(lambda: np.asarray(f(dirs, params, cone)[0, 0]))
        line = f"bf16/chunk32768: {ms:.1f} ms {all_}"
        if base_out is not None:
            peak = max(float(np.abs(base_out).max()), 1e-9)
            mse = float(((out - base_out) ** 2).mean())
            import math
            line += f"  psnr_vs_f32={10*math.log10(peak*peak/max(mse,1e-20)):.1f} dB"
        print(line, flush=True)

    if "stages" in which:
        prev = 0.0
        for dbg in (1, 3, 5, 8, 9):
            f = make(bricks, 32768, dbg)
            np.asarray(jax.block_until_ready(f(dirs, params, cone)))
            ms, _ = _median(lambda: np.asarray(f(dirs, params, cone)[0, 0]),
                            reps=3)
            print(f"stage {dbg}: cum {ms:.1f} ms  (delta {ms - prev:.1f})",
                  flush=True)
            prev = ms


if __name__ == "__main__":
    main()
