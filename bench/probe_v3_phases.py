"""TPU probe: per-phase isolation of march_bricks_v3 via debug_stage.

Each `debug_stage=k` early-returns a scalar probe after phase k; XLA
dead-code-eliminates everything downstream, so `time(k) - time(k-1)`
isolates one phase. Stages:

  1 cull prepass            6 hot sub-compaction
  2 + ray select            7 + erosion stream
  3 + cell compaction/pos   8 + cone stream
  4 + weather stream        9 + scatters + hf plane
  5 + pre stream            0 full march (accumulate + scatter-back)

Run ALONE on the TPU. Budget: each stage is ONE new jit signature
(~20-60 s remote compile) — select with --stages=1,2,3 (default). Suggested
ladder: run 1,2,3 then 4,5,6 then 7,8,9,0.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import importlib.util

    import jax
    import jax.numpy as jnp
    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "bench_root",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py"),
    )
    bench_root = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_root)
    hemisphere_dirs = bench_root.hemisphere_dirs
    from cloudscape_tpu.models import atmosphere
    from cloudscape_tpu.models.density import MarchParams
    from cloudscape_tpu.models.march_fast import (
        BrickPack, build_cone_cache, march_bricks_v3, v3_auto_policy,
    )
    from cloudscape_tpu.models.packs import reference_noise_pack

    stages = [1, 2, 3]
    for a in sys.argv[1:]:
        if a.startswith("--stages="):
            stages = [int(s) for s in a.split("=")[1].split(",")]

    steps = 128
    cone_res = (32, 512, 512)
    margin = 0.1

    noise = reference_noise_pack()
    bp = BrickPack.from_noise(noise)
    tlut = atmosphere.transmittance_lut()
    sun = np.array([0.3, 0.4, -0.85])
    sun /= np.linalg.norm(sun)
    sky = atmosphere.sky_lut(tlut, jnp.asarray(sun, jnp.float32))
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]), detailed_pos=np.array([0.4, 0.2]),
        weather_pos=np.array([0.01, 0.02]), time=12.5, cloud_coverage=0.35,
        light_direction=sun, ground_color=np.array([0.27, 0.19, 0.027]),
    )
    dirs = jnp.asarray(hemisphere_dirs(1024, 512))

    t0 = time.perf_counter()
    rk, ck, hk, cell_frac, hot_frac = v3_auto_policy(
        dirs, params, bp, steps=steps, cell_margin=margin)
    print(f"policy ({time.perf_counter()-t0:.1f}s): rk={rk} ck={ck} hk={hk} "
          f"cell_frac={cell_frac:.4f} hot_frac={hot_frac:.4f}", flush=True)

    build = jax.jit(
        lambda p: build_cone_cache(p, bp, 6, res=cone_res, chunk=65536)
    )
    t0 = time.perf_counter()
    cone = jax.block_until_ready(build(params))
    print(f"cone built ({time.perf_counter()-t0:.1f}s)", flush=True)

    for k in stages:
        fn = jax.jit(
            lambda d, p, c, k=k: march_bricks_v3(
                d, p, bp, sky, steps=steps, chunk=32768, cell_keep_frac=ck,
                hot_keep_frac=hk, cone_cache=c, ray_keep_frac=rk,
                ray_stride=2, cell_margin=margin, debug_stage=k)
        )
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fn(dirs, params, cone)))
        print(f"stage {k} compile+first ({time.perf_counter()-t0:.1f}s)",
              flush=True)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(dirs, params, cone)[0, 0])
            times.append((time.perf_counter() - t0) * 1e3)
        print(f"stage {k} device-complete ms: "
              f"median={statistics.median(times):.1f} "
              f"all={[round(t, 1) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
