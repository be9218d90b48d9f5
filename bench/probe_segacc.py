"""TPU probe: plane-scatter accumulation vs segmented hot-list
accumulation for march_bricks_v3 at the headline scale (1024x512 x 128
steps, shipped policy knobs).

accum="planes":    scatter t/cd to [n, steps] planes + dense hf recompute
                   + Pallas dense-plane accumulation (stages 9+0).
accum="segmented": exp(segmented-cumsum) prefix + radiance sum directly on
                   the [spc*cap_h] hot list + 4 sorted 1-D scatter-adds.

Also cross-checks the two outputs on-chip (max |diff| and PSNR) so the
perf number and the equivalence evidence come from the same run.

Run ALONE on the TPU. 2 new jit signatures (~60 s remote compile each).
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
    print(f"policy ({time.perf_counter()-t0:.1f}s): rk={rk} ck={ck} hk={hk}",
          flush=True)

    build = jax.jit(
        lambda p: build_cone_cache(p, bp, 6, res=cone_res, chunk=65536)
    )
    t0 = time.perf_counter()
    cone = jax.block_until_ready(build(params))
    print(f"cone built ({time.perf_counter()-t0:.1f}s)", flush=True)

    outs = {}
    for mode in ("planes", "segmented"):
        fn = jax.jit(
            lambda d, p, c, mode=mode: march_bricks_v3(
                d, p, bp, sky, steps=steps, chunk=32768, cell_keep_frac=ck,
                hot_keep_frac=hk, cone_cache=c, ray_keep_frac=rk,
                ray_stride=2, cell_margin=margin, accum=mode)
        )
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(dirs, params, cone))
        print(f"{mode} compile+first ({time.perf_counter()-t0:.1f}s)",
              flush=True)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(dirs, params, cone)[0, 0, 0])
            times.append((time.perf_counter() - t0) * 1e3)
        print(f"{mode} device-complete ms: "
              f"median={statistics.median(times):.1f} "
              f"all={[round(t, 1) for t in times]}", flush=True)
        outs[mode] = out

    d = jnp.abs(outs["planes"] - outs["segmented"])
    mse = jnp.mean((outs["planes"] - outs["segmented"]) ** 2)
    peak = jnp.max(jnp.abs(outs["planes"]))
    psnr = 10.0 * jnp.log10(peak * peak / jnp.maximum(mse, 1e-30))
    print(f"max|diff|={float(jnp.max(d)):.3e} psnr={float(psnr):.1f} dB "
          f"finite={bool(jnp.all(jnp.isfinite(outs['segmented'])))}",
          flush=True)


if __name__ == "__main__":
    main()
