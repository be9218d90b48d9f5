"""TPU probe: march_bricks_v3 (coarse-cell-gated march) at bench scale.

Run ALONE on the TPU (single process). Prints policy stats, device-complete
timings (1-px sync, median of 5), and optionally PSNR vs the shipped v2
configuration (--vs-v2) or the exact march (--exact).

Budget note: each flag adds one large jit compile (~30-60 s through the
remote-compile helper) — default run compiles policy probes + cone build +
v3 only.
"""

import statistics
import sys
import time

import numpy as np


def main():
    import importlib.util
    import os

    import jax
    import jax.numpy as jnp

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
        BrickPack, build_cone_cache, march_bricks, march_bricks_v2,
        march_bricks_v3, v2_auto_policy, v3_auto_policy,
    )
    from cloudscape_tpu.models.packs import reference_noise_pack
    from cloudscape_tpu.utils.image import psnr

    steps = 128
    cone_res = (32, 512, 512)
    do_v2 = "--vs-v2" in sys.argv
    do_exact = "--exact" in sys.argv
    margin = 0.1
    for a in sys.argv[1:]:
        if a.startswith("--margin="):
            margin = float(a.split("=")[1])

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

    fn3 = jax.jit(
        lambda d, p, c: march_bricks_v3(d, p, bp, sky, steps=steps,
                                        chunk=32768, cell_keep_frac=ck,
                                        hot_keep_frac=hk, cone_cache=c,
                                        ray_keep_frac=rk, ray_stride=2,
                                        cell_margin=margin)
    )
    t0 = time.perf_counter()
    out3 = np.asarray(jax.block_until_ready(fn3(dirs, params, cone)))
    print(f"v3 compile+first ({time.perf_counter()-t0:.1f}s) "
          f"finite={np.isfinite(out3).all()} "
          f"cloud_frac={(out3[..., 3] > 0.1).mean():.4f}", flush=True)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fn3(dirs, params, cone)[0, 0])
        times.append((time.perf_counter() - t0) * 1e3)
    print(f"v3 device-complete ms: median={statistics.median(times):.1f} "
          f"all={[round(t, 1) for t in times]}", flush=True)

    if do_v2:
        ray_keep, capacity_frac, t_cutoff, occ = v2_auto_policy(
            dirs, params, bp, steps=steps)
        fn2 = jax.jit(
            lambda d, p, c: march_bricks_v2(d, p, bp, sky, steps=steps,
                                            chunk=32768,
                                            capacity_frac=capacity_frac,
                                            cone_cache=c,
                                            ray_keep_frac=ray_keep,
                                            ray_stride=2, t_cutoff=t_cutoff)
        )
        t0 = time.perf_counter()
        out2 = np.asarray(jax.block_until_ready(fn2(dirs, params, cone)))
        print(f"v2 compile+first ({time.perf_counter()-t0:.1f}s)", flush=True)
        times2 = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn2(dirs, params, cone)[0, 0])
            times2.append((time.perf_counter() - t0) * 1e3)
        print(f"v2 device-complete ms: median={statistics.median(times2):.1f} "
              f"all={[round(t, 1) for t in times2]}", flush=True)
        print(f"v3 vs v2 PSNR: {psnr(out3, out2):.2f} dB", flush=True)

    if do_exact:
        fne = jax.jit(
            lambda d, p: march_bricks(d, p, bp, sky, steps=steps,
                                      chunk=32768, capacity_frac=0.25)
        )
        t0 = time.perf_counter()
        oute = np.asarray(jax.block_until_ready(fne(dirs, params)))
        print(f"exact compile+first ({time.perf_counter()-t0:.1f}s)",
              flush=True)
        print(f"v3 vs exact PSNR: {psnr(out3, oute):.2f} dB", flush=True)


if __name__ == "__main__":
    main()
