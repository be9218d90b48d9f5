"""TPU probe: march_bricks_v2 (staged erosion + cone cache) at bench scale.

Run ALONE on the TPU (single process). Prints timings + PSNR vs the exact
compacted march.
"""

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
    )
    from cloudscape_tpu.models.packs import reference_noise_pack
    from cloudscape_tpu.utils.image import psnr

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cone_res = tuple(int(x) for x in sys.argv[2].split(",")) if len(sys.argv) > 2 \
        else (32, 512, 512)
    cap = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    do_exact = "--exact" in sys.argv
    do_cull = "--cull" in sys.argv
    do_vs_uncull = "--vs-uncull" in sys.argv

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

    build = jax.jit(
        lambda p: build_cone_cache(p, bp, 6, res=cone_res, chunk=65536)
    )
    t0 = time.perf_counter()
    cc = jax.block_until_ready(build(params))
    print(f"cone build compile+run: {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    cc = jax.block_until_ready(build(params))
    print(f"cone build steady ({cone_res}): {time.perf_counter()-t0*1:.2f}s",
          flush=True)

    ray_keep = None
    if do_cull:
        from cloudscape_tpu.models.march_fast import (
            occupied_sample_fraction, ray_keep_fraction,
            select_capacity_frac, select_ray_keep_frac,
        )

        t0 = time.perf_counter()
        kf = float(ray_keep_fraction(dirs, params, bp, steps=steps))
        occ = float(occupied_sample_fraction(dirs, params, bp))
        ray_keep = select_ray_keep_frac(kf)
        cap = select_capacity_frac(occ / max(ray_keep, 1e-6))
        print(f"cull: keep {kf:.4f} -> bucket {ray_keep}, occ {occ:.4f} -> "
              f"cap {cap} ({time.perf_counter()-t0:.1f}s)", flush=True)

    fn = jax.jit(lambda d, p, c: march_bricks_v2(
        d, p, bp, sky, steps=steps, chunk=32768, capacity_frac=cap,
        weather_every=1, cone_cache=c, ray_keep_frac=ray_keep))
    t0 = time.perf_counter()
    out = np.asarray(jax.block_until_ready(fn(dirs, params, cc)))
    print(f"v2 compile+run: {time.perf_counter()-t0:.2f}s", flush=True)
    assert np.isfinite(out).all()
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fn(dirs, params, cc)))
        times.append((time.perf_counter() - t0) * 1e3)
    print(f"v2 steady: {sorted(times)[2]:.0f} ms  (all: "
          f"{[round(t) for t in times]})", flush=True)

    if do_vs_uncull and ray_keep is not None:
        fnu = jax.jit(lambda d, p, c: march_bricks_v2(
            d, p, bp, sky, steps=steps, chunk=32768, capacity_frac=0.15,
            weather_every=1, cone_cache=c))
        unc = np.asarray(jax.block_until_ready(fnu(dirs, params, cc)))
        t0 = time.perf_counter()
        unc = np.asarray(jax.block_until_ready(fnu(dirs, params, cc)))
        print(f"uncull steady: {(time.perf_counter()-t0)*1e3:.0f} ms; "
              f"PSNR culled vs unculled: {psnr(out, unc):.1f} dB", flush=True)

    if do_exact:
        ex = jax.jit(lambda d, p: march_bricks(
            d, p, bp, sky, steps=steps, chunk=32768, capacity_frac=0.08))
        t0 = time.perf_counter()
        exact = np.asarray(jax.block_until_ready(ex(dirs, params)))
        print(f"exact compile+run: {time.perf_counter()-t0:.2f}s", flush=True)
        t0 = time.perf_counter()
        exact = np.asarray(jax.block_until_ready(ex(dirs, params)))
        print(f"exact steady: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
        print(f"PSNR v2 vs exact: {psnr(out, exact):.1f} dB", flush=True)


if __name__ == "__main__":
    main()
