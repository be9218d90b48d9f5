"""TPU probe: ray-cull stage costs at bench scale (1024×512 × 128 steps).

Times (a) the prepass+selection alone, (b) the culled v2 march at
prepass_steps ∈ {32, 16}. Run ALONE on the TPU.
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
    from cloudscape_tpu.models import atmosphere
    from cloudscape_tpu.models.density import MarchParams
    from cloudscape_tpu.models.march_fast import (
        BrickPack, _cull_priority, _ray_setup, build_cone_cache,
        march_bricks_v2,
    )
    from cloudscape_tpu.models.packs import reference_noise_pack

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
    dirs = jnp.asarray(bench_root.hemisphere_dirs(1024, 512))
    shape = (512, 1024)

    build = jax.jit(lambda p: build_cone_cache(p, bp, 6, res=(32, 512, 512),
                                               chunk=65536))
    cc = jax.block_until_ready(build(params))
    print("cone built", flush=True)

    def timed(fn, *args, reps=4):
        np.asarray(jax.block_until_ready(fn(*args)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jax.block_until_ready(fn(*args)))
            ts.append((time.perf_counter() - t0) * 1e3)
        return sorted(ts)[len(ts) // 2], [round(t) for t in ts]

    # Bench policy with the occlusion cutoff: measured occupancy → bucket.
    from cloudscape_tpu.models.march_fast import (
        occupied_sample_fraction, ray_keep_fraction,
        select_capacity_frac, select_ray_keep_frac,
    )

    kf = float(ray_keep_fraction(dirs, params, bp, steps=128, ray_stride=2))
    rk = select_ray_keep_frac(kf)
    occ = float(occupied_sample_fraction(dirs, params, bp))
    cap = select_capacity_frac(occ / max(rk, 1e-6))
    print(f"policy: keep {kf:.4f} -> {rk}; occ(cutoff) {occ:.4f} -> cap {cap}",
          flush=True)

    variants = [
        ("policy+cutoff", dict(capacity_frac=cap, ray_keep_frac=rk)),
        ("cutoff-off", dict(capacity_frac=cap, ray_keep_frac=rk,
                            t_cutoff=0.0)),
    ]
    base = dict(steps=128, chunk=32768, weather_every=1,
                prepass_steps=32, ray_stride=2)
    for name, over in variants:
        kw = {**base, **over}
        fn = jax.jit(lambda d, p, c, kw=tuple(sorted(kw.items())):
                     march_bricks_v2(d, p, bp, sky, cone_cache=c,
                                     **dict(kw)))
        ms, all_ms = timed(fn, dirs, params, cc, reps=6)
        print(f"culled v2 {name}: {ms:.0f} ms  {all_ms}", flush=True)


if __name__ == "__main__":
    main()
