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

    for C, rs in ((32, 2), (32, 1)):
        @jax.jit
        def sel(d, p, C=C, rs=rs):
            flat = d.reshape(-1, 3)
            above, ndir, ss, p0, _, _ = _ray_setup(flat, p, 128)
            prio = _cull_priority(above, ndir, ss, p0, p, bp, 128, C,
                                  32768, shape, rs)
            return jnp.sort(jnp.argsort(-prio)[:314573])

        ms, all_ms = timed(sel, dirs, params)
        print(f"prepass+select C={C} stride={rs}: {ms:.0f} ms  {all_ms}",
              flush=True)

    for C, rs, reps in ((32, 2, 8), (32, 1, 4)):
        fn = jax.jit(lambda d, p, c, C=C, rs=rs: march_bricks_v2(
            d, p, bp, sky, steps=128, chunk=32768, capacity_frac=0.25,
            weather_every=1, cone_cache=c, ray_keep_frac=0.6,
            prepass_steps=C, ray_stride=rs))
        ms, all_ms = timed(fn, dirs, params, cc, reps=reps)
        print(f"culled v2 C={C} stride={rs}: {ms:.0f} ms  {all_ms}",
              flush=True)


if __name__ == "__main__":
    main()
