"""TPU probe: shard_map overhead bound — 1-chip mesh vs no mesh.

VERDICT r2 weak-#6: multi-chip perf is a projection; the zero-cost datapoint
that bounds the shard_map tax is the SAME tile update dispatched (a) plain
and (b) through `_update_tile_mesh` over a Mesh holding the single real
chip. Identical math, identical shapes — any delta is pure shard_map /
collective-machinery overhead.

Run ALONE on the TPU. Two new jit signatures (~1-2 min compile each).
"""

import statistics
import time


def timed(label, fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    med = statistics.median(ts)
    print(f"  {label}: {med:.1f} ms {[round(t, 1) for t in ts]}", flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState
    from cloudscape_tpu.engine import (
        CloudSkyEngine, _update_tile, _update_tile_mesh,
    )
    from cloudscape_tpu.parallel.sharding import make_mesh

    sun = np.array([0.3, 0.4, -0.85])
    sun /= np.linalg.norm(sun)
    eng = CloudSkyEngine(
        perf=PerfConfig(texture_size=768, frames_to_update=64,
                        march_steps=128),
        config=CloudConfig(cloud_coverage=0.35, sun_disk_scale=2.0,
                           wind_speed=10.0,
                           ground_color=(0.27, 0.19, 0.027, 1.0)),
        sun=SunState(direction=tuple(sun)),
        kernel="fast2",
        cone_res=(32, 512, 512),
        cone_prebake=False,
    )
    eng.update_sky(now=0.0)  # warm state (cone cache, sky LUT)
    mesh = make_mesh(jax.devices()[:1])

    common = dict(
        texture_size=eng.perf.texture_size,
        region=eng.perf.update_region_size,
        steps=eng.perf.march_steps,
        light_steps=eng.perf.light_steps,
        kernel="fast2",
        capacity_frac=0.5,
    )

    def plain():
        out = _update_tile(eng.cloud_ring + 0.0, jnp.int32(0), jnp.int32(0),
                           jnp.int32(0), eng._march_params, eng._noise_arg,
                           eng.sky_ring[0], None, **common)
        np.asarray(out[0, 0, 0, 0])

    def meshed():
        out = _update_tile_mesh(eng.cloud_ring + 0.0, jnp.int32(0),
                                jnp.int32(0), jnp.int32(0),
                                eng._march_params, eng._noise_arg,
                                eng.sky_ring[0], None,
                                mesh=mesh, axis_name="rays", **common)
        np.asarray(out[0, 0, 0, 0])

    print("1-chip-mesh vs no-mesh, same tile update (median of 5):",
          flush=True)
    a = timed("plain _update_tile", plain)
    b = timed("1-chip-mesh _update_tile_mesh", meshed)
    print(f"shard_map tax: {b - a:+.1f} ms ({b / a:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
