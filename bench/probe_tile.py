"""TPU probe: per-tile device-time decomposition at shipped defaults
(VERDICT r2 #4 — reference 60 fps equivalence wants ≤16 ms/tile device).

Splits the fused frame into its parts, each timed device-complete (1-px
readback sync, median of 5):
  1. tile march alone (_march_tile via _update_tile, 9216 rays × 128 steps)
     — uncull and bucketed-cull variants;
  2. the display composite alone (blend + rebrick + composite_display at
     1280×720);
  3. the fused single dispatch (tile + composite);
  4. the fused dispatch with skip_march (composite + ring plumbing only).
Run ALONE on the TPU."""

import importlib.util
import os
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

_spec = importlib.util.spec_from_file_location(
    "bench_root",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "bench.py"),
)
B = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(B)

from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState
from cloudscape_tpu.engine import (
    CloudSkyEngine, _render_frame_fused, _update_tile,
)


def timed(label, fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"  {label}: {statistics.median(ts):.1f} ms "
          f"{[round(t) for t in ts]}", flush=True)
    return statistics.median(ts)


def main():
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
        tile_cull=True,
        cone_prebake=False,  # isolate the dispatches; no background bake
    )
    eye = jnp.asarray(B.view_dirs())
    t0 = time.perf_counter()
    np.asarray(eng.render_frame(eye, now=0.0)[0, 0])
    print(f"warm start {time.perf_counter()-t0:.1f}s", flush=True)

    region = eng.perf.update_region_size
    common = dict(
        texture_size=eng.perf.texture_size, region=region,
        steps=eng.perf.march_steps, light_steps=eng.perf.light_steps,
        kernel="fast2", capacity_frac=0.5,
    )

    def tile_only(rk, prio):
        ring = eng.cloud_ring + 0.0
        out = _update_tile(ring, jnp.int32(0), jnp.int32(0), jnp.int32(0),
                           eng._march_params, eng._noise_arg,
                           eng.sky_ring[0], prio, ray_keep_frac=rk, **common)
        np.asarray(out[0, 0, 0, 0])

    print("device-complete pieces (median of 5):", flush=True)
    timed("tile march UNCULL (9216x128)", lambda: tile_only(None, None))
    timed("tile march cull 0.50", lambda: tile_only(0.5, eng._prio_map))
    timed("tile march cull 0.25", lambda: tile_only(0.25, eng._prio_map))

    def view_only():
        np.asarray(eng.render_view(eye)[0, 0])

    timed("render_view composite (1280x720)", view_only)

    cloud_pair, sky_pair = eng._display_pair_tables()

    def fused(skip):
        ring = eng.cloud_ring + 0.0
        _, frame = _render_frame_fused(
            ring, eng.sky_ring, jnp.int32(0), jnp.int32(0), jnp.int32(0),
            cloud_pair, sky_pair,
            eng._march_params, eng._noise_arg, jnp.int32(0),
            eng.transmittance, eye, jnp.float32(0.5),
            jnp.asarray(eng.frame_data.light_direction, jnp.float32),
            jnp.float32(2.0), None, skip_march=skip, **common)
        np.asarray(frame[0, 0])

    timed("fused skip_march (composite+plumbing)", lambda: fused(True))
    timed("fused tile+composite", lambda: fused(False))

    # v3 (coarse-cell-gated) march at tile scale: does the cell gating's row
    # saving survive its extra machinery at 9216 rays? Two bucket settings.
    from cloudscape_tpu.models.march_fast import march_bricks_v3
    from cloudscape_tpu.ops.octmap import texel_directions

    dirs96 = texel_directions(eng.perf.texture_size, x0=0, y0=0,
                              width=region, height=region)

    def v3_tile(rk, ck, hk):
        fn = jax.jit(lambda d, p, c: march_bricks_v3(
            d, p, eng._bricks, eng.sky_ring[0], steps=eng.perf.march_steps,
            light_steps=eng.perf.light_steps, chunk=region * region,
            cell_keep_frac=ck, hot_keep_frac=hk, cone_cache=c,
            ray_keep_frac=rk, ray_stride=2))
        def run():
            np.asarray(fn(dirs96, eng._march_params, eng._cone_cache)[0, 0, 0])
        return run

    timed("v3 tile march rk .5 ck .5 hk .5", v3_tile(0.5, 0.5, 0.5))
    timed("v3 tile march rk .5 ck .25 hk .35", v3_tile(0.5, 0.25, 0.35))


if __name__ == "__main__":
    main()
