"""TPU probe: decompose the remaining cycle-boundary spikes at shipped
defaults under cone_prebake (after the amortized bake landed). Measures the
isolated device cost of each boundary-region dispatch, then runs a
stage-LABELED tick loop so every elevated tick maps to the work that caused
it. Run ALONE on the TPU."""

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
    CloudSkyEngine, _cell_baker, _cone_assembler, _cone_idx_jit,
    _update_sky_lut_slot,
)


def sync(x):
    jax.block_until_ready(x)


def timed(label, fn, reps=3):
    fn()  # compile/warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"  {label}: {statistics.median(ts):.1f} ms  {[round(t) for t in ts]}",
          flush=True)


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
    )
    eye = jnp.asarray(B.view_dirs())
    t0 = time.perf_counter()
    np.asarray(eng.render_frame(eye, now=0.0)[0, 0])
    print(f"warm start {time.perf_counter()-t0:.1f}s", flush=True)

    res = eng.cone_res
    params = eng._march_params
    bricks = eng._bricks

    print("isolated device costs (median of 3, sync):", flush=True)
    # _update_sky_lut_slot donates its ring arg — feed it a scratch copy.
    timed("sky_lut_slot", lambda: sync(_update_sky_lut_slot(
        eng.sky_ring + 0.0, 0, eng.transmittance,
        jnp.asarray(eng.frame_data.light_direction, jnp.float32))))
    idx = jax.block_until_ready(_cone_idx_jit(res)(params, bricks))
    timed("cone_idx (occupancy+compact)",
          lambda: sync(_cone_idx_jit(res)(params, bricks)))
    baker = _cell_baker(eng.perf.light_steps, res, eng._cone_slice)

    def bake_once():
        vol = jnp.zeros((int(np.prod(res)),), jnp.float32)
        sync(baker(vol, idx, jnp.int32(0), params, bricks))
    timed(f"bake slice ({eng._cone_slice} cells)", bake_once)
    vol = jnp.zeros((int(np.prod(res)),), jnp.float32)
    timed("assemble (brick build)",
          lambda: sync(_cone_assembler()(vol.reshape(res)).table))
    timed("cull prepass+readback",
          lambda: eng._compute_tile_cull(params))

    # Labeled tick loop across a boundary.
    t0 = time.perf_counter()
    for i in range(1, 66):
        np.asarray(eng.render_frame(eye, now=i / 60.0)[0, 0])
    print(f"warm cycle {time.perf_counter()-t0:.1f}s", flush=True)

    def stage(e):
        p = e._pending
        if p is None:
            return "none"
        if p.idx is None:
            return "idx"
        if p.slices_done < e._n_cone_slices:
            return f"bake{p.slices_done}"
        if p.cone is None:
            return "assemble"
        if e.tile_cull and p.prio is None:
            return "cull"
        return "done"

    rows = []
    for i in range(66, 66 + 72):
        s_before = stage(eng)
        fr = eng.ring.frame
        t0 = time.perf_counter()
        f = eng.render_frame(eye, now=i / 60.0)
        np.asarray(f[0, 0])
        rows.append((fr, s_before, (time.perf_counter() - t0) * 1e3))
    med = statistics.median(r[2] for r in rows)
    print(f"labeled ticks (median {med:.1f} ms):", flush=True)
    for fr, s, t in rows:
        if t > 1.5 * med:
            print(f"  frame {fr:3d}  stage-before {s:10s}  {t:.1f} ms",
                  flush=True)
    print("  all:", [(r[0], r[1][:6], round(r[2])) for r in rows], flush=True)


if __name__ == "__main__":
    main()
