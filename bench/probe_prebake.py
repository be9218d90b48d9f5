"""TPU probe: cycle-boundary hitch at shipped defaults, cone_prebake vs
synchronous bake (VERDICT r2 #2 done-criterion: max/median tile time ≤ 2×).

Protocol: fused render_frame ticks with a 1-px readback sync per tick
(defeats relay async pipelining), one full warm-up cycle first (absorbs the
prebake executables' remote compiles), then a measured window that crosses
one rotation boundary. Run ALONE on the TPU.
"""

import importlib.util
import os
import statistics
import time

import numpy as np
import jax.numpy as jnp

_spec = importlib.util.spec_from_file_location(
    "bench_root",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "bench.py"),
)
B = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(B)

from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState
from cloudscape_tpu.engine import CloudSkyEngine


def run(prebake: bool, ticks: int = 72):
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
        cone_prebake=prebake,
    )
    eye = jnp.asarray(B.view_dirs())
    t0 = time.perf_counter()
    np.asarray(eng.render_frame(eye, now=0.0)[0, 0])  # warm start
    print(f"[prebake={prebake}] warm start {time.perf_counter()-t0:.1f}s",
          flush=True)
    # Warm-up: one full cycle + boundary (absorbs first-use compiles of the
    # prebake executables and every bucket variant).
    t0 = time.perf_counter()
    for i in range(1, 66):
        np.asarray(eng.render_frame(eye, now=i / 60.0)[0, 0])
    print(f"[prebake={prebake}] warm cycle {time.perf_counter()-t0:.1f}s",
          flush=True)
    times = []
    for i in range(66, 66 + ticks):
        t0 = time.perf_counter()
        f = eng.render_frame(eye, now=i / 60.0)
        np.asarray(f[0, 0])
        times.append((time.perf_counter() - t0) * 1e3)
    med = statistics.median(times)
    print(f"[prebake={prebake}] median {med:.1f} ms  max {max(times):.1f} ms"
          f"  max/med {max(times)/med:.2f}", flush=True)
    print("  ticks:", [round(t) for t in times], flush=True)
    return times


if __name__ == "__main__":
    run(True)
    run(False)
