"""TPU probe: device-trace the culled v2 march and summarize per-op time.

Runs one steady-state headline frame under jax.profiler, then parses the
perfetto trace json and prints the top fusions/ops by device time — ground
truth for where the ~1.4 s actually goes. Run ALONE on the TPU.
"""

import glob
import gzip
import json
import os
import shutil
import time

import numpy as np

LOG = "/tmp/cloudscape_trace"


def main():
    import importlib.util

    import jax
    import jax.numpy as jnp

    spec = importlib.util.spec_from_file_location(
        "bench_root",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py"))
    bench_root = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_root)
    from cloudscape_tpu.models import atmosphere
    from cloudscape_tpu.models.density import MarchParams
    from cloudscape_tpu.models.march_fast import (
        BrickPack, build_cone_cache, march_bricks_v2,
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
        light_direction=sun, ground_color=np.array([0.27, 0.19, 0.027]))
    dirs = jnp.asarray(bench_root.hemisphere_dirs(1024, 512))
    cc = jax.block_until_ready(jax.jit(lambda p: build_cone_cache(
        p, bp, 6, res=(32, 512, 512), chunk=65536))(params))
    fn = jax.jit(lambda d, p, c: march_bricks_v2(
        d, p, bp, sky, steps=128, chunk=32768, capacity_frac=0.22,
        cone_cache=c, ray_keep_frac=0.55, ray_stride=2))
    np.asarray(jax.block_until_ready(fn(dirs, params, cc)))  # compile+warm
    t0 = time.perf_counter()
    np.asarray(jax.block_until_ready(fn(dirs, params, cc)))
    print(f"frame: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

    shutil.rmtree(LOG, ignore_errors=True)
    jax.profiler.start_trace(LOG)
    np.asarray(jax.block_until_ready(fn(dirs, params, cc)))
    jax.profiler.stop_trace()

    files = glob.glob(os.path.join(LOG, "**", "*.trace.json.gz"),
                      recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Device-lane complete events: sum wall duration by (truncated) name.
    by_name = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        # keep only TPU device lanes (pid names include 'TPU' typically);
        # fall back to everything if metadata is absent.
        name = e.get("name", "?")
        if name.startswith(("process_", "thread_")):
            continue
        dur = e["dur"] / 1e3  # us → ms
        key = name[:60]
        by_name[key] = by_name.get(key, 0.0) + dur
        total += dur
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:40]
    print(f"sum of event durations: {total:.0f} ms (overcounts across lanes)")
    for name, ms in top:
        print(f"{ms:9.1f} ms  {name}", flush=True)


if __name__ == "__main__":
    main()
