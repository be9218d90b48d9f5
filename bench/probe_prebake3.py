"""TPU probe: stage-labeled tick loop at shipped defaults after the
boundary-spike flattening (fresh-skip, sliced brick assembly, pipelined
sky-LUT slot, sliced cull prepass + deferred readback). The VERDICT r2 #2
done-criterion: max/median tile tick ≤ 2× across a full cycle including the
boundary. Run ALONE on the TPU."""

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


def stage(e):
    p = e._pending
    if p is None:
        return "none"
    if p.fresh:
        return "boundary"
    if p.cone is None:
        if p.idx is None and p.occ_done < getattr(e, "_n_occ", 0):
            return f"occ{p.occ_done}"
        if p.idx is None:
            return "idxfin"
        if p.slices_done < e._n_cone_slices:
            return f"bake{p.slices_done}"
        if p.asm_done < e._n_asm:
            return f"asm{p.asm_done}"
        return "wrap"
    if p.sky is None:
        return f"sky{len(p.sky_rows or [])}"
    if e.tile_cull and p.buckets is None:
        if p.prio is None and p.cull_done < e._n_cull:
            return f"cull{p.cull_done}"
        if p.prio is None:
            return "cullfin"
        return "cullread"
    return "done"


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
        kernel="fast3",
        cone_res=(32, 512, 512),
        tile_cull=True,
    )
    print(f"schedule: occ={eng._n_occ}x{eng._occ_slice} "
          f"cone={eng._n_cone_slices}x{eng._cone_slice} "
          f"asm={eng._n_asm}x{eng._asm_slice} "
          f"sky={eng._n_sky}x{eng._sky_rows} cull={eng._n_cull}", flush=True)
    eye = jnp.asarray(B.view_dirs())
    t0 = time.perf_counter()
    np.asarray(eng.render_frame(eye, now=0.0)[0, 0])
    print(f"warm start {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(1, 66):
        np.asarray(eng.render_frame(eye, now=i / 60.0)[0, 0])
    print(f"warm cycle {time.perf_counter()-t0:.1f}s", flush=True)

    rows = []
    for i in range(66, 66 + 72):
        s_before = stage(eng)
        fr = eng.ring.frame
        t0 = time.perf_counter()
        f = eng.render_frame(eye, now=i / 60.0)
        np.asarray(f[0, 0])
        rows.append((fr, s_before, (time.perf_counter() - t0) * 1e3))
    ts = [r[2] for r in rows]
    med = statistics.median(ts)
    print(f"median {med:.1f} ms  max {max(ts):.1f} ms  "
          f"max/med {max(ts)/med:.2f}", flush=True)
    for fr, s, t in rows:
        if t > 1.5 * med:
            print(f"  frame {fr:3d}  stage-before {s:10s}  {t:.1f} ms",
                  flush=True)
    print("  all:", [(r[0], r[1][:7], round(r[2])) for r in rows], flush=True)


if __name__ == "__main__":
    main()
