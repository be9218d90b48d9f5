"""Serving-tick decomposition probe (VERDICT r4 #2).

At the reference's shipped operating point (768² map, 64-frame
amortization, one 96² tile per display frame — `cloud_sky/cloud_sky.gd:
83,111`) the fused `_render_frame_fused` tick measured 31.4 ms device in
BENCH_r04. This probe splits that tick into its blocks, each timed as a
full-cycle fori_loop (K = 64 tiles, same lax.switch bucket dispatch as
bench.py's device loop) with a single scalar readback:

  full     : the exact bench loop (march + ring write + pair preblend +
             rebrick + 1280×720 composite)              [baseline]
  nomarch  : skip_march=True on every tile (everything but the march)
  compo    : composite_display alone, pair textures prebricked OUTSIDE
             the loop (the per-pixel gather+ALU floor)
  preblend : cloud+sky pair blend + build_brick2_device per tick
  march k  : march_bricks_v3 alone at the serving tile shape, optional
             debug_stage isolation (--stages=1,3,6,9,0)

march ≈ full − nomarch; preblend+compo ≈ nomarch (ring write ~0).

Run ALONE on the TPU (never concurrently with any other TPU process).
Each part is one fresh executable: budget ~30-90 s compile per part.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

CONE_RES = (32, 512, 512)


def _median_time(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts), ts


def main() -> None:
    parts = ["full", "nomarch", "compo", "preblend"]
    stages = []
    for a in sys.argv[1:]:
        if a.startswith("--parts="):
            parts = [p for p in a.split("=")[1].split(",") if p]
        if a.startswith("--stages="):
            stages = [int(s) for s in a.split("=")[1].split(",")]

    import jax
    import jax.numpy as jnp

    from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState
    from cloudscape_tpu.engine import CloudSkyEngine, _render_frame_fused
    from cloudscape_tpu.models.compositor import composite_display
    from cloudscape_tpu.models.march_fast import march_bricks_v3
    from cloudscape_tpu.ops.brick import build_brick2_device
    from cloudscape_tpu.ops.octmap import texel_directions

    sun = np.array([0.3, 0.4, -0.85])
    sun = sun / np.linalg.norm(sun)

    def view_dirs(width=1280, height=720):
        fov_y = np.deg2rad(60.0)
        aspect = width / height
        ys = np.linspace(1.0, -1.0, height) * np.tan(fov_y / 2)
        xs = np.linspace(-1.0, 1.0, width) * np.tan(fov_y / 2) * aspect
        xx, yy = np.meshgrid(xs, ys)
        fwd = np.stack([xx, yy + 0.35, -np.ones_like(xx)], axis=-1)
        return (fwd / np.linalg.norm(fwd, axis=-1, keepdims=True)
                ).astype(np.float32)

    eye = jnp.asarray(view_dirs())

    eng = CloudSkyEngine(
        perf=PerfConfig(texture_size=768, frames_to_update=64,
                        march_steps=128),
        config=CloudConfig(cloud_coverage=0.35, sun_disk_scale=2.0,
                           wind_speed=10.0,
                           ground_color=(0.27, 0.19, 0.027, 1.0)),
        sun=SunState(direction=tuple(sun)),
        kernel="fast3", cone_res=CONE_RES, tile_cull=True,
    )
    print("warming one cycle...", flush=True)
    t0 = time.perf_counter()
    for i in range(66):
        np.asarray(eng.render_frame(eye, now=i / 60.0)[0, 0])
    print(f"warm: {time.perf_counter() - t0:.1f}s", flush=True)

    region = eng.perf.update_region_size
    tiles_per_row = eng.perf.texture_size // region
    n_tiles = tiles_per_row * tiles_per_row
    buckets = list(eng._tile_buckets or [1.0] * n_tiles)
    distinct = sorted(set(buckets))
    bucket_idx = jnp.asarray([distinct.index(b) for b in buckets], jnp.int32)
    print(json.dumps({"bucket_hist":
                      {str(b): buckets.count(b) for b in distinct}}),
          flush=True)
    K = n_tiles
    prio_arg = eng._prio_map if eng._prio_map is not None \
        else jnp.zeros((eng.perf.texture_size, eng.perf.texture_size),
                       jnp.float32)
    tex = eng.perf.texture_size
    steps = eng.perf.march_steps
    lsteps = eng.perf.light_steps
    loop_args = (eng.cloud_ring, eng.sky_ring, jnp.int32(0),
                 eng._march_params, eng._noise_arg,
                 jnp.int32(eng.ring.cloud_kernel_sky_slot),
                 eng.transmittance, eye, jnp.float32(0.5),
                 jnp.asarray(eng.frame_data.light_direction, jnp.float32),
                 jnp.float32(eng.config.sun_disk_scale), prio_arg)

    CLOUD_PAIR = eng._display_pair_tables()

    def fused_loop(skip_all: bool):
        def _variant(b):
            def branch(op):
                (ring, sky_ring, x0, y0, params_, noise_arg, sky_slot,
                 tlut_, eye_, blend, light, disk, prio) = op
                return _render_frame_fused(
                    ring, sky_ring, jnp.int32(0), x0, y0,
                    CLOUD_PAIR[0], CLOUD_PAIR[1],
                    params_, noise_arg, sky_slot, tlut_, eye_, blend,
                    light, disk, prio,
                    texture_size=tex, region=region, steps=steps,
                    light_steps=lsteps, kernel="fast3", deband=False,
                    capacity_frac=0.5,
                    ray_keep_frac=None if b >= 1.0 else b,
                    skip_march=skip_all or (b == 0.0))
            return branch

        branches = [_variant(b) for b in distinct]

        @jax.jit
        def run(ring, sky_ring, start, params_, noise_arg, sky_slot, tlut_,
                eye_, blend, light, disk, prio):
            def body(i, carry):
                ring, acc = carry
                tile = (start + i) % n_tiles
                x0 = (tile % tiles_per_row) * region
                y0 = (tile // tiles_per_row) * region
                ring, fr = jax.lax.switch(
                    bucket_idx[tile], branches,
                    (ring, sky_ring, x0, y0, params_, noise_arg, sky_slot,
                     tlut_, eye_, blend + acc * 1e-20, light, disk, prio))
                return ring, acc + fr[0, 0, 0]

            _, acc = jax.lax.fori_loop(0, K, body, (ring, jnp.float32(0.0)))
            return acc
        return run

    results = {}

    def bank(name, fn, args):
        np.asarray(fn(*args))  # compile
        ms, all_ms = _median_time(lambda: np.asarray(fn(*args)), reps=3)
        results[name] = round(ms / K, 3)
        print(json.dumps({"part": name, "per_tile_ms": round(ms / K, 3),
                          "total_ms": round(ms, 1),
                          "all_ms": [round(t, 1) for t in all_ms]}),
              flush=True)

    for part in parts:
        t0 = time.perf_counter()
        if part == "full":
            bank("full", fused_loop(False), loop_args)
        elif part == "nomarch":
            bank("nomarch", fused_loop(True), loop_args)
        elif part == "compo":
            cf = eng.cloud_ring[0]
            cb = build_brick2_device(
                cf + (eng.cloud_ring[1] - cf) * 0.5, (4, 8), (3, 7),
                wrap="clamp")
            sf = eng.sky_ring[0]
            sb = build_brick2_device(
                sf + (eng.sky_ring[1] - sf) * 0.5, (4, 8), (3, 7),
                wrap="clamp")

            @jax.jit
            def compo_loop(cb, sb, tlut_, eye_, light, disk):
                def body(i, acc):
                    fr = composite_display(
                        eye_, cb, sb, tlut_, light + acc * 1e-20, disk,
                        deband=False)
                    return acc + fr[0, 0, 0]
                return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

            bank("compo", compo_loop,
                 (cb, sb, eng.transmittance, eye,
                  jnp.asarray(eng.frame_data.light_direction, jnp.float32),
                  jnp.float32(eng.config.sun_disk_scale)))
        elif part == "preblend":
            @jax.jit
            def preblend_loop(ring, sky_ring, blend):
                def body(i, acc):
                    b = blend + acc * 1e-20
                    cf = ring[0]
                    cb = build_brick2_device(
                        cf + (ring[1] - cf) * b, (4, 8), (3, 7),
                        wrap="clamp")
                    sf = sky_ring[0]
                    sb = build_brick2_device(
                        sf + (sky_ring[1] - sf) * b, (4, 8), (3, 7),
                        wrap="clamp")
                    return acc + cb[0, 0] + sb[0, 0]
                return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

            bank("preblend", preblend_loop,
                 (eng.cloud_ring, eng.sky_ring, jnp.float32(0.5)))
        elif part == "march":
            bricks, cone_cache = eng._noise_arg

            def _mvariant(b):
                def branch(op):
                    x0, y0, params_, sky_img, eps = op
                    if b == 0.0:
                        return jnp.float32(0.0)
                    dirs = texel_directions(tex, x0=x0, y0=y0, width=region,
                                            height=region)
                    ps = max(1, steps // 4)
                    while steps % ps:
                        ps -= 1
                    kw = {}
                    if b < 1.0:
                        kw["cell_keep_frac"] = float(b)
                    tile = march_bricks_v3(
                        dirs, params_, bricks, sky_img, steps=steps,
                        light_steps=lsteps, chunk=min(region * region, 16384),
                        hot_keep_frac=0.5, cone_cache=cone_cache,
                        ray_keep_frac=None, prepass_steps=ps, ray_stride=2,
                        cell_margin=0.1,
                        debug_stage=stages[0] if stages else 0, **kw)
                    if stages and stages[0]:
                        return jnp.asarray(tile, jnp.float32).reshape(-1)[0]
                    return tile[0, 0, 0] + eps
                return branch

            mbranches = [_mvariant(b) for b in distinct]

            @jax.jit
            def march_loop(params_, sky_img):
                def body(i, acc):
                    tile = i % n_tiles
                    x0 = (tile % tiles_per_row) * region
                    y0 = (tile // tiles_per_row) * region
                    r = jax.lax.switch(
                        bucket_idx[tile], mbranches,
                        (x0, y0, params_, sky_img, acc * 1e-20))
                    return acc + r
                return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

            name = f"march_s{stages[0]}" if stages else "march"
            bank(name, march_loop,
                 (eng._march_params,
                  eng.sky_ring[eng.ring.cloud_kernel_sky_slot]))
            if stages:
                stages.pop(0)
        print(f"[{part}: {time.perf_counter() - t0:.1f}s incl compile]",
              flush=True)

    print(json.dumps({"probe": "tile_split", "per_tile_ms": results}),
          flush=True)


if __name__ == "__main__":
    main()
