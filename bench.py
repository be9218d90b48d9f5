"""Headline benchmark: full 1024×512 hemisphere re-render on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N, ...extras}

Baseline (BASELINE.md): < 16 ms for a full 1024×512-ray re-render at 128
march steps on one v5e chip. `vs_baseline` is 16 / measured_ms (>1 = faster
than target).

The headline path is `march_bricks_v3` (coarse-cell-gated staged march:
ray cull + per-ray live-cell compaction + hot-cell sub-compaction, all from
one shared stride-2 prepass) reading the per-cycle cone-density cache; the
cache build is timed separately and reported as `cone_build_ms` (it is
per-cycle state like the sky LUT — amortized over an engine cycle — and
`value_with_bake` reports the sum for a cold single-shot render). Quality
at EXACTLY these knob ratios is gated in tests/test_bench_config.py
(≥ 40 dB vs the exact march, bench scene + high-coverage variant).

Also reported (VERDICT r1 #5): the amortized operating point at the
reference's shipped defaults (768² map, 64-frame amortization, 128 steps,
`clouds_sky.tres`) — `per_tile_ms` is the steady-state median of the FUSED
single-dispatch `render_frame` (tile tick + 1280×720 composite in one
executable), `fps_equivalent` its inverse.

Runs on the default platform (the real TPU under axon); do NOT run
concurrently with any other TPU process.
"""

from __future__ import annotations

import json
import math
import statistics
import sys
import time

import numpy as np

BASELINE_MS = 16.0
WIDTH, HEIGHT = 1024, 512
STEPS = 128
CONE_RES = (32, 512, 512)  # 42.0 dB vs exact at full scale (PERF_NOTES)


def hemisphere_dirs(width: int, height: int) -> np.ndarray:
    """Lat-long grid over the upper hemisphere: width azimuths × height
    elevations, y-up world frame — width*height independent rays."""
    az = (np.arange(width) + 0.5) / width * 2.0 * np.pi - np.pi
    el = (np.arange(height) + 0.5) / height * (np.pi / 2.0)
    cos_el = np.cos(el)[:, None]
    d = np.stack(
        [
            cos_el * np.cos(az)[None, :],
            np.broadcast_to(np.sin(el)[:, None], (height, width)),
            cos_el * np.sin(az)[None, :],
        ],
        axis=-1,
    )
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def view_dirs(width: int = 1280, height: int = 720) -> np.ndarray:
    """A 1280×720 pinhole camera looking at the horizon (the reference demo's
    window size, `project.godot`)."""
    xs = (np.arange(width) + 0.5) / width * 2.0 - 1.0
    ys = (np.arange(height) + 0.5) / height * 2.0 - 1.0
    d = np.stack(
        [
            np.broadcast_to(xs[None, :] * 0.84, (height, width)),  # ~80° hfov
            np.broadcast_to(-ys[:, None] * 0.47 + 0.25, (height, width)),
            np.full((height, width), -1.0),
        ],
        axis=-1,
    )
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def _median_time(fn, reps: int = 5) -> tuple[float, list]:
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(times), [round(t, 2) for t in times]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cloudscape_tpu.models import atmosphere
    from cloudscape_tpu.models.density import MarchParams
    from cloudscape_tpu.models.march_fast import (
        BrickPack, build_cone_cache, march_bricks, march_bricks_v3,
        ray_keep_fraction, v3_auto_policy,
    )
    from cloudscape_tpu.models.packs import reference_noise_pack

    dev = jax.devices()[0]

    noise = reference_noise_pack()
    bricks = BrickPack.from_noise(noise)
    tlut = atmosphere.transmittance_lut()
    sun = np.array([0.3, 0.4, -0.85])
    sun /= np.linalg.norm(sun)
    sky = atmosphere.sky_lut(tlut, jnp.asarray(sun, jnp.float32))
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]),
        detailed_pos=np.array([0.4, 0.2]),
        weather_pos=np.array([0.01, 0.02]),
        time=12.5,
        cloud_coverage=0.35,
        light_direction=sun,
        ground_color=np.array([0.27, 0.19, 0.027]),
    )
    dirs = jnp.asarray(hemisphere_dirs(WIDTH, HEIGHT))

    # Scene-adaptive ray cull + live-cell + hot-cell capacity buckets (the
    # same policy the quality gates in tests/test_march_v3.py /
    # test_bench_config.py exercise): ray bucket from the prepass keep
    # fraction; live-cell bucket from the coarse-cell occupancy WITHIN kept
    # rays; hot-cell bucket from the pre>0 fraction within live cells.
    keep = float(ray_keep_fraction(dirs, params, bricks, steps=STEPS,
                                   ray_stride=2))
    ray_keep, cell_keep, hot_keep, cell_frac, hot_frac = v3_auto_policy(
        dirs, params, bricks, steps=STEPS)

    # ---- Per-cycle cone-density cache (state, like the sky LUT).
    build = jax.jit(lambda p: build_cone_cache(p, bricks, 6, res=CONE_RES,
                                               chunk=65536))
    cone = jax.block_until_ready(build(params))
    cone_ms, _ = _median_time(
        lambda: jax.block_until_ready(build(params)), reps=3
    )

    # ---- Headline: full re-render.
    fn = jax.jit(
        lambda d, p, c: march_bricks_v3(d, p, bricks, sky, steps=STEPS,
                                        chunk=32768,
                                        cell_keep_frac=cell_keep,
                                        hot_keep_frac=hot_keep,
                                        cone_cache=c,
                                        ray_keep_frac=ray_keep,
                                        ray_stride=2)
    )
    out = np.asarray(jax.block_until_ready(fn(dirs, params, cone)))
    finite = bool(np.isfinite(out).all())
    clouds_frac = float((out[..., 3] > 0.1).mean())

    # Device-complete timing: a 1-px readback forces the whole frame
    # computation to finish (and defeats the relay's async pipelining,
    # which makes bare block_until_ready under-report) without paying the
    # full-frame transfer. Hauling the 8.4 MB hemisphere back through the
    # axon loopback relay runs at ~35 MB/s (~240 ms) — a deployment
    # artifact (production displays/streams from device memory), reported
    # separately below, same methodology as the per-tile metric.
    def _device_complete():
        np.asarray(fn(dirs, params, cone)[0, 0])

    ms, all_ms = _median_time(_device_complete)
    mrays = WIDTH * HEIGHT / (ms * 1e-3) / 1e6
    t0 = time.perf_counter()
    np.asarray(jax.block_until_ready(fn(dirs, params, cone)))
    readback_ms = (time.perf_counter() - t0) * 1e3 - ms

    # The headline is now banked — everything below degrades to null fields
    # on failure so the driver ALWAYS records the march number (VERDICT r3
    # #1: r03's capture died with zero output).
    rec = {
        "metric": "hemisphere_1024x512_rerender",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 4),
        # Honest cold-start accounting (VERDICT r2 #7): the same ratio
        # against the bake-INCLUSIVE single-shot number, until the bake is
        # fully amortized per-frame.
        "vs_baseline_with_bake": round(BASELINE_MS / (ms + cone_ms), 4),
        "mrays_per_sec_per_chip": round(mrays, 2),
        "march_steps": STEPS,
        "finite": finite,
        "clouds_frac": round(clouds_frac, 4),
        "cone_build_ms": round(cone_ms, 1),
        "cell_keep_frac": cell_keep,
        "hot_keep_frac": hot_keep,
        "cell_frac_measured": round(cell_frac, 4),
        "hot_frac_measured": round(hot_frac, 4),
        "ray_keep_frac": ray_keep,
        "ray_keep_measured": round(keep, 4),
        "value_with_bake": round(ms + cone_ms, 1),
        "hemisphere_readback_ms": round(max(readback_ms, 0.0), 1),
        "quality_gate": "tests/test_bench_config.py (>=40dB, v3 vs exact)",
        "device": str(dev),
        "all_ms": all_ms,
    }

    # ---- v3 quality at FULL scale, on chip (VERDICT r3 #6): PSNR vs the
    # exact brick march (≡ the scan anchor ~1 ulp, tests/test_brick.py) at
    # exactly the headline scene/knobs — a measured number, not the CPU
    # ratio gate's extrapolation.
    try:
        exact_fn = jax.jit(
            lambda d, p: march_bricks(d, p, bricks, sky, steps=STEPS,
                                      chunk=32768, capacity_frac=0.2)
        )
        exact = np.asarray(jax.block_until_ready(exact_fn(dirs, params)))
        peak = max(float(np.abs(exact).max()), 1e-9)
        mse = float(((out - exact) ** 2).mean())
        rec["quality_db_vs_exact"] = round(
            10.0 * math.log10(peak * peak / max(mse, 1e-20)), 2)
    except Exception as e:
        print(f"quality capture failed: {e!r}", file=sys.stderr)
        rec["quality_db_vs_exact"] = None

    # ---- High-coverage quality at FULL scale, on chip (VERDICT r4 #6):
    # the 0.7-coverage variant previously lived only in the CPU-scale
    # ratio gate (tests/test_bench_config.py). Own auto-policy buckets
    # (the knobs the engine would pick for this scene) + own cone cache;
    # same exact-march referee.
    try:
        params_hc = MarchParams.create(
            cloud_pos=np.array([1.5, -0.3]),
            detailed_pos=np.array([0.4, 0.2]),
            weather_pos=np.array([0.01, 0.02]),
            time=12.5,
            cloud_coverage=0.7,
            light_direction=sun,
            ground_color=np.array([0.27, 0.19, 0.027]),
        )
        rk_h, ck_h, hk_h, _, _ = v3_auto_policy(dirs, params_hc, bricks,
                                                steps=STEPS)
        fn_hc = jax.jit(
            lambda d, p, c: march_bricks_v3(d, p, bricks, sky, steps=STEPS,
                                            chunk=32768, cell_keep_frac=ck_h,
                                            hot_keep_frac=hk_h, cone_cache=c,
                                            ray_keep_frac=rk_h, ray_stride=2)
        )
        cone_hc = jax.block_until_ready(build(params_hc))
        out_hc = np.asarray(jax.block_until_ready(
            fn_hc(dirs, params_hc, cone_hc)))
        exact_hc = np.asarray(jax.block_until_ready(
            exact_fn(dirs, params_hc)))
        peak = max(float(np.abs(exact_hc).max()), 1e-9)
        mse = float(((out_hc - exact_hc) ** 2).mean())
        rec["quality_db_vs_exact_high_coverage"] = round(
            10.0 * math.log10(peak * peak / max(mse, 1e-20)), 2)
        rec["high_coverage_policy"] = [rk_h, ck_h, hk_h]
    except Exception as e:
        print(f"high-coverage quality capture failed: {e!r}", file=sys.stderr)
        rec["quality_db_vs_exact_high_coverage"] = None

    try:
        _per_tile_metrics(rec, sun, jnp.asarray(view_dirs()))
    except Exception as e:
        print(f"per-tile metrics failed: {e!r}", file=sys.stderr)
        for k in ("per_tile_ms", "per_tile_max_ms", "per_tile_hitch",
                  "fps_equivalent", "per_tile_device_ms",
                  "fps_equivalent_device", "per_tile_readback_ms"):
            rec.setdefault(k, None)

    print(json.dumps(rec))


def _per_tile_metrics(rec: dict, sun, eye) -> None:
    """Amortized operating point at the reference's shipped defaults —
    fills rec in place so a failure anywhere leaves the headline intact."""
    import jax
    import jax.numpy as jnp

    from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState
    from cloudscape_tpu.engine import CloudSkyEngine

    eng = CloudSkyEngine(
        perf=PerfConfig(texture_size=768, frames_to_update=64,
                        march_steps=128),
        config=CloudConfig(cloud_coverage=0.35, sun_disk_scale=2.0,
                           wind_speed=10.0,
                           ground_color=(0.27, 0.19, 0.027, 1.0)),
        sun=SunState(direction=tuple(sun)),
        kernel="fast3",
        cone_res=CONE_RES,
        tile_cull=True,
    )
    rec["per_tile_kernel"] = eng.kernel
    frame = np.asarray(eng.render_frame(eye, now=0.0))  # warm start + compile
    rec["per_tile_finite"] = bool(np.isfinite(frame).all())
    # per_tile_ms: frame COMPLETE on device (1-px sync defeats async
    # pipelining). A deployment displays from device memory; hauling the
    # full 11 MB frame back through the axon loopback relay costs a further
    # ~250 ms of tunnel bandwidth (a deployment artifact, PERF_NOTES) and is
    # reported separately as per_tile_readback_ms.
    # One warm cycle (absorbs the prebake executables' first compiles and
    # every bucket variant), then a measured window crossing one rotation
    # boundary — per_tile_hitch = max/median across the window is the
    # flat-frame-cost gate (the reference's per-frame cost is flat;
    # VERDICT r2 #2 done-criterion ≤ 2×).
    for i in range(1, 66):
        np.asarray(eng.render_frame(eye, now=i / 60.0)[0, 0])
    tile_times = []
    for i in range(66, 66 + 70):
        t0 = time.perf_counter()
        f = eng.render_frame(eye, now=i / 60.0)
        np.asarray(f[0, 0])
        tile_times.append((time.perf_counter() - t0) * 1e3)
    per_tile_ms = statistics.median(tile_times)
    per_tile_max_ms = max(tile_times)
    # p95-based hitch alongside the max-based one: the e2e path rides the
    # axon loopback relay, whose jitter produces lone ~2x outlier ticks
    # even with NO prebake work scheduled (docs/PERF_NOTES.md round 3 —
    # "a lone 320 ms tick mid-cycle in the no-prebake run too"); the p95
    # isolates the schedule's actual flatness from single-tick transport
    # noise. Both are reported.
    p95 = sorted(tile_times)[int(len(tile_times) * 0.95)]
    t0 = time.perf_counter()
    np.asarray(jax.block_until_ready(eng.render_frame(eye, now=140 / 60.0)))
    rec["per_tile_ms"] = round(per_tile_ms, 2)
    rec["per_tile_max_ms"] = round(per_tile_max_ms, 1)
    rec["per_tile_hitch"] = round(per_tile_max_ms / per_tile_ms, 2)
    rec["per_tile_hitch_p95"] = round(p95 / per_tile_ms, 2)
    rec["fps_equivalent"] = round(1000.0 / per_tile_ms, 1)
    rec["per_tile_readback_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    rec["per_tile_config"] = \
        "768px_64frames_128steps_fused_1280x720_tilecull"
    rec["tile_all_ms"] = [round(t, 1) for t in tile_times]

    # ---- Device-only per-tile time (VERDICT r2 #4): a FULL amortized
    # cycle's frame ticks inside ONE executable — a lax.fori_loop over the
    # row-major tile sweep whose body lax.switches over the cycle's actual
    # per-tile bucket variants (0.0 skip / v3 cell buckets / dense 1.0 —
    # the same executables the serving loop dispatches) — with a single
    # 1-px readback, so the ~50-55 ms per-dispatch relay RTT amortizes
    # below 1 ms. loop_time/n_tiles is the true MEAN device cost of one
    # serving frame (tile march + blend + rebrick + 1280×720 composite)
    # over a cycle, honoring the tile-cull distribution.
    from cloudscape_tpu.engine import _render_frame_fused

    region = eng.perf.update_region_size
    tiles_per_row = eng.perf.texture_size // region
    n_tiles = tiles_per_row * tiles_per_row
    buckets = list(eng._tile_buckets or [1.0] * n_tiles)
    distinct = sorted(set(buckets))
    bucket_idx = jnp.asarray([distinct.index(b) for b in buckets], jnp.int32)
    rec["tile_bucket_hist"] = {str(b): buckets.count(b) for b in distinct}
    K = n_tiles

    cloud_pair, sky_pair = eng._display_pair_tables()

    def _variant(b):
        def branch(op):
            ring, sky_ring, x0, y0, params_, noise_arg, sky_slot, tlut_, \
                eye_, blend, light, disk, prio = op
            return _render_frame_fused(
                ring, sky_ring, jnp.int32(0), x0, y0,
                cloud_pair, sky_pair,
                params_, noise_arg, sky_slot, tlut_, eye_, blend, light,
                disk, prio,
                texture_size=eng.perf.texture_size, region=region,
                steps=eng.perf.march_steps,
                light_steps=eng.perf.light_steps,
                kernel=eng.kernel, deband=False, capacity_frac=0.5,
                ray_keep_frac=None if b >= 1.0 else b,
                skip_march=(b == 0.0))

        return branch

    branches = [_variant(b) for b in distinct]
    prio_arg = eng._prio_map if eng._prio_map is not None \
        else jnp.zeros((eng.perf.texture_size, eng.perf.texture_size),
                       jnp.float32)

    @jax.jit
    def _frames_looped(ring, sky_ring, start, params_, noise_arg, sky_slot,
                       tlut_, eye_, blend, light, disk, prio):
        def body(i, carry):
            ring, acc = carry
            tile = (start + i) % n_tiles
            x0 = (tile % tiles_per_row) * region
            y0 = (tile // tiles_per_row) * region
            ring, fr = jax.lax.switch(
                bucket_idx[tile], branches,
                (ring, sky_ring, x0, y0, params_, noise_arg, sky_slot,
                 tlut_, eye_, blend, light, disk, prio))
            return ring, acc + fr[0, 0, 0]

        _, acc = jax.lax.fori_loop(0, K, body, (ring, jnp.float32(0.0)))
        return acc

    loop_args = (eng.cloud_ring, eng.sky_ring, jnp.int32(0),
                 eng._march_params, eng._noise_arg,
                 jnp.int32(eng.ring.cloud_kernel_sky_slot),
                 eng.transmittance, eye, jnp.float32(0.5),
                 jnp.asarray(eng.frame_data.light_direction, jnp.float32),
                 jnp.float32(eng.config.sun_disk_scale), prio_arg)
    try:
        np.asarray(_frames_looped(*loop_args))  # compile
        dev_total_ms, _ = _median_time(
            lambda: np.asarray(_frames_looped(*loop_args)), reps=3)
        per_tile_device_ms = dev_total_ms / K
        rec["per_tile_device_ms"] = round(per_tile_device_ms, 2)
        rec["fps_equivalent_device"] = round(1000.0 / per_tile_device_ms, 1)
    except Exception as e:  # degrade: keep the headline line alive
        print(f"device-loop metric failed: {e!r}", file=sys.stderr)
        rec["per_tile_device_ms"] = None
        rec["fps_equivalent_device"] = None


if __name__ == "__main__":
    main()
