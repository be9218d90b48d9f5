"""Benchmark sweep over the five BASELINE.json configs.

Prints one JSON line per config (bench.py remains the single-headline
driver entry point). Run on the real TPU:

    python bench/sweep.py            # all configs
    python bench/sweep.py 1 4 5      # subset
    python bench/sweep.py --out SWEEP_r05.json   # also bank the rows
                                     # as a machine-readable artifact
                                     # (VERDICT r4 #8)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np


def _timed(fn, *args, reps: int = 3):
    import jax

    np.asarray(jax.block_until_ready(fn(*args)))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = np.asarray(jax.block_until_ready(fn(*args)))
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts), out


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import hemisphere_dirs

    from cloudscape_tpu.models import atmosphere
    from cloudscape_tpu.models.density import MarchParams
    from cloudscape_tpu.models.march_fast import (
        BrickPack, build_cone_cache, march_bricks, march_bricks_v2,
        march_bricks_v3, march_hierarchical, v2_auto_policy, v3_auto_policy,
    )
    from cloudscape_tpu.models.packs import procedural_noise_pack, reference_noise_pack

    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    which = {int(a) for a in argv} or {1, 2, 3, 4, 5}
    dev = str(jax.devices()[0])
    records = []

    noise = reference_noise_pack()
    bricks = BrickPack.from_noise(noise)
    tlut = atmosphere.transmittance_lut()

    def scene(sun, coverage=0.35):
        sun = np.asarray(sun, np.float64)
        sun = sun / np.linalg.norm(sun)
        sky = atmosphere.sky_lut(tlut, jnp.asarray(sun, jnp.float32))
        p = MarchParams.create(
            cloud_pos=np.array([1.5, -0.3]), detailed_pos=np.array([0.4, 0.2]),
            weather_pos=np.array([0.01, 0.02]), time=12.5,
            cloud_coverage=coverage, light_direction=sun,
            ground_color=np.array([0.27, 0.19, 0.027]),
        )
        return sky, p

    def emit(config, name, ms, w, h, extra=None):
        rec = {
            "config": config,
            "metric": name,
            "value": round(ms, 2),
            "unit": "ms",
            "mrays_per_sec_per_chip": round(w * h / ms / 1e3, 2),
            "device": dev,
        }
        rec.update(extra or {})
        records.append(rec)
        print(json.dumps(rec), flush=True)

    def time_v3(config, name, dirs, p, sky, cc, w, h, steps, bp=None):
        """Best-kernel row (VERDICT r3 #5): the same config through the v3
        cell-gated headline kernel with measured auto-policy buckets."""
        bp = bricks if bp is None else bp
        rk, ck, hk, cell_frac, hot_frac = v3_auto_policy(
            dirs, p, bp, steps=steps)
        f = jax.jit(lambda d, q, c: march_bricks_v3(
            d, q, bp, sky, steps=steps, chunk=32768, cell_keep_frac=ck,
            hot_keep_frac=hk, cone_cache=c, ray_keep_frac=rk, ray_stride=2))
        ms, _ = _timed(f, dirs, p, cc)
        emit(config, name, ms, w, h,
             {"kernel": "v3", "ray_keep_frac": rk, "cell_keep_frac": ck,
              "hot_keep_frac": hk, "cell_frac": round(float(cell_frac), 4),
              "hot_frac": round(float(hot_frac), 4)})

    if 1 in which:
        # Config 1: static noon sun, 256×128, 32 steps, baked inputs.
        sky, p = scene([0.05, 0.99, 0.05])
        dirs = jnp.asarray(hemisphere_dirs(256, 128))
        f = jax.jit(lambda d, q: march_bricks(d, q, bricks, sky, steps=32,
                                              chunk=32768, capacity_frac=0.2))
        ms, out = _timed(f, dirs, p)
        emit(1, "static_noon_256x128x32", ms, 256, 128,
             {"clouds_frac": round(float((out[..., 3] > 0.1).mean()), 3)})

    if 2 in which:
        # Config 2: animated wind + amortized update, 512×256-equivalent at
        # 64 steps — timed as the per-tile amortized dispatch (the actual
        # per-frame cost) plus the full-map equivalent. Production path
        # (v2 + ray cull + cone cache; ≥40 dB gated).
        sky, p = scene([0.3, 0.4, -0.85])
        dirs = jnp.asarray(hemisphere_dirs(512, 256))
        rk, cap, tc, _ = v2_auto_policy(dirs, p, bricks, steps=64)
        cc = jax.block_until_ready(jax.jit(lambda q: build_cone_cache(
            q, bricks, 6, res=(32, 512, 512), chunk=65536))(p))
        f = jax.jit(lambda d, q, c: march_bricks_v2(
            d, q, bricks, sky, steps=64, chunk=32768, capacity_frac=cap,
            cone_cache=c, ray_keep_frac=rk, ray_stride=2, t_cutoff=tc))
        ms, _ = _timed(f, dirs, p, cc)
        emit(2, "wind_amortized_512x256x64_fullmap", ms, 512, 256,
             {"kernel": "v2", "per_tile_ms_at_64frames": round(ms / 64.0, 2),
              "ray_keep_frac": rk, "capacity_frac": cap})
        time_v3(2, "wind_amortized_512x256x64_fullmap_v3", dirs, p, sky, cc,
                512, 256, 64)

    if 3 in which:
        # Config 3: full atmosphere + sun sweep, 1024×512 (the headline;
        # production path — bench.py is the canonical measurement).
        sky, p = scene([0.6, 0.25, -0.75])
        dirs = jnp.asarray(hemisphere_dirs(1024, 512))
        rk, cap, tc, _ = v2_auto_policy(dirs, p, bricks, steps=128)
        cc = jax.block_until_ready(jax.jit(lambda q: build_cone_cache(
            q, bricks, 6, res=(32, 512, 512), chunk=65536))(p))
        f = jax.jit(lambda d, q, c: march_bricks_v2(
            d, q, bricks, sky, steps=128, chunk=32768, capacity_frac=cap,
            cone_cache=c, ray_keep_frac=rk, ray_stride=2, t_cutoff=tc))
        ms, _ = _timed(f, dirs, p, cc)
        # Sky LUT re-render (per cycle when the sun moves).
        lut_ms, _ = _timed(
            jax.jit(lambda s: atmosphere.sky_lut(tlut, s)),
            jnp.asarray([0.3, 0.5, -0.8], jnp.float32),
        )
        emit(3, "atmosphere_sweep_1024x512x128", ms, 1024, 512,
             {"kernel": "v2", "sky_lut_ms": round(lut_ms, 2),
              "ray_keep_frac": rk, "capacity_frac": cap})
        time_v3(3, "atmosphere_sweep_1024x512x128_v3", dirs, p, sky, cc,
                1024, 512, 128)

    if 4 in which:
        # Config 4: fully procedural noise (Pallas generators), no assets.
        from cloudscape_tpu.ops import noise_pallas

        t0 = time.perf_counter()
        base = np.asarray(jax.block_until_ready(
            noise_pallas.generate_base_noise_pallas(128, 0)))
        gen_ms = (time.perf_counter() - t0) * 1e3
        pack = procedural_noise_pack(seed=0)
        pb = BrickPack.from_noise(pack)
        sky, p = scene([0.3, 0.4, -0.85])
        dirs = jnp.asarray(hemisphere_dirs(512, 256))
        rk, cap, tc, _ = v2_auto_policy(dirs, p, pb, steps=64)
        cc = jax.block_until_ready(jax.jit(lambda q: build_cone_cache(
            q, pb, 6, res=(32, 512, 512), chunk=65536))(p))
        f = jax.jit(lambda d, q, c: march_bricks_v2(
            d, q, pb, sky, steps=64, chunk=32768, capacity_frac=cap,
            cone_cache=c, ray_keep_frac=rk, ray_stride=2, t_cutoff=tc))
        ms, out = _timed(f, dirs, p, cc)
        emit(4, "procedural_pallas_512x256x64", ms, 512, 256,
             {"kernel": "v2", "pallas_base_gen_ms": round(gen_ms, 1),
              "ray_keep_frac": rk, "capacity_frac": cap,
              "clouds_frac": round(float((out[..., 3] > 0.1).mean()), 3)})
        time_v3(4, "procedural_pallas_512x256x64_v3", dirs, p, sky, cc,
                512, 256, 64, bp=pb)

    if 5 in which:
        # Config 5: hierarchical march, 2048×1024, 128 adaptive steps —
        # with the per-cycle cone cache (same state the engine/headline
        # amortize; without it the fine phase pays the 17-row inline light
        # march). Streamed over 4 row bands (march_hierarchical_banded ≡
        # monolithic, tested) so peak HBM fits beside the FULL-res
        # (32,512,512) cache — 41.9 dB at this operating point vs a
        # 512-step converged gt (tests/test_hierarchical.py gate ≥ 40).
        from cloudscape_tpu.models.march_fast import march_hierarchical_banded

        sky, p = scene([0.3, 0.4, -0.85])
        dirs = jnp.asarray(hemisphere_dirs(2048, 1024))
        cc = jax.block_until_ready(jax.jit(lambda q: build_cone_cache(
            q, bricks, 6, res=(32, 512, 512), chunk=65536))(p))
        f = lambda d, q, c: march_hierarchical_banded(
            d, q, bricks, sky, bands=4, steps=128, chunk=32768,
            capacity_frac=0.08, coarse_steps=32, cone_cache=c)
        ms, out = _timed(f, dirs, p, cc)
        emit(5, "hierarchical_2048x1024x128", ms, 2048, 1024,
             {"clouds_frac": round(float((out[..., 3] > 0.1).mean()), 3),
              "cone_cache": "32x512x512", "bands": 4, "coarse_steps": 32})

        # Best-kernel row (VERDICT r4 #1): the same config through the
        # window-lattice v3 cell-gated march — ray cull + cell gate + hot
        # sub-compaction fed from the hierarchical windows, buckets sized
        # per-band by the band-aware auto policy (ray_stride must stay 1
        # on the window lattice; ≥40 dB gate in tests/test_hierarchical.py
        # test_hier_v3_operating_point_holds_40db).
        from cloudscape_tpu.models.march_fast import (
            hier_v3_auto_policy, march_hierarchical_v3_banded,
        )

        rk, ck, hk, cell_frac, hot_frac = hier_v3_auto_policy(
            dirs, p, bricks, steps=128, coarse_steps=32, bands=4)
        f = lambda d, q, c: march_hierarchical_v3_banded(
            d, q, bricks, sky, bands=4, steps=128, chunk=32768,
            coarse_steps=32, cell_keep_frac=ck, hot_keep_frac=hk,
            ray_keep_frac=rk, cone_cache=c)
        ms, out = _timed(f, dirs, p, cc)
        emit(5, "hierarchical_2048x1024x128_v3", ms, 2048, 1024,
             {"kernel": "hier_v3", "ray_keep_frac": rk,
              "cell_keep_frac": ck, "hot_keep_frac": hk,
              "cell_frac": round(float(cell_frac), 4),
              "hot_frac": round(float(hot_frac), 4),
              "clouds_frac": round(float((out[..., 3] > 0.1).mean()), 3),
              "cone_cache": "32x512x512", "bands": 4, "coarse_steps": 32})

        # Best-SPEED row: the standard-lattice v3 cell-gated march over 4
        # row bands with per-band measured policy. The window lattice above
        # redistributes the step budget for QUALITY (48 dB class vs a
        # 512-step gt — the reference's TODO #1 semantics) but already
        # skips each ray's empty span, so the cell gate cannot repeat its
        # flat-lattice win there (measured: live cells within windows =
        # 0.98, docs/PERF_NOTES.md round 5). On the fixed lattice (the
        # exact march's own quality class, same ≥40 dB gates as the
        # headline — tests/test_bench_config.py/test_march_v3.py) the cell
        # gate does its full work; each 512×2048 band is exactly the
        # headline's ray count and bounds peak HBM like the banded
        # hierarchical rows do.
        n_bands, hb = 4, 1024 // 4
        band_ms, band_rows = 0.0, []
        for b in range(n_bands):
            db = dirs[b * hb:(b + 1) * hb]
            rk, ck, hk, cf, hf = v3_auto_policy(db, p, bricks, steps=128)
            f = jax.jit(lambda d, q, c, rk=rk, ck=ck, hk=hk: march_bricks_v3(
                d, q, bricks, sky, steps=128, chunk=32768,
                cell_keep_frac=ck, hot_keep_frac=hk, cone_cache=c,
                ray_keep_frac=rk, ray_stride=2))
            ms, _ = _timed(f, db, p, cc)
            band_ms += ms
            band_rows.append({"band": b, "ms": round(ms, 1),
                              "policy": [rk, ck, hk]})
        emit(5, "hierarchical_2048x1024x128_v3flat", band_ms, 2048, 1024,
             {"kernel": "v3_banded_flat", "bands": band_rows,
              "cone_cache": "32x512x512"})

    if out_path:
        with open(out_path, "w") as fh:
            json.dump(records, fh, indent=1)
        print(f"# wrote {len(records)} rows -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
