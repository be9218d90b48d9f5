"""Gates for the dense small-tile march (`march_tile_dense`) and the
engine's "fast3" production kernel (VERDICT r3 #2/#4).

`march_tile_dense` is `_march_core2`'s per-sample math with ALL capacity
machinery removed (no prepass, no cull, no compaction, no scatters) — the
serving-tile arm of kernel="fast3" below the measured tile-scale crossover
(`engine.V3_TILE_MIN_RAYS`). Its contract: bitwise the v2 march at ample
capacity with culling off, so every v2 quality gate transfers verbatim.

kernel="fast3" serves three paths with one user-facing mode:
- amortized tiles below the crossover → dense (this file's equality gate);
- tiles at/above the crossover → the staged v2 march;
- monolithic renders (`render_full_hemisphere`) → the measured-policy v3
  cell-gated headline march (the kernel bench.py times; gated vs exact).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState
from cloudscape_tpu.engine import CloudSkyEngine, V3_TILE_MIN_RAYS
from cloudscape_tpu.models import atmosphere
from cloudscape_tpu.models.density import MarchParams
from cloudscape_tpu.models.march_fast import (
    BrickPack,
    build_cone_cache,
    march_bricks,
    march_bricks_v2,
    march_tile_dense,
)
from cloudscape_tpu.models.packs import make_noise_pack
from cloudscape_tpu.utils.image import psnr


@pytest.fixture(scope="module")
def setup():
    from cloudscape_tpu.ops.noise import (
        generate_base_noise, generate_detail_noise,
    )
    from cloudscape_tpu.utils.assets import load_bmp

    noise = make_noise_pack(
        generate_base_noise(16, seed=1),
        generate_detail_noise(16, seed=2),
        load_bmp("/root/reference/cloud_sky/weather.bmp"),
    )
    bp = BrickPack.from_noise(noise)
    tlut = atmosphere.transmittance_lut()
    sun = np.array([0.3, 0.5, -0.8])
    sun /= np.linalg.norm(sun)
    slut = atmosphere.sky_lut(tlut, jnp.asarray(sun, jnp.float32))
    params = MarchParams.create(cloud_coverage=0.45, light_direction=sun)
    cc = build_cone_cache(params, bp, 2, res=(8, 64, 64), chunk=4096)
    return noise, bp, slut, params, cc, sun


def _tile_dirs(n=32):
    from cloudscape_tpu.ops.octmap import texel_directions

    return texel_directions(n)


def test_dense_matches_v2_ample_capacity(setup):
    """The contract: at ample capacity (no overflow), culling off and
    weather fetched every step, the v2 staged march computes exactly the
    same per-sample values the dense variant computes. XLA fuses the two
    forms differently (compacted list vs dense planes → different fma
    contraction/reduction trees), so equality is ulp-level, not bitwise:
    ≤ 4e-7 observed on this scene."""
    _, bp, slut, params, cc, _ = setup
    dirs = _tile_dirs(32)
    v2 = np.asarray(
        march_bricks_v2(dirs, params, bp, slut, steps=8, light_steps=2,
                        chunk=1024, capacity_frac=1.0, weather_every=1,
                        t_cutoff=0.0, cone_cache=cc))
    dense = np.asarray(
        march_tile_dense(dirs, params, bp, slut, steps=8, light_steps=2,
                         chunk=1024, cone_cache=cc))
    np.testing.assert_allclose(dense, v2, atol=2e-6)
    assert np.abs(dense).max() > 0.0, "equality test is vacuous (all empty)"


def test_dense_is_finite_and_nonempty(setup):
    """Sanity on the dense tile output (its quality gate IS the v2
    equality above — v2 itself is gated vs the exact march at production
    cone resolution in tests/test_march_v2.py)."""
    _, bp, slut, params, cc, _ = setup
    dense = np.asarray(
        march_tile_dense(_tile_dirs(32), params, bp, slut, steps=8,
                         light_steps=2, chunk=1024, cone_cache=cc))
    assert np.isfinite(dense).all()
    assert (dense[..., 3] > 0.0).any()


def test_engine_fast3_ticks_match_fast2(setup):
    """Below the crossover the fast3 engine's amortized tiles are the dense
    march — identical per-sample math to the fast2 tile march (to ulp-level
    fusion noise), differing only where fast2's 0.5 capacity bucket
    overflows (its ALU fallback). The serving rings must agree ≥ 40 dB over
    warm start + ticks and be ulp-close on ≥ 99% of texels."""
    noise, _, _, _, _, sun = setup
    kw = dict(
        perf=PerfConfig(texture_size=32, frames_to_update=16, march_steps=4,
                        light_steps=2),
        config=CloudConfig(cloud_coverage=0.45),
        sun=SunState(direction=tuple(sun)),
        noise=noise,
        cone_res=(8, 64, 64),
    )
    assert 32 * 32 < V3_TILE_MIN_RAYS
    e2 = CloudSkyEngine(kernel="fast2", **kw)
    e3 = CloudSkyEngine(kernel="fast3", **kw)
    for k in range(3):
        e2.update_sky(now=0.1 * k)
        e3.update_sky(now=0.1 * k)
    r2 = np.asarray(e2.cloud_ring)
    r3 = np.asarray(e3.cloud_ring)
    assert np.abs(r3).max() > 0.0
    p = psnr(r3, r2)
    assert p > 40.0, f"fast3 vs fast2 serving rings {p:.1f} dB"
    assert np.isclose(r3, r2, atol=1e-5).mean() > 0.99


def test_engine_fast3_monolithic_is_v3(setup):
    """render_full_hemisphere under fast3 routes through the measured-policy
    v3 headline march (VERDICT r3 #2: the engine serves the kernel bench.py
    times) — gated vs the exact march at the same snapshot."""
    noise, bp, _, _, _, sun = setup
    eng = CloudSkyEngine(
        perf=PerfConfig(texture_size=64, frames_to_update=16, march_steps=16,
                        light_steps=2),
        config=CloudConfig(cloud_coverage=0.45),
        sun=SunState(direction=tuple(sun)),
        noise=noise,
        kernel="fast3",
        cone_res=(8, 64, 64),
    )
    eng.update_sky(now=0.0)  # warm start
    mono = np.asarray(eng.render_full_hemisphere())
    assert np.isfinite(mono).all()
    assert eng._v3_policy_cache is not None  # measured once, cached per cycle
    # Reference: the ungated staged march with the SAME cone cache — this
    # isolates what the v3 route adds (ray cull + cell gate + hot gate with
    # measured policy); cone-cache quality itself is gated at production
    # resolution in tests/test_march_v2.py / test_bench_config.py.
    ref = np.asarray(
        march_bricks_v2(_tile_dirs(64), eng._march_params, eng._bricks,
                        eng.sky_ring[eng.ring.cloud_kernel_sky_slot],
                        steps=16, light_steps=2, chunk=4096,
                        capacity_frac=1.0, weather_every=1,
                        cone_cache=eng._cone_cache))
    p = psnr(mono, ref)
    assert p > 35.0, f"fast3 monolithic (v3) {p:.1f} dB vs ungated staged"


def test_engine_fast3_tile_cull_cell_buckets(setup):
    """fast3 + tile_cull: per-tile buckets are live-CELL capacity tiers for
    the v3 tile arm (0.0 = whole-tile skip, 1.0 = dense arm, otherwise a
    V3_TILE_CELL_BUCKETS member — round-4 measurement: v3 beats the dense
    arm at every tile scale, so bucketed tiles dispatch v3)."""
    from cloudscape_tpu.engine import V3_TILE_CELL_BUCKETS

    noise, _, _, _, _, sun = setup
    eng = CloudSkyEngine(
        perf=PerfConfig(texture_size=32, frames_to_update=16, march_steps=4,
                        light_steps=2),
        config=CloudConfig(cloud_coverage=0.45),
        sun=SunState(direction=tuple(sun)),
        noise=noise,
        kernel="fast3",
        cone_res=(8, 64, 64),
        tile_cull=True,
    )
    assert eng.tile_cull
    for k in range(3):
        eng.update_sky(now=0.1 * k)
    assert eng._tile_buckets is not None
    allowed = {0.0, 1.0} | set(V3_TILE_CELL_BUCKETS)
    assert set(eng._tile_buckets) <= allowed
    assert np.isfinite(np.asarray(eng.cloud_ring)).all()


@pytest.mark.slow
def test_engine_fast3_tile_cull_matches_plain(setup):
    """fast3 + tile_cull (v3 cell-bucketed tiles) vs plain fast3 (dense
    tiles): a full amortized cycle must stay ≥ 40 dB — the same gate the
    fast2 cull path carries (tests/test_engine.py) applied to the v3 tile
    arm."""
    noise, _, _, _, _, sun = setup
    kw = dict(
        perf=PerfConfig(texture_size=64, frames_to_update=16, march_steps=16,
                        light_steps=2),
        config=CloudConfig(cloud_coverage=0.45),
        sun=SunState(direction=tuple(sun)),
        noise=noise,
        kernel="fast3",
        cone_res=(8, 64, 64),
    )
    a = CloudSkyEngine(**kw)
    b = CloudSkyEngine(**kw, tile_cull=True)
    for _ in range(18):
        a.update_sky(now=0.0)
        b.update_sky(now=0.0)
    assert b._tile_buckets is not None
    assert any(0.0 < x < 1.0 for x in b._tile_buckets), \
        "no tile actually took the v3 bucketed arm"
    ra = np.asarray(a.cloud_ring)[a.ring.texture_to_blend_to]
    rb = np.asarray(b.cloud_ring)[b.ring.texture_to_blend_to]
    assert np.isfinite(rb).all()
    mse = float(((ra - rb) ** 2).mean())
    peak = max(float(np.abs(ra).max()), 1e-9)
    p = 10.0 * np.log10(peak * peak / max(mse, 1e-20))
    assert p > 40.0, f"fast3 tile-culled engine {p:.1f} dB vs plain"
