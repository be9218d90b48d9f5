"""PSNR gate for the shipped benchmark configuration (VERDICT r1 weak #2).

bench.py times `march_bricks_v3` (coarse-cell-gated march) with the
scene-adaptive `v3_auto_policy` buckets and a (32,512,512) cone cache. This
gate runs the same knob RATIOS and the same capacity policy at CPU scale —
chunk chosen so the capacity fraction binds exactly as it does at
1024×512×128 — against the exact (compact, non-staged) march, on the bench
scene AND a high-coverage variant, so a quality regression in the shipped
number can never go unnoticed. The previous headline path (v2) keeps its
own gate here too. bench.py cites this test.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cloudscape_tpu.models import atmosphere
from cloudscape_tpu.models.density import MarchParams
from cloudscape_tpu.models.march_fast import (
    BrickPack, build_cone_cache, march_bricks, march_bricks_v2,
    march_bricks_v3, v2_auto_policy, v3_auto_policy,
)
from cloudscape_tpu.models.packs import make_noise_pack
from cloudscape_tpu.utils.image import psnr

# Keep in sync with bench.py.
BENCH_CONE_RES = (32, 512, 512)
STEPS = 64          # scaled from 128; active-sample fraction is preserved
WIDTH, HEIGHT = 128, 64


@pytest.fixture(scope="module")
def setup():
    from cloudscape_tpu.ops.noise import generate_base_noise
    from cloudscape_tpu.utils.assets import load_bmp, slice_horizontal_3d

    small = slice_horizontal_3d(
        load_bmp("/root/reference/cloud_sky/worlnoise.bmp"), 32
    )
    weather = load_bmp("/root/reference/cloud_sky/weather.bmp")
    noise = make_noise_pack(
        np.asarray(generate_base_noise(32, seed=0)), small, weather
    )
    bp = BrickPack.from_noise(noise)
    tlut = atmosphere.transmittance_lut()
    sun = np.array([0.3, 0.4, -0.85])
    sun /= np.linalg.norm(sun)
    slut = atmosphere.sky_lut(tlut, jnp.asarray(sun, jnp.float32))
    return bp, slut, sun


def bench_dirs():
    from bench import hemisphere_dirs

    return jnp.asarray(hemisphere_dirs(WIDTH, HEIGHT))


def _gate(bp, slut, sun, coverage):
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]), detailed_pos=np.array([0.4, 0.2]),
        weather_pos=np.array([0.01, 0.02]), time=12.5,
        cloud_coverage=coverage, light_direction=sun,
        ground_color=np.array([0.27, 0.19, 0.027]),
    )
    dirs = bench_dirs()
    # The bench's own adaptive cull/capacity/cutoff policy, at the same
    # knob ratios (shared implementation: v2_auto_policy).
    ray_keep, cap, tc, _ = v2_auto_policy(dirs, params, bp, steps=STEPS)
    # chunk small enough that capacity = frac·total (as at bench scale).
    chunk = 512
    assert int(WIDTH * HEIGHT * STEPS * cap) > chunk
    exact = np.asarray(
        march_bricks(dirs, params, bp, slut, steps=STEPS, chunk=chunk,
                     capacity_frac=0.5)
    )
    cone = build_cone_cache(params, bp, 6, res=BENCH_CONE_RES, chunk=16384)
    got = np.asarray(
        march_bricks_v2(dirs, params, bp, slut, steps=STEPS, chunk=chunk,
                        capacity_frac=cap, cone_cache=cone,
                        ray_keep_frac=ray_keep, ray_stride=2, t_cutoff=tc)
    )
    assert (exact[..., 3] > 0.1).mean() > 0.02, "scene rendered no clouds"
    return psnr(got, exact)


def _gate_v3(bp, slut, sun, coverage):
    """The HEADLINE path's gate: march_bricks_v3 at the bench's knob ratios
    (v3_auto_policy buckets, stride-2 cull prepass, bench cone res) vs the
    exact march."""
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]), detailed_pos=np.array([0.4, 0.2]),
        weather_pos=np.array([0.01, 0.02]), time=12.5,
        cloud_coverage=coverage, light_direction=sun,
        ground_color=np.array([0.27, 0.19, 0.027]),
    )
    dirs = bench_dirs()
    rk, ck, hk, cell_frac, hot_frac = v3_auto_policy(
        dirs, params, bp, steps=STEPS)
    chunk = 512
    exact = np.asarray(
        march_bricks(dirs, params, bp, slut, steps=STEPS, chunk=chunk,
                     capacity_frac=0.5)
    )
    cone = build_cone_cache(params, bp, 6, res=BENCH_CONE_RES, chunk=16384)
    got = np.asarray(
        march_bricks_v3(dirs, params, bp, slut, steps=STEPS, chunk=chunk,
                        cell_keep_frac=ck, hot_keep_frac=hk, cone_cache=cone,
                        ray_keep_frac=rk, ray_stride=2)
    )
    assert (exact[..., 3] > 0.1).mean() > 0.02, "scene rendered no clouds"
    return psnr(got, exact)


@pytest.mark.slow
def test_bench_scene_quality(setup):
    bp, slut, sun = setup
    p = _gate(bp, slut, sun, coverage=0.35)  # the bench scene's coverage
    assert p > 40.0, f"bench-config PSNR {p:.1f} dB < 40 dB at bench knobs"


def test_bench_config_high_coverage(setup):
    """The same knobs on a high-coverage scene: capacity overflow may occur,
    but the shipped configuration must still hold the 40 dB gate."""
    bp, slut, sun = setup
    p = _gate(bp, slut, sun, coverage=0.7)
    assert p > 40.0, f"high-coverage bench-config PSNR {p:.1f} dB < 40 dB"


def test_bench_scene_quality_v3(setup):
    bp, slut, sun = setup
    p = _gate_v3(bp, slut, sun, coverage=0.35)
    assert p > 40.0, f"v3 bench-config PSNR {p:.1f} dB < 40 dB at bench knobs"


def test_bench_config_high_coverage_v3(setup):
    bp, slut, sun = setup
    p = _gate_v3(bp, slut, sun, coverage=0.7)
    assert p > 40.0, f"v3 high-coverage bench-config PSNR {p:.1f} dB < 40 dB"
