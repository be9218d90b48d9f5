"""Gates for the row-lean v2 march (`_march_core2` / `march_bricks_v2`).

v2 is position-matched to `march_bricks` (identical sample placement); its
approximations are gated here:
- staged erosion behind `pre > 0` — exact by construction (the predicate is
  exact), only capacity overflow can degrade it (and overflow now takes a
  graceful rank-selected ALU fallback);
- cone density from the per-cycle ConeCache — resolution-controlled;
- ray-level culling (priority prepass + histogram-threshold selection) —
  margin + dilation guards, soft capacity;
- the conservative occlusion cutoff (T_ub bound from pre-erosion density)
  — error bounded by the cutoff itself;
- optional along-ray weather lerp (weather_every > 1) — documented loss
  (the weather map's bilinear kinks at ~33 m undersample at node spacing),
  default is OFF (weather_every=1).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cloudscape_tpu.models import atmosphere
from cloudscape_tpu.models.density import MarchParams
from cloudscape_tpu.models.march_fast import (
    BrickPack,
    _compact_indices,
    build_cone_cache,
    march_bricks,
    march_bricks_v2,
    occupied_sample_fraction,
    ray_keep_fraction,
    select_ray_keep_frac,
)
from cloudscape_tpu.models.packs import make_noise_pack
from cloudscape_tpu.ops.octmap import texel_directions
from cloudscape_tpu.utils.image import psnr

CONE_RES = (32, 512, 512)


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
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]), detailed_pos=np.array([0.4, 0.2]),
        weather_pos=np.array([0.01, 0.02]), time=12.5, cloud_coverage=0.35,
        light_direction=sun, ground_color=np.array([0.27, 0.19, 0.027]),
    )
    dirs = texel_directions(32)
    exact = np.asarray(
        march_bricks(dirs, params, bp, slut, steps=64, chunk=1024,
                     capacity_frac=0.5)
    )
    cc = build_cone_cache(params, bp, 6, res=CONE_RES, chunk=16384)
    return bp, slut, params, dirs, exact, cc


def test_v2_matches_exact(setup):
    bp, slut, params, dirs, exact, cc = setup
    got = np.asarray(
        march_bricks_v2(dirs, params, bp, slut, steps=64, chunk=1024,
                        capacity_frac=0.5, cone_cache=cc)
    )
    p = psnr(got, exact)
    assert p > 40.0, f"v2 PSNR {p:.1f} dB < 40 dB vs exact march"
    assert np.isfinite(got).all()


def test_v2_weather_lerp_documented_loss(setup):
    """weather_every > 1 is a measured-loss knob (not default): the weather
    bilinear kinks at texel scale (~33 m) are far below node spacing."""
    bp, slut, params, dirs, exact, cc = setup
    p4 = psnr(np.asarray(
        march_bricks_v2(dirs, params, bp, slut, steps=64, chunk=1024,
                        capacity_frac=0.5, weather_every=4,
                        cone_cache=cc)), exact)
    assert 25.0 < p4 < 40.0, (
        f"weather_every=4 measured {p4:.1f} dB — update the documented band"
    )


@pytest.mark.slow
def test_v2_high_coverage(setup):
    bp, slut, _, dirs, _, _ = setup
    sun = np.array([0.3, 0.4, -0.85])
    sun /= np.linalg.norm(sun)
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]), cloud_coverage=0.85,
        light_direction=sun, ground_color=np.array([0.27, 0.19, 0.027]),
    )
    exact = np.asarray(
        march_bricks(dirs, params, bp, slut, steps=64, chunk=1024,
                     capacity_frac=0.5)
    )
    got = np.asarray(
        march_bricks_v2(dirs, params, bp, slut, steps=64, chunk=1024,
                        capacity_frac=0.5, cone_res=CONE_RES)
    )
    p = psnr(got, exact)
    assert p > 40.0, f"high-coverage v2 PSNR {p:.1f} dB"


@pytest.mark.slow
def test_sparse_cone_build_equals_dense(setup):
    """The pre>0-compacted (dilated) cone bake must agree with the dense bake
    wherever the march reads the cache. Center-sampled occupancy can miss
    sub-cell features between cell centers, so the agreement is near-exact
    rather than bitwise (measured ≤ 2.5e-4 max image delta / ~99 dB at this
    grid)."""
    bp, slut, params, dirs, _, _ = setup
    cd = build_cone_cache(params, bp, 6, res=(24, 256, 256), chunk=8192,
                          sparse_capacity_frac=None)
    cs = build_cone_cache(params, bp, 6, res=(24, 256, 256), chunk=8192)
    img_d = np.asarray(march_bricks_v2(dirs, params, bp, slut, steps=32,
                                       chunk=1024, capacity_frac=0.5,
                                       cone_cache=cd))
    img_s = np.asarray(march_bricks_v2(dirs, params, bp, slut, steps=32,
                                       chunk=1024, capacity_frac=0.5,
                                       cone_cache=cs))
    assert psnr(img_s, img_d) > 70.0
    assert np.abs(img_d - img_s).max() < 1e-2


@pytest.mark.slow
def test_v2_capacity_overflow_degrades_gracefully(setup):
    """Overflowed samples take the in-kernel fallback (ALU-only mean-erosion
    density, no sun term) instead of rendering as holes: output stays
    finite, visibly cloud-like (alpha mass preserved within a band), and
    differs from the exact render (overflow actually exercised)."""
    bp, slut, params, dirs, _, _ = setup
    ok = np.asarray(
        march_bricks_v2(dirs, params, bp, slut, steps=64, chunk=256,
                        capacity_frac=0.5, cone_res=(16, 128, 128))
    )
    tiny = np.asarray(
        march_bricks_v2(dirs, params, bp, slut, steps=64, chunk=256,
                        capacity_frac=0.01, cone_res=(16, 128, 128))
    )
    assert np.isfinite(tiny).all()
    assert not np.array_equal(tiny, ok)  # overflow actually occurred
    ratio = tiny[..., 3].sum() / max(ok[..., 3].sum(), 1e-9)
    assert 0.5 < ratio < 1.5, f"fallback alpha mass off ({ratio:.2f}×)"
    p = psnr(tiny, ok)
    assert p > 15.0, f"fallback render too degraded ({p:.1f} dB)"


def test_v2_ray_cull_matches(setup):
    """Ray-level culling (margin + 3×3-dilated prepass) vs the unculled v2
    path — and vs the exact-march anchor. On this scene the guards make it
    bit-comparable (see probe data in bench/probe_occupancy.py); the gate is
    the standard 40 dB."""
    bp, slut, params, dirs, exact, cc = setup
    kf = float(ray_keep_fraction(dirs, params, bp, steps=64,
                                 prepass_steps=16))
    rb = select_ray_keep_frac(kf)
    assert rb < 1.0, f"scene unexpectedly dense (keep {kf:.2f}) — no culling"
    base = np.asarray(
        march_bricks_v2(dirs, params, bp, slut, steps=64, chunk=256,
                        capacity_frac=0.5, cone_cache=cc)
    )
    got = np.asarray(
        march_bricks_v2(dirs, params, bp, slut, steps=64, chunk=256,
                        capacity_frac=0.5, cone_cache=cc,
                        ray_keep_frac=rb, prepass_steps=16)
    )
    assert np.isfinite(got).all()
    p = psnr(got, base)
    assert p > 40.0, f"ray-culled v2 PSNR {p:.1f} dB vs unculled"
    p2 = psnr(got, exact)
    assert p2 > 40.0, f"ray-culled v2 PSNR {p2:.1f} dB vs exact march"


def test_v2_ray_cull_overcast_selects_off(setup):
    """An overcast scene keeps ~every ray — the bucket policy must return
    1.0 (culling disabled) rather than pay prepass + compaction for
    nothing."""
    bp, _, _, dirs, _, _ = setup
    sun = np.array([0.3, 0.4, -0.85])
    sun /= np.linalg.norm(sun)
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]), cloud_coverage=0.95,
        light_direction=sun, ground_color=np.array([0.27, 0.19, 0.027]),
    )
    kf = float(ray_keep_fraction(dirs, params, bp, steps=64,
                                 prepass_steps=16))
    assert kf > 0.7
    assert select_ray_keep_frac(kf) == 1.0


def test_v2_ray_cull_overflow_renders_empty_sky(setup):
    """Ray capacity overflow drops whole rays to empty sky (the documented
    cliff — sized away by ray_keep_fraction + select_ray_keep_frac): output
    stays finite and only loses alpha mass, never corrupts."""
    bp, slut, params, dirs, _, cc = setup
    ok = np.asarray(
        march_bricks_v2(dirs, params, bp, slut, steps=64, chunk=256,
                        capacity_frac=0.5, cone_cache=cc)
    )
    tiny = np.asarray(
        march_bricks_v2(dirs, params, bp, slut, steps=64, chunk=256,
                        capacity_frac=0.5, cone_cache=cc,
                        ray_keep_frac=0.3, prepass_steps=16)
    )
    assert np.isfinite(tiny).all()
    assert not np.array_equal(tiny, ok), "capacity 0.3 didn't overflow"
    ratio = tiny[..., 3].sum() / max(ok[..., 3].sum(), 1e-9)
    assert ratio <= 1.0 + 1e-6, "overflow must only DROP rays"
    assert ratio > 0.3, f"overflow dropped nearly everything ({ratio:.2f}×)"
    # Dropped rays are exactly empty, kept rays exactly agree.
    kept = tiny[..., 3] > 0.0
    np.testing.assert_allclose(tiny[kept], ok[kept], rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_v2_occlusion_cutoff_near_exact(setup):
    """The conservative occlusion cutoff (T_ub from pre-erosion density)
    skips only provably-invisible staged samples: vs cutoff-off the image
    error is bounded by the cutoff itself (≤ ~1e-4 in radiance/alpha).
    Exercised on a high-coverage scene where occlusion actually bites."""
    bp, slut, _, dirs, _, _ = setup
    sun = np.array([0.3, 0.4, -0.85])
    sun /= np.linalg.norm(sun)
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]), cloud_coverage=0.75,
        light_direction=sun, ground_color=np.array([0.27, 0.19, 0.027]),
    )
    cc = build_cone_cache(params, bp, 6, res=(24, 256, 256), chunk=8192)
    off = np.asarray(
        march_bricks_v2(dirs, params, bp, slut, steps=64, chunk=1024,
                        capacity_frac=0.5, cone_cache=cc, t_cutoff=0.0)
    )
    on = np.asarray(
        march_bricks_v2(dirs, params, bp, slut, steps=64, chunk=1024,
                        capacity_frac=0.5, cone_cache=cc, t_cutoff=1e-4)
    )
    assert np.isfinite(on).all()
    assert np.abs(on - off).max() < 1e-3
    assert psnr(on, off) > 60.0
    # And the cutoff-aware occupancy estimate shrinks (capacity savings).
    occ_off = float(occupied_sample_fraction(dirs, params, bp, t_cutoff=0.0))
    occ_on = float(occupied_sample_fraction(dirs, params, bp))
    assert occ_on < occ_off


@pytest.mark.slow
def test_compact_indices_matches_nonzero():
    """_compact_indices ≡ jnp.nonzero(size=cap, fill=total) — fuzzed."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 5000))
        cap = int(rng.integers(1, 2000))
        mask = jnp.asarray(rng.random(n) < rng.uniform(0.01, 0.9))
        want = np.asarray(jnp.nonzero(mask, size=cap, fill_value=n)[0])
        got = np.asarray(_compact_indices(mask, cap, n))
        np.testing.assert_array_equal(got, want)
    for mask in [jnp.zeros(300, bool), jnp.ones(300, bool)]:
        want = np.asarray(jnp.nonzero(mask, size=128, fill_value=300)[0])
        np.testing.assert_array_equal(
            np.asarray(_compact_indices(mask, 128, 300)), want
        )
