"""Cloud raymarch: jitted JAX stage vs the NumPy f64 oracle (golden test).

BASELINE config-1 shape: small hemisphere batch, 32 steps, the f32 device
implementation must track the f64 oracle to high PSNR (≥ 40 dB gate; in
practice far higher).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cloudscape_tpu.models import march as march_mod
from cloudscape_tpu.models.density import MarchParams, density_at
from cloudscape_tpu.models.packs import make_noise_pack
from cloudscape_tpu.models import atmosphere
from cloudscape_tpu.ops import octmap
from cloudscape_tpu.utils.image import psnr
from oracle import reference as ref


@pytest.fixture(scope="module")
def small_noise(worlnoise_volume_mod, weather_image_mod):
    """Small procedural base volume + shipped detail/weather fixtures."""
    from cloudscape_tpu.ops.noise import generate_base_noise

    base = np.asarray(generate_base_noise(32, seed=0))
    return make_noise_pack(base, worlnoise_volume_mod, weather_image_mod)


@pytest.fixture(scope="module")
def worlnoise_volume_mod():
    from cloudscape_tpu.utils.assets import load_bmp, slice_horizontal_3d

    return slice_horizontal_3d(load_bmp("/root/reference/cloud_sky/worlnoise.bmp"), 32)


@pytest.fixture(scope="module")
def weather_image_mod():
    from cloudscape_tpu.utils.assets import load_bmp

    return load_bmp("/root/reference/cloud_sky/weather.bmp")


@pytest.fixture(scope="module")
def luts():
    tlut = atmosphere.transmittance_lut()
    sun = np.array([0.3, 0.4, -0.85])
    sun /= np.linalg.norm(sun)
    slut = atmosphere.sky_lut(tlut, jnp.asarray(sun, jnp.float32))
    return np.asarray(tlut), np.asarray(slut), sun


def _params(sun):
    return dict(
        cloud_pos=np.array([1.5, -0.3]),
        detailed_pos=np.array([0.4, 0.2]),
        weather_pos=np.array([0.01, 0.02]),
        time=12.5,
        density=0.05,
        cloud_coverage=0.35,
        light_direction=sun,
        light_energy=1.0,
        light_color=np.array([1.0, 0.98, 0.95]),
        ground_color=np.array([0.27, 0.19, 0.027]),
    )


def _np_pyramids(pack):
    return (
        [np.asarray(l, dtype=np.float64) for l in pack.large],
        [np.asarray(l, dtype=np.float64) for l in pack.small],
        np.asarray(pack.weather, dtype=np.float64),
    )


def test_density_parity(small_noise, luts):
    _, _, sun = luts
    rng = np.random.default_rng(7)
    n = 400
    # Random points inside the cloud shell.
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    r = rng.uniform(ref.SKY_B_RADIUS, ref.SKY_T_RADIUS, size=(n, 1))
    p = d * r
    weather = rng.uniform(0, 1, size=(n, 3))

    prm = _params(sun)
    jp = MarchParams.create(**{k: v for k, v in prm.items()})
    large_np, small_np, _ = _np_pyramids(small_noise)

    for mip in (0.0, 1.0, 3.0, 5.0):
        got, _ = density_at(
            jnp.asarray(p, jnp.float32), jnp.asarray(weather, jnp.float32),
            mip, jp, small_noise,
        )
        want = ref.density_np(p, weather, mip, prm, large_np, small_np)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-3,
                                   err_msg=f"mip={mip}")


def test_march_matches_oracle(small_noise, luts):
    tlut, slut, sun = luts
    n = 48
    dirs = np.asarray(octmap.texel_directions(n))  # [n, n, 3], mostly upper

    prm = _params(sun)
    jp = MarchParams.create(**prm)
    got = np.asarray(
        march_mod.march(
            jnp.asarray(dirs, jnp.float32), jp, small_noise,
            jnp.asarray(slut, jnp.float32), steps=32,
        )
    )
    large_np, small_np, weather_np = _np_pyramids(small_noise)
    want = ref.cloud_march_ref(
        dirs.astype(np.float64), prm, large_np, small_np, weather_np,
        slut.astype(np.float64), steps=32,
    )
    assert got.shape == want.shape == (n, n, 4)
    p = psnr(got, want)
    assert p > 40.0, f"PSNR {p:.1f} dB < 40 dB gate"
    # Alpha must be sane, and the scene must actually contain clouds (guards
    # against a vacuously-passing empty sky).
    assert got[..., 3].min() >= 0.0 and got[..., 3].max() <= 1.0
    assert (got[..., 3] > 0.1).mean() > 0.05, "test scene rendered no clouds"


def test_march_matches_oracle_second_scene(small_noise, luts):
    """A second scene widens the golden gate: low sun (sunset lighting,
    strong elevation-dependent HG lobe), heavy coverage, large wind
    integrals exercising the base/detail/weather offsets."""
    tlut, _, _ = luts
    from cloudscape_tpu.models import atmosphere

    sun = np.array([0.9, 0.08, 0.42])
    sun /= np.linalg.norm(sun)
    slut = np.asarray(atmosphere.sky_lut(
        jnp.asarray(tlut, jnp.float32), jnp.asarray(sun, jnp.float32)))

    prm = dict(
        cloud_pos=np.array([240.0, -180.0]),
        detailed_pos=np.array([33.0, 12.5]),
        weather_pos=np.array([0.21, -0.34]),
        time=4807.0,
        density=0.08,
        cloud_coverage=0.6,
        light_direction=sun,
        light_energy=1.6,
        light_color=np.array([1.0, 0.8, 0.6]),
        ground_color=np.array([0.5, 0.4, 0.3]),
    )
    jp = MarchParams.create(**prm)
    n = 32
    dirs = np.asarray(octmap.texel_directions(n))
    got = np.asarray(
        march_mod.march(jnp.asarray(dirs, jnp.float32), jp, small_noise,
                        jnp.asarray(slut, jnp.float32), steps=24)
    )
    large_np, small_np, weather_np = _np_pyramids(small_noise)
    want = ref.cloud_march_ref(
        dirs.astype(np.float64), prm, large_np, small_np, weather_np,
        slut.astype(np.float64), steps=24,
    )
    p = psnr(got, want)
    assert p > 40.0, f"second scene PSNR {p:.1f} dB"
    assert (want[..., 3] > 0.1).mean() > 0.1, "second scene rendered no clouds"


def test_march_below_horizon_is_zero(small_noise, luts):
    _, slut, sun = luts
    dirs = np.array([[0.0, -1.0, 0.0], [0.7, -0.1, 0.7]])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    jp = MarchParams.create(**_params(sun))
    out = np.asarray(
        march_mod.march(jnp.asarray(dirs, jnp.float32), jp, small_noise,
                        jnp.asarray(slut, jnp.float32), steps=8)
    )
    np.testing.assert_array_equal(out, 0.0)
