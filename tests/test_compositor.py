"""Composite/display stage vs the f64 oracle (`clouds.gdshader` parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cloudscape_tpu.models import atmosphere
from cloudscape_tpu.models.compositor import composite, sun_with_bloom
from cloudscape_tpu.utils.image import psnr
from oracle import reference as ref


@pytest.fixture(scope="module")
def fixtures(rng=None):
    rng = np.random.default_rng(99)
    cloud_from = rng.uniform(0, 1, (64, 64, 4)).astype(np.float32)
    cloud_to = rng.uniform(0, 1, (64, 64, 4)).astype(np.float32)
    tlut = np.asarray(atmosphere.transmittance_lut())
    sun = np.array([0.4, 0.35, -0.85])
    sun /= np.linalg.norm(sun)
    sky_from = np.asarray(atmosphere.sky_lut(jnp.asarray(tlut), jnp.asarray(sun, jnp.float32)))
    sun2 = np.array([0.42, 0.3, -0.86])
    sun2 /= np.linalg.norm(sun2)
    sky_to = np.asarray(atmosphere.sky_lut(jnp.asarray(tlut), jnp.asarray(sun2, jnp.float32)))
    return cloud_from, cloud_to, sky_from, sky_to, tlut, sun


def _viewdirs(n=2000, seed=5):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return d


def test_composite_matches_oracle(fixtures):
    cloud_from, cloud_to, sky_from, sky_to, tlut, sun = fixtures
    dirs = _viewdirs()
    for blend in (0.0, 0.5, 0.90625):
        got = np.asarray(
            composite(
                jnp.asarray(dirs, jnp.float32),
                jnp.asarray(cloud_from), jnp.asarray(cloud_to),
                jnp.asarray(sky_from), jnp.asarray(sky_to),
                jnp.asarray(tlut),
                jnp.float32(blend),
                jnp.asarray(sun, jnp.float32),
                jnp.float32(2.0),
            )
        )
        want = ref.composite_ref(
            dirs, cloud_from.astype(np.float64), cloud_to.astype(np.float64),
            sky_from.astype(np.float64), sky_to.astype(np.float64),
            tlut.astype(np.float64), blend, 2.0, sun,
        )
        # The sun-disk boundary and bloom are steep; compare in PSNR terms.
        p = psnr(got, want)
        assert p > 45.0, f"blend={blend}: PSNR {p:.1f}"
        assert np.isfinite(got).all()


def test_sun_disk_geometry(fixtures):
    *_, sun = fixtures
    # Dead-center on the sun → exactly 1.0 before the smoothstep.
    v = np.asarray(sun_with_bloom(jnp.asarray(sun[None], jnp.float32),
                                  jnp.asarray(sun, jnp.float32), 2.0))
    np.testing.assert_allclose(v, 1.0)
    # 90° away → tiny bloom only.
    perp = np.array([sun[1], -sun[0], 0.0])
    perp /= np.linalg.norm(perp)
    v2 = np.asarray(sun_with_bloom(jnp.asarray(perp[None], jnp.float32),
                                   jnp.asarray(sun, jnp.float32), 2.0))
    assert v2.max() < 0.01


def test_horizon_fade_full_below(fixtures):
    cloud_from, cloud_to, sky_from, sky_to, tlut, sun = fixtures
    # y <= 0 → output equals clamp(background): independent of cloud textures.
    dirs = np.array([[0.6, -0.2, 0.78], [0.0, -1.0, 0.0]])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    a = np.asarray(composite(
        jnp.asarray(dirs, jnp.float32),
        jnp.asarray(cloud_from), jnp.asarray(cloud_to),
        jnp.asarray(sky_from), jnp.asarray(sky_to),
        jnp.asarray(tlut), jnp.float32(0.3),
        jnp.asarray(sun, jnp.float32), jnp.float32(1.0)))
    b = np.asarray(composite(
        jnp.asarray(dirs, jnp.float32),
        jnp.asarray(cloud_from * 0 + 9.0), jnp.asarray(cloud_to * 0 + 9.0),
        jnp.asarray(sky_from), jnp.asarray(sky_to),
        jnp.asarray(tlut), jnp.float32(0.3),
        jnp.asarray(sun, jnp.float32), jnp.float32(1.0)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_deband_dither_zero_mean_and_bounded():
    """The debanding dither (`clouds.gdshader:1` use_debanding analog) must
    be zero-mean and bounded by ±0.5 display LSB."""
    from cloudscape_tpu.models.compositor import deband_dither

    d = np.asarray(deband_dither((128, 128)))
    assert abs(float(d.mean())) < 2e-5
    assert float(np.abs(d).max()) <= 0.5 / 255.0 + 1e-7
    # Decorrelated between adjacent pixels (not a constant field).
    assert float(d.std()) > 0.2 / 255.0


def test_composite_deband_flag(fixtures):
    """deband=False (default) is bit-identical to before; deband=True
    perturbs by at most one display LSB."""
    cloud_from, cloud_to, sky_from, sky_to, tlut, sun = fixtures
    d = _viewdirs(64 * 32).reshape(32, 64, 3)
    args = (jnp.asarray(d, jnp.float32), jnp.asarray(cloud_from),
            jnp.asarray(cloud_to), jnp.asarray(sky_from),
            jnp.asarray(sky_to), jnp.asarray(tlut), jnp.float32(0.5),
            jnp.asarray(sun, jnp.float32), jnp.float32(2.0))
    base = np.asarray(composite(*args))
    np.testing.assert_array_equal(np.asarray(composite(*args, deband=False)),
                                  base)
    on = np.asarray(composite(*args, deband=True))
    assert np.abs(on - base).max() <= 0.5 / 255.0 + 1e-7
    assert (on != base).any()


def test_composite_display_matches_composite(fixtures):
    """The serving-path composite (pre-blended + rebricked textures, 3 fat
    rows/pixel) must match `composite` to fp-reassociation level."""
    from cloudscape_tpu.models.compositor import composite_display
    from cloudscape_tpu.ops.brick import build_brick2_device

    cloud_from, cloud_to, sky_from, sky_to, tlut, sun = fixtures
    d = _viewdirs(64 * 32).reshape(32, 64, 3)
    blend = 0.40625
    want = np.asarray(composite(
        jnp.asarray(d, jnp.float32), jnp.asarray(cloud_from),
        jnp.asarray(cloud_to), jnp.asarray(sky_from), jnp.asarray(sky_to),
        jnp.asarray(tlut), jnp.float32(blend),
        jnp.asarray(sun, jnp.float32), jnp.float32(2.0)))
    cb = build_brick2_device(
        jnp.asarray(cloud_from + (cloud_to - cloud_from) * blend),
        (4, 8), (3, 7), wrap="clamp")
    sb = build_brick2_device(
        jnp.asarray(sky_from + (sky_to - sky_from) * blend),
        (4, 8), (3, 7), wrap="clamp")
    tb = build_brick2_device(jnp.asarray(tlut), (4, 8), (3, 7), wrap="clamp")
    got = np.asarray(composite_display(
        jnp.asarray(d, jnp.float32), cb, sb, tb,
        jnp.asarray(sun, jnp.float32), jnp.float32(2.0)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_downsample2x_box():
    from cloudscape_tpu.utils.image import downsample2x

    img = np.arange(4 * 6 * 3, dtype=np.float32).reshape(4, 6, 3)
    out = downsample2x(img)
    assert out.shape == (2, 3, 3)
    np.testing.assert_allclose(
        out[0, 0], img[0:2, 0:2].mean(axis=(0, 1)), rtol=1e-6
    )
    # mean-preserving on even-sized frames
    np.testing.assert_allclose(out.mean(), img.mean(), rtol=1e-6)
