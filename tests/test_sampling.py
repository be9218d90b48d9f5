"""Texture sampler emulation: JAX gathers vs the f64 oracle sampler, using the
two shipped assets as pixel-exact fixtures (SURVEY.md §4 kernel golden tests).
"""

import numpy as np
import jax.numpy as jnp

from cloudscape_tpu.ops import sampling
from oracle import reference as ref


def test_bilinear_repeat_weather_fixture(weather_image, rng):
    uv = rng.uniform(-3, 3, size=(4000, 2))  # wide range exercises wrap
    got = np.asarray(sampling.sample2d(jnp.asarray(weather_image), jnp.asarray(uv, jnp.float32)))
    want = ref.sample2d_np(weather_image.astype(np.float64), uv)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_bilinear_exact_at_texel_centers(weather_image):
    h, w, _ = weather_image.shape
    ys, xs = np.meshgrid(np.arange(0, h, 7), np.arange(0, w, 7), indexing="ij")
    uv = np.stack([(xs + 0.5) / w, (ys + 0.5) / h], axis=-1)
    got = np.asarray(sampling.sample2d(jnp.asarray(weather_image), jnp.asarray(uv, jnp.float32)))
    np.testing.assert_allclose(got, weather_image[ys, xs], atol=1e-6)


def test_bilinear_clamp_edge(rng):
    tex = rng.uniform(size=(8, 16, 3)).astype(np.float32)
    uv = rng.uniform(-1.5, 2.5, size=(2000, 2))
    got = np.asarray(
        sampling.sample2d(jnp.asarray(tex), jnp.asarray(uv, jnp.float32), wrap="clamp")
    )
    want = ref.sample2d_np(tex.astype(np.float64), uv, wrap="clamp")
    np.testing.assert_allclose(got, want, atol=2e-5)
    # Far outside must equal the corner texels exactly.
    corner = np.asarray(
        sampling.sample2d(jnp.asarray(tex), jnp.asarray([[-5.0, -5.0]], jnp.float32), wrap="clamp")
    )
    np.testing.assert_allclose(corner[0], tex[0, 0], atol=1e-6)


def test_trilinear_repeat_worlnoise_fixture(worlnoise_volume, rng):
    p = rng.uniform(-2, 2, size=(3000, 3))
    got = np.asarray(
        sampling.sample3d(jnp.asarray(worlnoise_volume), jnp.asarray(p, jnp.float32))
    )
    want = ref.sample3d_np(worlnoise_volume.astype(np.float64), p)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_trilinear_exact_at_texel_centers(worlnoise_volume):
    d, h, w, _ = worlnoise_volume.shape
    zs, ys, xs = np.meshgrid(
        np.arange(0, d, 5), np.arange(0, h, 5), np.arange(0, w, 5), indexing="ij"
    )
    p = np.stack([(xs + 0.5) / w, (ys + 0.5) / h, (zs + 0.5) / d], axis=-1)
    got = np.asarray(
        sampling.sample3d(jnp.asarray(worlnoise_volume), jnp.asarray(p, jnp.float32))
    )
    np.testing.assert_allclose(got, worlnoise_volume[zs, ys, xs], atol=1e-6)


def test_pyramid_shapes(worlnoise_volume):
    pyr = sampling.build_pyramid3d(jnp.asarray(worlnoise_volume))
    assert len(pyr) == 6  # 32 → 16 → 8 → 4 → 2 → 1
    assert pyr[0].shape == (32, 32, 32, 3)
    assert pyr[-1].shape == (1, 1, 1, 3)
    # Box filter preserves the mean exactly.
    np.testing.assert_allclose(
        np.asarray(pyr[-1]).ravel(), worlnoise_volume.mean(axis=(0, 1, 2)), rtol=1e-4
    )


def test_lod_sampling_parity(worlnoise_volume, rng):
    pyr_j = sampling.build_pyramid3d(jnp.asarray(worlnoise_volume))
    pyr_n = ref.build_pyramid3d_np(worlnoise_volume.astype(np.float64))
    p = rng.uniform(-1, 2, size=(1000, 3))
    # The exact lods the cloud kernel uses for the small noise: 0..5
    # (`clouds.glsl:132,190`) plus the clamp cases.
    for lod in (-2.0, 0.0, 1.0, 2.0, 3.0, 5.0, 7.0, 2.5):
        got = np.asarray(sampling.sample3d_lod(pyr_j, jnp.asarray(p, jnp.float32), lod))
        want = ref.sample3d_lod_np(pyr_n, p, lod)
        np.testing.assert_allclose(got, want, atol=3e-5, err_msg=f"lod={lod}")


def test_worlnoise_asset_structure(worlnoise_volume):
    """The shipped detail noise: 32³ RGB, three Worley octaves, values well
    spread in [0,1] (`SURVEY.md §2.9`)."""
    assert worlnoise_volume.shape == (32, 32, 32, 3)
    assert worlnoise_volume.min() >= 0.0 and worlnoise_volume.max() <= 1.0
    # Each channel should use a wide value range (Worley noise spans ~[0,1]).
    for c in range(3):
        ch = worlnoise_volume[..., c]
        assert ch.max() - ch.min() > 0.5


def test_weather_asset_structure(weather_image):
    assert weather_image.shape == (512, 512, 3)
    assert weather_image.min() >= 0.0 and weather_image.max() <= 1.0
