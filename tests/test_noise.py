"""Procedural noise generators: determinism, range, tileability, structure.

The original perlworlnoise.tga is missing from the reference mount, so the
generated field *defines* the base noise; these tests pin its contract. The
shipped worlnoise.bmp provides a statistical cross-check for the Worley
generator (SURVEY.md §2.9).
"""

import numpy as np
import jax.numpy as jnp

from cloudscape_tpu.ops import noise


def test_perlin_tileable():
    # Same lattice point one period apart must agree exactly.
    p = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (256, 3)), jnp.float32)
    a = np.asarray(noise.perlin3(p * 4, 4, seed=3))
    b = np.asarray(noise.perlin3((p + 1.0) * 4, 4, seed=3))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_worley_tileable():
    p = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (256, 3)), jnp.float32)
    a = np.asarray(noise.worley3(p, 8, seed=5))
    b = np.asarray(noise.worley3(p + 1.0, 8, seed=5))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_worley_range_and_spread():
    v = np.asarray(noise.generate_detail_noise(32, seed=0))
    assert v.shape == (32, 32, 32, 3)
    assert v.min() >= 0.0 and v.max() <= 1.0
    for c in range(3):
        ch = v[..., c]
        assert ch.max() - ch.min() > 0.5  # same spread contract as the asset


def test_detail_noise_statistics_vs_shipped_asset(worlnoise_volume):
    """Statistical cross-validation against worlnoise.bmp: comparable means
    and variances per channel (not pixel equality — the original generator is
    unknown)."""
    ours = np.asarray(noise.generate_detail_noise(32, seed=0))
    for c in range(3):
        ref_mean = worlnoise_volume[..., c].mean()
        our_mean = ours[..., c].mean()
        assert abs(ref_mean - our_mean) < 0.25, (c, ref_mean, our_mean)
        assert ours[..., c].std() > 0.05


def test_base_noise_contract():
    v = np.asarray(noise.generate_base_noise(32, seed=0))
    assert v.shape == (32, 32, 32, 4)
    assert v.min() >= 0.0 and v.max() <= 1.0
    # R is the cloud shape: must have both empty and solid regions.
    r = v[..., 0]
    assert (r < 0.05).mean() > 0.01
    assert (r > 0.5).mean() > 0.05
    # Octave channels get finer with channel index (higher freq → lower
    # spatial autocorrelation at lag 1).
    def autocorr(ch):
        return np.corrcoef(ch[:-1].ravel(), ch[1:].ravel())[0, 1]
    acs = [autocorr(v[..., c]) for c in (1, 2, 3)]
    assert acs[0] > acs[1] > acs[2]


def test_base_noise_determinism():
    a = np.asarray(noise.generate_base_noise(16, seed=4))
    b = np.asarray(noise.generate_base_noise(16, seed=4))
    c = np.asarray(noise.generate_base_noise(16, seed=5))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0.1


def test_weather_contract():
    w = np.asarray(noise.generate_weather(128, seed=0))
    assert w.shape == (128, 128, 3)
    assert w.min() >= 0.0 and w.max() <= 1.0
    coverage = w[..., 2]
    # Patchy: meaningful covered and clear areas.
    assert (coverage < 0.1).mean() > 0.05
    assert (coverage > 0.5).mean() > 0.05


def test_weather_tileable_under_wrap():
    w = np.asarray(noise.generate_weather(64, seed=1))
    # Periodic field: opposite edges must be continuous (difference across the
    # seam comparable to an interior-step difference).
    seam = np.abs(w[0, :, :] - w[-1, :, :]).mean()
    interior = np.abs(w[1:, :, :] - w[:-1, :, :]).mean()
    assert seam < 4.0 * interior
