"""Pallas noise kernels vs the jnp generators (same math, same hashes).

On the CPU suite the kernels run in interpreter mode — slower but exact, so
the parity gates here cover the real kernel logic.
"""

import numpy as np
import pytest

from cloudscape_tpu.ops import noise, noise_pallas


@pytest.mark.slow
def test_base_noise_matches_jnp():
    a = np.asarray(noise_pallas.generate_base_noise_pallas(16, seed=3))
    b = np.asarray(noise.generate_base_noise(16, seed=3))
    assert a.shape == b.shape == (16, 16, 16, 4)
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_detail_noise_matches_jnp():
    a = np.asarray(noise_pallas.generate_detail_noise_pallas(16, seed=9))
    b = np.asarray(noise.generate_detail_noise(16, seed=9))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_weather_matches_jnp():
    a = np.asarray(noise_pallas.generate_weather_pallas(64, seed=1))
    b = np.asarray(noise.generate_weather(64, seed=1))
    np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.slow
def test_base_noise_pallas_contract():
    v = np.asarray(noise_pallas.generate_base_noise_pallas(16, seed=0))
    assert v.min() >= 0.0 and v.max() <= 1.0
    assert np.isfinite(v).all()
