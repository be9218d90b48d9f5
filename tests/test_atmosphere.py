"""Atmosphere LUT stages vs the f64 oracle (SURVEY.md §4 kernel golden tests).

The LUTs are tiny (256×64, 200×100) so full-image closeness in f32 is cheap.
"""

import numpy as np
import jax.numpy as jnp

from cloudscape_tpu.models import atmosphere
from cloudscape_tpu.utils.image import psnr
from oracle import reference as ref


def test_transmittance_lut_matches_oracle():
    got = np.asarray(atmosphere.transmittance_lut())
    want = ref.transmittance_lut_ref()
    assert got.shape == want.shape == (64, 256, 4)
    # Transmittance ∈ [0,1]; f32 marching keeps tight absolute error.
    np.testing.assert_allclose(got, want, atol=5e-5)
    assert psnr(got, want, peak=1.0) > 80.0


def test_transmittance_lut_physics():
    t = np.asarray(atmosphere.transmittance_lut())
    assert np.all(t >= 0.0) and np.all(t <= 1.0)
    # Transmittance increases with altitude (less atmosphere to cross) for a
    # overhead sun.
    overhead = t[:, -1, 0]  # u=max → cosθ≈1
    assert overhead[-1] > overhead[0]
    # Sun below horizon (u=0 → cosθ=-1) at ground level: nearly opaque.
    assert t[0, 0, :].max() < 0.1


def test_sky_lut_matches_oracle():
    tlut_j = atmosphere.transmittance_lut()
    tlut_n = ref.transmittance_lut_ref()
    for sun in ([0.0, 0.5, 0.8], [0.3, 0.05, -0.9], [0.0, -0.3, 1.0]):
        sun = np.asarray(sun) / np.linalg.norm(sun)
        got = np.asarray(atmosphere.sky_lut(tlut_j, jnp.asarray(sun, jnp.float32)))
        want = ref.sky_lut_ref(tlut_n, sun)
        assert got.shape == want.shape == (100, 200, 4)
        p = psnr(got[..., :3], want[..., :3])
        assert p > 60.0, f"sun={sun}: PSNR {p:.1f} dB"
        assert np.all(got[..., 3] == 1.0)


def test_sky_lut_brighter_towards_sun():
    """With the sun up, the horizon near the sun azimuth outshines the
    anti-sun azimuth."""
    tlut = atmosphere.transmittance_lut()
    sun = np.array([1.0, 0.5, 0.0])
    sun /= np.linalg.norm(sun)
    img = np.asarray(atmosphere.sky_lut(tlut, jnp.asarray(sun, jnp.float32)))
    lum = img[..., :3].sum(axis=-1)
    # v=0.5 row is the horizon; sun_dir shader-frame azimuth for this sun.
    row = lum[50]
    assert row.max() > 2.0 * row.min()
