"""Unit parity: JAX math helpers vs the NumPy f64 oracle transcriptions.

Covers every scalar helper of `cloud_sky/clouds.glsl` (SURVEY.md §4 unit
level): remap, HG phase, gradients, iq hash, both ray-sphere variants,
sRGB→linear.
"""

import numpy as np
import jax.numpy as jnp

from cloudscape_tpu.ops import math as m
from oracle import reference as ref


def test_remap_parity(rng):
    v = rng.uniform(-2, 2, size=1000)
    got = np.asarray(m.remap(jnp.asarray(v, jnp.float32), -1.0, 1.0, 0.0, 1.0))
    want = ref.remap_np(v, -1.0, 1.0, 0.0, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_smoothstep_parity(rng):
    x = rng.uniform(-0.5, 1.5, size=1000)
    got = np.asarray(m.smoothstep(0.1, 0.9, jnp.asarray(x, jnp.float32)))
    want = ref.smoothstep_np(0.1, 0.9, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_hash_parity(rng):
    # Positions at the scale the kernel uses: hash(pos * 10) with pos on the
    # cloud shell (~6e6 m) — exercises the same catastrophic-cancellation
    # regime as production.
    p64 = rng.uniform(-1.0, 1.0, size=(500, 3)) * 4.0 + 0.5
    got = np.asarray(m.hash_iq(jnp.asarray(p64, jnp.float32)))
    want = ref.hash_np(p64.astype(np.float32).astype(np.float64))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_hash_range(rng):
    p = rng.uniform(-1e7, 1e7, size=(2000, 3))
    h = np.asarray(m.hash_iq(jnp.asarray(p, jnp.float32)))
    assert np.all(h >= 0.0) and np.all(h < 1.0)


def test_henyey_greenstein_parity(rng):
    c = rng.uniform(-1, 1, size=1000)
    for g in (0.6, -0.2, 0.9):
        got = np.asarray(m.henyey_greenstein(jnp.asarray(c, jnp.float32), g))
        want = ref.henyey_greenstein_np(c, g)
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_gradients_parity(rng):
    ct = rng.uniform(0, 1, size=500)
    h = rng.uniform(0, 1, size=500)
    got = np.asarray(
        m.density_height_gradient(jnp.asarray(h, jnp.float32), jnp.asarray(ct, jnp.float32))
    )
    want = ref.density_height_gradient_np(h, ct)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_intersect_sphere_far_parity(rng):
    # Camera inside the shell looking up, like `clouds.glsl:223-225`.
    n = 500
    dirs = rng.normal(size=(n, 3))
    dirs[:, 1] = np.abs(dirs[:, 1]) + 0.01
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pos = np.zeros((n, 3))
    pos[:, 1] = ref.G_RADIUS
    for radius in (ref.SKY_B_RADIUS, ref.SKY_T_RADIUS):
        got = np.asarray(
            m.intersect_sphere_far(
                jnp.asarray(pos, jnp.float32), jnp.asarray(dirs, jnp.float32), radius
            )
        )
        want = ref.intersect_sphere_far_np(pos, dirs, radius)
        np.testing.assert_allclose(got, want, rtol=2e-3)
        assert np.all(got > 0)


def test_ray_sphere_first_parity(rng):
    n = 2000
    ro = rng.normal(size=(n, 3)) * 3.0
    ro[:, 2] += ref.EYE_DISTANCE_TO_EARTH_CENTER
    rd = rng.normal(size=(n, 3))
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    for radius in (ref.EARTH_RADIUS, ref.ATMOSPHERE_RADIUS):
        got = np.asarray(
            m.ray_sphere_first(
                jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32), radius
            )
        )
        want = ref.ray_sphere_intersection_np(ro, rd, radius)
        # Near-tangent rays flip the discriminant sign between f32 and f64
        # (cancellation at Earth-radius scale) — the GPU reference has the
        # same sensitivity, so only compare away from the tangent boundary.
        b = np.sum(ro * rd, axis=-1)
        c = np.sum(ro * ro, axis=-1) - radius * radius
        d = b * b - c
        decisive = np.abs(d) > 1e-4 * np.abs(b * b + np.abs(c))
        miss = want < 0
        assert np.array_equal((got < 0)[decisive], miss[decisive])
        ok = decisive & ~miss
        # atol 0.05 km: -b + sqrt(d) cancels for near-surface inside-origins;
        # the f32 GPU reference carries the same absolute error.
        np.testing.assert_allclose(got[ok], want[ok], rtol=1e-3, atol=0.05)


def test_srgb_to_linear():
    c = np.linspace(0, 1, 101)
    got = np.asarray(m.srgb_to_linear(jnp.asarray(c, jnp.float32)))
    lo = c / 12.92
    hi = ((c + 0.055) / 1.055) ** 2.4
    want = np.where(c <= 0.04045, lo, hi)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    assert abs(float(m.srgb_to_linear(jnp.float32(1.0))) - 1.0) < 1e-6
