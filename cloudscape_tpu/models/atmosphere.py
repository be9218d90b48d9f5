"""Physically-based atmosphere precompute stages (jitted JAX).

TPU-native equivalents of the reference's two small Vulkan compute kernels:

- `transmittance_lut()`  ← `cloud_sky/transmittance-lut.glsl` (256×64 × 40-step
  midpoint march of spectral extinction, baked once at startup;
  driver `cloud_sky/transmittance_lut.gd:51-78`).
- `sky_lut()`            ← `cloud_sky/sky-lut.glsl` (200×100 × 30-step single +
  pseudo-multiple scattering, re-rendered once per texture-swap cycle;
  driver `cloud_sky/sky_lut.gd:122-148`).

Both are spectral in 4 samples (630/560/490/430 nm) following Fernando García
Liñán's MIT-licensed model (shadertoy msXXDS; see LICENSE). They are tiny
(16.4k / 20k rays) so plain jitted XLA — fully vectorized over texels with a
`lax.fori_loop` over march steps — is the right tool; no Pallas needed
(SURVEY.md §2, components 6-7).

All math f32 on device; validated against the f64 oracle in
tests/test_atmosphere.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cloudscape_tpu.ops.sampling import sample2d

# Constants shared by both kernels (`sky-lut.glsl:44-91`,
# `transmittance-lut.glsl:44-80`).
EARTH_RADIUS = 6371.0  # km
ATMOSPHERE_THICKNESS = 100.0  # km
ATMOSPHERE_RADIUS = EARTH_RADIUS + ATMOSPHERE_THICKNESS
EYE_ALTITUDE = 0.5  # km
EYE_DISTANCE_TO_EARTH_CENTER = EARTH_RADIUS + EYE_ALTITUDE
GROUND_ALBEDO = 0.3

TRANSMITTANCE_STEPS = 40  # `transmittance-lut.glsl:45`
IN_SCATTERING_STEPS = 30  # `sky-lut.glsl:53`

TRANSMITTANCE_LUT_SIZE = (64, 256)  # (H, W), `transmittance_lut.gd:6`
SKY_LUT_SIZE = (100, 200)  # (H, W), `sky_lut.gd:4`

_PI = 3.14159265358979323846
_INV_4PI = 0.25 / _PI
_PHASE_ISOTROPIC = _INV_4PI
_RAYLEIGH_PHASE_SCALE = (3.0 / 16.0) / _PI
_AEROSOL_G = 0.8

_SUN_SPECTRAL_IRRADIANCE = jnp.array([1.679, 1.828, 1.986, 1.307], jnp.float32)
_MOLECULAR_SCATTERING_BASE = jnp.array(
    [6.605e-3, 1.067e-2, 1.842e-2, 3.156e-2], jnp.float32
)
_OZONE_CROSS_SECTION = jnp.array(
    [3.472e-21, 3.914e-21, 1.349e-21, 11.03e-23], jnp.float32
) * 1e-4
_OZONE_MEAN_DOBSON = 350.0
_AEROSOL_ABSORPTION_XS = jnp.array(
    [2.8722e-24, 4.6168e-24, 7.9706e-24, 1.3578e-23], jnp.float32
)
_AEROSOL_SCATTERING_XS = jnp.array(
    [1.5908e-22, 1.7711e-22, 2.0942e-22, 2.4033e-22], jnp.float32
)
_AEROSOL_BASE_DENSITY = 1.3681e20
_AEROSOL_BG_OVER_BASE = 2e6 / 1.3681e20
_AEROSOL_HEIGHT_SCALE = 0.73

# Spectral → linear sRGB, GLSL mat4x3 column-major (`sky-lut.glsl:207-217`):
# rgb = M @ L_spectral.
SPECTRAL_TO_SRGB = jnp.array(
    [
        [137.672389239975, -8.632904716299537, -1.7181567391931372],
        [32.549094028629234, 91.29801417199785, -12.005406444382531],
        [-38.91428392614275, 34.31665471469816, 29.89044807197628],
        [8.572844237945445, -11.103384660054624, 117.47585277566478],
    ],
    jnp.float32,
).T  # [3, 4]


def _ray_sphere(ro, rd, radius):
    """First-hit/-1 solver (`sky-lut.glsl:100-109`); ro/rd [..., 3]."""
    b = jnp.sum(ro * rd, axis=-1)
    c = jnp.sum(ro * ro, axis=-1) - radius * radius
    d = b * b - c
    sqrt_d = jnp.sqrt(jnp.maximum(d, 0.0))
    hit = jnp.where(d > b * b, -b + sqrt_d, -b - sqrt_d)
    miss = jnp.logical_or(jnp.logical_and(c > 0.0, b > 0.0), d < 0.0)
    return jnp.where(miss, -1.0, hit)


def _atmosphere_coefficients(h):
    """(aerosol_scat, molecular_scat, extinction), each [..., 4]
    (`sky-lut.glsl:188-202`; absorption terms fold into extinction)."""
    h = jnp.maximum(h, 0.0)
    aerosol_density = _AEROSOL_BASE_DENSITY * (
        jnp.exp(-h / _AEROSOL_HEIGHT_SCALE) + _AEROSOL_BG_OVER_BASE
    )
    aerosol_absorption = _AEROSOL_ABSORPTION_XS * aerosol_density[..., None]
    aerosol_scattering = _AEROSOL_SCATTERING_XS * aerosol_density[..., None]
    hh = h + 1e-4  # `sky-lut.glsl:172`: avoid log(0)
    t = jnp.log(hh) - 3.22261
    ozone_density = 3.78547397e20 * (1.0 / hh) * jnp.exp(-t * t * 5.55555555)
    molecular_absorption = (
        _OZONE_CROSS_SECTION * _OZONE_MEAN_DOBSON * ozone_density[..., None]
    )
    molecular_scattering = _MOLECULAR_SCATTERING_BASE * jnp.exp(
        -0.07771971 * jnp.power(h, 1.16364243)
    )[..., None]
    extinction = (
        aerosol_absorption
        + aerosol_scattering
        + molecular_absorption
        + molecular_scattering
    )
    return aerosol_scattering, molecular_scattering, extinction


@partial(jax.jit, static_argnames=("width", "height"))
def transmittance_lut(width: int = 256, height: int = 64) -> jax.Array:
    """Bake the spectral sun-transmittance LUT, [height, width, 4] f32.

    u = sun cos-zenith * 0.5 + 0.5, v = start altitude / atmosphere thickness
    (`transmittance-lut.glsl:157-196`). Generated once; the reference has no
    update path (sun dependence is baked into u).
    """
    u = (jnp.arange(width, dtype=jnp.float32) / width)[None, :]
    v = (jnp.arange(height, dtype=jnp.float32) / height)[:, None]
    u, v = jnp.broadcast_arrays(u, v)

    sun_cos_theta = u * 2.0 - 1.0
    sun_dir = jnp.stack(
        [
            -jnp.sqrt(jnp.maximum(1.0 - sun_cos_theta * sun_cos_theta, 0.0)),
            jnp.zeros_like(sun_cos_theta),
            sun_cos_theta,
        ],
        axis=-1,
    )
    dist_center = EARTH_RADIUS + (ATMOSPHERE_RADIUS - EARTH_RADIUS) * v
    ray_origin = jnp.stack(
        [jnp.zeros_like(v), jnp.zeros_like(v), dist_center], axis=-1
    )

    t_d = _ray_sphere(ray_origin, sun_dir, ATMOSPHERE_RADIUS)
    dt = t_d / TRANSMITTANCE_STEPS

    def body(i, acc):
        t = (i.astype(jnp.float32) + 0.5) * dt
        x_t = ray_origin + sun_dir * t[..., None]
        altitude = jnp.linalg.norm(x_t, axis=-1) - EARTH_RADIUS
        _, _, extinction = _atmosphere_coefficients(altitude)
        return acc + extinction * dt[..., None]

    tau = jax.lax.fori_loop(
        0, TRANSMITTANCE_STEPS, body, jnp.zeros((height, width, 4), jnp.float32)
    )
    return jnp.exp(-tau)


def _transmittance_from_lut(tlut, cos_theta, normalized_altitude):
    """`sky-lut.glsl:137-142`: clamp-to-edge bilinear lookup."""
    u = jnp.clip(cos_theta * 0.5 + 0.5, 0.0, 1.0)
    v = jnp.clip(normalized_altitude, 0.0, 1.0)
    uv = jnp.stack(jnp.broadcast_arrays(u, v), axis=-1)
    return sample2d(tlut, uv, wrap="clamp")


def _multiple_scattering(tlut, cos_theta, normalized_height, d):
    """Ground bounce + fitted Earth term (`sky-lut.glsl:144-164`)."""
    omega = 2.0 * _PI * (
        1.0 - jnp.sqrt(jnp.maximum(d * d - EARTH_RADIUS**2, 0.0)) / d
    )
    t_to_ground = _transmittance_from_lut(tlut, cos_theta, jnp.zeros_like(cos_theta))
    ones = jnp.ones_like(cos_theta)
    t_ground_to_sample = _transmittance_from_lut(tlut, ones, jnp.zeros_like(cos_theta)) / \
        _transmittance_from_lut(tlut, ones, normalized_height)
    l_ground = (
        _PHASE_ISOTROPIC
        * omega[..., None]
        * (GROUND_ALBEDO / _PI)
        * t_to_ground
        * t_ground_to_sample
        * cos_theta[..., None]
    )
    l_ms = 0.02 * jnp.array([0.217, 0.347, 0.594, 1.0], jnp.float32) * (
        1.0 / (1.0 + 5.0 * jnp.exp(-17.92 * cos_theta))
    )[..., None]
    return l_ms + l_ground


@partial(jax.jit, static_argnames=("width", "height"))
def sky_lut(tlut: jax.Array, sun_direction, width: int = 200, height: int = 100
            ) -> jax.Array:
    """Render the sky-view LUT, [height, width, 4] (linear sRGB + alpha 1).

    Full-sphere lat-long with sqrt-warped elevation (`sky-lut.glsl:278-315`);
    `sun_direction` is the Godot world (y-up) sun vector the driver pushes
    (`sky_lut.gd:129-131`); the kernel's negated `.xzy` swizzle
    (`sky-lut.glsl:221-223`) is reproduced inside.
    """
    return sky_lut_rows(tlut, sun_direction, 0, rows=height, width=width,
                        height=height)


def sky_lut_rows(tlut: jax.Array, sun_direction, row0, *, rows: int,
                 width: int = 200, height: int = 100) -> jax.Array:
    """One row band [row0, row0+rows) of `sky_lut`, [rows, width, 4].

    Bitwise-equal to the same rows of the full render: every texel's math
    is elementwise in (u, v) (the in-scattering loop reduces along STEPS,
    not texels), so slicing the v range changes nothing. Lets the engine's
    amortized prebake spread the per-cycle LUT render (~48 ms on a v5e)
    over several ticks instead of spiking one (VERDICT r4 #3). `row0` may
    be traced — one executable serves every band of a given height."""
    sun_direction = jnp.asarray(sun_direction, jnp.float32)
    sun_dir = jnp.stack(
        [-sun_direction[0], -sun_direction[2], sun_direction[1]]
    )

    u = (jnp.arange(width, dtype=jnp.float32) / width)[None, :]
    v = ((jnp.asarray(row0, jnp.float32)
          + jnp.arange(rows, dtype=jnp.float32)) / height)[:, None]
    u, v = jnp.broadcast_arrays(u, v)

    azimuth = 2.0 * _PI * u
    l = v * 2.0 - 1.0
    elev = l * l * jnp.sign(l) * (_PI * 0.5)
    ray_dir = jnp.stack(
        [
            jnp.cos(elev) * jnp.cos(azimuth),
            jnp.cos(elev) * jnp.sin(azimuth),
            jnp.sin(elev),
        ],
        axis=-1,
    )
    ray_origin = jnp.broadcast_to(
        jnp.array([0.0, 0.0, EYE_DISTANCE_TO_EARTH_CENTER], jnp.float32),
        ray_dir.shape,
    )

    atmos_dist = _ray_sphere(ray_origin, ray_dir, ATMOSPHERE_RADIUS)
    ground_dist = _ray_sphere(ray_origin, ray_dir, EARTH_RADIUS)
    t_d = jnp.where(ground_dist < 0.0, atmos_dist, ground_dist)

    cos_theta = jnp.sum(-ray_dir * sun_dir, axis=-1)
    molecular_phase = _RAYLEIGH_PHASE_SCALE * (1.0 + cos_theta * cos_theta)
    den = 1.0 + _AEROSOL_G**2 + 2.0 * _AEROSOL_G * cos_theta
    aerosol_phase = _INV_4PI * (1.0 - _AEROSOL_G**2) / (den * jnp.sqrt(den))

    dt = t_d / IN_SCATTERING_STEPS

    def body(i, carry):
        l_in, transmittance = carry
        t = (i.astype(jnp.float32) + 0.5) * dt
        x_t = ray_origin + ray_dir * t[..., None]
        dist_center = jnp.linalg.norm(x_t, axis=-1)
        zenith_dir = x_t / dist_center[..., None]
        altitude = dist_center - EARTH_RADIUS
        normalized_altitude = altitude / ATMOSPHERE_THICKNESS
        sample_cos_theta = jnp.sum(zenith_dir * sun_dir, axis=-1)

        aerosol_scattering, molecular_scattering, extinction = (
            _atmosphere_coefficients(altitude)
        )
        t_sun = _transmittance_from_lut(tlut, sample_cos_theta, normalized_altitude)
        ms = _multiple_scattering(tlut, sample_cos_theta, normalized_altitude, dist_center)
        s_term = _SUN_SPECTRAL_IRRADIANCE * (
            molecular_scattering * (molecular_phase[..., None] * t_sun + ms)
            + aerosol_scattering * (aerosol_phase[..., None] * t_sun + ms)
        )
        step_transmittance = jnp.exp(-dt[..., None] * extinction)
        # Hillaire's energy-conserving analytic step (`sky-lut.glsl:261-272`).
        s_int = (s_term - s_term * step_transmittance) / jnp.maximum(extinction, 1e-7)
        return (l_in + transmittance * s_int, transmittance * step_transmittance)

    init = (
        jnp.zeros((rows, width, 4), jnp.float32),
        jnp.ones((rows, width, 4), jnp.float32),
    )
    l_spec, _ = jax.lax.fori_loop(0, IN_SCATTERING_STEPS, body, init)

    rgb = jnp.einsum("hwc,rc->hwr", l_spec, SPECTRAL_TO_SRGB)
    return jnp.concatenate([rgb, jnp.ones((rows, width, 1), jnp.float32)], axis=-1)
