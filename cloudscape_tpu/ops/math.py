"""Exact JAX transcriptions of the reference's GLSL math helpers.

Every function here reproduces, bit-for-bit in f32 semantics, a helper from the
reference shaders (cites point into /root/reference):

- remap                     `cloud_sky/clouds.glsl:67-69`
- smoothstep (GLSL)         used throughout (GLSL built-in semantics)
- hash_iq                   `cloud_sky/clouds.glsl:60-64` (iq's 3D hash)
- henyey_greenstein         `cloud_sky/clouds.glsl:72-75`
- height_fraction           `cloud_sky/clouds.glsl:77-80`
- mix_gradients             `cloud_sky/clouds.glsl:82-90`
- density_height_gradient   `cloud_sky/clouds.glsl:92-95`
- intersect_sphere_far      `cloud_sky/clouds.glsl:97-105` (far-root variant)
- ray_sphere_first          `cloud_sky/sky-lut.glsl:100-109` (first-hit/-1 variant)
- srgb_to_linear            Godot Color.srgb_to_linear (`cloud_sky/cloud_sky.gd:79`)

All functions are shape-polymorphic: scalars broadcast, vectors live in a
trailing axis of size 3 unless noted. Everything is pure and jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

# k = 1/(4*pi) as spelled in the reference (`clouds.glsl:73`).
_HG_K = 0.0795774715459

# The cloud kernel's (truncated!) PI constant (`clouds.glsl:47`). The sky-LUT
# kernel uses full precision (`sky-lut.glsl:44`); keep both spellings so each
# stage matches its source.
PI_CLOUDS = 3.141592
PI = 3.14159265358979323846


def remap(value, original_min, original_max, new_min, new_max):
    """Linear range remap, unclamped (`clouds.glsl:67-69`)."""
    return new_min + (
        (value - original_min) / (original_max - original_min) * (new_max - new_min)
    )


def smoothstep(edge0, edge1, x):
    """GLSL smoothstep: clamped Hermite interpolation."""
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def fract(x):
    """GLSL fract(x) = x - floor(x)."""
    return x - jnp.floor(x)


def hash_iq(p):
    """iq's 3D→1D hash (`clouds.glsl:60-64`): p is [..., 3], returns [...]."""
    p = fract(p * 0.3183099 + 0.1)
    p = p * 17.0
    return fract(p[..., 0] * p[..., 1] * p[..., 2] * (p[..., 0] + p[..., 1] + p[..., 2]))


def henyey_greenstein(cos_theta, g):
    """HG phase with k = 1/4π (`clouds.glsl:72-75`)."""
    gg = g * g
    return _HG_K * (1.0 - gg) / jnp.power(1.0 + gg - 2.0 * g * cos_theta, 1.5)


def height_fraction(radial_distance, bottom_radius, top_radius):
    """Fraction of height within the cloud shell, clamped (`clouds.glsl:77-80`)."""
    h = (radial_distance - bottom_radius) / (top_radius - bottom_radius)
    return jnp.clip(h, 0.0, 1.0)


# Cloud-type vertical profiles (`clouds.glsl:83-85`).
_STRATUS_GRADIENT = jnp.array([0.02, 0.05, 0.09, 0.11], dtype=jnp.float32)
_STRATOCUMULUS_GRADIENT = jnp.array([0.02, 0.2, 0.48, 0.625], dtype=jnp.float32)
_CUMULUS_GRADIENT = jnp.array([0.01, 0.0625, 0.78, 1.0], dtype=jnp.float32)


def mix_gradients(cloud_type):
    """Blend the three cloud-type gradients by weather.r (`clouds.glsl:82-90`).

    cloud_type: [...] → returns [..., 4].
    """
    cloud_type = jnp.asarray(cloud_type)
    stratus = 1.0 - jnp.clip(cloud_type * 2.0, 0.0, 1.0)
    stratocumulus = 1.0 - jnp.abs(cloud_type - 0.5) * 2.0
    cumulus = jnp.clip(cloud_type - 0.5, 0.0, 1.0) * 2.0
    return (
        _STRATUS_GRADIENT * stratus[..., None]
        + _STRATOCUMULUS_GRADIENT * stratocumulus[..., None]
        + _CUMULUS_GRADIENT * cumulus[..., None]
    )


def density_height_gradient(height_frac, cloud_type):
    """Vertical density envelope (`clouds.glsl:92-95`)."""
    g = mix_gradients(cloud_type)
    return smoothstep(g[..., 0], g[..., 1], height_frac) - smoothstep(
        g[..., 2], g[..., 3], height_frac
    )


def intersect_sphere_far(pos, dir, radius):
    """Far-root ray/sphere solver (`clouds.glsl:97-105`).

    Returns max root /(2a); NaN on miss (the reference only calls it for rays
    guaranteed to hit — camera inside the shell looking up).
    pos, dir: [..., 3]; radius scalar.
    """
    a = jnp.sum(dir * dir, axis=-1)
    b = 2.0 * jnp.sum(dir * pos, axis=-1)
    c = jnp.sum(pos * pos, axis=-1) - radius * radius
    d = jnp.sqrt(b * b - 4.0 * a * c)
    return jnp.maximum(-b - d, -b + d) / (2.0 * a)


def ray_sphere_first(ro, rd, radius):
    """First-hit ray/sphere with -1.0 miss sentinel (`sky-lut.glsl:100-109`).

    Also returns -1 when the ray points away from a sphere it is outside of.
    ro, rd: [..., 3]; radius scalar. Branchless transcription of the GLSL
    if-chain; rd must be normalized (the reference assumes it).
    """
    b = jnp.sum(ro * rd, axis=-1)
    c = jnp.sum(ro * ro, axis=-1) - radius * radius
    d = b * b - c
    sqrt_d = jnp.sqrt(jnp.maximum(d, 0.0))
    inside_far = -b + sqrt_d  # used when origin is inside (c <= 0 → d > b*b)
    outside_near = -b - sqrt_d
    hit = jnp.where(d > b * b, inside_far, outside_near)
    miss = jnp.logical_or(jnp.logical_and(c > 0.0, b > 0.0), d < 0.0)
    return jnp.where(miss, -1.0, hit)


def srgb_to_linear(c):
    """Godot's Color.srgb_to_linear, per channel (`cloud_sky.gd:79`)."""
    c = jnp.asarray(c)
    return jnp.where(
        c <= 0.04045,
        c / 12.92,
        jnp.power((c + 0.055) / 1.055, 2.4),
    )


def normalize(v, axis=-1):
    """GLSL normalize."""
    return v / jnp.linalg.norm(v, axis=axis, keepdims=True)
