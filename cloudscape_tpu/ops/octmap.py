"""Hemispherical octahedral map encode/decode.

The reference stores the sky hemisphere in a square texture using a signed
octahedral parameterization (adapted from johnwhite3d's blog per the source
comment): decode in the compute kernel (`cloud_sky/clouds.glsl:239-256`),
encode in the display shader (`cloud_sky/clouds.gdshader:15-32`). The oct frame
is z-up; world space is y-up, bridged by a `.xzy` swizzle at both call sites
(`clouds.glsl:262`, `clouds.gdshader:109`).

This module exposes both the raw oct-frame transforms and the world-frame
convenience wrappers (with the swizzle baked in), plus the texel→direction grid
used to drive the raymarch (`clouds.glsl:258-262`: uv = texel_index /
texture_size, note *no* half-texel offset — reproduce as-is).
"""

from __future__ import annotations

import jax.numpy as jnp

from cloudscape_tpu.ops.math import normalize


def _oct_wrap(v):
    """Fold the lower hemisphere (`clouds.glsl:239-244` / `clouds.gdshader:15-20`).

    v: [..., 2] → [..., 2].
    """
    sign_val = jnp.where(v >= 0.0, 1.0, -1.0)
    return (1.0 - jnp.abs(v[..., ::-1])) * sign_val


def oct_to_vec3(e):
    """Decode square uv in [0,1]² to a unit direction, oct (z-up) frame
    (`clouds.glsl:248-256`). e: [..., 2] → [..., 3]."""
    nx = e[..., 0] - e[..., 1]
    ny = (e[..., 0] + e[..., 1]) - 1.0
    nz = 1.0 - jnp.abs(nx) - jnp.abs(ny)
    nxy = jnp.stack([nx, ny], axis=-1)
    nxy = jnp.where(nz[..., None] >= 0.0, nxy, _oct_wrap(nxy))
    n = jnp.concatenate([nxy, nz[..., None]], axis=-1)
    return normalize(n)


def vec3_to_oct(e):
    """Encode a direction (oct z-up frame) to square uv in [0,1]²
    (`clouds.gdshader:22-32`). e: [..., 3] → [..., 2]."""
    e = e / jnp.sum(jnp.abs(e), axis=-1, keepdims=True)
    exy = jnp.where(e[..., 2:3] >= 0.0, e[..., 0:2], _oct_wrap(e[..., 0:2]))
    ny = exy[..., 1] * 0.5 + 0.5
    nx = exy[..., 0] * 0.5 + ny
    ny = exy[..., 0] * -0.5 + ny
    return jnp.stack([nx, ny], axis=-1)


def uv_to_world_dir(uv):
    """uv [...,2] → world-frame (y-up) unit direction, as the cloud kernel does
    (`clouds.glsl:262`: `oct_to_vec3(uv).xzy`)."""
    n = oct_to_vec3(uv)
    return n[..., jnp.array([0, 2, 1])]


def world_dir_to_uv(d):
    """World-frame (y-up) direction → oct uv, as the display shader does
    (`clouds.gdshader:109`: `vec3_to_oct(norm.xzy)`)."""
    return vec3_to_oct(d[..., jnp.array([0, 2, 1])])


def texel_directions(texture_size: int, x0: int = 0, y0: int = 0,
                     width: int | None = None, height: int | None = None):
    """Direction grid for a texel rectangle of the hemisphere map.

    Mirrors `clouds.glsl:258-262`: pos = texel index + update_position,
    uv = pos / texture_size (no +0.5 texel-center offset — the reference's
    exact, slightly skewed mapping). Returns [height, width, 3] world dirs.

    x0/y0 may be Python ints or traced scalars (tile cursor); width/height must
    be static.
    """
    width = texture_size if width is None else width
    height = texture_size if height is None else height
    xs = jnp.arange(width, dtype=jnp.float32) + x0
    ys = jnp.arange(height, dtype=jnp.float32) + y0
    u = xs[None, :] / texture_size
    v = ys[:, None] / texture_size
    uv = jnp.stack(jnp.broadcast_arrays(u, v), axis=-1)
    return uv_to_world_dir(uv)
