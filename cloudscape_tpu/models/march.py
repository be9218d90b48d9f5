"""Cloud raymarch — jitted JAX reference implementation (the on-device oracle).

TPU-native restatement of `cloud_sky/clouds.glsl:139-237`: rays are the
vectorized batch axis (one VPU lane per ray after XLA tiling), the 128-step
primary march is a `lax.scan` carrying (position, transmittance, alpha,
radiance), and the 6-sample secondary light march is unrolled statically
(its mip levels are per-iteration constants, `clouds.glsl:190`).

The reference's `if (t > 0)` guard around lighting (`clouds.glsl:184`) is an
exact no-op when t == 0 (dt = 1, radiance = 0), i.e. it only exists to dodge
SIMT divergence — here the lighting math runs unconditionally and XLA
vectorizes it flat. A `march_hierarchical` variant with coarse empty-space
skipping lives in `models/march_fast.py`.

This module is the numerics anchor: the Pallas kernel is gated against it,
and it is itself gated against the NumPy f64 oracle (tests/test_march.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cloudscape_tpu.config import GROUND_RADIUS, SKY_B_RADIUS, SKY_T_RADIUS
from cloudscape_tpu.models.density import MarchParams, NoisePack, density_at, sample_weather
from cloudscape_tpu.ops import math as m
from cloudscape_tpu.ops.sampling import sample2d

# The 6 hard-coded cone-sampling offsets (`clouds.glsl:140`).
RANDOM_VECTORS = jnp.array(
    [
        [0.38051305, 0.92453449, -0.02111345],
        [-0.50625799, -0.03590792, -0.86163418],
        [-0.32509218, -0.94557439, 0.01428793],
        [0.09026238, -0.27376545, 0.95755165],
        [0.28128598, 0.42443639, -0.86065785],
        [-0.16852403, 0.14748697, 0.97460106],
    ],
    jnp.float32,
)

# The cloud kernel's truncated PI (`clouds.glsl:47`).
_PI_C = m.PI_CLOUDS


def sky_lut_lookup(sky_lut_img, ray_dir):
    """`clouds.glsl:49-57`: equirect decode with sqrt-warped elevation,
    clamp-to-edge bilinear. ray_dir [..., 3] world (y-up)."""
    phi = jnp.arctan2(ray_dir[..., 2], ray_dir[..., 0])
    theta = jnp.arcsin(jnp.clip(ray_dir[..., 1], -1.0, 1.0))
    u = phi / _PI_C * 0.5 + 0.5
    v = jnp.sqrt(jnp.abs(theta) / (_PI_C * 0.5)) * jnp.sign(theta) * 0.5 + 0.5
    uv = jnp.stack(jnp.broadcast_arrays(u, v), axis=-1)
    return sample2d(sky_lut_img, uv, wrap="clamp")[..., :3]


def ambient_colors(params: MarchParams, sky_lut_img):
    """The three per-dispatch LUT-derived colors (`clouds.glsl:162-167`),
    constant across rays — hoisted out of the march."""
    sqrt_half = 1.0 / jnp.sqrt(jnp.float32(2.0))
    atmosphere_sun = (
        sky_lut_lookup(sky_lut_img, params.light_direction)
        * 0.1
        * params.light_energy
        * params.light_color
    )
    amb = sky_lut_lookup(sky_lut_img, jnp.array([sqrt_half, sqrt_half, 0.0])) * 0.05
    atmosphere_ambient = 0.5 * (amb + jnp.linalg.norm(amb))
    gnd = sky_lut_lookup(sky_lut_img, jnp.array([sqrt_half, -sqrt_half, 0.0])) * 5.0 * 0.05
    atmosphere_ground = 0.5 * (gnd + params.ground_color * jnp.linalg.norm(gnd))
    return atmosphere_sun, atmosphere_ambient, atmosphere_ground


@partial(jax.jit, static_argnames=("steps", "light_steps"))
def march(dirs, params: MarchParams, noise: NoisePack, sky_lut_img,
          steps: int = 128, light_steps: int = 6):
    """March a batch of world-space view directions through the cloud shell.

    dirs: [..., 3] unit directions (y-up). Returns [..., 4] = (L.rgb, alpha);
    below-horizon rays return zeros (`clouds.glsl:221,232-234`).
    """
    dirs = jnp.asarray(dirs, jnp.float32)
    shape = dirs.shape[:-1]

    above = dirs[..., 1] > 0.0
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    ndir = jnp.where(above[..., None], dirs, up)

    cam = jnp.array([0.0, GROUND_RADIUS, 0.0], jnp.float32)
    cam_b = jnp.broadcast_to(cam, ndir.shape)
    start = cam + ndir * m.intersect_sphere_far(cam_b, ndir, SKY_B_RADIUS)[..., None]
    end = cam + ndir * m.intersect_sphere_far(cam_b, ndir, SKY_T_RADIUS)[..., None]
    shelldist = jnp.linalg.norm(end - start, axis=-1)
    ss = shelldist / steps

    # Per-texel deterministic start jitter (`clouds.glsl:145`), stable across
    # frames — the reference's anti-banding without temporal reprojection.
    p0 = start + ndir * (m.hash_iq(start * 10.0) * ss)[..., None]

    lss = (SKY_T_RADIUS - SKY_B_RADIUS) / 64.0
    ldir = params.light_direction / jnp.linalg.norm(params.light_direction)

    costheta = jnp.sum(ldir * ndir, axis=-1)
    phase = jnp.maximum(
        jnp.maximum(
            m.henyey_greenstein(costheta, 0.6),
            m.henyey_greenstein(costheta, 0.4 - 1.4 * ldir[1]),
        ),
        m.henyey_greenstein(costheta, -0.2),
    )

    atmosphere_sun, atmosphere_ambient, atmosphere_ground = ambient_colors(
        params, sky_lut_img
    )

    # Precompute the per-step cone offsets: lp after j steps is
    # p + sum_{k<=j} (ldir + RANDOM_VECTORS[k]*k) * lss  (`clouds.glsl:187`).
    light_offsets = jnp.cumsum(
        (ldir[None, :] + RANDOM_VECTORS[:light_steps]
         * jnp.arange(light_steps, dtype=jnp.float32)[:, None]) * lss,
        axis=0,
    )  # [light_steps, 3]
    distant_offset = ldir * (18.0 * lss)

    def step_fn(carry, _):
        p, T, alpha, L = carry
        p = p + ndir * ss[..., None]

        weather = sample_weather(noise, p[..., jnp.array([0, 2])], params.weather_pos)
        hf = m.height_fraction(jnp.linalg.norm(p, axis=-1), SKY_B_RADIUS, SKY_T_RADIUS)

        t, _ = density_at(p, weather, 0.0, params, noise)
        dt = jnp.exp(-params.density * t * ss)

        # Secondary light march: 6 cone samples at mips 0..5 + 1 distant
        # sample at mip 5 (`clouds.glsl:184-199`), unconditional (see module
        # docstring).
        cd = jnp.zeros(shape, jnp.float32)
        for j in range(light_steps):
            lp = p + light_offsets[j]
            lweather = sample_weather(
                noise, lp[..., jnp.array([0, 2])], params.weather_pos
            )
            lt, _ = density_at(lp, lweather, float(j), params, noise)
            cd = cd + lt

        lp = p + distant_offset
        lhf = m.height_fraction(jnp.linalg.norm(lp, axis=-1), SKY_B_RADIUS, SKY_T_RADIUS)
        # Quirk preserved: the distant sample's weather omits + weather_pos
        # (`clouds.glsl:197`).
        lweather = sample2d(
            noise.weather, lp[..., jnp.array([0, 2])] * 0.00006 + 0.5, wrap="repeat"
        )
        ldens, _ = density_at(lp, lweather, 5.0, params, noise)
        cd = cd + jnp.power(ldens, (1.0 - lhf) * 0.8 + 0.5)

        # Beer–powder (`clouds.glsl:201-204`).
        beers = jnp.exp(-params.density * cd * lss * 3.0)
        powder = 1.0 - jnp.exp(-params.density * cd * lss * 6.0)
        beers_total = 2.0 * beers * powder

        ambient = atmosphere_ground + (atmosphere_ambient - atmosphere_ground) * \
            m.smoothstep(0.0, 1.0, hf)[..., None]
        alpha = alpha + (1.0 - dt) * (1.0 - alpha)
        radiance = (ambient + (beers_total * phase)[..., None] * atmosphere_sun) * t[..., None]
        L = L + T[..., None] * (radiance - radiance * dt[..., None]) / \
            jnp.maximum(1e-7, t)[..., None]
        T = T * dt
        return (p, T, alpha, L), None

    # Derive the carry init from varying inputs (ss/p0) so the scan carry has
    # consistent varying-manual-axes under shard_map.
    init = (
        p0,
        jnp.ones_like(ss),
        jnp.zeros_like(ss),
        jnp.zeros_like(p0),
    )
    (_, _, alpha, L), _ = jax.lax.scan(step_fn, init, None, length=steps)

    alpha = jnp.clip(alpha, 0.0, 1.0)
    out = jnp.concatenate([L, alpha[..., None]], axis=-1)
    return jnp.where(above[..., None], out, 0.0)
