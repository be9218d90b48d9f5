"""Schneider-style cloud density field (`cloud_sky/clouds.glsl:107-137`).

The density model, shared verbatim by the jitted reference march
(`models/march.py`) and re-derived on brick tables by the production path
(`models/march_fast.py`): height-gradient shaping by cloud type, coverage
remap from the weather map, and high-frequency Worley erosion — "Heavily based
on method from Schneider" per the reference source. (SURVEY.md prescribed a
Pallas march kernel; that was dropped for a measured reason — per-row DMA
gathers are ~200× slower than XLA's gather path, docs/PERF_NOTES.md.)

Noise inputs arrive as a `NoisePack` pytree of mip pyramids; all `textureLod`
mips in the reference are static per call site, so `mip` here is a static
Python float.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from cloudscape_tpu.config import SKY_B_RADIUS, SKY_T_RADIUS
from cloudscape_tpu.ops import math as m
from cloudscape_tpu.ops.sampling import sample2d, sample3d_lod


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NoisePack:
    """Device-resident noise volumes with full mip chains.

    - large: Perlin-Worley base, 128³ RGBA mip pyramid (R = base shape,
      G/B/A = Worley FBM octaves; replaces the missing perlworlnoise.tga).
    - small: Worley detail, 32³ RGB mip pyramid (worlnoise.bmp or procedural).
    - weather: 512² RGB, mipless (R = cloud type, B = coverage; weather.bmp or
      procedural).
    """

    large: Tuple[jax.Array, ...]
    small: Tuple[jax.Array, ...]
    weather: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MarchParams:
    """Per-cycle kernel inputs — the analog of the reference's push-constant
    block (`clouds.glsl:18-40` / `cloud_sky.gd:251-289`), snapshotted once per
    texture-swap by the engine (FrameData semantics, `cloud_sky.gd:56-79`)."""

    cloud_pos: jax.Array  # [2] base wind integral
    detailed_pos: jax.Array  # [2] detail wind integral
    weather_pos: jax.Array  # [2] weather advection integral
    time: jax.Array  # scalar, seconds
    density: jax.Array  # scalar extinction scale
    cloud_coverage: jax.Array  # scalar
    light_direction: jax.Array  # [3] toward the sun, world y-up
    light_energy: jax.Array  # scalar
    light_color: jax.Array  # [3] linear RGB
    ground_color: jax.Array  # [3] linear RGB

    @staticmethod
    def create(cloud_pos=(0.0, 0.0), detailed_pos=(0.0, 0.0),
               weather_pos=(0.0, 0.0), time=0.0, density=0.05,
               cloud_coverage=0.25, light_direction=(0.0, 0.5, -1.0),
               light_energy=1.0, light_color=(1.0, 1.0, 1.0),
               ground_color=(1.0, 1.0, 1.0)) -> "MarchParams":
        f = lambda v: jnp.asarray(v, jnp.float32)
        return MarchParams(
            cloud_pos=f(cloud_pos), detailed_pos=f(detailed_pos),
            weather_pos=f(weather_pos), time=f(time), density=f(density),
            cloud_coverage=f(cloud_coverage), light_direction=f(light_direction),
            light_energy=f(light_energy), light_color=f(light_color),
            ground_color=f(ground_color),
        )


def sample_weather(noise: NoisePack, pxz, weather_pos):
    """Weather fetch (`clouds.glsl:169-174`): repeat-wrap bilinear at
    p.xz * 6e-5 + 0.5 + weather_pos. pxz: [..., 2] → [..., 3]."""
    uv = pxz * 0.00006 + 0.5 + weather_pos
    return sample2d(noise.weather, uv, wrap="repeat")


def density_at(p, weather, mip: float, params: MarchParams, noise: NoisePack):
    """Cloud density at world points p [..., 3] (`clouds.glsl:109-137`).

    weather: [..., 3] pre-fetched weather sample; mip: static lod
    (large noise at mip-2, small at mip).
    """
    hf = m.height_fraction(jnp.linalg.norm(p, axis=-1), SKY_B_RADIUS, SKY_T_RADIUS)

    # Base wind offset (`clouds.glsl:114`).
    offset = 20.0 * params.cloud_pos * 0.6
    p_base = jnp.stack(
        [p[..., 0] + offset[0], p[..., 1], p[..., 2] + offset[1]], axis=-1
    )

    n = sample3d_lod(noise.large, p_base * 0.00008, mip - 2.0, wrap="repeat")
    fbm = n[..., 1] * 0.625 + n[..., 2] * 0.25 + n[..., 3] * 0.125

    g = m.density_height_gradient(hf, weather[..., 0])
    base_cloud = m.remap(n[..., 0], -(1.0 - fbm), 1.0, 0.0, 1.0)
    weather_coverage = params.cloud_coverage * weather[..., 2]
    # The GLSL remap divides by weather_coverage (`clouds.glsl:124`), which is
    # 0 where the weather map has no coverage; the GPU's NaN-absorbing
    # min/max clamps recover 0 there, so guard the denominator (the final
    # `* weather_coverage` then zeroes the texel identically).
    base_cloud = (base_cloud * g - (1.0 - weather_coverage)) / jnp.maximum(
        weather_coverage, 1e-6
    )
    base_cloud = base_cloud * weather_coverage

    # Detail wind + animated vertical drift (`clouds.glsl:128-129`).
    p_det = jnp.stack(
        [
            p_base[..., 0] - params.detailed_pos[0] * 40.0,
            p_base[..., 1] - params.time * 40.0,
            p_base[..., 2] - params.detailed_pos[1] * 40.0,
        ],
        axis=-1,
    )
    hn = sample3d_lod(noise.small, p_det * 0.001, mip, wrap="repeat")
    hfbm = hn[..., 0] * 0.625 + hn[..., 1] * 0.25 + hn[..., 2] * 0.125
    hfbm = hfbm + (1.0 - 2.0 * hfbm) * jnp.clip(hf * 4.0, 0.0, 1.0)
    base_cloud = m.remap(base_cloud, hfbm * 0.4 * hf, 1.0, 0.0, 1.0)
    return jnp.power(jnp.clip(base_cloud, 0.0, 1.0), (1.0 - hf) * 0.8 + 0.5), hf
