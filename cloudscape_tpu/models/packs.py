"""NoisePack builders: baked-asset and fully-procedural noise inputs.

The reference loads three textures with full mip chains
(`cloud_sky/cloud_sky.gd:298-341`); its base volume `perlworlnoise.tga` is
missing from the mount, so the default pack regenerates it on device
(`ops/noise.py`) while still using the two shipped BMPs when available —
giving a pixel-exact sampler path for everything that can be validated.
`procedural_noise_pack` needs no assets at all (BASELINE config 4).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from cloudscape_tpu.models.density import NoisePack
from cloudscape_tpu.ops import noise as noise_gen
from cloudscape_tpu.ops.sampling import build_pyramid3d

REFERENCE_ASSET_DIR = "/root/reference/cloud_sky"


def make_noise_pack(large_volume, small_volume, weather_image) -> NoisePack:
    """Build mip pyramids and assemble the pack.

    large_volume: [D,H,W,4]; small_volume: [D,H,W,3]; weather: [H,W,3]
    (weather is sampled miplessly, `weather.bmp.import: mipmaps=false`).
    """
    return NoisePack(
        large=build_pyramid3d(jnp.asarray(large_volume, jnp.float32)),
        small=build_pyramid3d(jnp.asarray(small_volume, jnp.float32)),
        weather=jnp.asarray(weather_image, jnp.float32),
    )


def procedural_noise_pack(seed: int = 0, base_size: int = 128,
                          detail_size: int = 32, weather_size: int = 512
                          ) -> NoisePack:
    """Fully on-device pack — no baked assets (BASELINE config 4)."""
    return make_noise_pack(
        noise_gen.generate_base_noise(base_size, seed),
        noise_gen.generate_detail_noise(detail_size, seed),
        noise_gen.generate_weather(weather_size, seed),
    )


def reference_noise_pack(asset_dir: str = REFERENCE_ASSET_DIR, seed: int = 0
                         ) -> NoisePack:
    """Shipped worlnoise.bmp + weather.bmp, procedural 128³ base volume.

    Falls back to fully procedural if the assets are unavailable.
    """
    from cloudscape_tpu.utils.assets import load_bmp, slice_horizontal_3d

    worl_path = os.path.join(asset_dir, "worlnoise.bmp")
    weather_path = os.path.join(asset_dir, "weather.bmp")
    if not (os.path.exists(worl_path) and os.path.exists(weather_path)):
        return procedural_noise_pack(seed)
    small = slice_horizontal_3d(load_bmp(worl_path), 32)
    weather = load_bmp(weather_path)
    large = noise_gen.generate_base_noise(128, seed)
    return make_noise_pack(large, np.asarray(small), np.asarray(weather))
