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

REFERENCE_ASSET_DIR = "/root/reference/cloud_sky"


def _pyramid3d_np(tex: np.ndarray):
    """Host-side mip chain (2×2×2 box). Building pyramids on host avoids a
    cascade of tiny per-level TPU compiles (~30 s each through the compile
    tunnel) for what is a one-time <100 ms numpy reduction."""
    tex = np.asarray(tex, np.float32)
    try:
        from cloudscape_tpu.utils import _native
    except Exception:
        _native = None
    levels = [tex]
    while min(tex.shape[:3]) > 1:
        nxt = _native.mip3d(tex) if _native is not None else None
        if nxt is None:
            d, h, w, c = tex.shape
            nxt = tex.reshape(d // 2, 2, h // 2, 2, w // 2, 2, c).mean(
                axis=(1, 3, 5), dtype=np.float32
            )
        tex = nxt
        levels.append(tex)
    return levels


def make_noise_pack(large_volume, small_volume, weather_image) -> NoisePack:
    """Build mip pyramids (host-side) and assemble the pack.

    large_volume: [D,H,W,4]; small_volume: [D,H,W,3]; weather: [H,W,3]
    (weather is sampled miplessly, `weather.bmp.import: mipmaps=false`).
    """
    return NoisePack(
        large=tuple(jnp.asarray(l) for l in _pyramid3d_np(np.asarray(large_volume))),
        small=tuple(jnp.asarray(l) for l in _pyramid3d_np(np.asarray(small_volume))),
        weather=jnp.asarray(weather_image, jnp.float32),
    )


_NOISE_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                "..", ".noise_cache")


def _generate_cached(fn, name: str, size: int, seed: int):
    """Generate on the default device with a host-side .npz cache.

    The generators are deterministic in (size, seed); caching makes repeated
    engine/bench startups instant (fresh generation costs ~30 s of TPU
    compiles through the compile tunnel, or minutes on a slow host CPU)."""
    path = os.path.abspath(
        os.path.join(_NOISE_CACHE_DIR, f"{name}_{size}_{seed}.npz")
    )
    if os.path.exists(path):
        try:
            with np.load(path) as z:
                return z["v"]
        except Exception:
            pass
    v = np.asarray(fn(size, seed))
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez_compressed(path, v=v)
    except OSError:
        pass
    return v


def procedural_noise_pack(seed: int = 0, base_size: int = 128,
                          detail_size: int = 32, weather_size: int = 512
                          ) -> NoisePack:
    """Fully procedural pack — no baked assets (BASELINE config 4)."""
    return make_noise_pack(
        _generate_cached(noise_gen.generate_base_noise, "base", base_size, seed),
        _generate_cached(noise_gen.generate_detail_noise, "detail", detail_size, seed),
        _generate_cached(noise_gen.generate_weather, "weather", weather_size, seed),
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
    large = _generate_cached(noise_gen.generate_base_noise, "base", 128, seed)
    return make_noise_pack(large, np.asarray(small), np.asarray(weather))
