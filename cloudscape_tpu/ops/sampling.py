"""Texture-unit emulation: bilinear/trilinear filtered gathers with mip chains.

TPUs have no texture hardware, so the reference's sampler objects
(`cloud_sky/cloud_sky.gd:301-307`: repeat-wrap trilinear with mip filtering for
the noise volumes; `cloud_sky.gd:381-390`: clamp-to-edge for the sky LUT) are
rebuilt here as batched XLA gathers over HBM-resident arrays.

Conventions (matching GLSL/Vulkan exactly):
- texel centers at (i + 0.5) / N; filtering coordinate c = uv * N - 0.5;
- REPEAT wraps integer taps mod N; CLAMP_TO_EDGE clamps taps to [0, N-1]
  (index clamping is exactly equivalent to the spec's coordinate clamping);
- `textureLod(tex, p, lod)` clamps lod to [0, levels-1] and blends the two
  straddling mip levels linearly.

A key structural fact exploited throughout: every `textureLod` in the
reference's kernels uses a *statically known* lod (`clouds.glsl:117` lod=mip-2
with mip a per-call-site constant, `:132` lod=mip, `:190` lod=j in an
unrolled 6-step loop, `:198` lod=5), so mip level selection here is
compile-time static — no per-sample level divergence ever reaches XLA.

Array layouts: 2D textures are [H, W, C] with u→W, v→H; 3D textures are
[D, H, W, C] with p.x→W, p.y→H, p.z→D (matching the .import 3D slicing of
`worlnoise.bmp.import:28-29`). Mip pyramids are tuples of arrays, level 0
first, each level halving every spatial dim (box filter, as Godot's importer
generates: `*.import: mipmaps/generate=true`).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def _wrap_idx(i, n, mode: str):
    if mode == "repeat":
        return jnp.remainder(i, n)
    if mode == "clamp":
        return jnp.clip(i, 0, n - 1)
    raise ValueError(f"unknown wrap mode {mode!r}")


def sample2d(tex, uv, wrap: str = "repeat"):
    """Bilinear 2D fetch. tex: [H, W, C]; uv: [..., 2] → [..., C]."""
    h, w, _ = tex.shape
    cx = uv[..., 0] * w - 0.5
    cy = uv[..., 1] * h - 0.5
    ix0 = jnp.floor(cx)
    iy0 = jnp.floor(cy)
    fx = (cx - ix0)[..., None]
    fy = (cy - iy0)[..., None]
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    ix1 = _wrap_idx(ix0 + 1, w, wrap)
    iy1 = _wrap_idx(iy0 + 1, h, wrap)
    ix0 = _wrap_idx(ix0, w, wrap)
    iy0 = _wrap_idx(iy0, h, wrap)

    flat = tex.reshape(-1, tex.shape[-1])
    # One stacked gather of the 4 corners: [..., 4] indices.
    idx = jnp.stack(
        [iy0 * w + ix0, iy0 * w + ix1, iy1 * w + ix0, iy1 * w + ix1], axis=-1
    )
    corners = jnp.take(flat, idx, axis=0)  # [..., 4, C]
    c00, c10, c01, c11 = (corners[..., k, :] for k in range(4))
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return top + (bot - top) * fy


def sample3d(tex, p, wrap: str = "repeat"):
    """Trilinear 3D fetch. tex: [D, H, W, C]; p: [..., 3] (x,y,z) → [..., C]."""
    d, h, w, _ = tex.shape
    cx = p[..., 0] * w - 0.5
    cy = p[..., 1] * h - 0.5
    cz = p[..., 2] * d - 0.5
    ix0 = jnp.floor(cx)
    iy0 = jnp.floor(cy)
    iz0 = jnp.floor(cz)
    fx = (cx - ix0)[..., None]
    fy = (cy - iy0)[..., None]
    fz = (cz - iz0)[..., None]
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    iz0 = iz0.astype(jnp.int32)
    ix1 = _wrap_idx(ix0 + 1, w, wrap)
    iy1 = _wrap_idx(iy0 + 1, h, wrap)
    iz1 = _wrap_idx(iz0 + 1, d, wrap)
    ix0 = _wrap_idx(ix0, w, wrap)
    iy0 = _wrap_idx(iy0, h, wrap)
    iz0 = _wrap_idx(iz0, d, wrap)

    flat = tex.reshape(-1, tex.shape[-1])
    base00 = (iz0 * h + iy0) * w
    base01 = (iz0 * h + iy1) * w
    base10 = (iz1 * h + iy0) * w
    base11 = (iz1 * h + iy1) * w
    idx = jnp.stack(
        [
            base00 + ix0, base00 + ix1,
            base01 + ix0, base01 + ix1,
            base10 + ix0, base10 + ix1,
            base11 + ix0, base11 + ix1,
        ],
        axis=-1,
    )
    c = jnp.take(flat, idx, axis=0)  # [..., 8, C]
    # Lerp x, then y, then z.
    cx00 = c[..., 0, :] + (c[..., 1, :] - c[..., 0, :]) * fx
    cx01 = c[..., 2, :] + (c[..., 3, :] - c[..., 2, :]) * fx
    cx10 = c[..., 4, :] + (c[..., 5, :] - c[..., 4, :]) * fx
    cx11 = c[..., 6, :] + (c[..., 7, :] - c[..., 6, :]) * fx
    cy0 = cx00 + (cx01 - cx00) * fy
    cy1 = cx10 + (cx11 - cx10) * fy
    return cy0 + (cy1 - cy0) * fz


def build_pyramid3d(tex) -> Tuple:
    """Full mip chain for a [D, H, W, C] volume via 2×2×2 box filter."""
    levels = [tex]
    while min(tex.shape[:3]) > 1:
        d, h, w, c = tex.shape
        tex = tex.reshape(d // 2, 2, h // 2, 2, w // 2, 2, c).mean(axis=(1, 3, 5))
        levels.append(tex)
    return tuple(levels)


def build_pyramid2d(tex) -> Tuple:
    """Full mip chain for a [H, W, C] image via 2×2 box filter."""
    levels = [tex]
    while min(tex.shape[:2]) > 1:
        h, w, c = tex.shape
        tex = tex.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))
        levels.append(tex)
    return tuple(levels)


def sample3d_lod(pyramid: Sequence, p, lod: float, wrap: str = "repeat"):
    """`textureLod` on a 3D mip pyramid with a *static* lod.

    lod is clamped to [0, len(pyramid)-1]; fractional lods blend the two
    straddling levels linearly (mip_filter = LINEAR,
    `cloud_sky.gd:307`). Since lod is static the blend resolves at trace time
    to one or two trilinear fetches.
    """
    lod = float(lod)
    max_level = len(pyramid) - 1
    lod = min(max(lod, 0.0), float(max_level))
    d0 = int(lod)
    f = lod - d0
    lo = sample3d(pyramid[d0], p, wrap)
    if f == 0.0:
        return lo
    hi = sample3d(pyramid[min(d0 + 1, max_level)], p, wrap)
    return lo + (hi - lo) * f


def sample2d_lod(pyramid: Sequence, uv, lod: float, wrap: str = "repeat"):
    """`textureLod` on a 2D mip pyramid with a static lod."""
    lod = float(lod)
    max_level = len(pyramid) - 1
    lod = min(max(lod, 0.0), float(max_level))
    d0 = int(lod)
    f = lod - d0
    lo = sample2d(pyramid[d0], uv, wrap)
    if f == 0.0:
        return lo
    hi = sample2d(pyramid[min(d0 + 1, max_level)], uv, wrap)
    return lo + (hi - lo) * f
