"""Display composite stage — jitted equivalent of `cloud_sky/clouds.gdshader`.

The only full-rate stage in the reference (runs per screen pixel each frame).
Takes explicit camera ray directions and sun direction in place of Godot's
`EYEDIR`/`LIGHT0_DIRECTION` built-ins: octahedral-decodes the two cloud blend
buffers, blends the two sky-LUT backbuffers, draws the sun disk with bloom
attenuated by the transmittance LUT, and applies the horizon fade
(`clouds.gdshader:104-116`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cloudscape_tpu.ops import math as m
from cloudscape_tpu.ops.brick import BrickTable2D, sample_brick2
from cloudscape_tpu.ops.octmap import world_dir_to_uv
from cloudscape_tpu.ops.sampling import sample2d


def _fetch_clamp(tex, uv):
    """Clamp-wrap bilinear fetch from either a raw [H, W, C] image or a
    BrickTable2D (the serving path rebricks its display textures per frame:
    one fat gather row per fetch instead of 4 narrow corner gathers)."""
    if isinstance(tex, BrickTable2D):
        return sample_brick2(tex, uv)
    return sample2d(tex, uv, wrap="clamp")

# Megameter-unit geometry of the composite shader (`clouds.gdshader:72-75`).
GROUND_RADIUS_MM = 6.360
ATMOSPHERE_RADIUS_MM = 6.460
VIEW_POS_MM = jnp.array([0.0, GROUND_RADIUS_MM + 0.0002, 0.0], jnp.float32)

_PI = jnp.pi  # Godot's shader PI built-in (full precision, unlike clouds.glsl)


def sky_lut_blend(sky_from, sky_to, ray_dir, blend_amount):
    """`clouds.gdshader:34-45`: blended equirect lookup with the /50 exposure
    normalization constant. sky_to=None reads either a single pre-blended
    LUT (blending commutes with the bilinear fetch) or an 8-channel PAIR
    brick table (from rgba ‖ to rgba in one gather row — the serving path;
    one row fetch, then the same fetch-then-lerp order as the split path)."""
    phi = jnp.arctan2(ray_dir[..., 2], ray_dir[..., 0])
    theta = jnp.arcsin(jnp.clip(ray_dir[..., 1], -1.0, 1.0))
    u = phi / _PI * 0.5 + 0.5
    v = jnp.sqrt(jnp.abs(theta) / (_PI * 0.5)) * jnp.sign(theta) * 0.5 + 0.5
    uv = jnp.stack(jnp.broadcast_arrays(u, v), axis=-1)
    if sky_to is None and isinstance(sky_from, BrickTable2D) \
            and sky_from.channels == 8:
        r = _fetch_clamp(sky_from, uv)
        a = r[..., 0:3]
        return (a + (r[..., 4:7] - a) * blend_amount) / 50.0
    a = _fetch_clamp(sky_from, uv)[..., :3]
    if sky_to is None:
        return a / 50.0
    b = _fetch_clamp(sky_to, uv)[..., :3]
    return (a + (b - a) * blend_amount) / 50.0


def sun_with_bloom(ray_dir, sun_dir, sun_disk_scale):
    """Solid sun disk + gaussian/inverse bloom (`clouds.gdshader:47-59`)."""
    sun_solid_angle = sun_disk_scale * (0.53 * _PI / 180.0)
    min_cos = jnp.cos(sun_solid_angle)
    cos_theta = jnp.sum(ray_dir * sun_dir, axis=-1)
    offset = jnp.maximum(min_cos - cos_theta, 0.0)
    gaussian = jnp.exp(-offset * 50000.0) * 0.5
    inv = 1.0 / (0.02 + offset * 300.0) * 0.01
    lum = jnp.where(cos_theta >= min_cos, 1.0, gaussian + inv)
    return lum[..., None] * jnp.ones((3,), jnp.float32)


def transmittance_lookup(tlut, pos_mm, sun_dir):
    """`clouds.gdshader:77-85` in megameter units."""
    height = jnp.linalg.norm(pos_mm, axis=-1)
    up = pos_mm / height[..., None]
    sun_cos_zenith = jnp.sum(up * sun_dir, axis=-1)
    u = jnp.clip(0.5 + 0.5 * sun_cos_zenith, 0.0, 1.0)
    v = jnp.clip(
        (height - GROUND_RADIUS_MM) / (ATMOSPHERE_RADIUS_MM - GROUND_RADIUS_MM),
        0.0,
        1.0,
    )
    uv = jnp.stack(jnp.broadcast_arrays(u, v), axis=-1)
    return _fetch_clamp(tlut, uv)[..., :3]


def get_atmo(eyedir, sky_from, sky_to, tlut, blend_amount, sun_dir,
             sun_disk_scale):
    """Background atmosphere + sun (`clouds.gdshader:87-102`)."""
    col = sky_lut_blend(sky_from, sky_to, eyedir, blend_amount)
    sun_lum = m.smoothstep(0.002, 1.0, sun_with_bloom(eyedir, sun_dir, sun_disk_scale))
    view_pos = jnp.broadcast_to(VIEW_POS_MM, eyedir.shape)
    hits_ground = m.ray_sphere_first(view_pos, eyedir, GROUND_RADIUS_MM) >= 0.0
    # The shader does this lookup per pixel (`clouds.gdshader:95`), but the
    # view position is a constant, so every pixel fetches the SAME texel —
    # and TPU gathers pay full row-issue latency for duplicate indices
    # (PERF_NOTES probe_gather_runs). One fetch, broadcast: bitwise the
    # same values, ~1 gather row per pixel removed from the display
    # composite (921k rows at 1280×720).
    tl = transmittance_lookup(tlut, VIEW_POS_MM[None, :], sun_dir)[0]
    has_sun = (jnp.linalg.norm(sun_lum, axis=-1) > 0.0)[..., None]
    sun_lum = jnp.where(
        has_sun, jnp.where(hits_ground[..., None], 0.0, sun_lum * tl), sun_lum
    )
    return col + sun_lum


def composite_display(eyedir, cloud_blended, sky_blended, tlut, sun_dir,
                      sun_disk_scale, blend_amount=0.0, *,
                      deband: bool = False):
    """Serving-path composite over display-ready brick tables.

    Two table forms are accepted:

    - PAIR tables (channels == 8, the serving default): each gather row
      carries the blend pair (from rgba in channels 0-3, to rgba in 4-7;
      built once per cycle — the pair is frozen between rotations), and the
      per-pixel lerp by `blend_amount` happens after the fetch, the same
      order as the split-path `composite`. One fat row per texture per
      pixel with ZERO per-tick table work (the per-tick pre-blend+rebrick
      measured 16.3 of the 31.7 ms serving tick, bench/probe_tile_split.py).
    - PRE-BLENDED tables/images (channels == 4): the round-3 form — blend
      hoisted out of the fetch entirely (exact up to fp reassociation);
      `blend_amount` is ignored.

    Gated ≈bit-level against `composite` in tests/test_compositor.py.
    """
    eyedir = jnp.asarray(eyedir, jnp.float32)
    norm = eyedir.at[..., 1].set(jnp.maximum(0.0, eyedir[..., 1]))
    n_len = jnp.linalg.norm(norm, axis=-1, keepdims=True)
    norm = jnp.where(
        n_len > 0.0, norm / jnp.maximum(n_len, 1e-12),
        jnp.array([1.0, 0.0, 0.0], jnp.float32),
    )
    clouds = _fetch_clamp(cloud_blended, world_dir_to_uv(norm))
    if isinstance(cloud_blended, BrickTable2D) and cloud_blended.channels == 8:
        clouds = clouds[..., 0:4] + \
            (clouds[..., 4:8] - clouds[..., 0:4]) * blend_amount
    background = get_atmo(
        eyedir, sky_blended, None, tlut, blend_amount, sun_dir,
        sun_disk_scale
    )
    color = background * (1.0 - clouds[..., 3:4]) + clouds[..., :3]
    fade = m.smoothstep(0.6, 1.0, 1.0 - eyedir[..., 1])[..., None]
    c = jnp.clip(color, 0.0, 100.0)
    b = jnp.clip(background, 0.0, 100.0)
    out = c + (b - c) * fade
    if deband:
        out = jnp.maximum(out + deband_dither(eyedir.shape[:-1])[..., None], 0.0)
    return out


def deband_dither(shape):
    """Zero-mean screen-space dither for display parity with the reference's
    `render_mode use_debanding` (`clouds.gdshader:1-2`): interleaved gradient
    noise over pixel coordinates, scaled to ±0.5 of an 8-bit display LSB.
    shape: the image shape (..., H, W) the dither is generated for."""
    if len(shape) >= 2:
        y = jax.lax.broadcasted_iota(jnp.float32, shape, len(shape) - 2)
        x = jax.lax.broadcasted_iota(jnp.float32, shape, len(shape) - 1)
    else:
        x = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
        y = jnp.zeros(shape, jnp.float32)
    # Jimenez interleaved gradient noise — uniform in [0, 1), zero-mean after
    # the -0.5 shift; decorrelated between adjacent pixels.
    ign = jnp.modf(52.9829189 * jnp.modf(0.06711056 * x + 0.00583715 * y)[0])[0]
    return (ign - 0.5) / 255.0


@partial(jax.jit, static_argnames=("deband",))
def composite(eyedir, cloud_from, cloud_to, sky_from, sky_to, tlut,
              blend_amount, sun_dir, sun_disk_scale, *, deband: bool = False):
    """Full sky() entry point (`clouds.gdshader:104-116`).

    eyedir: [..., 3] world view directions. cloud_from/to: the two blending
    hemisphere maps [N, N, 4]; sky_from/to: the two sky-LUT backbuffers;
    tlut: transmittance LUT. Returns [..., 3] linear HDR color.

    deband=True adds the reference's debanding (`clouds.gdshader:1`
    `render_mode use_debanding`): a zero-mean per-pixel dither of ±0.5
    display LSB that breaks up banding in smooth sky gradients, using the
    eyedir grid's trailing two axes as the pixel lattice.
    """
    eyedir = jnp.asarray(eyedir, jnp.float32)
    norm = eyedir.at[..., 1].set(jnp.maximum(0.0, eyedir[..., 1]))
    # Straight-down view dirs clamp to the zero vector; their cloud sample is
    # fully horizon-faded (`clouds.gdshader:115` fade = 1 for y <= 0), so any
    # valid direction works — guard the normalize against 0/0.
    n_len = jnp.linalg.norm(norm, axis=-1, keepdims=True)
    norm = jnp.where(
        n_len > 0.0, norm / jnp.maximum(n_len, 1e-12),
        jnp.array([1.0, 0.0, 0.0], jnp.float32),
    )

    oct_uv = world_dir_to_uv(norm)
    blend_from = sample2d(cloud_from, oct_uv, wrap="clamp")
    blend_to = sample2d(cloud_to, oct_uv, wrap="clamp")
    clouds = blend_from + (blend_to - blend_from) * blend_amount

    background = get_atmo(
        eyedir, sky_from, sky_to, tlut, blend_amount, sun_dir, sun_disk_scale
    )
    color = background * (1.0 - clouds[..., 3:4]) + clouds[..., :3]
    fade = m.smoothstep(0.6, 1.0, 1.0 - eyedir[..., 1])[..., None]
    c = jnp.clip(color, 0.0, 100.0)
    b = jnp.clip(background, 0.0, 100.0)
    out = c + (b - c) * fade
    if deband:
        out = jnp.maximum(out + deband_dither(eyedir.shape[:-1])[..., None], 0.0)
    return out
