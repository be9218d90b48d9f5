"""Per-cycle baked density field — a DOCUMENTED MEASURED NEGATIVE.

STATUS (round 2): baking the pre-erosion density onto a warped world grid
cannot match the exact march at the 40 dB gate at ANY feasible resolution —
image PSNR saturates at ~22/25/28 dB for (16,256²)/(24,384²)/(32,512²)
grids (docs/PERF_NOTES.md "round 2 negative results"). The reason is
structural: the gate compares against the exact march's own point samples,
whose ~100 m noise features at up-to-220 km distance would need
~feature-size grid cells (≈14,000² per shell layer) to reproduce. The SMOOTH
half of the idea — the cone-integrated light density — is what bakes well,
and shipped as the v2 march's ConeCache (march_fast.build_cone_cache).

This module is kept as the reproducible experiment behind that conclusion
(plus `occupied_ray_fraction`, a useful capacity-sizing diagnostic).
`march_baked` works and is tested, at its measured quality band.

`MarchParams` is frozen for a whole amortized cycle (FrameData snapshot
semantics, `cloud_sky.gd:165-187`), so everything the march reads from the
noise textures is a pure function of *position* for the duration of a cycle.
This module bakes the two expensive per-sample quantities onto a shell-aligned
warped grid once per cycle:

- channel 0: `pre` — the pre-erosion Schneider density
  (`clouds.glsl:109-125`: base shape + height gradient + coverage remap),
  which otherwise costs a weather row + a large-noise row per sample;
- channel 1: `cd` — the secondary cone/light march density sum
  (`clouds.glsl:184-199`), which otherwise costs ~17 gather rows per active
  sample.

Both live in ONE 2-channel brick row (4×4×4×2ch = 128 lanes), so the fine
march pays a single gather row per (ray, step) sample for both. Only the
detail erosion (`clouds.glsl:127-136`) stays live — its ~31 m features
cannot be tabulated over a 220 km shell at any feasible resolution — fetched
behind the exact `pre > 0` occupancy predicate.

Grid parameterization (same warp as the ConeCache): (hf, z̃, x̃) with
x = sign(l)·l²·extent, l = 2(x̂−0.5) — resolution concentrates near the
viewer exactly as the image's pixel footprint does (the hemisphere map is a
fixed-angular-resolution view from the shell center). Every march sample has
y > 0 (the camera sits on the planet surface, the shell is above), so
(x, z, hf) uniquely determines the world position.

Approximate by construction (trilinear in warped space); gated ≥ 40 dB
against the exact `march_bricks` in tests/test_field.py, resolution sweep in
docs/PERF_NOTES.md.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cloudscape_tpu.config import GROUND_RADIUS, SKY_B_RADIUS, SKY_T_RADIUS
from cloudscape_tpu.models.density import MarchParams
from cloudscape_tpu.models.march import ambient_colors
from cloudscape_tpu.models.march_fast import (
    BrickPack,
    _cone_density,
    _density_finish_xyz,
    _density_pre_xyz,
    _light_offsets,
    _pad_blocks,
    _ray_setup,
    _weather_rb_xy,
    _compact_indices,
)
from cloudscape_tpu.ops import math as m
from cloudscape_tpu.ops.brick import (
    BrickTable3D,
    build_brick3_device,
    sample_brick3_xyz,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DensityField:
    """One amortized cycle's baked (pre, cd) field. table: clamp-wrap
    2-channel BrickTable3D on the (hf, z̃, x̃) grid."""

    table: BrickTable3D
    extent: float = dataclasses.field(default=220e3,
                                      metadata=dict(static=True))


def _warp(v, extent: float):
    return 0.5 + 0.5 * jnp.sign(v) * jnp.sqrt(jnp.abs(v) / extent)


def _unwarp(c, extent: float):
    l = 2.0 * (c - 0.5)
    return jnp.sign(l) * l * l * extent


def field_coords_xyz(px, py, pz, extent: float):
    """World position components → field uvw components (x̃, z̃, hf)."""
    hf = m.height_fraction(jnp.sqrt(px * px + py * py + pz * pz),
                           SKY_B_RADIUS, SKY_T_RADIUS)
    return _warp(px, extent), _warp(pz, extent), hf


def _grid_positions(res, extent: float):
    """Flattened world positions of all (hf, z̃, x̃) grid cell centers.
    res = (n_hf, n_z, n_x). Beyond-horizon cells clamp onto the shell (never
    queried by real samples — every march sample is horizon-limited)."""
    nd, nh, nw = res
    xs = _unwarp((jnp.arange(nw, dtype=jnp.float32) + 0.5) / nw, extent)
    zs = _unwarp((jnp.arange(nh, dtype=jnp.float32) + 0.5) / nh, extent)
    hfs = (jnp.arange(nd, dtype=jnp.float32) + 0.5) / nd
    r = SKY_B_RADIUS + hfs * (SKY_T_RADIUS - SKY_B_RADIUS)

    x = jnp.broadcast_to(xs[None, None, :], res)
    z = jnp.broadcast_to(zs[None, :, None], res)
    rr = r[:, None, None]
    y = jnp.sqrt(jnp.maximum(rr * rr - x * x - z * z, 1.0))
    return x.reshape(-1), y.reshape(-1), z.reshape(-1)


def build_density_field(params: MarchParams, bp: BrickPack,
                        res=(32, 768, 768), cone_res=(16, 192, 192),
                        light_steps: int = 6, extent: float = 220e3,
                        chunk: int = 65536) -> DensityField:
    """Bake the (pre, cd) field for one FrameData snapshot (device-side, one
    jit trace; all loops are `lax.map`).

    `pre` is evaluated at every fine grid cell (2 gather rows each). `cd` is
    smooth (a cone-integrated quantity — the deep-shadow-map observation,
    docs/PERF_NOTES.md), so it is evaluated densely on the smaller `cone_res`
    grid (~17 rows each) and upsampled onto the fine grid (1 row each).
    """
    nd, nh, nw = res

    def chunked(fn, *arrays):
        n = arrays[0].shape[0]
        blocks = tuple(_pad_blocks(a, chunk, jnp.float32(0.0)) for a in arrays)
        return jax.lax.map(fn, blocks).reshape(-1)[:n]

    # ---- pre on the fine grid.
    px, py, pz = _grid_positions(res, extent)

    def pre_chunk(blk):
        bx, by_, bz = blk
        weather = _weather_rb_xy(bp, bx, bz, params.weather_pos)
        pre, _ = _density_pre_xyz(bx, by_, bz, weather, 0.0, params, bp)
        return pre

    pre = chunked(pre_chunk, px, py, pz)

    # ---- cd on the coarse grid, then upsampled to the fine grid.
    ldir = params.light_direction / jnp.linalg.norm(params.light_direction)
    light_offsets, distant_offset, _ = _light_offsets(ldir, light_steps)
    cx, cy, cz = _grid_positions(cone_res, extent)

    def cone_chunk(blk):
        p = jnp.stack(blk, axis=-1)
        return _cone_density(p, params, bp, light_offsets, distant_offset,
                             light_steps)

    cd_coarse = chunked(cone_chunk, cx, cy, cz)
    cone_table = build_brick3_device(
        cd_coarse.reshape(cone_res + (1,)), (8, 4, 4), (7, 3, 3), wrap="clamp"
    )

    def upsample_chunk(blk):
        bx, by_, bz = blk
        qx, qz, qh = field_coords_xyz(bx, by_, bz, extent)
        return sample_brick3_xyz(cone_table, qx, qz, qh)[..., 0]

    cd = chunked(upsample_chunk, px, py, pz)

    vol = jnp.stack([pre, cd], axis=-1).reshape(nd, nh, nw, 2)
    table = build_brick3_device(vol, (4, 4, 4), (3, 3, 3), wrap="clamp")
    return DensityField(table=table, extent=extent)


def sample_field_xyz(field: DensityField, px, py, pz):
    """(pre, cd) at world position components — ONE gather row."""
    qx, qz, qh = field_coords_xyz(px, py, pz, field.extent)
    return sample_brick3_xyz(field.table, qx, qz, qh)


def occupied_ray_fraction(dirs, params: MarchParams, field: DensityField,
                          coarse_steps: int = 16,
                          occupancy_margin: float = 0.3):
    """Fraction of rays whose shell segment touches any cloud (per the baked
    field's coarse probe) — use once per cycle to size `ray_capacity_frac`
    with a margin. Host-callable diagnostic, jit-safe."""
    flat = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)
    above, ndir, ss, _, _, _ = _ray_setup(flat, params, 1)
    cam = jnp.array([0.0, GROUND_RADIUS, 0.0], jnp.float32)
    cam_b = jnp.broadcast_to(cam, ndir.shape)
    start = cam + ndir * m.intersect_sphere_far(cam_b, ndir, SKY_B_RADIUS)[..., None]
    shelldist = ss * 1.0
    k = (jnp.arange(coarse_steps, dtype=jnp.float32) + 0.5) / coarse_steps
    p = start[:, None, :] + ndir[:, None, :] * (shelldist[:, None] * k[None, :])[..., None]
    pre = sample_field_xyz(field, p[..., 0], p[..., 1], p[..., 2])[..., 0]
    occ = jnp.any(pre > -occupancy_margin, axis=1) & above
    return jnp.mean(occ.astype(jnp.float32))


def march_baked(dirs, params: MarchParams, bp: BrickPack,
                field: DensityField, sky_lut_img, steps: int = 128,
                coarse_steps: int = 16, chunk: int = 32768,
                ray_capacity_frac: float = 1.0,
                erosion_capacity_frac: float = 0.5,
                occupancy_margin: float = 0.3,
                jitter: bool = True):
    """Baked-field raymarch: the flagship full-re-render path.

    Per (ray, step) sample: ONE field gather row gives (pre, cd); the detail
    erosion (`clouds.glsl:127-136`) is fetched compacted behind the exact
    `pre > 0` occupancy predicate (erosion only reduces density and maps
    pre ≤ 0 to exactly 0). The window/compaction structure follows
    `march_hierarchical`: a coarse probe of the baked field finds each ray's
    occupied t-window, empty rays skip the fine march, and the full `steps`
    budget is re-distributed inside the window.

    ray_capacity_frac: same cliff semantics as `march_hierarchical` — the
    default 1.0 can never overflow; lower only with measured occupancy
    (`occupied_ray_fraction`) plus margin. erosion_capacity_frac: capacity of
    the compacted erosion list as a fraction of compacted (ray·step) samples;
    overflow zeroes the density of excess samples (visible holes), so keep
    ≥ measured `pre > 0` fraction with margin — 0.5 holds every measured
    scene (gated in tests/test_field.py).

    Approximate by construction; gated ≥ 40 dB vs `march_bricks` in tests.
    """
    dirs = jnp.asarray(dirs, jnp.float32)
    shape = dirs.shape[:-1]
    flat = dirs.reshape(-1, 3)
    n = flat.shape[0]
    chunk = min(chunk, max(n, 1))
    atmos = ambient_colors(params, sky_lut_img)
    atmosphere_sun, atmosphere_ambient, atmosphere_ground = atmos

    above, ndir, ss, p0, phase, ldir = _ray_setup(flat, params, steps)
    lss = (SKY_T_RADIUS - SKY_B_RADIUS) / 64.0
    shelldist = ss * steps
    cam = jnp.array([0.0, GROUND_RADIUS, 0.0], jnp.float32)
    cam_b = jnp.broadcast_to(cam, ndir.shape)
    start = cam + ndir * m.intersect_sphere_far(cam_b, ndir, SKY_B_RADIUS)[..., None]

    # ---- 1. Coarse occupancy from the baked field (1 row per probe).
    k_c = (jnp.arange(coarse_steps, dtype=jnp.float32) + 0.5) / coarse_steps

    def coarse_chunk(args):
        startc, ndirc, sdc = args
        tt = (sdc[:, None] * k_c[None, :])
        cpx = startc[:, 0, None] + ndirc[:, 0, None] * tt
        cpy = startc[:, 1, None] + ndirc[:, 1, None] * tt
        cpz = startc[:, 2, None] + ndirc[:, 2, None] * tt
        return sample_field_xyz(field, cpx, cpy, cpz)[..., 0]

    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    blocks = (
        _pad_blocks(start, chunk, up * GROUND_RADIUS),
        _pad_blocks(ndir, chunk, up),
        _pad_blocks(shelldist, chunk, jnp.float32(1.0)),
    )
    pre_c = jax.lax.map(coarse_chunk, blocks).reshape(-1, coarse_steps)[:n]

    occ = pre_c > -occupancy_margin
    pad = jnp.zeros_like(occ[:, :1])
    occ = occ | jnp.concatenate([pad, occ[:, :-1]], axis=1) | \
        jnp.concatenate([occ[:, 1:], pad], axis=1)
    any_occ = jnp.any(occ, axis=1) & above

    idx_c = jnp.arange(coarse_steps)
    big = coarse_steps + 1
    first = jnp.min(jnp.where(occ, idx_c[None, :], big), axis=1)
    last = jnp.max(jnp.where(occ, idx_c[None, :], -1), axis=1)
    a = jnp.clip(first.astype(jnp.float32) / coarse_steps, 0.0, 1.0)
    b = jnp.clip((last.astype(jnp.float32) + 1.0) / coarse_steps, 0.0, 1.0)
    b = jnp.maximum(b, a + 1.0 / coarse_steps)

    # ---- 2. Ray compaction.
    ray_cap = max(int(n * ray_capacity_frac), chunk)
    ray_cap += (-ray_cap) % chunk
    ridx = _compact_indices(any_occ, ray_cap, n)
    rsafe = jnp.minimum(ridx, n - 1)

    ndir_r = ndir[rsafe]
    start_r = start[rsafe]
    sd_r = shelldist[rsafe]
    a_r, b_r = a[rsafe], b[rsafe]
    phase_r = phase[rsafe]
    above_r = above[rsafe] & (ridx < n)
    nr = ray_cap

    ss_r = (b_r - a_r) * sd_r / steps
    jit_r = m.hash_iq(start_r * 10.0) if jitter else jnp.zeros_like(sd_r)
    p0_r = start_r + ndir_r * (a_r * sd_r + jit_r * ss_r)[..., None]

    # ---- 3. Fine dense phase: 1 field row per sample → (pre, cd).
    i_step = jnp.arange(1, steps + 1, dtype=jnp.float32)

    def dense_chunk(args):
        p0c, ndirc, ssc = args
        tt = ssc[:, None] * i_step[None, :]
        fpx = p0c[:, 0, None] + ndirc[:, 0, None] * tt
        fpy = p0c[:, 1, None] + ndirc[:, 1, None] * tt
        fpz = p0c[:, 2, None] + ndirc[:, 2, None] * tt
        f = sample_field_xyz(field, fpx, fpy, fpz)
        hf = m.height_fraction(jnp.sqrt(fpx * fpx + fpy * fpy + fpz * fpz),
                               SKY_B_RADIUS, SKY_T_RADIUS)
        return f[..., 0], f[..., 1], hf

    blocks = (
        _pad_blocks(p0_r, chunk, up * GROUND_RADIUS),
        _pad_blocks(ndir_r, chunk, up),
        _pad_blocks(ss_r, chunk, jnp.float32(1.0)),
    )
    pre, cd, hf = jax.lax.map(dense_chunk, blocks)
    pre = pre.reshape(-1, steps)[:nr]
    cd = cd.reshape(-1, steps)[:nr]
    hf = hf.reshape(-1, steps)[:nr]

    # ---- 4. Compacted erosion: t where pre > 0, exactly 0 elsewhere.
    total = nr * steps
    occupied = (pre > 0.0) & above_r[:, None]
    e_cap = max(int(total * erosion_capacity_frac), chunk)
    e_cap += (-e_cap) % chunk
    eidx = _compact_indices(occupied.reshape(-1), e_cap, total)

    ray_i = jnp.minimum(eidx // steps, nr - 1)
    stp = (eidx % steps).astype(jnp.float32) + 1.0
    tt_e = ss_r[ray_i] * stp
    epx = p0_r[ray_i, 0] + ndir_r[ray_i, 0] * tt_e
    epy = p0_r[ray_i, 1] + ndir_r[ray_i, 1] * tt_e
    epz = p0_r[ray_i, 2] + ndir_r[ray_i, 2] * tt_e
    pre_e = jnp.take(pre.reshape(-1), jnp.minimum(eidx, total - 1))
    hf_e = m.height_fraction(jnp.sqrt(epx * epx + epy * epy + epz * epz),
                             SKY_B_RADIUS, SKY_T_RADIUS)

    def erosion_chunk(blk):
        bpre, bhf, bx, by_, bz = blk
        return _density_finish_xyz(bpre, bhf, bx, by_, bz, 0.0, params, bp)

    t_e = jax.lax.map(
        erosion_chunk,
        (pre_e.reshape(-1, chunk), hf_e.reshape(-1, chunk),
         epx.reshape(-1, chunk), epy.reshape(-1, chunk),
         epz.reshape(-1, chunk)),
    ).reshape(-1)
    t = jnp.zeros((total + 1,), jnp.float32).at[eidx].set(
        t_e, mode="drop"
    )[:total].reshape(nr, steps)

    # ---- 5. Accumulation (identical math to `_march_core` phase 3).
    dt = jnp.exp(-params.density * t * ss_r[:, None])
    t_prefix = jnp.concatenate(
        [jnp.ones_like(dt[:, :1]), jnp.cumprod(dt, axis=1)[:, :-1]], axis=1
    )
    beers = jnp.exp(-params.density * cd * lss * 3.0)
    powder = 1.0 - jnp.exp(-params.density * cd * lss * 6.0)
    beers_total = jnp.where(t > 0.0, 2.0 * beers * powder, 0.0)

    ambient = atmosphere_ground + (atmosphere_ambient - atmosphere_ground) * \
        m.smoothstep(0.0, 1.0, hf)[..., None]
    radiance = (ambient + (beers_total * phase_r[:, None])[..., None] * atmosphere_sun) \
        * t[..., None]
    contrib = t_prefix[..., None] * (radiance - radiance * dt[..., None]) / \
        jnp.maximum(1e-7, t)[..., None]
    L = jnp.sum(contrib, axis=1)
    alpha = jnp.clip(1.0 - jnp.prod(dt, axis=1), 0.0, 1.0)
    out_r = jnp.concatenate([L, alpha[..., None]], axis=-1)
    out_r = jnp.where(above_r[..., None], out_r, 0.0)

    # ---- 6. Scatter rays back.
    out = jnp.zeros((n + 1, 4), jnp.float32).at[ridx].set(
        out_r, mode="drop"
    )[:n]
    return out.reshape(shape + (4,))


march_baked_jit = jax.jit(
    march_baked,
    static_argnames=("steps", "coarse_steps", "chunk", "ray_capacity_frac",
                     "erosion_capacity_frac", "occupancy_margin", "jitter"),
)

build_density_field_jit = jax.jit(
    build_density_field,
    static_argnames=("res", "cone_res", "light_steps", "extent", "chunk"),
)
