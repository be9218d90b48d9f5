"""Fast cloud raymarch: brick-row gathers + scan-free prefix-product march.

Same math as `models/march.py` (the semantics reference, itself gated against
the f64 oracle), restructured for the TPU memory system per
docs/PERF_NOTES.md:

1. Texture fetches go through 128-lane brick rows (`ops/brick.py`) — one
   gather row per filtered sample instead of 8 corner rows + mip stacking.
2. The march has NO `lax.scan` over steps. All (ray, step) samples are
   computed fully parallel (Phase A); the accumulation recurrence of
   `clouds.glsl:206-210` is associative, so Phase B is a prefix product:

       1 - alpha_total = prod_i dt_i
       L = sum_i (prod_{k<i} dt_k) * radiance_i * (1 - dt_i) / max(t_i, 1e-7)

3. Sample positions use the closed form p_i = p0 + dir * ss * i instead of
   iterative accumulation (differences are sub-centimeter at f32 — far below
   the noise texel scale; verified > 40 dB vs `march` in tests).

Rays are processed in chunks via `lax.map` inside one jit so peak HBM for the
gather rows stays bounded while the dispatch count stays at 1.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from cloudscape_tpu.config import GROUND_RADIUS, SKY_B_RADIUS, SKY_T_RADIUS
from cloudscape_tpu.models.density import MarchParams, NoisePack
from cloudscape_tpu.models.march import RANDOM_VECTORS, ambient_colors
from cloudscape_tpu.ops import math as m
from cloudscape_tpu.ops.brick import (
    BrickTable2D,
    BrickTable3D,
    TinyVolume3D,
    build_brick2,
    build_brick3,
    build_tiny3,
    sample_brick2_xy,
    sample_brick3_xyz,
    sample_tiny3_xyz,
)

Volume = Union[BrickTable3D, TinyVolume3D]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BrickPack:
    """Brick-table mirror of a NoisePack with channels precombined
    (exact: FBM dot products and box-filter mips commute with lerp):
    large → (R, FBM), small → (hfbm), weather → (cloud_type, coverage)."""

    large: Tuple[Volume, ...]
    small: Tuple[Volume, ...]
    weather: BrickTable2D

    @staticmethod
    def from_noise(noise: NoisePack, dtype=None) -> "BrickPack":
        """dtype: storage dtype for the 3D noise tables (None = float32;
        jnp.bfloat16 halves table HBM and is ~10% faster on the dense phase
        at a small quantization cost — measured ≥ the 40 dB gate, see
        tests/test_brick.py). The weather table stays f32 (its coverage
        channel feeds a hard threshold)."""
        import dataclasses as _dc

        def cast(vol):
            if dtype is None:
                return vol
            if isinstance(vol, BrickTable3D):
                return _dc.replace(vol, table=vol.table.astype(dtype))
            return _dc.replace(vol, row=vol.row.astype(dtype))

        large_levels = []
        for lvl in noise.large:
            a = np.asarray(lvl)
            combined = np.stack(
                [a[..., 0], a[..., 1] * 0.625 + a[..., 2] * 0.25 + a[..., 3] * 0.125],
                axis=-1,
            )
            if combined.size <= 128:
                large_levels.append(cast(build_tiny3(combined)))
            else:
                large_levels.append(cast(build_brick3(combined, (4, 4, 4), (3, 3, 3))))
        small_levels = []
        for lvl in noise.small:
            a = np.asarray(lvl)
            combined = (
                a[..., 0] * 0.625 + a[..., 1] * 0.25 + a[..., 2] * 0.125
            )[..., None]
            if combined.size <= 128:
                small_levels.append(cast(build_tiny3(combined)))
            else:
                small_levels.append(cast(build_brick3(combined, (8, 4, 4), (7, 3, 3))))
        w = np.asarray(noise.weather)
        weather = build_brick2(
            np.stack([w[..., 0], w[..., 2]], axis=-1), (8, 8), (7, 7)
        )
        return BrickPack(large=tuple(large_levels), small=tuple(small_levels),
                         weather=weather)


def _sample_volume_xyz(vol: Volume, qx, qy, qz):
    if isinstance(vol, TinyVolume3D):
        return sample_tiny3_xyz(vol, qx, qy, qz)
    return sample_brick3_xyz(vol, qx, qy, qz)


def _weather_rb(bp: BrickPack, pxz, weather_pos):
    """(cloud_type, coverage) weather fetch (`clouds.glsl:169-174`)."""
    return _weather_rb_xy(bp, pxz[..., 0], pxz[..., 1], weather_pos)


def _weather_rb_xy(bp: BrickPack, px, pz, weather_pos):
    return sample_brick2_xy(
        bp.weather,
        px * 0.00006 + 0.5 + weather_pos[0],
        pz * 0.00006 + 0.5 + weather_pos[1],
    )


def _density_pre_xyz(px, py, pz, weather_rb, mip: float, params: MarchParams,
                     bp: BrickPack):
    """First half of the Schneider density (`clouds.glsl:109-125`): base
    shape + coverage remap, *before* detail erosion. Needs only the weather
    and large-noise fetches. Coordinates are separate component planes
    (stacked [..., 3] tensors cost lane-padded copies on TPU).

    Returns (pre, hf): erosion can only reduce density, and the erosion remap
    maps pre ≤ 0 to exactly 0 — so `pre > 0` is an exact occupancy predicate
    for staging the small-noise fetch.
    """
    hf = m.height_fraction(jnp.sqrt(px * px + py * py + pz * pz),
                           SKY_B_RADIUS, SKY_T_RADIUS)

    offset = 20.0 * params.cloud_pos * 0.6
    bx = px + offset[0]
    bz = pz + offset[1]

    lod_l = int(min(max(mip - 2.0, 0.0), len(bp.large) - 1))
    n = _sample_volume_xyz(bp.large[lod_l], bx * 0.00008, py * 0.00008,
                           bz * 0.00008)  # [..., 2] (R, FBM)

    g = m.density_height_gradient(hf, weather_rb[..., 0])
    base_cloud = m.remap(n[..., 0], -(1.0 - n[..., 1]), 1.0, 0.0, 1.0)
    weather_coverage = params.cloud_coverage * weather_rb[..., 1]
    base_cloud = (base_cloud * g - (1.0 - weather_coverage)) / jnp.maximum(
        weather_coverage, 1e-6
    )
    return base_cloud * weather_coverage, hf


def _density_finish_xyz(pre, hf, px, py, pz, mip: float, params: MarchParams,
                        bp: BrickPack):
    """Second half (`clouds.glsl:127-136`): detail erosion + final shaping."""
    offset = 20.0 * params.cloud_pos * 0.6
    dx = (px + offset[0] - params.detailed_pos[0] * 40.0) * 0.001
    dy = (py - params.time * 40.0) * 0.001
    dz = (pz + offset[1] - params.detailed_pos[1] * 40.0) * 0.001
    lod_s = int(min(max(mip, 0.0), len(bp.small) - 1))
    hfbm = _sample_volume_xyz(bp.small[lod_s], dx, dy, dz)[..., 0]
    hfbm = hfbm + (1.0 - 2.0 * hfbm) * jnp.clip(hf * 4.0, 0.0, 1.0)
    base_cloud = m.remap(pre, hfbm * 0.4 * hf, 1.0, 0.0, 1.0)
    return jnp.power(jnp.clip(base_cloud, 0.0, 1.0), (1.0 - hf) * 0.8 + 0.5)


def _density_bricks_xyz(px, py, pz, weather_rb, mip: float,
                        params: MarchParams, bp: BrickPack):
    """Full Schneider density (`clouds.glsl:109-137`) on brick tables,
    component-plane coordinates. Returns (density, height_fraction)."""
    pre, hf = _density_pre_xyz(px, py, pz, weather_rb, mip, params, bp)
    return _density_finish_xyz(pre, hf, px, py, pz, mip, params, bp), hf


def _density_pre(p, weather_rb, mip: float, params: MarchParams,
                 bp: BrickPack):
    return _density_pre_xyz(p[..., 0], p[..., 1], p[..., 2], weather_rb, mip,
                            params, bp)


def _density_bricks(p, weather_rb, mip: float, params: MarchParams,
                    bp: BrickPack):
    """[..., 3] wrapper over `_density_bricks_xyz`."""
    return _density_bricks_xyz(p[..., 0], p[..., 1], p[..., 2], weather_rb,
                               mip, params, bp)


def _ray_setup(dirs, params: MarchParams, steps: int):
    """Per-ray geometry shared by all phases: (above, ndir, ss, p0, phase,
    ldir)."""
    above = dirs[..., 1] > 0.0
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    ndir = jnp.where(above[..., None], dirs, up)

    cam = jnp.array([0.0, GROUND_RADIUS, 0.0], jnp.float32)
    cam_b = jnp.broadcast_to(cam, ndir.shape)
    start = cam + ndir * m.intersect_sphere_far(cam_b, ndir, SKY_B_RADIUS)[..., None]
    end = cam + ndir * m.intersect_sphere_far(cam_b, ndir, SKY_T_RADIUS)[..., None]
    ss = jnp.linalg.norm(end - start, axis=-1) / steps
    p0 = start + ndir * (m.hash_iq(start * 10.0) * ss)[..., None]

    ldir = params.light_direction / jnp.linalg.norm(params.light_direction)
    costheta = jnp.sum(ldir * ndir, axis=-1)
    phase = jnp.maximum(
        jnp.maximum(
            m.henyey_greenstein(costheta, 0.6),
            m.henyey_greenstein(costheta, 0.4 - 1.4 * ldir[1]),
        ),
        m.henyey_greenstein(costheta, -0.2),
    )
    return above, ndir, ss, p0, phase, ldir


def _light_offsets(ldir, light_steps: int):
    lss = (SKY_T_RADIUS - SKY_B_RADIUS) / 64.0
    offsets = jnp.cumsum(
        (ldir[None, :] + RANDOM_VECTORS[:light_steps]
         * jnp.arange(light_steps, dtype=jnp.float32)[:, None]) * lss,
        axis=0,
    )
    return offsets, ldir * (18.0 * lss), lss


def _cone_density_xyz(px, py, pz, params: MarchParams, bp: BrickPack,
                      light_offsets, distant_offset, light_steps: int,
                      approx_weather: bool = False):
    """Secondary (sun) march density sum `cd` (`clouds.glsl:184-199`) on
    component-plane coordinates.

    approx_weather reuses one weather fetch (at the sample position) for all
    cone samples: the cone spans ≲0.1 weather texel horizontally, so the
    bilinear deltas are sub-texel — saves 6 of the 17 gather rows per active
    sample (PSNR-gated in tests)."""
    cd = jnp.zeros(px.shape, jnp.float32)
    shared_weather = (
        _weather_rb_xy(bp, px, pz, params.weather_pos) if approx_weather
        else None
    )
    for j in range(light_steps):
        lx = px + light_offsets[j, 0]
        ly = py + light_offsets[j, 1]
        lz = pz + light_offsets[j, 2]
        lweather = (
            shared_weather if approx_weather
            else _weather_rb_xy(bp, lx, lz, params.weather_pos)
        )
        lt, _ = _density_bricks_xyz(lx, ly, lz, lweather, float(j), params, bp)
        cd = cd + lt

    lx = px + distant_offset[0]
    ly = py + distant_offset[1]
    lz = pz + distant_offset[2]
    lhf = m.height_fraction(jnp.sqrt(lx * lx + ly * ly + lz * lz),
                            SKY_B_RADIUS, SKY_T_RADIUS)
    # Quirk preserved: no + weather_pos on the distant sample (`clouds.glsl:197`).
    lweather = sample_brick2_xy(bp.weather, lx * 0.00006 + 0.5,
                                lz * 0.00006 + 0.5)
    ldens, _ = _density_bricks_xyz(lx, ly, lz, lweather, 5.0, params, bp)
    return cd + jnp.power(ldens, (1.0 - lhf) * 0.8 + 0.5)


def _cone_density(p, params: MarchParams, bp: BrickPack, light_offsets,
                  distant_offset, light_steps: int,
                  approx_weather: bool = False):
    """[..., 3] wrapper over `_cone_density_xyz`."""
    return _cone_density_xyz(p[..., 0], p[..., 1], p[..., 2], params, bp,
                             light_offsets, distant_offset, light_steps,
                             approx_weather)


def _march_chunk(dirs, params: MarchParams, bp: BrickPack, atmos,
                 steps: int, light_steps: int):
    """Dense Phase A+B for one chunk of rays. dirs: [n, 3] → [n, 4]."""
    atmosphere_sun, atmosphere_ambient, atmosphere_ground = atmos
    above, ndir, ss, p0, phase, ldir = _ray_setup(dirs, params, steps)
    light_offsets, distant_offset, lss = _light_offsets(ldir, light_steps)

    # Phase A — all samples in parallel, component planes [n, steps].
    i_step = jnp.arange(1, steps + 1, dtype=jnp.float32)
    tt = ss[:, None] * i_step[None, :]
    px = p0[:, 0, None] + ndir[:, 0, None] * tt
    py = p0[:, 1, None] + ndir[:, 1, None] * tt
    pz = p0[:, 2, None] + ndir[:, 2, None] * tt

    weather = _weather_rb_xy(bp, px, pz, params.weather_pos)
    hf = m.height_fraction(jnp.sqrt(px * px + py * py + pz * pz),
                           SKY_B_RADIUS, SKY_T_RADIUS)

    t, _ = _density_bricks_xyz(px, py, pz, weather, 0.0, params, bp)
    dt = jnp.exp(-params.density * t * ss[:, None])

    cd = _cone_density_xyz(px, py, pz, params, bp, light_offsets,
                           distant_offset, light_steps)

    beers = jnp.exp(-params.density * cd * lss * 3.0)
    powder = 1.0 - jnp.exp(-params.density * cd * lss * 6.0)
    beers_total = 2.0 * beers * powder

    ambient = atmosphere_ground + (atmosphere_ambient - atmosphere_ground) * \
        m.smoothstep(0.0, 1.0, hf)[..., None]
    radiance = (ambient + (beers_total * phase[:, None])[..., None] * atmosphere_sun) \
        * t[..., None]

    # Phase B — prefix-product accumulation.
    t_prefix = jnp.concatenate(
        [jnp.ones_like(dt[:, :1]), jnp.cumprod(dt, axis=1)[:, :-1]], axis=1
    )
    contrib = t_prefix[..., None] * (radiance - radiance * dt[..., None]) / \
        jnp.maximum(1e-7, t)[..., None]
    L = jnp.sum(contrib, axis=1)
    alpha = jnp.clip(1.0 - jnp.prod(dt, axis=1), 0.0, 1.0)

    out = jnp.concatenate([L, alpha[..., None]], axis=-1)
    return jnp.where(above[..., None], out, 0.0)


def _compact_indices(mask_flat, capacity: int, total: int,
                     return_rank: bool = False):
    """Indices of the first `capacity` True entries, padded with `total`.
    With return_rank, also returns each element's exclusive rank among True
    entries (valid where mask is True) — `mask & (rank < capacity)` is the
    coverage test, computed from arrays this function already materializes
    (an overflow `lax.cond` at this scale costs ~230 ms of plane copies,
    measured in a device trace).

    Equivalent to jnp.nonzero(mask, size=capacity, fill_value=total), but
    TPU-shaped. jnp.nonzero lowers to a full SORT (~90 ms at 67M); the round-1
    replacement (cumsum + a total-sized scatter) still paid ~7 ns per ELEMENT
    in scatter-update latency (~490 ms at 67M). This version scatters only
    per-128-lane-BLOCK offsets (total/128 updates) and resolves each
    destination slot with ONE fat-row gather:

    1. blocks of 128 lanes: inclusive lane cumsum + per-block counts;
    2. block offsets (exclusive cumsum over blocks, ~total/128 elements);
    3. for each destination slot k, the owning block and its offset are
       recovered by scattering (block_index, block_offset) at offset
       positions and forward-filling with a running max — capacity-sized
       scans, not total-sized;
    4. the in-block rank r = k − offset resolves to a lane by comparing the
       block's 128-lane cumsum row (one gather row) against r+1.
    """
    C = 128
    n = mask_flat.shape[0]
    n_pad = (-n) % C
    if n_pad:
        mask_flat = jnp.concatenate(
            [mask_flat, jnp.zeros((n_pad,), mask_flat.dtype)]
        )
    nb = mask_flat.shape[0] // C
    m2 = mask_flat.reshape(nb, C).astype(jnp.int32)
    lane_cum = jnp.cumsum(m2, axis=1)  # [nb, 128] inclusive
    row_cnt = lane_cum[:, -1]
    row_off = jnp.cumsum(row_cnt) - row_cnt  # exclusive offsets

    # Forward-fill (block id, block offset) over destination slots. Only
    # nonempty blocks scatter (their offsets are unique); empty blocks and
    # offsets ≥ capacity go out of bounds and are dropped.
    pos_b = jnp.where((row_cnt > 0) & (row_off < capacity), row_off,
                      capacity + 1)
    blk_of = jnp.full((capacity + 1,), -1, jnp.int32).at[pos_b].max(
        jnp.arange(nb, dtype=jnp.int32), mode="drop", unique_indices=True,
    )[:capacity]
    off_of = jnp.zeros((capacity + 1,), jnp.int32).at[pos_b].max(
        row_off, mode="drop", unique_indices=True,
    )[:capacity]
    blk = jax.lax.cummax(blk_of)
    off = jax.lax.cummax(off_of)

    r = jnp.arange(capacity, dtype=jnp.int32) - off

    # Per-slot resolve, CHUNKED: the [capacity, 128] lane-cumsum gather is
    # the whole function's peak buffer (10.25 GB at config-5's 21.5M
    # capacity — an HBM OOM); a lax.map keeps one ≤1M-slot block live.
    def resolve(args):
        blk_c, off_c, r_c = args
        rows = jnp.take(lane_cum, jnp.maximum(blk_c, 0), axis=0,
                        indices_are_sorted=True)  # [block, 128]
        lane = jnp.argmax(rows == (r_c + 1)[:, None], axis=1).astype(
            jnp.int32)
        valid = (blk_c >= 0) & (r_c < rows[:, -1])
        return jnp.where(valid, blk_c * C + lane, total)

    res_chunk = min(capacity, 1 << 20)
    idx = jax.lax.map(resolve, (
        _pad_blocks(blk, res_chunk, jnp.int32(-1)),
        _pad_blocks(off, res_chunk, jnp.int32(0)),
        _pad_blocks(r, res_chunk, jnp.int32(0)),
    )).reshape(-1)[:capacity]
    if return_rank:
        rank = (row_off[:, None] + (lane_cum - m2)).reshape(-1)
        if n_pad:
            rank = rank[:n]
        return idx, rank
    return idx


def _pad_blocks(flat, chunk, fill):
    """Pad leading dim to a chunk multiple and reshape to [k, chunk, ...]."""
    n = flat.shape[0]
    n_pad = (-n) % chunk
    if n_pad:
        pad = jnp.broadcast_to(fill, (n_pad,) + flat.shape[1:])
        flat = jnp.concatenate([flat, pad], axis=0)
    return flat.reshape((-1, chunk) + flat.shape[1:])


def _ceil_to(v: int, mult: int) -> int:
    return (v + mult - 1) // mult * mult


def _compact_mask(mask_flat, capacity: int, total: int):
    """Indices of the first `capacity` True entries (ascending, fill=total):
    the Pallas streaming kernel when shapes permit (row-padding the mask to
    the kernel's grid multiple — padded rows are all-False, so the result
    is identical), XLA `_compact_indices` otherwise."""
    from cloudscape_tpu.ops import compact_pallas as _cp

    if (jax.default_backend() == "tpu" and total % _cp.LANES == 0
            and capacity % _cp.LANES == 0):
        m2 = mask_flat.reshape(-1, _cp.LANES)
        pad_rows = (-m2.shape[0]) % _cp.ROWS
        if pad_rows:
            m2 = jnp.concatenate(
                [m2, jnp.zeros((pad_rows, _cp.LANES), m2.dtype)])
        idx, _ = _cp.compact_indices_pallas(m2, capacity, total)
        return idx
    return _compact_indices(mask_flat, capacity, total)


def _march_compact(flat, params: MarchParams, bp: BrickPack, atmos,
                   steps: int, light_steps: int, chunk: int,
                   capacity_frac: float, t_cutoff: float,
                   approx_light: bool = False, cone_cache=None):
    """Occupancy-compacted march over all rays at once: per-ray geometry setup
    plus the shared `_march_core` (one implementation serves this path and the
    hierarchical window-adjusted path)."""
    above, ndir, ss, p0, phase, ldir = _ray_setup(flat, params, steps)
    return _march_core(above, ndir, ss, p0, phase, ldir, params, bp, atmos,
                       steps, light_steps, chunk, capacity_frac, t_cutoff,
                       approx_light, cone_cache)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ConeCache:
    """Shell-aligned cone-density field (the volumetric analog of a deep
    shadow map): cd = `_cone_density` precomputed on a (height-fraction,
    warped-z, warped-x) grid, valid for one FrameData snapshot (one
    amortized cycle). Collapses the 17-row secondary march into one
    brick-row lookup per active sample.

    The horizontal axes use a sqrt warp (like the sky LUT's elevation warp,
    `sky-lut.glsl:290-291`): x = sign(l)·l²·extent with l = 2(x̂-0.5), which
    concentrates resolution near the viewer where visible clouds are close
    (≈6 m cells at 1 km, ≈2.3 km cells at the 220 km horizon edge)."""

    table: BrickTable3D  # clamp-wrap, 1 channel (cd)
    extent: float = dataclasses.field(default=220e3,
                                      metadata=dict(static=True))


def _cone_cache_coords_xyz(px, py, pz, extent: float):
    """World position components → cache uvw components (x̂, ẑ, hf)."""
    def warp(v):
        return 0.5 + 0.5 * jnp.sign(v) * jnp.sqrt(jnp.abs(v) / extent)

    hf = m.height_fraction(jnp.sqrt(px * px + py * py + pz * pz),
                           SKY_B_RADIUS, SKY_T_RADIUS)
    return warp(px), warp(pz), hf


def build_cone_cache(params: MarchParams, bp: BrickPack,
                     light_steps: int = 6, res=(16, 256, 256),
                     extent: float = 220e3, chunk: int = 16384,
                     sparse_capacity_frac: float | None = 0.45) -> ConeCache:
    """Evaluate `_cone_density` on the cache grid (device-side, chunked) and
    pack it into a clamp-wrap brick table. res = (n_hf, n_z, n_x).

    sparse_capacity_frac: when set, the 17-row cone march runs only on grid
    cells whose pre-erosion density is positive, dilated by one cell (the
    march queries the cache only at `pre > 0` sample positions, and a
    trilinear footprint reaches the 1-cell neighborhood). Near-exact rather
    than exact: center-sampled occupancy can miss sub-cell features between
    cell centers — measured ≤ 2.5e-4 max image delta (~99 dB) vs the dense
    build (tests/test_march_v2.py). Sized as a fraction of all grid cells;
    overflow leaves far cells at cd=0, so keep ≥ the scene's
    dilated-occupancy (~0.24 on the bench scene) with margin. None = dense
    build (every cell).
    """
    nd, nh, nw = res
    ldir = params.light_direction / jnp.linalg.norm(params.light_direction)
    light_offsets, distant_offset, _ = _light_offsets(ldir, light_steps)

    def unwarp(c):
        l = 2.0 * (c - 0.5)
        return jnp.sign(l) * l * l * extent

    xs = unwarp((jnp.arange(nw, dtype=jnp.float32) + 0.5) / nw)
    zs = unwarp((jnp.arange(nh, dtype=jnp.float32) + 0.5) / nh)
    hfs = (jnp.arange(nd, dtype=jnp.float32) + 0.5) / nd
    r = SKY_B_RADIUS + hfs * (SKY_T_RADIUS - SKY_B_RADIUS)

    x = xs[None, None, :]
    z = zs[None, :, None]
    rr = r[:, None, None]
    rho2 = x * x + z * z
    # Beyond-horizon grid cells have no valid shell point; clamp onto the
    # shell (those cells are never queried by real samples).
    y = jnp.sqrt(jnp.maximum(rr * rr - rho2, 1.0))
    px, py, pz = (jnp.broadcast_to(v, res).reshape(-1) for v in (x, y, z))
    n = px.shape[0]

    from cloudscape_tpu.ops.brick import build_brick3_device

    def chunked(fn, *arrays):
        n_in = arrays[0].shape[0]
        blocks = tuple(_pad_blocks(a, chunk, a.reshape(-1)[-1])
                       for a in arrays)
        out = jax.lax.map(fn, blocks)
        return jax.tree_util.tree_map(
            lambda v: v.reshape((-1,) + v.shape[2:])[:n_in], out
        )

    if sparse_capacity_frac is None:
        cd = chunked(
            lambda blk: _cone_density_xyz(blk[0], blk[1], blk[2], params, bp,
                                          light_offsets, distant_offset,
                                          light_steps),
            px, py, pz,
        )
    else:
        pre = chunked(
            lambda blk: _density_pre_xyz(
                blk[0], blk[1], blk[2],
                _weather_rb_xy(bp, blk[0], blk[2], params.weather_pos),
                0.0, params, bp)[0],
            px, py, pz,
        )
        occ = (pre > 0.0).reshape(nd, nh, nw)
        # One-cell dilation per axis (trilinear query footprint).
        for ax in range(3):
            occ = occ | jnp.roll(occ, 1, ax) | jnp.roll(occ, -1, ax)
        occ = occ.reshape(-1)
        capacity = cone_capacity(n, sparse_capacity_frac, chunk)
        idx = _compact_indices(occ, capacity, n)
        # Cell coordinates recomputed from the flat cell index (pure ALU —
        # cheaper than three narrow coordinate gathers).
        safe = jnp.minimum(idx, n - 1)
        iz = safe // (nh * nw)
        iy = (safe // nw) % nh
        ix = safe % nw
        cx = unwarp((ix.astype(jnp.float32) + 0.5) / nw)
        cz = unwarp((iy.astype(jnp.float32) + 0.5) / nh)
        cr = SKY_B_RADIUS + ((iz.astype(jnp.float32) + 0.5) / nd) * (
            SKY_T_RADIUS - SKY_B_RADIUS)
        cy = jnp.sqrt(jnp.maximum(cr * cr - cx * cx - cz * cz, 1.0))
        cd_c = chunked(
            lambda blk: _cone_density_xyz(blk[0], blk[1], blk[2], params, bp,
                                          light_offsets, distant_offset,
                                          light_steps),
            cx, cy, cz,
        )
        cd = jnp.zeros((n,), jnp.float32).at[idx].set(
            cd_c, mode="drop", indices_are_sorted=True,
            unique_indices=True,
        )

    vol = cd.reshape(nd, nh, nw, 1)
    table = build_brick3_device(vol, (8, 4, 4), (7, 3, 3), wrap="clamp")
    return ConeCache(table=table, extent=extent)


def cone_capacity(n: int, sparse_capacity_frac: float, chunk: int) -> int:
    """Compacted-cell capacity of the sparse cone bake — the single source
    of truth shared by `build_cone_cache` and the amortized two-stage bake
    (`cone_occupancy_indices` / `bake_cone_cells`), so the engine's per-tick
    slice schedule matches the build bitwise."""
    capacity = max(int(n * sparse_capacity_frac), chunk)
    return capacity + (-capacity) % chunk


def _cone_grid_chunked(res, extent, chunk):
    """Shared cell-center grid + chunked-map helper of the cone builders."""
    nd, nh, nw = res

    def unwarp(c):
        l = 2.0 * (c - 0.5)
        return jnp.sign(l) * l * l * extent

    def chunked(fn, *arrays):
        n_in = arrays[0].shape[0]
        blocks = tuple(_pad_blocks(a, chunk, a.reshape(-1)[-1])
                       for a in arrays)
        out = jax.lax.map(fn, blocks)
        return jax.tree_util.tree_map(
            lambda v: v.reshape((-1,) + v.shape[2:])[:n_in], out
        )

    return unwarp, chunked


def cone_occupancy_indices(params: MarchParams, bp: BrickPack,
                           res=(16, 256, 256), extent: float = 220e3,
                           chunk: int = 16384,
                           sparse_capacity_frac: float = 0.45):
    """Stage 1 of the amortized per-cycle cone bake (VERDICT r2 #2): the
    full build's pre>0 occupancy pass + one-cell dilation + compaction,
    factored out so the expensive cone march over the compacted cells can
    be spread across the cycle's ticks (`bake_cone_cells`). Produces the
    bitwise-same sorted index vector as `build_cone_cache`'s sparse path
    (fill = n for unused capacity slots — out of bounds, so every scatter
    drops them). Global compaction (not per-slab) keeps the overflow
    behavior identical to the synchronous build regardless of how occupancy
    is distributed along z (tests/test_cone_prebake.py)."""
    nd, nh, nw = res
    unwarp, chunked = _cone_grid_chunked(res, extent, chunk)
    xs = unwarp((jnp.arange(nw, dtype=jnp.float32) + 0.5) / nw)
    zs = unwarp((jnp.arange(nh, dtype=jnp.float32) + 0.5) / nh)
    hfs = (jnp.arange(nd, dtype=jnp.float32) + 0.5) / nd
    r = SKY_B_RADIUS + hfs * (SKY_T_RADIUS - SKY_B_RADIUS)
    x = xs[None, None, :]
    z = zs[None, :, None]
    rr = r[:, None, None]
    y = jnp.sqrt(jnp.maximum(rr * rr - (x * x + z * z), 1.0))
    px, py, pz = (jnp.broadcast_to(v, res).reshape(-1) for v in (x, y, z))
    n = px.shape[0]
    pre = chunked(
        lambda blk: _density_pre_xyz(
            blk[0], blk[1], blk[2],
            _weather_rb_xy(bp, blk[0], blk[2], params.weather_pos),
            0.0, params, bp)[0],
        px, py, pz,
    )
    occ = (pre > 0.0).reshape(res)
    for ax in range(3):
        occ = occ | jnp.roll(occ, 1, ax) | jnp.roll(occ, -1, ax)
    capacity = cone_capacity(n, sparse_capacity_frac, chunk)
    return _compact_indices(occ.reshape(-1), capacity, n)


def cone_occupancy_slice(occ, i0, params: MarchParams, bp: BrickPack,
                         count: int, res=(16, 256, 256),
                         extent: float = 220e3, chunk: int = 16384):
    """Stage-0 slice of the amortized cone bake (VERDICT r4 #3): evaluate
    the `pre > 0` occupancy predicate for the flat cells [i0, i0+count) and
    write them into the donated bool buffer `occ` ([nd*nh*nw]). Running all
    slices then `cone_occupancy_finalize` reproduces
    `cone_occupancy_indices` bitwise: the per-cell math is elementwise
    (identical formulas on identical inputs — the monolithic pass's
    broadcast grid evaluates the same expressions per cell), and the
    dilation + compaction happen unsliced in the finalize. Factored out
    because the one-shot occupancy pass measured ~112 ms — the largest
    single prebake-tick spike in the serving loop's flat-frame-cost gate."""
    nd, nh, nw = res
    n = nd * nh * nw
    unwarp, chunked = _cone_grid_chunked(res, extent, chunk)
    sl = i0 + jnp.arange(count, dtype=jnp.int32)
    safe = jnp.minimum(sl, n - 1)
    iz = safe // (nh * nw)
    iy = (safe // nw) % nh
    ix = safe % nw
    cx = unwarp((ix.astype(jnp.float32) + 0.5) / nw)
    cz = unwarp((iy.astype(jnp.float32) + 0.5) / nh)
    cr = SKY_B_RADIUS + ((iz.astype(jnp.float32) + 0.5) / nd) * (
        SKY_T_RADIUS - SKY_B_RADIUS)
    cy = jnp.sqrt(jnp.maximum(cr * cr - cx * cx - cz * cz, 1.0))
    pre = chunked(
        lambda blk: _density_pre_xyz(
            blk[0], blk[1], blk[2],
            _weather_rb_xy(bp, blk[0], blk[2], params.weather_pos),
            0.0, params, bp)[0],
        cx, cy, cz,
    )
    return jax.lax.dynamic_update_slice(occ, pre > 0.0, (i0,))


def cone_occupancy_finalize(occ, res=(16, 256, 256), chunk: int = 16384,
                            sparse_capacity_frac: float = 0.45):
    """Dilation + compaction tail of the amortized occupancy stage — the
    exact ops `cone_occupancy_indices` runs after its occupancy pass, so
    slice-accumulated buffers finalize to the bitwise-same index vector.
    Compaction goes through `_compact_mask` (the Pallas streaming kernel on
    TPU — bit-identical to the XLA form, tests/test_compact_pallas.py):
    this tick is the schedule's one unsplittable step, so its ~35 ms XLA
    compaction was the flatness floor."""
    nd, nh, nw = res
    n = nd * nh * nw
    occ = occ.reshape(res)
    for ax in range(3):
        occ = occ | jnp.roll(occ, 1, ax) | jnp.roll(occ, -1, ax)
    capacity = cone_capacity(n, sparse_capacity_frac, chunk)
    return _compact_mask(occ.reshape(-1), capacity, n)


def bake_cone_cells(vol, idx, i0, params: MarchParams, bp: BrickPack,
                    count: int, light_steps: int = 6, res=(16, 256, 256),
                    extent: float = 220e3, chunk: int = 16384):
    """Stage 2 of the amortized cone bake: cone-march the compacted cells
    `idx[i0 : i0 + count]` and scatter them into the flat cone-density
    volume `vol` (shape [nd*nh*nw], donated by the engine's jit wrapper).
    i0 is traced, so ONE executable serves every slice of every cycle;
    running all slices reproduces `build_cone_cache`'s sparse cd vector
    bitwise (same indices, same cell math, same scatter — overlap from a
    clamped final slice just rewrites identical values)."""
    nd, nh, nw = res
    n = nd * nh * nw
    ldir = params.light_direction / jnp.linalg.norm(params.light_direction)
    light_offsets, distant_offset, _ = _light_offsets(ldir, light_steps)
    unwarp, chunked = _cone_grid_chunked(res, extent, chunk)
    sl = jax.lax.dynamic_slice(idx, (i0,), (count,))
    safe = jnp.minimum(sl, n - 1)
    iz = safe // (nh * nw)
    iy = (safe // nw) % nh
    ix = safe % nw
    cx = unwarp((ix.astype(jnp.float32) + 0.5) / nw)
    cz = unwarp((iy.astype(jnp.float32) + 0.5) / nh)
    cr = SKY_B_RADIUS + ((iz.astype(jnp.float32) + 0.5) / nd) * (
        SKY_T_RADIUS - SKY_B_RADIUS)
    cy = jnp.sqrt(jnp.maximum(cr * cr - cx * cx - cz * cz, 1.0))
    cd_c = chunked(
        lambda blk: _cone_density_xyz(blk[0], blk[1], blk[2], params, bp,
                                      light_offsets, distant_offset,
                                      light_steps),
        cx, cy, cz,
    )
    return vol.at[sl].set(cd_c, mode="drop", indices_are_sorted=True,
                          unique_indices=True)


def assemble_cone_cache(cd_vol, extent: float = 220e3) -> ConeCache:
    """Pack a fully-baked [nd, nh, nw] cone-density volume (accumulated
    slice-by-slice with `bake_cone_cells`) into the brick-table ConeCache —
    the final step of the amortized per-cycle bake. For the table build
    itself amortized across ticks, see `cone_table_rows` +
    `wrap_cone_table`."""
    from cloudscape_tpu.ops.brick import build_brick3_device

    table = build_brick3_device(cd_vol[..., None], (8, 4, 4), (7, 3, 3),
                                wrap="clamp")
    return ConeCache(table=table, extent=extent)


CONE_BRICK = (8, 4, 4)
CONE_STRIDE = (7, 3, 3)


def cone_table_rows(cd_vol, b0, count: int):
    """Rows [b0, b0 + count) of the cone cache's brick table (the sliceable
    assembly — `build_brick3_rows` with the cone brick geometry); writing
    every range then `wrap_cone_table` reproduces `assemble_cone_cache`
    bitwise (tests/test_cone_prebake.py)."""
    from cloudscape_tpu.ops.brick import build_brick3_rows

    return build_brick3_rows(cd_vol[..., None], b0, count, CONE_BRICK,
                             CONE_STRIDE, wrap="clamp")


def wrap_cone_table(table, res, extent: float = 220e3) -> ConeCache:
    """Metadata-only constructor around a fully-written [n_bricks, 128]
    cone brick table (zero device work — the last step of the amortized
    assembly)."""
    from cloudscape_tpu.ops.brick import BrickTable3D, brick3_grid

    return ConeCache(
        table=BrickTable3D(table=table, dims=tuple(res), brick=CONE_BRICK,
                           stride=CONE_STRIDE,
                           grid=brick3_grid(res, CONE_STRIDE), channels=1,
                           wrap="clamp"),
        extent=extent,
    )


def cull_raw_slice(buf, dirs_sub, i0, params: MarchParams, bp: BrickPack,
                   count: int, steps: int = 128, prepass_steps: int = 32,
                   chunk: int = 32768):
    """One slice of the amortized tile-cull prepass (the engine's pending
    pipeline): RAW per-(ray, coarse-cell) unclamped pre at the coarse probe
    samples (UNMASKED — the horizon mask is applied in `cull_finalize`, so
    the occupancy dilation sees the same input as `_cull_prepass`) for
    subsampled rays [i0, i0 + count), scattered into `buf`
    [n_sub, prepass_steps] (donated by the engine's jit wrapper).
    `cull_finalize` reduces to the per-ray priority (max over cells,
    above-masked — bitwise the former per-ray raw), applies the neighbor
    dilation/upsample and tile reductions, and derives the per-tile CELL
    fractions that size fast3's per-tile capacities. i0 is traced (one
    executable serves every slice); the per-ray values match
    `cull_priority_map`'s internal prepass to float precision (per-ray math
    is identical; executable shapes differ)."""
    d = jax.lax.dynamic_slice(dirs_sub, (i0, 0), (count, 3))
    _, ndir, ss, p0, _, _ = _ray_setup(d, params, steps)
    i_pre = (jnp.arange(prepass_steps, dtype=jnp.float32) + 1.0) \
        * float(steps // prepass_steps)

    def prepass_chunk(args):
        p0c, ndirc, ssc = args
        tt = ssc[:, None] * i_pre[None, :]
        px = p0c[:, 0, None] + ndirc[:, 0, None] * tt
        py = p0c[:, 1, None] + ndirc[:, 1, None] * tt
        pz = p0c[:, 2, None] + ndirc[:, 2, None] * tt
        w = _weather_rb_xy(bp, px, pz, params.weather_pos)
        pre_p, _ = _density_pre_xyz(px, py, pz, w, 0.0, params, bp)
        return pre_p

    up0 = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    c = min(chunk, count)
    raw = jax.lax.map(prepass_chunk, (
        _pad_blocks(p0, c, up0 * GROUND_RADIUS),
        _pad_blocks(ndir, c, up0),
        _pad_blocks(ss, c, jnp.float32(1.0)),
    )).reshape(-1, prepass_steps)[:count]
    return jax.lax.dynamic_update_slice(buf, raw, (i0, 0))


def cull_finalize(raw, dirs, region: int, ray_stride: int = 2,
                  prepass_margin: float = 0.02, cell_margin: float = 0.1):
    """Final step of the amortized tile-cull prepass: per-ray priority (max
    over the stored per-cell pre — bitwise the former per-ray raw),
    neighbor-bonus dilation + nearest upsample, horizon mask, the per-tile
    keep fractions, and the per-tile live-CELL fractions (`_cull_prepass`'s
    dilated `pre > -cell_margin` occupancy, tile-averaged — sizes fast3's
    per-tile cell capacities) — `cull_priority_map`'s tail on a raw buffer
    accumulated by `cull_raw_slice`. Returns (prio [H, W], tile_keep
    [H/region, W/region], tile_cell [H/region, W/region])."""
    H, W = dirs.shape[:2]
    hs, ws = H // ray_stride, W // ray_stride
    P = raw.shape[-1]
    above = (dirs[..., 1] > 0.0).reshape(-1)
    above_sub = above.reshape(H, W)[::ray_stride, ::ray_stride].reshape(-1)
    # Per-ray priority: max over cells, THEN above-masked (matching
    # `_cull_prepass`, which masks prio before the dilation).
    r2 = jnp.where(above_sub, jnp.max(raw, axis=1),
                   jnp.float32(-jnp.inf)).reshape(hs, ws)
    d2 = jnp.maximum(r2, _dilate_max(r2) - 0.1)
    prio = jnp.repeat(jnp.repeat(d2, ray_stride, axis=0), ray_stride,
                      axis=1).reshape(-1)
    prio = jnp.where(above, prio, jnp.float32(-jnp.inf)).reshape(H, W)
    keep = (prio > -prepass_margin).astype(jnp.float32)
    tile_keep = keep.reshape(H // region, region, W // region, region) \
        .mean(axis=(1, 3))
    # Dilated cell occupancy, mirroring `_cull_prepass` exactly: dilate the
    # UNMASKED occupancy (3×3 across rays, ±1 along the ray), apply the
    # above mask afterwards — so below-horizon occupied rays still
    # contribute to their above-horizon neighbors' dilation.
    o = (raw > -cell_margin).reshape(hs, ws, P)
    o = o | jnp.roll(o, 1, 0) | jnp.roll(o, -1, 0)
    o = o | jnp.roll(o, 1, 1) | jnp.roll(o, -1, 1)
    o = o.reshape(hs * ws, P)
    pad0 = jnp.zeros_like(o[:, :1])
    o = o | jnp.concatenate([pad0, o[:, :-1]], axis=1) \
        | jnp.concatenate([o[:, 1:], pad0], axis=1)
    tile_cell = _tile_cell_fracs(o & above_sub[:, None],
                                 hs, ws, ray_stride, region)
    return prio, tile_keep, tile_cell


def _march_core(above, ndir, ss, p0, phase, ldir, params: MarchParams,
                bp: BrickPack, atmos, steps: int, light_steps: int,
                chunk: int, capacity_frac: float, t_cutoff: float,
                approx_light: bool = False, cone_cache=None):
    """Compacted march over prepared rays (arbitrary per-ray start/step).

    The secondary light march (`clouds.glsl:184-199`) only contributes where
    the primary density t > 0 — the reference's own `if (t > 0)` guard — and
    where the accumulated transmittance hasn't saturated (contributions are
    multiplied by the prefix product, so T_prefix ≤ t_cutoff ≈ invisible).
    Phase 1 computes primary density densely (a staged variant compacting the
    erosion fetch behind `pre > 0` measured *slower* on chip, see
    docs/PERF_NOTES.md); phase 2 gathers the active samples into a compact
    list (static capacity = capacity_frac · n · steps, overflow drops the
    *sun* term of excess samples only) and runs the expensive cone sampling
    on ~10-20% of the work — or, with a `cone_cache`, one brick-row lookup
    per active sample; phase 3 scatters back and runs the prefix-product
    accumulation. Returns [n, 4]."""
    atmosphere_sun, atmosphere_ambient, atmosphere_ground = atmos
    n = ndir.shape[0]
    light_offsets, distant_offset, lss = _light_offsets(ldir, light_steps)
    i_step = jnp.arange(1, steps + 1, dtype=jnp.float32)
    total = n * steps

    # Per-ray geometry packed into ONE 8-lane row: a single row-latency per
    # compacted sample instead of 7 separate narrow gathers.
    geom = jnp.concatenate(
        [p0, ndir, ss[:, None], jnp.zeros_like(ss[:, None])], axis=1
    )  # [n, 8] (p0 xyz, ndir xyz, ss, pad)

    def positions_for_xyz(idx):
        """Recompute sample positions (component planes) from flat
        (ray·step) indices — cheaper than gathering stored [.., 3] vectors
        (narrow rows pad 42×). idx ascending from the cumsum compaction."""
        ray = jnp.minimum(idx // steps, n - 1)
        stp = (idx % steps).astype(jnp.float32) + 1.0
        g = jnp.take(geom, ray, axis=0, indices_are_sorted=True)
        tt = g[:, 6] * stp
        return (g[:, 0] + g[:, 3] * tt,
                g[:, 1] + g[:, 4] * tt,
                g[:, 2] + g[:, 5] * tt)

    # ---- Phase 1 (dense, chunked): primary density + height fraction.
    def dense_chunk(args):
        p0c, ndirc, ssc = args
        tt = ssc[:, None] * i_step[None, :]
        px = p0c[:, 0, None] + ndirc[:, 0, None] * tt
        py = p0c[:, 1, None] + ndirc[:, 1, None] * tt
        pz = p0c[:, 2, None] + ndirc[:, 2, None] * tt
        weather = _weather_rb_xy(bp, px, pz, params.weather_pos)
        return _density_bricks_xyz(px, py, pz, weather, 0.0, params, bp)

    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    blocks = (
        _pad_blocks(p0, chunk, up * GROUND_RADIUS),
        _pad_blocks(ndir, chunk, up),
        _pad_blocks(ss, chunk, jnp.float32(1.0)),
    )
    t, hf = jax.lax.map(dense_chunk, blocks)
    t = t.reshape(-1, steps)[:n]
    hf = hf.reshape(-1, steps)[:n]

    dt = jnp.exp(-params.density * t * ss[:, None])
    t_prefix = jnp.concatenate(
        [jnp.ones_like(dt[:, :1]), jnp.cumprod(dt, axis=1)[:, :-1]], axis=1
    )

    # ---- Phase 2 (compacted): cone density where it can matter.
    active = (t > 0.0) & (t_prefix > t_cutoff) & above[:, None]
    capacity = max(int(total * capacity_frac), chunk)
    capacity += (-capacity) % chunk
    idx = _compact_indices(active.reshape(-1), capacity, total)
    ax, ay, az = positions_for_xyz(idx)

    if cone_cache is not None:
        qx, qz, qh = _cone_cache_coords_xyz(ax, ay, az, cone_cache.extent)
        cd_active = sample_brick3_xyz(cone_cache.table, qx, qz, qh)[..., 0]
    else:
        cd_active = jax.lax.map(
            lambda blk: _cone_density_xyz(blk[0], blk[1], blk[2], params, bp,
                                          light_offsets, distant_offset,
                                          light_steps,
                                          approx_weather=approx_light),
            (ax.reshape(-1, chunk), ay.reshape(-1, chunk),
             az.reshape(-1, chunk)),
        ).reshape(-1)
    cd = jnp.zeros((total,), jnp.float32).at[idx].set(
        cd_active, mode="drop", indices_are_sorted=True, unique_indices=True,
    ).reshape(n, steps)

    beers = jnp.exp(-params.density * cd * lss * 3.0)
    powder = 1.0 - jnp.exp(-params.density * cd * lss * 6.0)
    beers_total = jnp.where(active, 2.0 * beers * powder, 0.0)

    ambient = atmosphere_ground + (atmosphere_ambient - atmosphere_ground) * \
        m.smoothstep(0.0, 1.0, hf)[..., None]
    radiance = (ambient + (beers_total * phase[:, None])[..., None] * atmosphere_sun) \
        * t[..., None]
    contrib = t_prefix[..., None] * (radiance - radiance * dt[..., None]) / \
        jnp.maximum(1e-7, t)[..., None]
    L = jnp.sum(contrib, axis=1)
    alpha = jnp.clip(1.0 - jnp.prod(dt, axis=1), 0.0, 1.0)

    out = jnp.concatenate([L, alpha[..., None]], axis=-1)
    return jnp.where(above[..., None], out, 0.0)


def _halo_rows(a, axis_name: str):
    """±1-row halo over a row-sharded grid: each shard receives its up
    neighbor's LAST row and its down neighbor's FIRST row through a cyclic
    `ppermute` ring (rides ICI). The ring wrap reproduces `jnp.roll`'s
    global wrap semantics exactly, so a dilation computed on the halo'd
    block is bitwise the unsharded dilation of the full grid. Returns
    [rows+2, ...] (halo row 0 above, halo row -1 below)."""
    D = jax.lax.axis_size(axis_name)
    down = [(i, (i + 1) % D) for i in range(D)]
    up = [(i, (i - 1) % D) for i in range(D)]
    top = jax.lax.ppermute(a[-1:], axis_name, down)
    bot = jax.lax.ppermute(a[:1], axis_name, up)
    return jnp.concatenate([top, a, bot], axis=0)


def _dilate_max(m2, axis_name: str | None = None):
    """3×3 max dilation, separable (rows then cols — 4 maxes, not 8).
    axis_name: the grid's row axis is sharded over that mesh axis — the
    row pass uses a ppermute halo instead of jnp.roll (bitwise equal)."""
    if axis_name is None:
        d = jnp.maximum(m2, jnp.maximum(jnp.roll(m2, 1, 0),
                                        jnp.roll(m2, -1, 0)))
    else:
        e = _halo_rows(m2, axis_name)
        d = jnp.maximum(e[1:-1], jnp.maximum(e[:-2], e[2:]))
    return jnp.maximum(d, jnp.maximum(jnp.roll(d, 1, 1), jnp.roll(d, -1, 1)))


def _cull_prepass(above, ndir, ss, p0, params: MarchParams, bp: BrickPack,
                  steps: int, prepass_steps: int, chunk: int,
                  cull_shape: tuple | None, ray_stride: int = 1,
                  cell_margin: float | None = None,
                  axis_name: str | None = None):
    """Coarse exact prepass shared by the ray cull and (v3) cell staging.

    Returns (prio, occ_cells, meta):

    - prio [n]: per-ray cull priority — max `pre` over `prepass_steps`
      coarse exact samples (pre is the unclamped coverage margin, smooth
      along the ray), with a 3×3 neighbor bonus (−0.1) when the 2-D ray
      grid is known, and −inf below the horizon. Shared by `_march_core2`'s
      ray cull and `ray_keep_fraction` so capacity sizing sees exactly what
      the kernel ranks.
    - occ_cells [n_coarse, prepass_steps] bool (None when cell_margin is
      None): per-(coarse-ray, coarse-cell) occupancy `pre > -cell_margin`,
      dilated 3×3 across rays (when the grid is known) and ±1 along the
      ray. Cell k's prepass sample sits at fine step (k+1)·(steps/P) — its
      END — so the ±1 along-ray dilation brackets every fine step of a
      marked cell between probed positions.
    - meta (hs, ws, stride) mapping full-ray ids to occ_cells rows (None
      when the 1-D fallback applies — occ_cells is then per full ray).

    ray_stride > 1 (needs the 2-D grid with divisible dims) scores only
    every stride-th ray per axis and nearest-upsamples the dilated
    priority — stride 2 quarters the prepass gather cost, and the coarse
    dilation's wider footprint (±2 fine rays) still covers every skipped
    ray's neighborhood (quality-gated with the rest of the cull)."""
    n = ndir.shape[0]
    i_pre = (jnp.arange(prepass_steps, dtype=jnp.float32) + 1.0) \
        * float(steps // prepass_steps)
    cells = cell_margin is not None

    # FUSED weather+pre body, deliberately: splitting into two lax.map
    # passes (the single-gather-stream rule) measured 143.6 vs 126.5 ms at
    # the headline scale (round 4) — the prepass is filter-heavy enough
    # (bilinear weather + trilinear base noise) that the filter hides
    # behind the interleaved gathers, exactly the round-2 caveat's regime.
    def prepass_chunk(args):
        p0c, ndirc, ssc = args
        tt = ssc[:, None] * i_pre[None, :]
        px = p0c[:, 0, None] + ndirc[:, 0, None] * tt
        py = p0c[:, 1, None] + ndirc[:, 1, None] * tt
        pz = p0c[:, 2, None] + ndirc[:, 2, None] * tt
        w = _weather_rb_xy(bp, px, pz, params.weather_pos)
        pre_p, _ = _density_pre_xyz(px, py, pz, w, 0.0, params, bp)
        if not cells:
            return jnp.max(pre_p, axis=1)
        return jnp.max(pre_p, axis=1), pre_p > -cell_margin

    grid = cull_shape is not None and len(cull_shape) == 2
    sub = ray_stride > 1 and grid \
        and cull_shape[0] % ray_stride == 0 and cull_shape[1] % ray_stride == 0
    if sub:
        H, W = cull_shape
        hs, ws = H // ray_stride, W // ray_stride

        def coarse(a):
            return a.reshape((H, W) + a.shape[1:])[::ray_stride, ::ray_stride] \
                .reshape((hs * ws,) + a.shape[1:])

        above_p, ndir_p, ss_p, p0_p = (coarse(above), coarse(ndir),
                                       coarse(ss), coarse(p0))
        n_p = hs * ws
    else:
        above_p, ndir_p, ss_p, p0_p, n_p = above, ndir, ss, p0, n

    up0 = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    chunk_p = min(chunk, n_p)
    mapped = jax.lax.map(prepass_chunk, (
        _pad_blocks(p0_p, chunk_p, up0 * GROUND_RADIUS),
        _pad_blocks(ndir_p, chunk_p, up0),
        _pad_blocks(ss_p, chunk_p, jnp.float32(1.0)),
    ))
    occ_cells = None
    meta = None
    if cells:
        prio, occ = mapped
        occ = occ.reshape(-1, prepass_steps)[:n_p]
        if grid:
            gh, gw = (hs, ws) if sub else cull_shape
            o = occ.reshape(gh, gw, prepass_steps)
            if axis_name is None:
                o = o | jnp.roll(o, 1, 0) | jnp.roll(o, -1, 0)
            else:
                # Row axis sharded over the mesh: halo exchange keeps the
                # dilation bitwise-identical to the unsharded grid.
                e = _halo_rows(o, axis_name)
                o = e[1:-1] | e[:-2] | e[2:]
            o = o | jnp.roll(o, 1, 1) | jnp.roll(o, -1, 1)
            occ = o.reshape(n_p, prepass_steps)
            meta = (gh, gw, ray_stride if sub else 1)
        pad0 = jnp.zeros_like(occ[:, :1])
        occ_cells = occ \
            | jnp.concatenate([pad0, occ[:, :-1]], axis=1) \
            | jnp.concatenate([occ[:, 1:], pad0], axis=1)
    else:
        prio = mapped
    prio = prio.reshape(-1)[:n_p]
    neg_inf = jnp.float32(-jnp.inf)
    prio = jnp.where(above_p, prio, neg_inf)
    if sub:
        d2 = jnp.maximum(prio.reshape(hs, ws),
                         _dilate_max(prio.reshape(hs, ws), axis_name) - 0.1)
        prio = jnp.repeat(jnp.repeat(d2, ray_stride, axis=0), ray_stride,
                          axis=1).reshape(-1)
        return jnp.where(above, prio, neg_inf), occ_cells, meta
    if grid:
        m2 = prio.reshape(cull_shape)
        prio = jnp.where(above,
                         jnp.maximum(prio.reshape(-1),
                                     _dilate_max(m2, axis_name).reshape(-1)
                                     - 0.1),
                         neg_inf)
    return prio, occ_cells, meta


def _cull_priority(above, ndir, ss, p0, params: MarchParams, bp: BrickPack,
                   steps: int, prepass_steps: int, chunk: int,
                   cull_shape: tuple | None, ray_stride: int = 1):
    """Priority-only view of `_cull_prepass` (the v2 / engine cull path)."""
    return _cull_prepass(above, ndir, ss, p0, params, bp, steps,
                         prepass_steps, chunk, cull_shape, ray_stride)[0]


def _select_top_rays(prio, ray_cap, n):
    """Indices (ascending, fill=n) of ~the top ray_cap rays by priority
    WITHOUT a sort: histogram threshold (256 bins over the useful pre
    range) + index-order compaction of the rays above it. A full argsort
    costs ~116 ms at 524k rays on TPU (device trace; lax.top_k at
    k ≈ 0.6n is another ~400 ms worse); the histogram select is ~ms.
    Degradation under tight capacity drops the lowest-priority BIN first
    (bin width ~0.004 ≪ the 0.02 safety margin), and up to one boundary
    bin may go unused — covered by the bucket margin."""
    finite = jnp.isfinite(prio)
    pb = jnp.clip((prio + 0.5) * 256.0, 0.0, 255.0).astype(jnp.int32)
    hist = jnp.zeros((256,), jnp.int32).at[pb].add(
        finite.astype(jnp.int32))
    above_cnt = jnp.cumsum(hist[::-1])[::-1]  # rays with bin ≥ b
    fits = above_cnt <= ray_cap
    # First fitting bin; if even the top bin overflows (pathological
    # undersizing), confine the arbitrary drops to the top bin.
    bsel = jnp.where(jnp.any(fits), jnp.argmax(fits), 255)
    return _compact_indices(finite & (pb >= bsel), ray_cap, n)


def _ray_capacity(n: int, ray_keep_frac: float, align: int = 256) -> int:
    """Culled-ray capacity: ray_keep_frac·n rounded UP to a small lane
    alignment (256 keeps every downstream reshape/DMA 8×128-tile friendly),
    capped at n. Round 2 floored this at a full lax.map chunk, which made
    engine tile culling structurally inert (ray_cap == n for every region ≤
    chunk — ADVICE r2); the alignment floor keeps real culling at tile scale
    (region 96 → 9216 rays → bucket 0.25 keeps 2304)."""
    cap = max(int(n * ray_keep_frac + align - 1) // align * align, align)
    return min(cap, n)


def _march_core2(above, ndir, ss, p0, phase, params: MarchParams,
                 bp: BrickPack, atmos, steps: int, chunk: int,
                 capacity_frac: float, cone_cache: "ConeCache",
                 weather_every: int = 4, ray_keep_frac: float | None = None,
                 prepass_steps: int = 32, cull_shape: tuple | None = None,
                 ray_stride: int = 1, t_cutoff: float = 0.0,
                 cull_prio=None):
    """Row-lean march core (the headline-path variant of `_march_core`).

    Same math, restructured to minimize gather rows per (ray, step) sample —
    the march is gather-latency-bound (docs/PERF_NOTES.md):

    1. Weather is fetched at every `weather_every`-th step and lerped along
       the ray (its uv is LINEAR in ray t, and the map's features are
       ~16.7 km-period blobs vs ≤ 0.7 km between fetch nodes): 1/K weather
       rows per sample instead of 1.
    2. The dense phase fetches only the large-noise row → `pre`
       (`clouds.glsl:109-125`). The detail-erosion fetch
       (`clouds.glsl:127-136`) is staged behind the exact `pre > 0`
       occupancy predicate (erosion only reduces density; pre ≤ 0 remaps to
       exactly 0) — ~1 small-noise row per OCCUPIED sample instead of per
       sample. (Round 1 measured this staging as a loss with jnp.nonzero +
       stacked-position gathers; with cumsum compaction + component-plane
       position recompute it wins — see PERF_NOTES round 2.)
    3. The cone/light density comes from the per-cycle `cone_cache`
       (REQUIRED here): 1 brick row per occupied sample, evaluated on the
       SAME compacted list as the erosion (one compaction pass total),
       masked by t > 0 afterwards.

    capacity_frac sizes the shared occupied-sample list as a fraction of
    n·steps; overflow zeroes whole samples (not just their sun term), so
    keep ≥ the scene's `pre > 0` fraction with margin (gated in
    tests/test_march_v2.py).

    ray_keep_frac (None/1.0 = off) enables RAY-level culling: a coarse
    prepass (`prepass_steps` exact dense samples per ray, both fetches
    fused) scores every ray by its maximum sampled `pre` (pre IS the
    unclamped coverage margin `base·g − (1−wc)`, smooth along the ray),
    and only the ray_keep_frac·n highest-priority rays are marched — the
    rest render as empty sky. Every later phase runs only on the selected
    rays (compacted; the [n, steps] plane layout makes the ray
    gather/scatter a cheap 128-lane-row op). On the bench scene only 46%
    of rays touch cloud at all — the gather-bound phases are
    ray-proportional, so this is a ~1.8× frame lever.

    Guards against rays occupied only BETWEEN prepass samples (a wrongly
    culled ray is a binary error): (a) priority ordering itself — capacity
    is always filled, starting with near-occupied rays (the value margin
    band, measured: margin 0.05 alone misses zero occupied rays on the
    bench scene, bench/probe_occupancy.py); (b) a 3×3 neighbor bonus when
    `cull_shape` gives the 2-D ray grid (a ray ranks at least 0.1 below
    its best neighbor — adjacent rays' independent jitter phases make
    neighbors an effective safety net). Under-capacity degrades by
    dropping the LOWEST-priority (thinnest) rays, not arbitrary ones —
    size it with `ray_keep_fraction` + `select_ray_keep_frac` (gated in
    tests/test_march_v2.py).
    """
    atmosphere_sun, atmosphere_ambient, atmosphere_ground = atmos
    n = ndir.shape[0]
    n_out = n
    cull = ray_keep_frac is not None and ray_keep_frac < 1.0
    if cull:
        if cull_prio is not None:
            # Precomputed per-ray priority (e.g. the engine's per-cycle
            # map, sliced per tile) — skip the prepass entirely.
            prio = jnp.where(above, cull_prio.reshape(-1), -jnp.inf)
        else:
            assert steps % prepass_steps == 0, \
                "prepass_steps must divide steps"
            prio = _cull_priority(above, ndir, ss, p0, params, bp, steps,
                                  prepass_steps, chunk, cull_shape,
                                  ray_stride)
        ray_cap = _ray_capacity(n, ray_keep_frac)
        # Every later phase is ray-proportional: shrink the lax.map chunk to
        # the culled ray count so _pad_blocks doesn't pad 4× at tile scale.
        chunk = min(chunk, ray_cap)
        ridx = _select_top_rays(prio, ray_cap, n)
        valid_r = ridx < n
        safe_r = jnp.minimum(ridx, n - 1)
        geom_r = jnp.concatenate(
            [p0, ndir, ss[:, None], phase[:, None]], axis=1)  # [n, 8]
        g_r = jnp.take(geom_r, safe_r, axis=0, indices_are_sorted=True)
        p0 = g_r[:, 0:3]
        ndir = g_r[:, 3:6]
        ss = g_r[:, 6]
        phase = g_r[:, 7]
        above = jnp.take(above, safe_r, indices_are_sorted=True) & valid_r
        n = ray_cap
    lss = (SKY_T_RADIUS - SKY_B_RADIUS) / 64.0
    total = n * steps
    K = weather_every
    assert steps % K == 0, "weather_every must divide steps"
    n_nodes = steps // K + 1
    i_step = jnp.arange(1, steps + 1, dtype=jnp.float32)
    i_node = jnp.arange(n_nodes, dtype=jnp.float32) * K  # i-1 of each node

    # ---- Phase 1 (dense, chunked): pre + hf. TWO single-gather-stream
    # passes: interleaving the weather and large-noise gathers in one fused
    # loop runs at ~7 ns/row, while each stream alone runs at ~3.5 ns/row
    # (968 vs 232+227 ms at 67M samples, docs/PERF_NOTES.md round 2) — the
    # materialized weather values (two [n, steps] f32 planes; never a
    # 2-lane minor dim) cost ~1 GB of sequential traffic, 100× cheaper.
    def weather_chunk(args):
        p0c, ndirc, ssc = args
        if K == 1:
            tt = ssc[:, None] * i_step[None, :]
            wx = p0c[:, 0, None] + ndirc[:, 0, None] * tt
            wz = p0c[:, 2, None] + ndirc[:, 2, None] * tt
            w = _weather_rb_xy(bp, wx, wz, params.weather_pos)
        else:
            # Weather nodes (uv linear in t → lerp error is bilinear-kink
            # scale only; documented loss, see tests).
            tt_n = ssc[:, None] * (i_node[None, :] + 1.0)
            wx = p0c[:, 0, None] + ndirc[:, 0, None] * tt_n
            wz = p0c[:, 2, None] + ndirc[:, 2, None] * tt_n
            w_nodes = _weather_rb_xy(bp, wx, wz, params.weather_pos)
            fr = (jnp.arange(K, dtype=jnp.float32) / K)[None, None, :, None]
            w0 = w_nodes[:, :-1, None, :]
            w1 = w_nodes[:, 1:, None, :]
            w = (w0 + (w1 - w0) * fr).reshape(w_nodes.shape[0], steps, 2)
        return w[..., 0], w[..., 1]

    def pre_chunk(args):
        p0c, ndirc, ssc, wrc, wbc = args
        tt = ssc[:, None] * i_step[None, :]
        px = p0c[:, 0, None] + ndirc[:, 0, None] * tt
        py = p0c[:, 1, None] + ndirc[:, 1, None] * tt
        pz = p0c[:, 2, None] + ndirc[:, 2, None] * tt
        weather = jnp.stack([wrc, wbc], axis=-1)
        pre_c, hf_c = _density_pre_xyz(px, py, pz, weather, 0.0, params, bp)
        if t_cutoff <= 0.0:
            return pre_c, hf_c, jnp.ones_like(pre_c, dtype=bool)
        # Occlusion cutoff (conservative): erosion only REDUCES density and
        # is maximal at hfbm = 1, so t ≥ t_lb below — the resulting prefix
        # transmittance T_ub ≥ the true prefix. Samples with T_ub ≤ cutoff
        # are provably invisible (their contribution carries the true
        # prefix ≤ T_ub); staging skips them, and since T_ub is monotone
        # decreasing, every LATER occupied sample on the ray is skipped
        # too, keeping the accumulation self-consistent (alpha error ≤
        # cutoff). v1's `_march_core` cuts only the sun term using the
        # exact t_prefix; here erosion itself is staged, so the bound must
        # come from pre alone.
        t_lb = jnp.power(
            jnp.clip(m.remap(pre_c, 0.4 * hf_c, 1.0, 0.0, 1.0), 0.0, 1.0),
            (1.0 - hf_c) * 0.8 + 0.5,
        )
        dt_ub = jnp.exp(-params.density * t_lb * ssc[:, None])
        T_ub = jnp.concatenate(
            [jnp.ones_like(dt_ub[:, :1]), jnp.cumprod(dt_ub, axis=1)[:, :-1]],
            axis=1,
        )
        return pre_c, hf_c, T_ub > t_cutoff

    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    blocks = (
        _pad_blocks(p0, chunk, up * GROUND_RADIUS),
        _pad_blocks(ndir, chunk, up),
        _pad_blocks(ss, chunk, jnp.float32(1.0)),
    )
    w_r, w_b = jax.lax.map(weather_chunk, blocks)
    pre, hf, live = jax.lax.map(pre_chunk, blocks + (w_r, w_b))
    pre = pre.reshape(-1, steps)[:n]
    hf = hf.reshape(-1, steps)[:n]

    # ---- Phase 2 (one shared compaction): erosion → t, cone-cache → cd.
    occupied = (pre > 0.0) & above[:, None]
    if t_cutoff > 0.0:
        occupied &= live.reshape(-1, steps)[:n]
    capacity = max(int(total * capacity_frac), chunk)
    capacity += (-capacity) % chunk
    from cloudscape_tpu.ops import compact_pallas as _cp

    if (jax.default_backend() == "tpu"
            and total % (_cp.ROWS * _cp.LANES) == 0):
        # Pallas streaming compaction: 152 vs 245 ms at headline scale
        # (docs/PERF_NOTES.md), bit-identical indices and ranks.
        idx, rank = _cp.compact_indices_pallas(
            occupied.reshape(-1, _cp.LANES), capacity, total)
        rank = rank.reshape(-1)
    else:
        idx, rank = _compact_indices(occupied.reshape(-1), capacity, total,
                                     return_rank=True)

    # Per-ray geometry packed into ONE 8-lane row: a single row-latency per
    # staged sample instead of 7 separate narrow gathers (row latency
    # dominates; 7 gathers at 0.25·n·steps indices measured ~4s of the round-1
    # v2 prototype's 5.4s frame). idx is ascending from the cumsum compaction
    # (trailing fill = total), so every take/scatter is flagged sorted.
    geom = jnp.concatenate(
        [p0, ndir, ss[:, None], jnp.zeros_like(ss[:, None])], axis=1
    )  # [n, 8] (p0 xyz, ndir xyz, ss, pad)
    ray_i = jnp.minimum(idx // steps, n - 1)
    stp = (idx % steps).astype(jnp.float32) + 1.0
    g = jnp.take(geom, ray_i, axis=0, indices_are_sorted=True)
    tt_e = g[:, 6] * stp
    epx = g[:, 0] + g[:, 3] * tt_e
    epy = g[:, 1] + g[:, 4] * tt_e
    epz = g[:, 2] + g[:, 5] * tt_e
    pre_e = jnp.take(pre.reshape(-1), jnp.minimum(idx, total - 1),
                     indices_are_sorted=True)
    hf_e = m.height_fraction(jnp.sqrt(epx * epx + epy * epy + epz * epz),
                             SKY_B_RADIUS, SKY_T_RADIUS)

    # Two single-stream passes here as well (erosion row, then cone row) —
    # same interleaved-gather penalty as the dense phase.
    def erosion_chunk(blk):
        bpre, bhf, bx, by_, bz = blk
        return _density_finish_xyz(bpre, bhf, bx, by_, bz, 0.0, params, bp)

    def cone_chunk(blk):
        bx, by_, bz, bt = blk
        qx, qz, qh = _cone_cache_coords_xyz(bx, by_, bz, cone_cache.extent)
        cd_blk = sample_brick3_xyz(cone_cache.table, qx, qz, qh)[..., 0]
        return jnp.where(bt > 0.0, cd_blk, 0.0)

    exc = (epx.reshape(-1, chunk), epy.reshape(-1, chunk),
           epz.reshape(-1, chunk))
    t_e = jax.lax.map(
        erosion_chunk,
        (pre_e.reshape(-1, chunk), hf_e.reshape(-1, chunk)) + exc,
    )
    cd_e = jax.lax.map(cone_chunk, exc + (t_e,))
    # Two 1-D scatters (a packed [total, 2] scatter pads its 2-lane minor dim
    # to the 128-lane vreg tile — 64× write traffic, measured +3 s/frame).
    # Fill rows all carry index `total` — OUT of bounds for the (total,)
    # buffer, so mode="drop" discards them and the sorted+unique flags hold
    # honestly (fill slots repeating an in-bounds index would violate the
    # unique_indices contract — ADVICE r2).
    def scatter_back(vals):
        return jnp.zeros((total,), jnp.float32).at[idx].set(
            vals.reshape(-1), mode="drop", indices_are_sorted=True,
            unique_indices=True,
        ).reshape(n, steps)

    # Overflow handling as a fused WHERE, not a lax.cond: occupied samples
    # beyond capacity (rank ≥ capacity — the rank comes free from the
    # compaction's own cumsums) take a graceful ALU-only fallback — the
    # erosion remap evaluated at the detail noise's MEAN (hfbm = 0.5 makes
    # the height blend a fixed 0.5 too), and no sun term (cd stays 0 →
    # beers_total = 0). With no overflow, covered ≡ occupied and this is
    # bitwise the plain scatter result. A cond was measured at ~230 ms of
    # plane operand/result copies + 84 ms body at frame scale (device
    # trace) — far more than this select's one extra fused sweep.
    covered = occupied & (rank.reshape(n, steps) < capacity)
    base_fb = m.remap(pre, 0.5 * 0.4 * hf, 1.0, 0.0, 1.0)
    t_fb = jnp.power(jnp.clip(base_fb, 0.0, 1.0), (1.0 - hf) * 0.8 + 0.5)
    t = jnp.where(covered, scatter_back(t_e),
                  jnp.where(occupied, t_fb, 0.0))
    cd = scatter_back(cd_e)  # uncovered samples: 0 → no sun term

    out = _accumulate_phase3(t, cd, hf, ss, phase, above, params, atmos,
                             lss, steps, chunk)
    if cull:
        # Scatter kept-ray results back (culled/overflow rays = empty sky);
        # ridx fill = n_out, out of bounds → dropped (unique holds).
        out = jnp.zeros((n_out, 4), jnp.float32).at[ridx].set(
            out, mode="drop", indices_are_sorted=True, unique_indices=True,
        )
    return out


def _accumulate_phase3(t, cd, hf, ss, phase, above, params: MarchParams,
                       atmos, lss, steps: int, chunk: int):
    """Phase 3 (dense elementwise, shared by `_march_core2`/`_march_core3`):
    same math as `_march_core`, computed in per-channel COMPONENT PLANES —
    [n, steps, 3] intermediates put a 3-lane minor dim on the (8, 128) vreg
    tile (~40× padded traffic, ~0.3 s/frame measured) — and CHUNKED through
    one lax.map so the ~20 elementwise passes fuse into a single HBM sweep
    of the three input planes instead of ~20 full-size unfused loops. On TPU
    at the production step count the whole phase runs as one Pallas kernel
    (cumprod + accumulation fused in VMEM: 67 → 56 ms device, and the step
    count of the phase no longer depends on XLA's fusion choices)."""
    atmosphere_sun, atmosphere_ambient, atmosphere_ground = atmos
    n = t.shape[0]
    from cloudscape_tpu.ops import accum_pallas as _ap

    if jax.default_backend() == "tpu" and steps == _ap.STEPS:
        A = (-params.density) * t * ss[:, None]
        cd3 = (-params.density * lss * 3.0) * cd
        ph = jnp.broadcast_to(phase[:, None], (n, steps))
        scal = jnp.concatenate([
            jnp.asarray(atmosphere_sun, jnp.float32).reshape(-1)[:3],
            jnp.asarray(atmosphere_ambient, jnp.float32).reshape(-1)[:3],
            jnp.asarray(atmosphere_ground, jnp.float32).reshape(-1)[:3],
            jnp.zeros((3,), jnp.float32),
        ]).reshape(1, 12)
        n_pad = (-n) % _ap.BLOCK
        if n_pad:
            z = jnp.zeros((n_pad, steps), jnp.float32)
            A, cd3, hf_p, ph = (jnp.concatenate([A, z]),
                                jnp.concatenate([cd3, z]),
                                jnp.concatenate([hf, z]),
                                jnp.concatenate([ph, z]))
        else:
            hf_p = hf
        return _ap.accumulate_pallas(A, cd3, hf_p, ph, scal)[:n]

    def accum_chunk(args):
        tc, cdc, hfc, ssc, phasec, abovec = args
        dt = jnp.exp(-params.density * tc * ssc[:, None])
        t_prefix = jnp.concatenate(
            [jnp.ones_like(dt[:, :1]), jnp.cumprod(dt, axis=1)[:, :-1]],
            axis=1,
        )
        beers = jnp.exp(-params.density * cdc * lss * 3.0)
        powder = 1.0 - jnp.exp(-params.density * cdc * lss * 6.0)
        beers_total = jnp.where(tc > 0.0, 2.0 * beers * powder, 0.0)

        sm = m.smoothstep(0.0, 1.0, hfc)
        bt_phase = beers_total * phasec[:, None]
        # contrib_c = t_prefix · radiance_c · (1 - dt) / max(t, eps);
        # radiance_c = (ambient_c + bt_phase · sun_c) · t — hoisted.
        shared = t_prefix * (1.0 - dt) * (tc / jnp.maximum(1e-7, tc))
        L = []
        for c in range(3):
            ambient_c = atmosphere_ground[c] + \
                (atmosphere_ambient[c] - atmosphere_ground[c]) * sm
            L.append(jnp.sum(
                shared * (ambient_c + bt_phase * atmosphere_sun[c]), axis=1))
        alpha = jnp.clip(1.0 - jnp.prod(dt, axis=1), 0.0, 1.0)
        out = jnp.stack([L[0], L[1], L[2], alpha], axis=-1)
        return jnp.where(abovec[..., None], out, 0.0)

    return jax.lax.map(accum_chunk, (
        _pad_blocks(t, chunk, jnp.float32(0.0)),
        _pad_blocks(cd, chunk, jnp.float32(0.0)),
        _pad_blocks(hf, chunk, jnp.float32(0.0)),
        _pad_blocks(ss, chunk, jnp.float32(1.0)),
        _pad_blocks(phase, chunk, jnp.float32(0.0)),
        _pad_blocks(above, chunk, jnp.bool_(False)),
    )).reshape(-1, 4)[:n]


def _seg_end_reduce(cellsums, incl, head, ray_h, n: int, cap_h: int,
                    scan_fn):
    """Segment-END extraction instead of full-size scatter-adds: the 4
    per-ray reductions as `.at[].add` over the whole hot list cost
    ~7 ns/UPDATE × 4 × cap_h (the round-2 scatter rule — the largest block
    of the accum phase at the headline scale). Instead: segmented-scan each
    radiance channel (3 more single-pass Pallas scans; the logT scan `incl`
    already ran), compact the segment-end positions (≤ one per ray — ray_h
    is sorted, so each ray's cells are one contiguous run, and the fill
    suffix merges into the last real segment contributing +0), then gather
    the 4 totals at the ends and scatter ≤ n unique sorted values. Update
    count drops from 4·cap_h to ~n. `scan_fn` is injected so the CPU
    equivalence test can drive this exact code with an XLA segmented scan
    (tests/test_march_v3.py)."""
    seg_end = jnp.concatenate([head[1:], jnp.ones((1,), bool)])
    cap_e = min(_ceil_to(n, 128), cap_h)
    sidx = _compact_mask(seg_end, cap_e, cap_h)
    ssafe = jnp.minimum(sidx, cap_h - 1)
    valid_e = sidx < cap_h
    rid = jnp.where(valid_e, jnp.take(ray_h, ssafe,
                                      indices_are_sorted=True), n)
    bufs = []
    for cs in cellsums:
        tot = scan_fn(cs, head)
        bufs.append(jnp.zeros((n,), jnp.float32).at[rid].set(
            jnp.take(tot, ssafe, indices_are_sorted=True), mode="drop",
            indices_are_sorted=True, unique_indices=True))
    logT = jnp.zeros((n,), jnp.float32).at[rid].set(
        jnp.take(incl, ssafe, indices_are_sorted=True), mode="drop",
        indices_are_sorted=True, unique_indices=True)
    return bufs, logT


def _accumulate_segmented(t_h, cd_h, hf_h, g_h, ray_h, valid_h, n: int,
                          spc: int, params: MarchParams, atmos, lss,
                          axis_name: str | None = None):
    """Hot-list accumulation (v3 `accum="segmented"`): the per-ray
    transmittance prefix and radiance sum computed directly on the
    [spc·cap_h] hot sample list — no [n, steps] plane scatters, no dense
    hf recompute, no dense-plane accumulation sweep (the plane path's
    stage-9+0 cost is hot-capacity-independent; this one scales with the
    hot list).

    Mathematically identical to `_accumulate_phase3` over scattered
    planes: dead samples have t = 0 → dt = 1 and zero radiance, so
    skipping them changes nothing, and the step prefix product
    Π exp(A_j) becomes exp(Σ A_j) with A = −density·t·ss (already
    computed — no log). The cross-cell prefix is a SEGMENTED scan
    (`lax.associative_scan` over a (value, segment-start) monoid): a
    global cumsum-minus-segment-base would subtract two large f32
    partials (sum over ~2M cells) to recover a ~1-magnitude per-ray
    value — catastrophic cancellation — while the segmented monoid keeps
    all arithmetic ray-local. Tolerance-equal to the plane path
    (reduction-order noise), same ≥40 dB referee
    (tests/test_march_v3.py)."""
    atmosphere_sun, atmosphere_ambient, atmosphere_ground = atmos
    cap_h = valid_h.shape[0]
    t_l = jnp.where(valid_h[None, :], t_h.reshape(spc, cap_h), 0.0)
    cd_l = cd_h.reshape(spc, cap_h)
    hf_l = hf_h.reshape(spc, cap_h)
    ss_h = g_h[:, 6]
    phase_h = g_h[:, 7]

    A_l = (-params.density) * t_l * ss_h[None, :]  # log dt per lane, ≤ 0
    # In-cell exclusive prefix (spc is tiny — a couple of vector adds).
    excl = jnp.concatenate(
        [jnp.zeros((1, cap_h), jnp.float32), jnp.cumsum(A_l[:-1], axis=0)],
        axis=0)
    cell_logdt = excl[-1] + A_l[-1]  # [cap_h] per-cell total

    # Segmented EXCLUSIVE prefix over each ray's (ascending) hot cells.
    head = jnp.concatenate(
        [jnp.ones((1,), bool), ray_h[1:] != ray_h[:-1]])

    use_pallas = jax.default_backend() == "tpu" and axis_name is None
    if use_pallas:
        # One streaming pass (read value+head, write prefix) instead of
        # the associative_scan's ~21 full-array passes — measured 33 ms
        # off the headline frame (docs/PERF_NOTES.md round 5). Kept off
        # the sharded path: the kernel's tile-aligned combine tree is not
        # alignment-invariant, which would break test_sharding's bitwise
        # 2-device ≡ 8-device reshard gate (per-shard cap_h differs).
        from cloudscape_tpu.ops.segscan_pallas import segscan_sum_pallas

        incl = segscan_sum_pallas(cell_logdt, head)
    else:
        def seg_sum(a, b):
            return jnp.where(b[1], b[0], a[0] + b[0]), a[1] | b[1]

        incl, _ = jax.lax.associative_scan(seg_sum, (cell_logdt, head))
    ray_excl = incl - cell_logdt

    dt_l = jnp.exp(A_l)
    t_prefix = jnp.exp(ray_excl[None, :] + excl)
    beers = jnp.exp((-params.density * lss * 3.0) * cd_l)
    powder = 1.0 - jnp.exp((-params.density * lss * 6.0) * cd_l)
    beers_total = jnp.where(t_l > 0.0, 2.0 * beers * powder, 0.0)
    sm = m.smoothstep(0.0, 1.0, hf_l)
    bt_phase = beers_total * phase_h[None, :]
    # Same soft zero-gate as `_accumulate_phase3`'s accum_chunk.
    shared = t_prefix * (1.0 - dt_l) * (t_l / jnp.maximum(1e-7, t_l))

    cellsums = []
    for c in range(3):
        ambient_c = atmosphere_ground[c] + \
            (atmosphere_ambient[c] - atmosphere_ground[c]) * sm
        cellsums.append(jnp.sum(
            shared * (ambient_c + bt_phase * atmosphere_sun[c]), axis=0))

    if use_pallas:
        bufs, logT = _seg_end_reduce(cellsums, incl, head, ray_h, n, cap_h,
                                     segscan_sum_pallas)
    else:
        # Per-ray reductions: one sorted 1-D scatter-add per channel (+ one
        # for log-transmittance); fills route out of bounds and drop.
        ridx = jnp.where(valid_h, ray_h, n)
        bufs = [jnp.zeros((n,), jnp.float32).at[ridx].add(
            cs, mode="drop", indices_are_sorted=True) for cs in cellsums]
        logT = jnp.zeros((n,), jnp.float32).at[ridx].add(
            cell_logdt, mode="drop", indices_are_sorted=True)
    alpha = jnp.clip(1.0 - jnp.exp(logT), 0.0, 1.0)
    return jnp.stack(bufs + [alpha], axis=-1)


def _march_core3(above, ndir, ss, p0, phase, params: MarchParams,
                 bp: BrickPack, atmos, steps: int, chunk: int,
                 cell_keep_frac: float, cone_cache: "ConeCache",
                 ray_keep_frac: float | None = None,
                 prepass_steps: int = 32, cull_shape: tuple | None = None,
                 ray_stride: int = 1, cell_margin: float = 0.1,
                 hot_keep_frac: float = 0.5, debug_stage: int = 0,
                 axis_name: str | None = None, accum: str = "segmented"):
    """Window-staged march core (the v3 headline variant — VERDICT r2 #1).

    `_march_core2` still marches ALL `steps` samples of every kept ray
    through the dense weather+pre gather streams, even though the staged
    occupancy on the bench scene is ~0.09 — the dense streams are the
    measured frame floor (~0.49 s of 1.06 s, docs/PERF_NOTES.md round-2
    close-out). v3 removes the dense phase entirely:

    1. The SAME coarse cull prepass that scores rays also emits per-ray
       coarse-CELL occupancy (`_cull_prepass`: prepass_steps cells per ray,
       each covering steps/prepass_steps consecutive fine steps;
       `pre > -cell_margin` at the probe, dilated 3×3 across rays and ±1
       along the ray). Outside a dilated-live cell, `pre ≤ 0` to margin
       conservatism → density exactly 0 → zero contribution.
    2. ONE sample compaction over the cell-gated mask replaces core2's
       `pre > 0` compaction; ALL FOUR gather streams (weather, large-noise
       pre, detail erosion, cone cache) then run only on compacted live
       samples — fine sample PLACEMENT is unchanged (hierarchical
       redistribution was the measured-negative static-window variant; the
       cell gate keeps v1/v2's exact step lattice, so quality holds by
       construction wherever the coarse gate is conservative).
    3. t / cd / hf are scattered back to [n, steps] planes (fill 0 — dead
       samples contribute nothing: radiance ∝ t and 1−dt = 0) and phase 3
       runs unchanged (`_accumulate_phase3`).

    cell_keep_frac sizes the compacted sample list as a fraction of
    n·steps AFTER ray culling; overflow drops the highest-index cells
    (far-grid rays) — size it from `v3_auto_policy` with margin. The
    occlusion cutoff is intentionally absent (it needs a dense pre plane;
    the cell gate removes far more work than the cutoff ever did).

    Matches `/root/reference/README.md:28` (TODO #1, hierarchical
    marching) applied to `clouds.glsl:172-212`'s hot loop."""
    atmosphere_sun, atmosphere_ambient, atmosphere_ground = atmos
    n = ndir.shape[0]
    n_out = n
    P = prepass_steps
    assert steps % P == 0, "prepass_steps must divide steps"
    spc = steps // P

    # debug_stage (perf isolation, bench/probe_v3_phases.py): early-return a
    # scalar probe after stage k — XLA dead-code-eliminates everything the
    # probe doesn't depend on, so timing stage k vs k-1 isolates one phase.
    def _dbg(*xs):
        probe = sum(jnp.sum(x.astype(jnp.float32)) for x in xs)
        return jnp.zeros((n_out, 4), jnp.float32).at[0, 0].set(probe)

    prio, occ_cells, meta = _cull_prepass(
        above, ndir, ss, p0, params, bp, steps, P, chunk, cull_shape,
        ray_stride, cell_margin, axis_name)
    if debug_stage == 1:  # prepass only
        return _dbg(prio, occ_cells)

    cull = ray_keep_frac is not None and ray_keep_frac < 1.0
    if cull:
        ray_cap = _ray_capacity(n, ray_keep_frac)
        chunk = min(chunk, ray_cap)
        ridx = _select_top_rays(prio, ray_cap, n)
        if debug_stage == 2:  # + ray select
            return _dbg(ridx, occ_cells)
        valid_r = ridx < n
        safe_r = jnp.minimum(ridx, n - 1)
        geom_r = jnp.concatenate(
            [p0, ndir, ss[:, None], phase[:, None]], axis=1)  # [n, 8]
        g_r = jnp.take(geom_r, safe_r, axis=0, indices_are_sorted=True)
        p0 = g_r[:, 0:3]
        ndir = g_r[:, 3:6]
        ss = g_r[:, 6]
        phase = g_r[:, 7]
        above = jnp.take(above, safe_r, indices_are_sorted=True) & valid_r
        ray_ids = safe_r
        n = ray_cap
    else:
        ray_ids = None

    # Per-(kept-)ray live-cell rows from the prepass's coarse grid.
    if meta is not None:
        gh, gw, stride = meta
        W = cull_shape[1]
        if ray_ids is None:
            if stride == 1:
                occ_rows = occ_cells
            else:
                o = occ_cells.reshape(gh, 1, gw, 1, P)
                o = jnp.broadcast_to(o, (gh, stride, gw, stride, P))
                occ_rows = o.reshape(n, P)
        else:
            ci = (ray_ids // W // stride) * gw + (ray_ids % W) // stride
            occ_rows = jnp.take(occ_cells, ci, axis=0,
                                indices_are_sorted=True)
    elif ray_ids is None:
        occ_rows = occ_cells
    else:
        occ_rows = jnp.take(occ_cells, ray_ids, axis=0,
                            indices_are_sorted=True)
    live = occ_rows & above[:, None]  # [n, P]

    lss = (SKY_T_RADIUS - SKY_B_RADIUS) / 64.0
    total_cells = n * P

    # ---- Live-CELL compaction (one compaction at 1/spc the sample count).
    cap_c = min(_ceil_to(max(int(total_cells * cell_keep_frac), chunk), chunk),
                _ceil_to(total_cells, chunk))
    cidx = _compact_mask(live.reshape(-1), cap_c, total_cells)
    valid_c = cidx < total_cells
    ray_i = jnp.minimum(cidx // P, n - 1)
    cell_k = (cidx % P).astype(jnp.float32)

    # Per-ray geometry packed into ONE 8-lane row, gathered once per CELL
    # (¼ the rows of a per-sample gather); positions for the cell's spc
    # samples expand as LANE-MAJOR flat planes — lane l's block is a
    # [cap_c] slice, so no [cap_c, spc] minor-dim array (which would pad
    # its spc lanes to the 128-lane vreg tile) is ever materialized.
    # phase rides in lane 7 (was a pad) so the segmented accumulator gets
    # it per hot cell for free with the same row gather.
    geom = jnp.concatenate(
        [p0, ndir, ss[:, None], phase[:, None]], axis=1
    )  # [n, 8] (p0 xyz, ndir xyz, ss, phase)
    g = jnp.take(geom, ray_i, axis=0, indices_are_sorted=True)

    def lane_positions(gg, ck):
        parts = []
        for axis in range(3):
            lanes = [
                gg[:, axis] + gg[:, 3 + axis]
                * (gg[:, 6] * (ck * spc + float(l + 1)))
                for l in range(spc)
            ]
            parts.append(jnp.concatenate(lanes))
        return parts  # [M] each, lane-major (lane 0 block, lane 1 block, …)

    sx, sy, sz = lane_positions(g, cell_k)
    if debug_stage == 3:  # + cell compaction & positions
        return _dbg(sx, sy, sz)

    # ---- Live passes (single-gather-stream rule): weather row, then
    # large-noise pre row, over all live samples.
    def weather_chunk(blk):
        bx, bz = blk
        w = _weather_rb_xy(bp, bx, bz, params.weather_pos)
        return w[..., 0], w[..., 1]

    def pre_chunk(blk):
        bx, by_, bz, bwr, bwb = blk
        weather = jnp.stack([bwr, bwb], axis=-1)
        return _density_pre_xyz(bx, by_, bz, weather, 0.0, params, bp)

    exc = (sx.reshape(-1, chunk), sy.reshape(-1, chunk),
           sz.reshape(-1, chunk))
    w_r, w_b = jax.lax.map(weather_chunk, (exc[0], exc[2]))
    if debug_stage == 4:  # + weather stream
        return _dbg(w_r, w_b)
    pre_s, hf_s = jax.lax.map(pre_chunk, exc + (w_r, w_b))
    pre_s = pre_s.reshape(spc, cap_c)
    hf_s = hf_s.reshape(spc, cap_c)
    if debug_stage == 5:  # + pre stream
        return _dbg(pre_s, hf_s)

    # ---- HOT-cell sub-compaction: `pre > 0` is the exact occupancy
    # predicate (erosion only reduces density, pre ≤ 0 remaps to exactly
    # 0), so the expensive erosion + cone streams run only on cells with
    # any occupied sample. Overflow drops the highest-index hot cells —
    # covered by the bucket margin (`v3_auto_policy`).
    hot = jnp.any(pre_s > 0.0, axis=0) & valid_c  # [cap_c]
    cap_h = min(_ceil_to(max(int(cap_c * hot_keep_frac), chunk), chunk),
                cap_c)
    hidx = _compact_mask(hot, cap_h, cap_c)
    hsafe = jnp.minimum(hidx, cap_c - 1)
    valid_h = hidx < cap_c
    cidx_h = jnp.where(valid_h,
                       jnp.take(cidx, hsafe, indices_are_sorted=True),
                       total_cells)
    ray_h = jnp.minimum(cidx_h // P, n - 1)
    cell_h = (cidx_h % P).astype(jnp.float32)
    g_h = jnp.take(geom, ray_h, axis=0, indices_are_sorted=True)
    hx, hy, hz = lane_positions(g_h, cell_h)
    # ONE [cap_h, spc] row-gather instead of spc scalar takes: narrow
    # (lane-padded) gathers run 2-4.7× slower PER ROW than row gathers
    # (docs/PERF_NOTES.md round-1 table), and the row form issues ¼ the
    # rows. Bitwise-identical values (same elements, gathered row-wise).
    pre_h = jnp.take(pre_s.T, hsafe, axis=0,
                     indices_are_sorted=True).T.reshape(-1)
    hf_h = m.height_fraction(jnp.sqrt(hx * hx + hy * hy + hz * hz),
                             SKY_B_RADIUS, SKY_T_RADIUS)
    if debug_stage == 6:  # + hot sub-compaction
        return _dbg(pre_h, hf_h, hx)

    def erosion_chunk(blk):
        bpre, bhf, bx, by_, bz = blk
        t_c = _density_finish_xyz(bpre, bhf, bx, by_, bz, 0.0, params, bp)
        return jnp.where(bpre > 0.0, t_c, 0.0)

    def cone_chunk(blk):
        bx, by_, bz, bt = blk
        qx, qz, qh = _cone_cache_coords_xyz(bx, by_, bz, cone_cache.extent)
        cd_blk = sample_brick3_xyz(cone_cache.table, qx, qz, qh)[..., 0]
        return jnp.where(bt > 0.0, cd_blk, 0.0)

    hxc = (hx.reshape(-1, chunk), hy.reshape(-1, chunk),
           hz.reshape(-1, chunk))
    t_h = jax.lax.map(erosion_chunk,
                      (pre_h.reshape(-1, chunk), hf_h.reshape(-1, chunk))
                      + hxc)
    if debug_stage == 7:  # + erosion stream
        return _dbg(t_h)
    cd_h = jax.lax.map(cone_chunk, hxc + (t_h,))
    if debug_stage == 8:  # + cone stream
        return _dbg(t_h, cd_h)

    if accum == "segmented":
        out = _accumulate_segmented(t_h.reshape(-1), cd_h.reshape(-1),
                                    hf_h, g_h, ray_h, valid_h, n, spc,
                                    params, atmos, lss,
                                    axis_name=axis_name)
        if debug_stage == 9:  # accumulation complete, pre scatter-back
            return _dbg(out)
        if cull:
            out = jnp.zeros((n_out, 4), jnp.float32).at[ridx].set(
                out, mode="drop", indices_are_sorted=True,
                unique_indices=True)
        return out

    # ---- Scatter t / cd to [n, steps] planes from the HOT list only
    # (dead and unoccupied samples are 0 in both planes — radiance ∝ t
    # and 1 − dt = 0, so fill 0 is exact). Per-LANE 1-D scatters into the
    # flat [n·steps] plane: a [cap_h, spc=4] row scatter into an
    # [n·P, spc]-minor buffer pads 4 lanes to the 128-lane vreg tile —
    # measured +362 ms/frame at the headline scale (round-4 phase
    # isolation; the round-2 "always scatter 1-D" rule, re-learned on the
    # write side). Each lane's plane indices are strictly ascending
    # (cidx_h is); fill rows go out of bounds and are dropped, so
    # sorted+unique hold honestly.
    total = n * steps
    base_h = jnp.where(valid_h, ray_h * steps + (cidx_h % P) * spc, total)

    def scatter_plane(vals):
        vals = vals.reshape(spc, cap_h)
        buf = jnp.zeros((total,), jnp.float32)
        for l in range(spc):
            buf = buf.at[base_h + l].set(
                vals[l], mode="drop", indices_are_sorted=True,
                unique_indices=True,
            )
        return buf.reshape(n, steps)

    t = scatter_plane(t_h)
    cd = scatter_plane(cd_h)

    # hf plane: pure-ALU dense recompute (positions + height_fraction, no
    # gathers) — cheaper than a third capacity-sized scatter, and exact for
    # every sample (same float ops as the gathered passes).
    i_step = jnp.arange(1, steps + 1, dtype=jnp.float32)

    def hf_chunk(args):
        p0c, ndirc, ssc = args
        tt = ssc[:, None] * i_step[None, :]
        px = p0c[:, 0, None] + ndirc[:, 0, None] * tt
        py = p0c[:, 1, None] + ndirc[:, 1, None] * tt
        pz = p0c[:, 2, None] + ndirc[:, 2, None] * tt
        return m.height_fraction(jnp.sqrt(px * px + py * py + pz * pz),
                                 SKY_B_RADIUS, SKY_T_RADIUS)

    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    hf = jax.lax.map(hf_chunk, (
        _pad_blocks(p0, chunk, up * GROUND_RADIUS),
        _pad_blocks(ndir, chunk, up),
        _pad_blocks(ss, chunk, jnp.float32(1.0)),
    )).reshape(-1, steps)[:n]
    if debug_stage == 9:  # + scatters and hf plane
        return _dbg(t, cd, hf)

    out = _accumulate_phase3(t, cd, hf, ss, phase, above, params, atmos,
                             lss, steps, chunk)
    if cull:
        # ridx fill = n_out, out of bounds → dropped (unique holds).
        out = jnp.zeros((n_out, 4), jnp.float32).at[ridx].set(
            out, mode="drop", indices_are_sorted=True, unique_indices=True,
        )
    return out


@partial(jax.jit, static_argnames=("steps", "stride", "t_cutoff"))
def occupied_sample_fraction(dirs, params: MarchParams, bp: BrickPack,
                             steps: int = 16, stride: int = 8,
                             t_cutoff: float = 1e-4):
    """Cheap estimate of the STAGED (ray·step) occupancy — `pre > 0` minus
    the occlusion cutoff (`_march_core2`'s conservative T_ub bound at this
    coarse step count) — the quantity that sizes the compacted capacity.
    Probes every `stride`-th ray at `steps` coarse samples (≈
    n/stride·steps·2 gather rows). Call once per cycle / scene and feed
    `select_capacity_frac` (match the march's t_cutoff)."""
    flat = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)[::stride]
    above, ndir, ss, p0, _, _ = _ray_setup(flat, params, steps)
    i_step = jnp.arange(1, steps + 1, dtype=jnp.float32)
    tt = ss[:, None] * i_step[None, :]
    px = p0[:, 0, None] + ndir[:, 0, None] * tt
    py = p0[:, 1, None] + ndir[:, 1, None] * tt
    pz = p0[:, 2, None] + ndir[:, 2, None] * tt
    weather = _weather_rb_xy(bp, px, pz, params.weather_pos)
    pre, hf = _density_pre_xyz(px, py, pz, weather, 0.0, params, bp)
    occ = (pre > 0.0) & above[:, None]
    if t_cutoff > 0.0:
        t_lb = jnp.power(
            jnp.clip(m.remap(pre, 0.4 * hf, 1.0, 0.0, 1.0), 0.0, 1.0),
            (1.0 - hf) * 0.8 + 0.5,
        )
        dt_ub = jnp.exp(-params.density * t_lb * ss[:, None])
        T_ub = jnp.concatenate(
            [jnp.ones_like(dt_ub[:, :1]), jnp.cumprod(dt_ub, axis=1)[:, :-1]],
            axis=1,
        )
        occ &= T_ub > t_cutoff
    return jnp.mean(occ.astype(jnp.float32))


@partial(jax.jit, static_argnames=("steps", "prepass_steps", "chunk",
                                   "prepass_margin", "ray_stride"))
def ray_keep_fraction(dirs, params: MarchParams, bp: BrickPack,
                      steps: int = 128, prepass_steps: int = 32,
                      chunk: int = 32768, prepass_margin: float = 0.02,
                      ray_stride: int = 1):
    """Fraction of rays whose `_march_core2` cull priority exceeds
    −prepass_margin — the quantity that sizes `ray_keep_frac`. Runs the
    kernel's own `_cull_priority` (full grid, dilation bonus included) so
    the capacity bucket covers exactly the rays the kernel will rank above
    the safety band. Cost ≈ one prepass (~prepass_steps·2 rows per ray);
    call once per cycle / scene — parameters are frozen per cycle
    (FrameData semantics), so the bucket stays valid for the whole cycle."""
    dirs = jnp.asarray(dirs, jnp.float32)
    shape = dirs.shape[:-1]
    flat = dirs.reshape(-1, 3)
    above, ndir, ss, p0, _, _ = _ray_setup(flat, params, steps)
    prio = _cull_priority(above, ndir, ss, p0, params, bp, steps,
                          prepass_steps, min(chunk, max(flat.shape[0], 1)),
                          shape if len(shape) == 2 else None, ray_stride)
    return jnp.mean((prio > -prepass_margin).astype(jnp.float32))


def _tile_cell_fracs(occ_cells, gh: int, gw: int, stride: int, region: int):
    """Per-tile live-(coarse-ray, coarse-cell) fraction from a dilated
    occupancy grid (`_cull_prepass` semantics): the quantity that sizes a
    per-tile `march_bricks_v3` cell capacity. occ_cells rows are the
    stride-subsampled [gh, gw] grid; a region² tile covers region/stride
    coarse rows/cols."""
    P = occ_cells.shape[-1]
    r = max(region // stride, 1)
    o = occ_cells.reshape(gh, gw, P).astype(jnp.float32)
    return o.reshape(gh // r, r, gw // r, r, P).mean(axis=(1, 3, 4))


@partial(jax.jit, static_argnames=("steps", "prepass_steps", "chunk",
                                   "ray_stride", "region", "prepass_margin",
                                   "cell_margin"))
def cull_priority_map(dirs, params: MarchParams, bp: BrickPack,
                      steps: int = 128, prepass_steps: int = 32,
                      chunk: int = 32768, ray_stride: int = 2,
                      region: int | None = None,
                      prepass_margin: float = 0.02,
                      cell_margin: float | None = None):
    """Full-grid cull priority map for PRECOMPUTED per-tile culling (the
    engine's per-cycle path: parameters are frozen per cycle, so one map
    serves every tile of the cycle via `march_bricks_v2(cull_prio=...)`).

    dirs: [H, W, 3]. Returns (prio [H, W] f32, tile_keep [H//region,
    W//region] f32 — fraction of each region² tile above the margin;
    tile_keep is None when region is None). With cell_margin set, returns
    a third element: per-tile live-CELL fractions (the `_cull_prepass`
    dilated occupancy, tile-averaged) — the engine's fast3 per-tile
    cell-capacity sizing."""
    dirs = jnp.asarray(dirs, jnp.float32)
    shape = dirs.shape[:-1]
    flat = dirs.reshape(-1, 3)
    above, ndir, ss, p0, _, _ = _ray_setup(flat, params, steps)
    if cell_margin is not None:
        prio, occ_cells, meta = _cull_prepass(
            above, ndir, ss, p0, params, bp, steps, prepass_steps,
            min(chunk, max(flat.shape[0], 1)), shape, ray_stride,
            cell_margin)
        prio = prio.reshape(shape)
    else:
        prio = _cull_priority(
            above, ndir, ss, p0, params, bp, steps, prepass_steps,
            min(chunk, max(flat.shape[0], 1)), shape,
            ray_stride).reshape(shape)
    if region is None:
        return (prio, None) if cell_margin is None else (prio, None, None)
    H, W = shape
    keep = (prio > -prepass_margin).astype(jnp.float32)
    tile_keep = keep.reshape(H // region, region, W // region, region) \
        .mean(axis=(1, 3))
    if cell_margin is None:
        return prio, tile_keep
    gh, gw, stride = meta if meta is not None else (H, W, 1)
    # Below-horizon rays are never live in the march (`live = occ & above`)
    # — mask them so horizon tiles get honestly small buckets.
    above_sub = above.reshape(H, W)[::stride, ::stride].reshape(-1)
    tile_cell = _tile_cell_fracs(occ_cells & above_sub[:, None],
                                 gh, gw, stride, region)
    return prio, tile_keep, tile_cell


RAY_KEEP_BUCKETS = (0.3, 0.35, 0.4, 0.45, 0.5, 0.55, 0.6, 0.65, 0.7,
                    0.75, 0.8, 0.9, 1.0)


def select_ray_keep_frac(keep_frac: float, margin: float = 1.06,
                         buckets=RAY_KEEP_BUCKETS) -> float:
    """Smallest ray-capacity bucket ≥ margin × measured keep fraction
    (static jit argument; fine buckets — every ray-proportional phase pays
    the bucket, ~10%/0.05 of the frame, and in practice a scene touches
    one bucket). The measured fraction is exact (full-grid,
    dilation-aware) and the march itself rounds capacity up to a chunk
    multiple, so the margin only covers within-cycle wind drift. Capacity
    shortfalls degrade softly (the lowest-priority rays drop first), so
    the bucket is a quality knob, not a cliff. 1.0 disables culling
    entirely (overcast scenes keep everything anyway)."""
    need = keep_frac * margin
    for b in buckets:
        if need <= b:
            return b
    return 1.0


CAPACITY_BUCKETS = (0.09, 0.12, 0.15, 0.18, 0.2, 0.22, 0.25, 0.3, 0.35, 0.5)


def select_capacity_frac(occupied_frac: float, margin: float = 1.3,
                         buckets=CAPACITY_BUCKETS) -> float:
    """Smallest capacity bucket ≥ margin × measured occupancy (static jit
    argument → at most len(buckets) executables). Above the last bucket,
    returns 0.5 — `_march_core2`'s overflow fallback degrades gracefully
    (ALU-only density, no sun term for the excess samples)."""
    need = occupied_frac * margin
    for b in buckets:
        if need <= b:
            return b
    return buckets[-1]


def v2_auto_policy(dirs, params: MarchParams, bp: BrickPack,
                   steps: int = 128, ray_stride: int = 2):
    """Scene-adaptive knobs for `march_bricks_v2`, measured once per
    cycle/scene (host-side; ~two prepass-scale device calls). Returns
    (ray_keep_frac, capacity_frac, t_cutoff, occupied_frac):

    - ray bucket from the cull-prepass keep fraction;
    - capacity bucket from the staged occupancy WITHIN kept rays;
    - occlusion cutoff enabled only when it shrinks the capacity bucket
      (the cutoff's dense cumprod pass costs ~40 ms/frame at bench scale —
      pure tax on thin scenes, large capacity win on overcast ones).

    The same policy is exercised by the quality gates in
    tests/test_bench_config.py and shipped by bench.py / bench/sweep.py."""
    keep = float(ray_keep_fraction(dirs, params, bp, steps=steps,
                                   ray_stride=ray_stride))
    rk = select_ray_keep_frac(keep)
    occ_plain = float(occupied_sample_fraction(dirs, params, bp,
                                               t_cutoff=0.0))
    occ_cut = float(occupied_sample_fraction(dirs, params, bp))
    cap_plain = select_capacity_frac(occ_plain / max(rk, 1e-6))
    cap_cut = select_capacity_frac(occ_cut / max(rk, 1e-6))
    if cap_cut < cap_plain:
        return rk, cap_cut, 1e-4, occ_cut
    return rk, cap_plain, 0.0, occ_plain


@partial(jax.jit, static_argnames=("steps", "prepass_steps", "chunk",
                                   "ray_stride", "cell_margin",
                                   "prepass_margin"))
def cull_cell_stats(dirs, params: MarchParams, bp: BrickPack,
                    steps: int = 128, prepass_steps: int = 32,
                    chunk: int = 32768, ray_stride: int = 2,
                    cell_margin: float = 0.1, prepass_margin: float = 0.02):
    """(keep_frac, cell_frac) for sizing `march_bricks_v3`'s buckets: the
    cull-prepass ray keep fraction (as `ray_keep_fraction`) and the mean
    dilated-live-CELL fraction over all rays — both from the kernel's own
    `_cull_prepass`, so the buckets cover exactly what the kernel gates.
    One prepass-scale device call; parameters are frozen per cycle
    (FrameData semantics), so call once per cycle / scene."""
    dirs = jnp.asarray(dirs, jnp.float32)
    shape = dirs.shape[:-1]
    flat = dirs.reshape(-1, 3)
    above, ndir, ss, p0, _, _ = _ray_setup(flat, params, steps)
    prio, occ_cells, meta = _cull_prepass(
        above, ndir, ss, p0, params, bp, steps, prepass_steps,
        min(chunk, max(flat.shape[0], 1)),
        shape if len(shape) == 2 else None, ray_stride, cell_margin)
    keep = jnp.mean((prio > -prepass_margin).astype(jnp.float32))
    if meta is not None and meta[2] > 1:
        gh, gw, stride = meta
        o = occ_cells.reshape(gh, 1, gw, 1, -1)
        occ_full = jnp.broadcast_to(
            o, (gh, stride, gw, stride, o.shape[-1])
        ).reshape(flat.shape[0], -1)
    else:
        occ_full = occ_cells
    live = occ_full & above[:, None]
    return keep, jnp.mean(live.astype(jnp.float32))


CELL_BUCKETS = (0.1, 0.125, 0.15, 0.175, 0.2, 0.225, 0.25, 0.275, 0.3,
                0.325, 0.35, 0.375, 0.4, 0.45, 0.5, 0.55, 0.6, 0.65, 0.7,
                0.8, 0.9, 1.0)


def select_cell_keep_frac(cell_frac: float, margin: float = 1.12,
                          buckets=CELL_BUCKETS) -> float:
    """Smallest cell-capacity bucket ≥ margin × measured live-cell fraction
    (static jit argument). The buckets are FINE (0.025-0.05 steps): every
    live-proportional stream (geometry, weather, pre, hot machinery) pays
    the whole capacity including fill slots, so bucket overshoot is a
    direct multiplier on the frame (measured: bucket 0.8 at live 0.56 cost
    ~8% of the headline). A scene still touches one bucket (±1 across a
    cycle's wind drift). Overflow in `_march_core3` drops the
    highest-index live cells (no fallback — unlike core2's per-sample
    overflow the cell gate has no dense pre plane to fall back on), and
    the measured fraction is exact for the frozen cycle, so a 1.12 margin
    covers drift."""
    need = cell_frac * margin
    for b in buckets:
        if need <= b:
            return b
    return 1.0


@partial(jax.jit, static_argnames=("steps", "prepass_steps", "stride",
                                   "chunk"))
def hot_cell_fraction(dirs, params: MarchParams, bp: BrickPack,
                      steps: int = 128, prepass_steps: int = 32,
                      stride: int = 8, chunk: int = 16384):
    """Fraction of (ray, coarse-cell) blocks with any EXACT `pre > 0`
    sample — the quantity that sizes `_march_core3`'s hot sub-capacity.
    Probes every `stride`-th ray at the full fine step count (the hot
    predicate is exact, so only the ray subsample approximates)."""
    flat = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)[::stride]
    above, ndir, ss, p0, _, _ = _ray_setup(flat, params, steps)
    spc = steps // prepass_steps
    i_step = jnp.arange(1, steps + 1, dtype=jnp.float32)

    def dense_chunk(args):
        p0c, ndirc, ssc = args
        tt = ssc[:, None] * i_step[None, :]
        px = p0c[:, 0, None] + ndirc[:, 0, None] * tt
        py = p0c[:, 1, None] + ndirc[:, 1, None] * tt
        pz = p0c[:, 2, None] + ndirc[:, 2, None] * tt
        w = _weather_rb_xy(bp, px, pz, params.weather_pos)
        pre_c, _ = _density_pre_xyz(px, py, pz, w, 0.0, params, bp)
        return pre_c > 0.0

    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    nr = flat.shape[0]
    ch = min(chunk, max(nr, 1))
    occ = jax.lax.map(dense_chunk, (
        _pad_blocks(p0, ch, up * GROUND_RADIUS),
        _pad_blocks(ndir, ch, up),
        _pad_blocks(ss, ch, jnp.float32(1.0)),
    )).reshape(-1, steps)[:nr]
    hot = jnp.any(occ.reshape(nr, prepass_steps, spc), axis=2) \
        & above[:, None]
    return jnp.mean(hot.astype(jnp.float32))


def v3_auto_policy(dirs, params: MarchParams, bp: BrickPack,
                   steps: int = 128, ray_stride: int = 2,
                   cell_margin: float = 0.1, prepass_steps: int = 32):
    """Scene-adaptive knobs for `march_bricks_v3`, measured once per
    cycle/scene (host-side; two probe-scale device calls). Returns
    (ray_keep_frac, cell_keep_frac, hot_keep_frac, cell_frac, hot_frac):

    - ray bucket from the cull keep fraction (as `v2_auto_policy`);
    - live-cell bucket from the dilated-live-cell fraction WITHIN the
      kept-ray capacity (cell_frac / ray bucket — kept rays hold ≥ the
      live cells of dropped ones up to the margin band);
    - hot bucket from the exact occupied-cell fraction within the live
      capacity, margin 1.5 (overflow drops hot cells with no fallback)."""
    keep, cell_frac = (float(v) for v in cull_cell_stats(
        dirs, params, bp, steps=steps, ray_stride=ray_stride,
        cell_margin=cell_margin, prepass_steps=prepass_steps))
    hot_frac = float(hot_cell_fraction(dirs, params, bp, steps=steps,
                                       prepass_steps=prepass_steps))
    rk = select_ray_keep_frac(keep)
    ck = select_cell_keep_frac(cell_frac / max(rk, 1e-6))
    hk = select_cell_keep_frac(hot_frac / max(rk * ck, 1e-6), margin=1.2)
    return rk, ck, hk, cell_frac, hot_frac


@partial(jax.jit, static_argnames=("steps", "light_steps", "chunk",
                                   "cell_keep_frac", "cone_res",
                                   "ray_keep_frac", "prepass_steps",
                                   "ray_stride", "cell_margin",
                                   "hot_keep_frac", "debug_stage",
                                   "axis_name", "accum"))
def march_bricks_v3(dirs, params: MarchParams, bp: BrickPack, sky_lut_img,
                    steps: int = 128, light_steps: int = 6,
                    chunk: int = 32768, cell_keep_frac: float = 0.5,
                    cone_cache: "ConeCache | None" = None,
                    cone_res=(32, 512, 512),
                    ray_keep_frac: float | None = None,
                    prepass_steps: int = 32, ray_stride: int = 1,
                    cell_margin: float = 0.1, hot_keep_frac: float = 0.5,
                    debug_stage: int = 0, axis_name: str | None = None,
                    accum: str = "segmented"):
    """Window-staged fast march (the v3 headline path): `_march_core3` over
    world directions — v2's staged machinery with the dense phase replaced
    by coarse-cell-gated sample compaction from the shared cull prepass.
    Position-matched to `march_bricks` / `march_bricks_v2` (identical fine
    sample placement); the cell gate's conservatism is margin+dilation
    (gated ≥ 40 dB in tests/test_march_v3.py). Size the buckets with
    `v3_auto_policy`.

    axis_name (inside `shard_map` only): dirs' ROW axis is sharded over
    that mesh axis — the prepass dilations halo-exchange one boundary row
    over ICI (`_halo_rows`) so the cell gate is BITWISE the unsharded
    gate (no whole-ray/whole-cell decision depends on the sharding).
    Rendered values are tolerance-equal, not bitwise: XLA's SPMD
    compilation makes different fma-contraction choices inside a
    shard_map body (≤ ~1e-2 on the image through the exp accumulation —
    tests/test_sharding.py). Capacities size per shard; keep the buckets
    overflow-free for that equivalence."""
    dirs = jnp.asarray(dirs, jnp.float32)
    shape = dirs.shape[:-1]
    flat = dirs.reshape(-1, 3)
    n = flat.shape[0]
    atmos = ambient_colors(params, sky_lut_img)
    if cone_cache is None:
        cone_cache = build_cone_cache(params, bp, light_steps, res=cone_res,
                                      chunk=min(chunk, max(n, 1)))
    above, ndir, ss, p0, phase, _ = _ray_setup(flat, params, steps)
    out = _march_core3(above, ndir, ss, p0, phase, params, bp, atmos,
                       steps, min(chunk, max(n, 1)), cell_keep_frac,
                       cone_cache, ray_keep_frac, prepass_steps,
                       shape if len(shape) == 2 else None, ray_stride,
                       cell_margin, hot_keep_frac, debug_stage, axis_name,
                       accum)
    return out.reshape(shape + (4,))


def _march_core_dense(above, ndir, ss, p0, phase, params: MarchParams,
                      bp: BrickPack, atmos, steps: int, chunk: int,
                      cone_cache: "ConeCache"):
    """Machinery-free staged march: exactly `_march_core2`'s per-sample
    math (weather row + large-noise pre + staged-erosion semantics + cone
    cache) evaluated DENSELY on every (ray, step) sample — no prepass, no
    ray cull, no compaction, no scatters. Below the measured tile-scale
    crossover (docs/PERF_NOTES.md round 4) the capacity machinery's fixed
    cost exceeds the gather rows it saves, so this is the serving-tile
    arm of the "fast3" engine kernel (the reference's own operating point:
    one 96² tile × 128 steps per frame, `cloud_sky/cloud_sky.gd:83,111`).

    Matches `_march_core2` at ample capacity with culling off and
    weather_every=1 to ulp-level fusion noise (≤4e-7 observed — XLA builds
    different fma/reduction trees for the dense-plane vs compacted-list
    forms; tests/test_tile_dense.py): `t` is zero wherever `pre ≤ 0`
    (erosion only reduces density), `cd` is masked by `t > 0` — the same
    selects core2 applies on its compacted list."""
    n = ndir.shape[0]
    lss = (SKY_T_RADIUS - SKY_B_RADIUS) / 64.0
    i_step = jnp.arange(1, steps + 1, dtype=jnp.float32)

    def _pos(p0c, ndirc, ssc):
        tt = ssc[:, None] * i_step[None, :]
        return (p0c[:, 0, None] + ndirc[:, 0, None] * tt,
                p0c[:, 1, None] + ndirc[:, 1, None] * tt,
                p0c[:, 2, None] + ndirc[:, 2, None] * tt)

    # One single-gather-stream pass per texture (weather → pre → erosion →
    # cone), positions recomputed per pass (pure ALU — free next to gather
    # issue): the interleaved-stream penalty rule, docs/PERF_NOTES.md.
    def weather_chunk(args):
        p0c, ndirc, ssc = args
        px, _, pz = _pos(p0c, ndirc, ssc)
        w = _weather_rb_xy(bp, px, pz, params.weather_pos)
        return w[..., 0], w[..., 1]

    def pre_chunk(args):
        p0c, ndirc, ssc, wrc, wbc = args
        px, py, pz = _pos(p0c, ndirc, ssc)
        weather = jnp.stack([wrc, wbc], axis=-1)
        return _density_pre_xyz(px, py, pz, weather, 0.0, params, bp)

    def erosion_chunk(args):
        p0c, ndirc, ssc, prec, hfc = args
        px, py, pz = _pos(p0c, ndirc, ssc)
        t_c = _density_finish_xyz(prec, hfc, px, py, pz, 0.0, params, bp)
        return jnp.where(prec > 0.0, t_c, 0.0)

    def cone_chunk(args):
        p0c, ndirc, ssc, tc = args
        px, py, pz = _pos(p0c, ndirc, ssc)
        qx, qz, qh = _cone_cache_coords_xyz(px, py, pz, cone_cache.extent)
        cd_c = sample_brick3_xyz(cone_cache.table, qx, qz, qh)[..., 0]
        return jnp.where(tc > 0.0, cd_c, 0.0)

    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    blocks = (
        _pad_blocks(p0, chunk, up * GROUND_RADIUS),
        _pad_blocks(ndir, chunk, up),
        _pad_blocks(ss, chunk, jnp.float32(1.0)),
    )
    w_r, w_b = jax.lax.map(weather_chunk, blocks)
    pre, hf = jax.lax.map(pre_chunk, blocks + (w_r, w_b))
    t = jax.lax.map(erosion_chunk, blocks + (pre, hf))
    cd = jax.lax.map(cone_chunk, blocks + (t,))

    def _sl(a):
        return a.reshape(-1, steps)[:n]

    return _accumulate_phase3(_sl(t), _sl(cd), _sl(hf), ss, phase, above,
                              params, atmos, lss, steps, chunk)


@partial(jax.jit, static_argnames=("steps", "light_steps", "chunk",
                                   "cone_res"))
def march_tile_dense(dirs, params: MarchParams, bp: BrickPack, sky_lut_img,
                     steps: int = 128, light_steps: int = 6,
                     chunk: int = 16384,
                     cone_cache: "ConeCache | None" = None,
                     cone_res=(32, 512, 512)):
    """Dense small-tile march (`_march_core_dense` over world directions):
    the serving-tile arm of the engine's "fast3" kernel. Same per-sample
    values as `march_bricks_v2` with culling off at ample capacity
    (tests/test_tile_dense.py); use the v2/v3 paths above the tile-scale
    crossover where the capacity machinery pays for itself."""
    dirs = jnp.asarray(dirs, jnp.float32)
    shape = dirs.shape[:-1]
    flat = dirs.reshape(-1, 3)
    n = flat.shape[0]
    atmos = ambient_colors(params, sky_lut_img)
    if cone_cache is None:
        cone_cache = build_cone_cache(params, bp, light_steps, res=cone_res,
                                      chunk=min(chunk, max(n, 1)))
    above, ndir, ss, p0, phase, _ = _ray_setup(flat, params, steps)
    out = _march_core_dense(above, ndir, ss, p0, phase, params, bp, atmos,
                            steps, min(chunk, max(n, 1)), cone_cache)
    return out.reshape(shape + (4,))


@partial(jax.jit, static_argnames=("steps", "light_steps", "chunk",
                                   "capacity_frac", "weather_every",
                                   "cone_res", "ray_keep_frac",
                                   "prepass_steps", "ray_stride", "t_cutoff"))
def march_bricks_v2(dirs, params: MarchParams, bp: BrickPack, sky_lut_img,
                    steps: int = 128, light_steps: int = 6,
                    chunk: int = 32768, capacity_frac: float = 0.25,
                    weather_every: int = 1,
                    cone_cache: "ConeCache | None" = None,
                    cone_res=(32, 512, 512),
                    ray_keep_frac: float | None = None,
                    prepass_steps: int = 32, ray_stride: int = 1,
                    t_cutoff: float = 1e-4, cull_prio=None):
    """Row-lean fast march (headline path): `_march_core2` over world
    directions. Builds the per-cycle cone cache inline when not supplied.
    Position-matched to `march_bricks` (same sample placement); the
    approximations (weather lerp, staged erosion, cached cone density,
    optional ray culling) are each gated ≥ 40 dB in tests/test_march_v2.py.

    With ray culling on (`ray_keep_frac < 1`), `capacity_frac` is a fraction
    of the COMPACTED total (ray_keep_frac·n·steps) — size it from the
    occupied fraction WITHIN kept rays (≈ occupied_sample_fraction /
    keep bucket)."""
    dirs = jnp.asarray(dirs, jnp.float32)
    shape = dirs.shape[:-1]
    flat = dirs.reshape(-1, 3)
    n = flat.shape[0]
    atmos = ambient_colors(params, sky_lut_img)
    if cone_cache is None:
        cone_cache = build_cone_cache(params, bp, light_steps, res=cone_res,
                                      chunk=min(chunk, max(n, 1)))
    above, ndir, ss, p0, phase, _ = _ray_setup(flat, params, steps)
    out = _march_core2(above, ndir, ss, p0, phase, params, bp, atmos,
                       steps, min(chunk, max(n, 1)), capacity_frac,
                       cone_cache, weather_every, ray_keep_frac,
                       prepass_steps, shape if len(shape) == 2 else None,
                       ray_stride, t_cutoff, cull_prio)
    return out.reshape(shape + (4,))


def _hier_windows(flat, params: MarchParams, bp: BrickPack, steps: int,
                  coarse_steps: int, chunk: int, occupancy_margin: float):
    """Hierarchical window setup shared by `march_hierarchical` (v1 core)
    and `march_hierarchical_v3`: per-ray occupied t-window [a, b] on the
    shell segment from `coarse_steps` pre-erosion mip-2 density probes,
    dilated one coarse cell and padded by `occupancy_margin` (conservative
    — pre only shrinks under erosion, so a window that the dilated margin
    marks empty is exactly empty at mip 0 wherever the mip-2 probe bounds
    the field; gated vs a 512-step converged march in
    tests/test_hierarchical.py).

    Returns (above, ndir, phase, ldir, start, shelldist, a, b, any_occ),
    all per-ray over the FULL grid (callers compact or cull as they
    choose). Elementwise identical to the former inline phase 1 of
    `march_hierarchical` (bitwise — tests gate banded ≡ monolithic)."""
    n = flat.shape[0]
    above, ndir, ss, _, phase, ldir = _ray_setup(flat, params, steps)
    shelldist = ss * steps
    # _ray_setup's p0 includes the jitter; recover the shell entry point
    # for windowing.
    cam = jnp.array([0.0, GROUND_RADIUS, 0.0], jnp.float32)
    cam_b = jnp.broadcast_to(cam, ndir.shape)
    start = cam + ndir * m.intersect_sphere_far(cam_b, ndir, SKY_B_RADIUS)[..., None]

    # ---- 1. Coarse occupancy (chunked).
    xz = jnp.array([0, 2])
    k_c = (jnp.arange(coarse_steps, dtype=jnp.float32) + 0.5) / coarse_steps

    def coarse_chunk(args):
        startc, ndirc, sdc = args
        p = startc[:, None, :] + ndirc[:, None, :] * (sdc[:, None] * k_c[None, :])[..., None]
        weather = _weather_rb(bp, p[..., xz], params.weather_pos)
        pre, _ = _density_pre(p, weather, 2.0, params, bp)
        return pre

    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    blocks = (
        _pad_blocks(start, chunk, up * GROUND_RADIUS),
        _pad_blocks(ndir, chunk, up),
        _pad_blocks(shelldist, chunk, jnp.float32(1.0)),
    )
    pre_c = jax.lax.map(coarse_chunk, blocks).reshape(-1, coarse_steps)[:n]

    occ = pre_c > -occupancy_margin
    # One-cell dilation (zero-padded shifts — no wrap-around).
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
    return above, ndir, phase, ldir, start, shelldist, a, b, any_occ


def _hier_window_lattice(flat, params: MarchParams, bp: BrickPack,
                         steps: int, coarse_steps: int, chunk: int,
                         occupancy_margin: float):
    """Window-adjusted fine march lattice over the FULL grid (no
    compaction): per-ray step size / jittered origin on the occupied
    [a, b] window. Returns (above_w, ndir, ss_w, p0_w, phase) with
    above_w = above & any_occ (empty-window rays are definitively dead —
    same zero output as `march_hierarchical`'s non-compacted rays).
    Elementwise identical to v1's post-compaction window math."""
    above, ndir, phase, _, start, shelldist, a, b, any_occ = _hier_windows(
        flat, params, bp, steps, coarse_steps, chunk, occupancy_margin)
    ss_w = (b - a) * shelldist / steps
    jitter = m.hash_iq(start * 10.0)  # same per-texel dither source
    p0_w = start + ndir * (a * shelldist + jitter * ss_w)[..., None]
    return above & any_occ, ndir, ss_w, p0_w, phase


@partial(jax.jit, static_argnames=("steps", "light_steps", "coarse_steps",
                                   "chunk", "capacity_frac", "t_cutoff",
                                   "ray_capacity_frac", "approx_light"))
def march_hierarchical(dirs, params: MarchParams, bp: BrickPack, sky_lut_img,
                       steps: int = 128, light_steps: int = 6,
                       coarse_steps: int = 16, chunk: int = 16384,
                       capacity_frac: float = 0.25, t_cutoff: float = 1e-4,
                       ray_capacity_frac: float = 1.0,
                       occupancy_margin: float = 0.3,
                       approx_light: bool = False,
                       cone_cache: "ConeCache | None" = None):
    """Hierarchical raymarch (BASELINE config 5, the reference's TODO #1).

    1. Coarse pass: `coarse_steps` pre-erosion density probes per ray at
       mip 2 (32³ large-noise table + weather only) → per-coarse-cell
       occupancy, dilated by one cell and padded by `occupancy_margin` for
       conservatism.
    2. Ray compaction: rays with an empty window (no cloud anywhere on the
       shell segment, or below horizon) skip the fine march entirely.
    3. Adaptive fine march: the full `steps` budget is re-distributed over
       each surviving ray's occupied [a, b] t-window — empty-space skipping
       with *more* effective resolution inside clouds than the fixed-step
       reference (its "fewer steps towards horizon" comment never shipped).

    Approximate by construction (sample placement differs from the fixed-step
    reference). Quality gates (tests/test_hierarchical.py): ≥ 40 dB vs a
    512-step converged `march_bricks` at the config-5 operating point
    (128 steps, coarse_steps=32, the sweep's cone cache), and never more
    than 1 dB behind the fixed-step march at equal 64-step budget.

    ray_capacity_frac sizes the compacted ray list as a fraction of all rays.
    The default 1.0 can never overflow. Lowering it buys speed on sparse
    scenes but has a CLIFF: if more than that fraction of rays have occupied
    windows (e.g. full overcast — the hemi-oct map is all above-horizon
    texels), the overflowed rays are dropped from the fine march and render
    BLACK. Only lower it when the scene's occupancy is known and bounded.
    """
    dirs = jnp.asarray(dirs, jnp.float32)
    shape = dirs.shape[:-1]
    flat = dirs.reshape(-1, 3)
    n = flat.shape[0]
    atmos = ambient_colors(params, sky_lut_img)

    above, ndir, phase, ldir, start, shelldist, a, b, any_occ = \
        _hier_windows(flat, params, bp, steps, coarse_steps, chunk,
                      occupancy_margin)

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

    # ---- 3. Window-adjusted fine march through the shared compacted core.
    ss_r = (b_r - a_r) * sd_r / steps
    jitter = m.hash_iq(start_r * 10.0)  # same per-texel dither source
    p0_r = start_r + ndir_r * (a_r * sd_r + jitter * ss_r)[..., None]

    out_r = _march_core(above_r, ndir_r, ss_r, p0_r, phase_r, ldir, params,
                        bp, atmos, steps, light_steps, chunk, capacity_frac,
                        t_cutoff, approx_light, cone_cache)

    out = jnp.zeros((n, 4), jnp.float32).at[ridx].set(
        out_r, mode="drop", indices_are_sorted=True, unique_indices=True,
    )
    return out.reshape(shape + (4,))


def march_hierarchical_banded(dirs, *args, bands: int = 4, **kwargs):
    """`march_hierarchical` streamed over `bands` horizontal row bands, one
    dispatch each (rays are independent, so the banded render is the
    monolithic render — tests/test_hierarchical.py gates equality).

    Caps peak HBM at ~1/bands of the monolithic call's [n, steps] planes
    and global compaction buffers, which is what lets BASELINE config 5's
    2M-ray fine phase run beside the full-resolution (32, 512, 512)
    cone-density cache (VERDICT r2 #3 — the monolithic 2048×1024 call OOMs
    v5e HBM with that cache). All bands share one jit executable (same
    shapes). dirs must be [H, W, 3] with H % bands == 0.

    Capacity semantics: `capacity_frac` / `ray_capacity_frac` pools are
    per-band, so under OVERFLOW the dropped samples differ from the
    monolithic call (which pools globally); at non-overflowing capacity the
    two are bitwise-identical (tested)."""
    H = dirs.shape[0]
    assert H % bands == 0, f"rows {H} not divisible by bands {bands}"
    rows = H // bands
    outs = [march_hierarchical(dirs[i * rows:(i + 1) * rows], *args, **kwargs)
            for i in range(bands)]
    return jnp.concatenate(outs, axis=0)


@partial(jax.jit, static_argnames=("steps", "light_steps", "coarse_steps",
                                   "chunk", "cell_keep_frac", "hot_keep_frac",
                                   "ray_keep_frac", "prepass_steps",
                                   "ray_stride", "cell_margin", "cone_res",
                                   "occupancy_margin", "accum"))
def march_hierarchical_v3(dirs, params: MarchParams, bp: BrickPack,
                          sky_lut_img, steps: int = 128,
                          light_steps: int = 6, coarse_steps: int = 32,
                          chunk: int = 32768, cell_keep_frac: float = 0.5,
                          hot_keep_frac: float = 0.5,
                          ray_keep_frac: float | None = None,
                          cone_cache: "ConeCache | None" = None,
                          cone_res=(32, 512, 512), prepass_steps: int = 32,
                          ray_stride: int = 1, cell_margin: float = 0.1,
                          occupancy_margin: float = 0.3,
                          accum: str = "segmented"):
    """Hierarchical march through the v3 cell-gated core (VERDICT r4 #1:
    BASELINE config 5 fed the machinery that bought 2-5× on configs 2-4).

    Phase 1 is `march_hierarchical`'s coarse window probe — the adaptive
    re-distribution of the full `steps` budget over each ray's occupied
    [a, b] t-window (the reference's own top TODO,
    `/root/reference/README.md:28`), which is what holds ≥ 40 dB against a
    512-step converged march at 128 steps. The fine phase then runs
    `_march_core3` ON THE WINDOW LATTICE instead of the v1 compacted core:

    - the stride-`ray_stride` cull prepass probes the window-adjusted
      steps, so its per-(ray, cell) grid refines WITH the window — cells
      cover occupied shell, not empty sky;
    - the ray cull replaces v1's explicit `any_occ` compaction: an
      empty-window ray collapses to a 1-coarse-cell sliver at shell exit,
      scores prio ≤ −margin, and drops in the bucketed ray select
      (`above & any_occ` additionally hard-kills its cell rows);
    - the cell gate removes the occupancy GAPS inside wide windows (patchy
      clouds along a ray) that the single [first, last] window cannot
      clip, and the hot sub-compaction confines erosion + cone gathers to
      exactly-occupied cells.

    Size the buckets with `hier_v3_auto_policy` (window-lattice stats —
    the standard-lattice `v3_auto_policy` undercounts live cells because
    windows concentrate cells inside clouds). Banded form:
    `march_hierarchical_v3_banded` (HBM cap at config-5 scale).

    ray_stride defaults to 1 here (the standard-lattice v3 ships stride
    2): on the window lattice cell k spans a DIFFERENT t-range per ray
    (each ray has its own [a, b]), so inheriting a stride-neighbor's
    cell-occupancy row mismarks cells dead — measured 37.0 dB at stride
    2 vs 41.5 at stride 1 on the config-5 scene, independent of every
    capacity knob (round-5 isolation, docs/PERF_NOTES.md)."""
    dirs = jnp.asarray(dirs, jnp.float32)
    shape = dirs.shape[:-1]
    flat = dirs.reshape(-1, 3)
    n = flat.shape[0]
    atmos = ambient_colors(params, sky_lut_img)
    if cone_cache is None:
        cone_cache = build_cone_cache(params, bp, light_steps, res=cone_res,
                                      chunk=min(chunk, max(n, 1)))
    above_w, ndir, ss_w, p0_w, phase = _hier_window_lattice(
        flat, params, bp, steps, coarse_steps, chunk, occupancy_margin)
    out = _march_core3(above_w, ndir, ss_w, p0_w, phase, params, bp, atmos,
                       steps, min(chunk, max(n, 1)), cell_keep_frac,
                       cone_cache, ray_keep_frac, prepass_steps,
                       shape if len(shape) == 2 else None, ray_stride,
                       cell_margin, hot_keep_frac, 0, None, accum)
    return out.reshape(shape + (4,))


def march_hierarchical_v3_banded(dirs, *args, bands: int = 4, **kwargs):
    """`march_hierarchical_v3` streamed over `bands` horizontal row bands
    (HBM cap, as `march_hierarchical_banded`). Unlike the v1 banded form,
    banded is NOT bitwise the monolithic render: the prepass's 3×3 ray
    dilation and the stride-2 priority upsample see only in-band neighbor
    rows (2 boundary rows per band seam lose cross-band dilation), and
    capacity pools are per-band. The config-5 acceptance is therefore a
    direct PSNR gate on the banded render vs the converged ground truth
    (tests/test_hierarchical.py)."""
    H = dirs.shape[0]
    assert H % bands == 0, f"rows {H} not divisible by bands {bands}"
    rows = H // bands
    outs = [march_hierarchical_v3(dirs[i * rows:(i + 1) * rows], *args,
                                  **kwargs)
            for i in range(bands)]
    return jnp.concatenate(outs, axis=0)


@partial(jax.jit, static_argnames=("steps", "coarse_steps", "prepass_steps",
                                   "chunk", "ray_stride", "cell_margin",
                                   "prepass_margin", "occupancy_margin"))
def _hier_cull_cell_stats(dirs, params: MarchParams, bp: BrickPack,
                          steps: int = 128, coarse_steps: int = 32,
                          prepass_steps: int = 32, chunk: int = 32768,
                          ray_stride: int = 1, cell_margin: float = 0.1,
                          prepass_margin: float = 0.02,
                          occupancy_margin: float = 0.3):
    """`cull_cell_stats` on the hierarchical WINDOW lattice: (keep_frac,
    cell_frac) from `_cull_prepass` over the window-adjusted steps — the
    stats that size `march_hierarchical_v3`'s buckets (the standard
    lattice undercounts: windows concentrate cells inside clouds)."""
    dirs = jnp.asarray(dirs, jnp.float32)
    shape = dirs.shape[:-1]
    flat = dirs.reshape(-1, 3)
    n = flat.shape[0]
    above_w, ndir, ss_w, p0_w, _ = _hier_window_lattice(
        flat, params, bp, steps, coarse_steps, min(chunk, max(n, 1)),
        occupancy_margin)
    prio, occ_cells, meta = _cull_prepass(
        above_w, ndir, ss_w, p0_w, params, bp, steps, prepass_steps,
        min(chunk, max(n, 1)), shape if len(shape) == 2 else None,
        ray_stride, cell_margin)
    keep = jnp.mean((prio > -prepass_margin).astype(jnp.float32))
    if meta is not None and meta[2] > 1:
        gh, gw, stride = meta
        o = occ_cells.reshape(gh, 1, gw, 1, -1)
        occ_full = jnp.broadcast_to(
            o, (gh, stride, gw, stride, o.shape[-1])
        ).reshape(n, -1)
    else:
        occ_full = occ_cells
    live = occ_full & above_w[:, None]
    return keep, jnp.mean(live.astype(jnp.float32))


@partial(jax.jit, static_argnames=("steps", "coarse_steps", "prepass_steps",
                                   "stride", "chunk", "occupancy_margin"))
def hier_hot_cell_fraction(dirs, params: MarchParams, bp: BrickPack,
                           steps: int = 128, coarse_steps: int = 32,
                           prepass_steps: int = 32, stride: int = 8,
                           chunk: int = 16384,
                           occupancy_margin: float = 0.3):
    """`hot_cell_fraction` on the hierarchical window lattice: fraction of
    (ray, coarse-cell) blocks with any exact `pre > 0` sample at the
    window-adjusted fine positions, probing every `stride`-th ray (the
    window math is per-ray elementwise, so the strided subset's windows
    match the full grid's)."""
    flat = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)[::stride]
    nr = flat.shape[0]
    ch = min(chunk, max(nr, 1))
    above_w, ndir, ss_w, p0_w, _ = _hier_window_lattice(
        flat, params, bp, steps, coarse_steps, ch, occupancy_margin)
    spc = steps // prepass_steps
    i_step = jnp.arange(1, steps + 1, dtype=jnp.float32)

    def dense_chunk(args):
        p0c, ndirc, ssc = args
        tt = ssc[:, None] * i_step[None, :]
        px = p0c[:, 0, None] + ndirc[:, 0, None] * tt
        py = p0c[:, 1, None] + ndirc[:, 1, None] * tt
        pz = p0c[:, 2, None] + ndirc[:, 2, None] * tt
        w = _weather_rb_xy(bp, px, pz, params.weather_pos)
        pre_c, _ = _density_pre_xyz(px, py, pz, w, 0.0, params, bp)
        return pre_c > 0.0

    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    occ = jax.lax.map(dense_chunk, (
        _pad_blocks(p0_w, ch, up * GROUND_RADIUS),
        _pad_blocks(ndir, ch, up),
        _pad_blocks(ss_w, ch, jnp.float32(1.0)),
    )).reshape(-1, steps)[:nr]
    hot = jnp.any(occ.reshape(nr, prepass_steps, spc), axis=2) \
        & above_w[:, None]
    return jnp.mean(hot.astype(jnp.float32))


def hier_v3_auto_policy(dirs, params: MarchParams, bp: BrickPack,
                        steps: int = 128, coarse_steps: int = 32,
                        ray_stride: int = 1, cell_margin: float = 0.1,
                        prepass_steps: int = 32, bands: int = 1):
    """Scene-adaptive knobs for `march_hierarchical_v3` — `v3_auto_policy`
    measured on the WINDOW lattice (two probe-scale device calls per
    cycle/scene, ×bands). Returns (ray_keep_frac, cell_keep_frac,
    hot_keep_frac, cell_frac, hot_frac). The live-cell fraction under
    windows runs well above the standard lattice's (windows remove the
    empty shell the cell gate would otherwise skim), so buckets sized by
    the standard policy would overflow and soft-drop far cells.

    bands > 1 sizes for `march_hierarchical_v3_banded`: capacity pools
    are PER BAND there, so each fraction must cover the densest band,
    not the global mean (global sizing measured 27.5 dB on config 5 —
    zenith-band overflow soft-dropped live rays; per-band-max restores
    the monolithic 41.5 dB, round-5 isolation in docs/PERF_NOTES.md).
    cell_frac/hot_frac returned are the per-band maxima."""
    H = dirs.shape[0]
    assert H % bands == 0, f"rows {H} not divisible by bands {bands}"
    rows = H // bands
    keep = cell_frac = hot_frac = 0.0
    for i in range(bands):
        band = dirs[i * rows:(i + 1) * rows]
        k, cf = (float(v) for v in _hier_cull_cell_stats(
            band, params, bp, steps=steps, coarse_steps=coarse_steps,
            ray_stride=ray_stride, cell_margin=cell_margin,
            prepass_steps=prepass_steps))
        hf = float(hier_hot_cell_fraction(
            band, params, bp, steps=steps, coarse_steps=coarse_steps,
            prepass_steps=prepass_steps))
        keep, cell_frac = max(keep, k), max(cell_frac, cf)
        hot_frac = max(hot_frac, hf)
    # Derive from the maxima: every band's pool is sized rk·ck(·hk) of
    # its rows, so covering the densest band covers them all.
    rk = select_ray_keep_frac(keep)
    ck = select_cell_keep_frac(cell_frac / max(rk, 1e-6))
    hk = select_cell_keep_frac(hot_frac / max(rk * ck, 1e-6), margin=1.2)
    return rk, ck, hk, cell_frac, hot_frac


@partial(jax.jit, static_argnames=("steps", "light_steps", "chunk", "compact",
                                   "capacity_frac", "t_cutoff", "approx_light",
                                   "cone_cache_res"))
def march_bricks(dirs, params: MarchParams, bp: BrickPack, sky_lut_img,
                 steps: int = 128, light_steps: int = 6, chunk: int = 16384,
                 compact: bool = True, capacity_frac: float = 0.25,
                 t_cutoff: float = 1e-4, approx_light: bool = False,
                 cone_cache: "ConeCache | None" = None,
                 cone_cache_res=None):
    """Fast march over world directions. dirs: [..., 3] → [..., 4].

    compact=True routes through the occupancy-compacted pipeline (see
    `_march_compact`); compact=False is the simple dense Phase A+B. chunk
    bounds peak HBM for the gather rows (chunk·steps·512 B per live gather
    buffer); all chunk loops run inside this jit via `lax.map` so the whole
    call is one dispatch.
    """
    dirs = jnp.asarray(dirs, jnp.float32)
    shape = dirs.shape[:-1]
    flat = dirs.reshape(-1, 3)
    n = flat.shape[0]

    atmos = ambient_colors(params, sky_lut_img)

    if cone_cache is None and cone_cache_res is not None:
        cone_cache = build_cone_cache(params, bp, light_steps,
                                      res=cone_cache_res,
                                      chunk=min(chunk, max(n, 1)))
    if compact:
        out = _march_compact(flat, params, bp, atmos, steps, light_steps,
                             min(chunk, max(n, 1)), capacity_frac, t_cutoff,
                             approx_light, cone_cache)
        return out.reshape(shape + (4,))

    if n <= chunk:
        out = _march_chunk(flat, params, bp, atmos, steps, light_steps)
        return out.reshape(shape + (4,))

    down = jnp.array([0.0, -1.0, 0.0], jnp.float32)
    blocks = _pad_blocks(flat, chunk, down)
    out = jax.lax.map(
        lambda d: _march_chunk(d, params, bp, atmos, steps, light_steps), blocks
    )
    out = out.reshape(-1, 4)[:n]
    return out.reshape(shape + (4,))
