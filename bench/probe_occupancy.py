"""Occupancy statistics for the bench scene (CPU, forced).

Measures how selective a *noise-only* conservative occupancy predicate is:

    pre > 0  ⟺  base·g > 1 - wc,   wc = cloud_coverage · weather.b ≤ cc
    ⇒  pre > 0  ⟹  base · g_ub(hf) > 1 - cc          (weather-free, exact)

where g_ub(h) = ss(0.01, 0.05, h) − ss(0.78, 1.0, h) upper-bounds the
height gradient over every cloud type (edges are the per-parameter extremes
of the three gradient tables; smoothstep is monotone in its edges).

If P(candidate) ≪ 1, the dense weather fetch (1 gather row per (ray, step)
sample = half the dense-phase rows) can be staged behind this predicate —
an EXACT restructuring, no quality cost.

Also reports per-ray-segment candidate occupancy for K ∈ {4, 8, 16} fine
steps per segment (ceiling for segment-level skipping of the large fetch).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from cloudscape_tpu.models.density import MarchParams
    from cloudscape_tpu.models.march_fast import (
        BrickPack, _density_pre_xyz, _ray_setup, _weather_rb_xy,
    )
    from cloudscape_tpu.models.packs import reference_noise_pack
    from cloudscape_tpu.ops import math as m
    # repo-root bench.py (the module shadows the bench/ namespace dir)
    from bench import hemisphere_dirs  # type: ignore[attr-defined]

    noise = reference_noise_pack()
    bricks = BrickPack.from_noise(noise)
    sun = np.array([0.3, 0.4, -0.85])
    sun /= np.linalg.norm(sun)
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]),
        detailed_pos=np.array([0.4, 0.2]),
        weather_pos=np.array([0.01, 0.02]),
        time=12.5,
        cloud_coverage=0.35,
        light_direction=sun,
        ground_color=np.array([0.27, 0.19, 0.027]),
    )

    # Subsampled bench ray grid (statistics only).
    dirs = hemisphere_dirs(1024, 512)[::8, ::16].reshape(-1, 3)
    steps = 128
    above, ndir, ss, p0, _, _ = _ray_setup(jnp.asarray(dirs), params, steps)
    i_step = jnp.arange(1, steps + 1, dtype=jnp.float32)
    tt = ss[:, None] * i_step[None, :]
    px = p0[:, 0, None] + ndir[:, 0, None] * tt
    py = p0[:, 1, None] + ndir[:, 1, None] * tt
    pz = p0[:, 2, None] + ndir[:, 2, None] * tt

    weather = _weather_rb_xy(bricks, px, pz, params.weather_pos)
    pre, hf = _density_pre_xyz(px, py, pz, weather, 0.0, params, bricks)
    occupied = np.asarray((pre > 0.0) & above[:, None])

    # Weather-free candidate predicate.
    from cloudscape_tpu.config import SKY_B_RADIUS, SKY_T_RADIUS  # noqa

    offset = 20.0 * params.cloud_pos * 0.6
    bx = px + offset[0]
    bz = pz + offset[1]
    from cloudscape_tpu.models.march_fast import _sample_volume_xyz

    n = _sample_volume_xyz(bricks.large[0], bx * 0.00008, py * 0.00008,
                           bz * 0.00008)
    base = m.remap(n[..., 0], -(1.0 - n[..., 1]), 1.0, 0.0, 1.0)
    g_ub = m.smoothstep(0.01, 0.05, hf) - m.smoothstep(0.78, 1.0, hf)
    cand = np.asarray(
        (base * g_ub > 1.0 - params.cloud_coverage) & above[:, None]
    )

    # Numeric (tight) g_max over cloud_type, for reference.
    gm = jnp.zeros_like(hf)
    for ct in np.linspace(0.0, 1.0, 17):
        gm = jnp.maximum(gm, m.density_height_gradient(hf, jnp.float32(ct)))
    cand_tight = np.asarray(
        (base * gm > 1.0 - params.cloud_coverage) & above[:, None]
    )

    miss = occupied & ~cand
    print(f"samples: {occupied.size}  above-horizon: "
          f"{np.asarray(above).mean():.3f}")
    print(f"P(pre>0)            = {occupied.mean():.4f}")
    print(f"P(candidate, g_ub)  = {cand.mean():.4f}")
    print(f"P(candidate, tight) = {cand_tight.mean():.4f}")
    print(f"conservativeness: occupied&!cand = {miss.mean():.6f} (must be 0)")

    # Segment-level candidate occupancy (ceiling for coarse skipping).
    for K in (4, 8, 16):
        seg = cand.reshape(cand.shape[0], steps // K, K).any(axis=2)
        print(f"K={K:2d}: P(segment has candidate) = {seg.mean():.4f}")

    # ---- RAY-level stats (ceiling for whole-ray culling: a skipped ray
    # costs per-RAY machinery only — the [n, steps] planes make ray
    # gather/scatter a 128-lane-row op).
    ray_occ = occupied.any(axis=1)
    ray_cand = cand.any(axis=1)
    print(f"P(ray has occupied sample)  = {ray_occ.mean():.4f}")
    print(f"P(ray has noise-candidate)  = {ray_cand.mean():.4f}")
    # Conservative ray bound quality: rays kept by cand but actually empty.
    print(f"P(cand-kept ray is empty)   = "
          f"{(ray_cand & ~ray_occ).mean():.4f}")
    # Coarse prepass ceiling: a 16-point subsampled EXACT pre>0 probe
    # (not conservative — measures how much a point-sampled prepass misses).
    for C in (8, 16, 32):
        sub = occupied[:, ::steps // C]
        rs = sub.any(axis=1)
        miss_r = (ray_occ & ~rs)
        # severity: occupied samples on missed rays / all occupied samples
        sev = occupied[miss_r].sum() / max(occupied.sum(), 1)
        print(f"coarse{C:3d}-pt exact prepass: keeps {rs.mean():.4f} of rays,"
              f" misses {miss_r.mean():.4f} of rays"
              f" ({sev:.5f} of occupied samples)")

    # ---- Inverted staging: weather-only predicate for the LARGE fetch.
    # pre > 0 ⟺ base·g > 1−wc with base ≤ b_ub (global, monotone in
    # (r↑, fbm↓) so the per-texel extremes bound every trilinear sample).
    la = np.asarray(noise.large[0])
    r_max = float(la[..., 0].max())
    fbm = la[..., 1] * 0.625 + la[..., 2] * 0.25 + la[..., 3] * 0.125
    f_min = float(fbm.min())
    b_ub = (r_max + 1.0 - f_min) / (2.0 - f_min)
    g = m.density_height_gradient(hf, weather[..., 0])
    wc = params.cloud_coverage * weather[..., 1]
    wcand = np.asarray((g * b_ub > 1.0 - wc) & above[:, None])
    wmiss = occupied & ~wcand
    print(f"b_ub = {b_ub:.4f} (r_max {r_max:.3f}, fbm_min {f_min:.3f})")
    print(f"P(weather-candidate) = {wcand.mean():.4f}")
    print(f"conservativeness: occupied&!wcand = {wmiss.mean():.6f} (must be 0)")
    for K in (4, 8, 16):
        seg = wcand.reshape(wcand.shape[0], steps // K, K).any(axis=2)
        print(f"K={K:2d}: P(segment has weather-candidate) = {seg.mean():.4f}")

    # Combined predicate (weather fetched first, then noise only on wcand,
    # occupied needs both) — the two-stage ladder's stage-2 fraction:
    both = cand & wcand
    print(f"P(wcand & noise-cand) = {both.mean():.4f}  "
          f"(stage-2 exact occupied = {occupied.mean():.4f})")

    # ---- Gather-free weather bound: a static max-mip of weather.b at
    # 8×8 / 16×16 cells (level 6 fits ONE 64-lane broadcast row; level 5
    # two rows) sampled NEAREST with a 1-texel apron. Predicate:
    #   base·g_ub(hf) > 1 − cc·b_ubL(u)   (conservative, exact staging)
    w_np = np.asarray(noise.weather)  # [512, 512, 3]; .b = coverage ch 2
    b = w_np[..., 2]
    H = b.shape[0]
    ux = np.asarray(px) * 0.00006 + 0.5 + float(params.weather_pos[0])
    uz = np.asarray(pz) * 0.00006 + 0.5 + float(params.weather_pos[1])
    for ncells in (8, 16, 32):
        cs = H // ncells
        bm = np.zeros((ncells, ncells), np.float32)
        for cy in range(ncells):
            for cx in range(ncells):
                ys = (np.arange(cy * cs - 1, (cy + 1) * cs + 1)) % H
                xs = (np.arange(cx * cs - 1, (cx + 1) * cs + 1)) % H
                bm[cy, cx] = b[np.ix_(ys, xs)].max()
        # NOTE the march samples weather at (px, pz) → (u, v); the brick
        # fetch maps qu→x-axis. weather[v, u] row-major (v = z).
        cu = (np.floor(ux * ncells) % ncells).astype(int)
        cv = (np.floor(uz * ncells) % ncells).astype(int)
        b_ub = bm[cv, cu]
        cand2 = np.asarray(base * g_ub > 1.0 - params.cloud_coverage * b_ub) \
            & np.asarray(above[:, None])
        miss2 = occupied & ~cand2
        print(f"maxmip {ncells}x{ncells}: P(cand) = {cand2.mean():.4f}  "
              f"occupied&!cand = {miss2.mean():.6f}")

    # ---- 1-row prepass variant: at C subsampled points, noise fetch +
    # gather-free weather maxmip bound (8×8). Ray keep rate + miss severity.
    ncells = 8
    cs = H // ncells
    bm = np.zeros((ncells, ncells), np.float32)
    for cy in range(ncells):
        for cx in range(ncells):
            ys = (np.arange(cy * cs - 1, (cy + 1) * cs + 1)) % H
            xs = (np.arange(cx * cs - 1, (cx + 1) * cs + 1)) % H
            bm[cy, cx] = b[np.ix_(ys, xs)].max()
    cu = (np.floor(ux * ncells) % ncells).astype(int)
    cv = (np.floor(uz * ncells) % ncells).astype(int)
    mm_cand = np.asarray(
        base * g_ub > 1.0 - params.cloud_coverage * bm[cv, cu]
    ) & np.asarray(above[:, None])
    for C in (16, 32):
        sub = mm_cand[:, :: steps // C]
        rs = sub.any(axis=1)
        miss_r = ray_occ & ~rs
        sev = occupied[miss_r].sum() / max(occupied.sum(), 1)
        print(f"1-row maxmip prepass C={C}: keeps {rs.mean():.4f} of rays,"
              f" misses {miss_r.mean():.4f} of occupied rays"
              f" ({sev:.5f} of occupied samples)")

    # ---- Conservativeness guards for the exact coarse prepass:
    # (a) value margin: keep if any prepass sample has pre > -m (pre is
    #     pre-clamp remap — recompute unclamped margin form: keep if
    #     base·g > 1-wc-m at any coarse point);
    # (b) 3×3 image-space dilation of the keep mask.
    g_w = m.density_height_gradient(hf, weather[..., 0])
    wc_s = params.cloud_coverage * weather[..., 1]
    margin_val = np.asarray(base * g_w - (1.0 - wc_s))  # >0 ⟺ pre>0
    for C in (16, 32):
        sl = slice(None, None, steps // C)
        for mg in (0.0, 0.01, 0.02, 0.05, 0.1):
            rs = (margin_val[:, sl] > -mg).any(axis=1) \
                & np.asarray(above[:, None]).any(axis=1)
            miss_r = ray_occ & ~rs
            sev = occupied[miss_r].sum() / max(occupied.sum(), 1)
            print(f"margin prepass C={C} m={mg:4.2f}: keeps {rs.mean():.4f},"
                  f" misses {miss_r.mean():.5f} of rays"
                  f" ({sev:.6f} of occ samples)")
    # (b) needs the 2-D ray grid: rays here are a [64, 64] subgrid.
    import scipy.ndimage as ndi  # noqa: available? fall back to manual
    ks = (steps // 32)
    rs0 = (margin_val[:, ::ks] > 0.0).any(axis=1).reshape(64, 64)
    rs_d = np.zeros_like(rs0)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            rs_d |= np.roll(np.roll(rs0, dy, 0), dx, 1)
    miss_r = ray_occ & ~rs_d.reshape(-1)
    sev = occupied[miss_r].sum() / max(occupied.sum(), 1)
    print(f"3x3-dilated exact prepass C=32: keeps {rs_d.mean():.4f},"
          f" misses {miss_r.mean():.5f} ({sev:.6f} of occ samples)")


if __name__ == "__main__":
    main()
