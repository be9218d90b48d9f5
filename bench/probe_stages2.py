"""TPU probe: incremental v2 stage costs (dense → +compact → +staged → full).
Run ALONE on the TPU."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cloudscape_tpu.config import GROUND_RADIUS
    from cloudscape_tpu.models import atmosphere
    from cloudscape_tpu.models.density import MarchParams
    from cloudscape_tpu.models.march_fast import (
        BrickPack, _compact_indices, _density_finish_xyz, _density_pre_xyz,
        _pad_blocks, _ray_setup, _weather_rb_xy, _cone_cache_coords_xyz,
        build_cone_cache,
    )
    from cloudscape_tpu.models.packs import reference_noise_pack
    from cloudscape_tpu.ops import math as m
    from cloudscape_tpu.ops.brick import sample_brick3_xyz
    from cloudscape_tpu.config import SKY_B_RADIUS, SKY_T_RADIUS

    W, H, STEPS, CHUNK = 1024, 512, 128, 32768
    CAP_FRAC = 0.12
    noise = reference_noise_pack()
    bp = BrickPack.from_noise(noise)
    sun = np.array([0.3, 0.4, -0.85]); sun /= np.linalg.norm(sun)
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]), detailed_pos=np.array([0.4, 0.2]),
        weather_pos=np.array([0.01, 0.02]), time=12.5, cloud_coverage=0.35,
        light_direction=sun, ground_color=np.array([0.27, 0.19, 0.027]))
    cc = jax.block_until_ready(build_cone_cache(params, bp, 6,
                                                res=(32, 512, 512),
                                                chunk=65536))

    az = (np.arange(W) + 0.5) / W * 2 * np.pi - np.pi
    el = (np.arange(H) + 0.5) / H * (np.pi / 2)
    ce = np.cos(el)[:, None]
    d = np.stack([ce * np.cos(az), np.broadcast_to(np.sin(el)[:, None], (H, W)),
                  ce * np.sin(az)], -1)
    dirs = jnp.asarray(
        (d / np.linalg.norm(d, axis=-1, keepdims=True)).reshape(-1, 3),
        jnp.float32)
    n = dirs.shape[0]
    total = n * STEPS
    i_step = jnp.arange(1, STEPS + 1, dtype=jnp.float32)
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)

    def stage(flat, upto):
        above, ndir, ss, p0, phase, _ = _ray_setup(flat, params, STEPS)
        blocks = (
            _pad_blocks(p0, CHUNK, up * GROUND_RADIUS),
            _pad_blocks(ndir, CHUNK, up),
            _pad_blocks(ss, CHUNK, jnp.float32(1.0)),
        )

        # Two single-stream passes, matching _march_core2 (K=1).
        def weather_chunk(args):
            p0c, ndirc, ssc = args
            tt = ssc[:, None] * i_step[None, :]
            wx = p0c[:, 0, None] + ndirc[:, 0, None] * tt
            wz = p0c[:, 2, None] + ndirc[:, 2, None] * tt
            w = _weather_rb_xy(bp, wx, wz, params.weather_pos)
            return w[..., 0], w[..., 1]

        def pre_chunk(args):
            p0c, ndirc, ssc, wrc, wbc = args
            tt = ssc[:, None] * i_step[None, :]
            px = p0c[:, 0, None] + ndirc[:, 0, None] * tt
            py = p0c[:, 1, None] + ndirc[:, 1, None] * tt
            pz = p0c[:, 2, None] + ndirc[:, 2, None] * tt
            weather = jnp.stack([wrc, wbc], axis=-1)
            return _density_pre_xyz(px, py, pz, weather, 0.0, params, bp)

        w_r, w_b = jax.lax.map(weather_chunk, blocks)
        if upto == "weather":
            return w_r.sum() + w_b.sum()
        pre, hf = jax.lax.map(pre_chunk, blocks + (w_r, w_b))
        pre = pre.reshape(-1, STEPS)[:n]
        hf = hf.reshape(-1, STEPS)[:n]
        if upto == "dense":
            return pre.sum() + hf.sum()

        occupied = (pre > 0.0) & above[:, None]
        capacity = max(int(total * CAP_FRAC), CHUNK)
        capacity += (-capacity) % CHUNK
        idx = _compact_indices(occupied.reshape(-1), capacity, total)
        geom = jnp.concatenate(
            [p0, ndir, ss[:, None], jnp.zeros_like(ss[:, None])], axis=1)
        ray_i = jnp.minimum(idx // STEPS, n - 1)
        stp = (idx % STEPS).astype(jnp.float32) + 1.0
        g = jnp.take(geom, ray_i, axis=0, indices_are_sorted=True)
        tt_e = g[:, 6] * stp
        epx = g[:, 0] + g[:, 3] * tt_e
        epy = g[:, 1] + g[:, 4] * tt_e
        epz = g[:, 2] + g[:, 5] * tt_e
        pre_e = jnp.take(pre.reshape(-1), jnp.minimum(idx, total - 1),
                         indices_are_sorted=True)
        if upto == "compact":
            return pre_e.sum() + epx.sum() + epy.sum() + epz.sum()

        hf_e = m.height_fraction(jnp.sqrt(epx*epx + epy*epy + epz*epz),
                                 SKY_B_RADIUS, SKY_T_RADIUS)

        def staged_chunk(blk):
            bpre, bhf, bx, by_, bz = blk
            t_blk = _density_finish_xyz(bpre, bhf, bx, by_, bz, 0.0, params, bp)
            qx, qz, qh = _cone_cache_coords_xyz(bx, by_, bz, cc.extent)
            cd_blk = sample_brick3_xyz(cc.table, qx, qz, qh)[..., 0]
            return t_blk, jnp.where(t_blk > 0.0, cd_blk, 0.0)

        t_e, cd_e = jax.lax.map(
            staged_chunk,
            (pre_e.reshape(-1, CHUNK), hf_e.reshape(-1, CHUNK),
             epx.reshape(-1, CHUNK), epy.reshape(-1, CHUNK),
             epz.reshape(-1, CHUNK)))
        if upto == "staged":
            return t_e.sum() + cd_e.sum()

        def scatter_back(vals):
            return jnp.zeros((total + 1,), jnp.float32).at[idx].set(
                vals.reshape(-1), mode="drop", indices_are_sorted=True,
                unique_indices=True)[:total].reshape(n, STEPS)

        t = scatter_back(t_e)
        cd = scatter_back(cd_e)
        return t.sum() + cd.sum() + phase.sum()

    import sys
    stages = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "dense", "compact", "staged", "scatter"]
    for upto in stages:
        j = jax.jit(lambda f, u=upto: stage(f, u))
        t0 = time.perf_counter()
        float(jax.block_until_ready(j(dirs)))
        print(f"{upto:8s} compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jax.block_until_ready(j(dirs)))
            ts.append((time.perf_counter() - t0) * 1e3)
        print(f"{upto:8s}: {sorted(ts)[1]:.0f} ms {[round(t) for t in ts]}",
              flush=True)


if __name__ == "__main__":
    main()
