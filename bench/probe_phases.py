"""TPU probe: isolate v2 phase costs. Run ALONE on the TPU."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cloudscape_tpu.models import atmosphere
    from cloudscape_tpu.models.density import MarchParams
    from cloudscape_tpu.models.march_fast import (
        BrickPack, _density_bricks_xyz, _density_pre_xyz, _pad_blocks,
        _ray_setup, _weather_rb_xy,
    )
    from cloudscape_tpu.models.packs import reference_noise_pack
    from cloudscape_tpu.config import GROUND_RADIUS

    W, H, STEPS, CHUNK = 1024, 512, 128, 32768
    noise = reference_noise_pack()
    bp = BrickPack.from_noise(noise)
    sun = np.array([0.3, 0.4, -0.85]); sun /= np.linalg.norm(sun)
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]), detailed_pos=np.array([0.4, 0.2]),
        weather_pos=np.array([0.01, 0.02]), time=12.5, cloud_coverage=0.35,
        light_direction=sun, ground_color=np.array([0.27, 0.19, 0.027]))

    az = (np.arange(W) + 0.5) / W * 2 * np.pi - np.pi
    el = (np.arange(H) + 0.5) / H * (np.pi / 2)
    ce = np.cos(el)[:, None]
    d = np.stack([ce * np.cos(az), np.broadcast_to(np.sin(el)[:, None], (H, W)),
                  ce * np.sin(az)], -1)
    dirs = jnp.asarray(
        (d / np.linalg.norm(d, axis=-1, keepdims=True)).reshape(-1, 3),
        jnp.float32)

    i_step = jnp.arange(1, STEPS + 1, dtype=jnp.float32)
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)

    def prep(flat):
        above, ndir, ss, p0, phase, ldir = _ray_setup(flat, params, STEPS)
        return (
            _pad_blocks(p0, CHUNK, up * GROUND_RADIUS),
            _pad_blocks(ndir, CHUNK, up),
            _pad_blocks(ss, CHUNK, jnp.float32(1.0)),
        )

    def dense_v1(flat):
        def chunk_fn(args):
            p0c, ndirc, ssc = args
            tt = ssc[:, None] * i_step[None, :]
            px = p0c[:, 0, None] + ndirc[:, 0, None] * tt
            py = p0c[:, 1, None] + ndirc[:, 1, None] * tt
            pz = p0c[:, 2, None] + ndirc[:, 2, None] * tt
            weather = _weather_rb_xy(bp, px, pz, params.weather_pos)
            t, hf = _density_bricks_xyz(px, py, pz, weather, 0.0, params, bp)
            return t.sum() + hf.sum()
        return jax.lax.map(chunk_fn, prep(flat)).sum()

    def dense_v2(flat):
        def chunk_fn(args):
            p0c, ndirc, ssc = args
            tt = ssc[:, None] * i_step[None, :]
            px = p0c[:, 0, None] + ndirc[:, 0, None] * tt
            py = p0c[:, 1, None] + ndirc[:, 1, None] * tt
            pz = p0c[:, 2, None] + ndirc[:, 2, None] * tt
            weather = _weather_rb_xy(bp, px, pz, params.weather_pos)
            pre, hf = _density_pre_xyz(px, py, pz, weather, 0.0, params, bp)
            return pre.sum() + hf.sum()
        return jax.lax.map(chunk_fn, prep(flat)).sum()

    for name, fn in [("dense_v1 (3 rows)", dense_v1), ("dense_v2 (2 rows)", dense_v2)]:
        j = jax.jit(fn)
        t0 = time.perf_counter()
        float(jax.block_until_ready(j(dirs)))
        print(f"{name} compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jax.block_until_ready(j(dirs)))
            ts.append((time.perf_counter() - t0) * 1e3)
        print(f"{name}: {sorted(ts)[1]:.0f} ms {[round(t) for t in ts]}",
              flush=True)


if __name__ == "__main__":
    main()
