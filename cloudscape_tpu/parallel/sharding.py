"""Multi-chip rendering: hemisphere tiles sharded over a 1-D device mesh.

The reference is single-GPU; multi-chip scaling is this rebuild's extension
(SURVEY.md §2 "Multi-chip scaling"). Rays are embarrassingly parallel and
share only read-only inputs, so the natural decomposition is:

- shard the hemisphere's row axis across the mesh (`P("rays")`),
- replicate the noise volumes (~35 MB f32 + mips) and LUTs on every chip,
- no communication inside the march at all — collectives appear only for
  whole-frame reductions (exposure/luminance statistics) and for assembling a
  displayed image, and they ride ICI.

`render_hemisphere_sharded` is bitwise-identical to the single-chip render
(a pure reshard; verified in tests/test_sharding.py), so fidelity testing
reduces to the single-chip gates.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cloudscape_tpu.models import atmosphere
from cloudscape_tpu.models.density import MarchParams, NoisePack
from cloudscape_tpu.models.march import march
from cloudscape_tpu.ops.octmap import texel_directions


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "rays") -> Mesh:
    """1-D mesh over all (or the given) devices; the single sharding axis is
    hemisphere rows."""
    if devices is None:
        devices = jax.devices()
    return Mesh(list(devices), (axis_name,))


def _march_for(kernel: str, steps: int, light_steps: int,
               axis_name: str = "rays", v3_policy=(1.0, 0.75, 0.75)):
    """Per-shard march callable: reference (NoisePack), fast (BrickPack),
    fast2 (the row-lean staged march), or fast3 (the v3 cell-gated headline
    march — its prepass dilations halo-exchange one boundary row over ICI
    via `_halo_rows`, so the sharded cell GATE is bitwise the unsharded
    one; rendered values are tolerance-equal, ≤ ~1e-2 SPMD fma noise,
    tests/test_sharding.py. v3_policy = (ray_keep, cell_keep, hot_keep)
    buckets, sized per shard — keep them overflow-free).
    For fast2/fast3, noise is a (BrickPack, ConeCache) tuple, both
    replicated — the cone cache is per-cycle state exactly as in the
    engine."""
    if kernel == "fast3":
        from cloudscape_tpu.models.march_fast import march_bricks_v3

        ps = max(1, steps // 4)
        while steps % ps:
            ps -= 1
        rk, ck, hk = v3_policy

        def f3(d, p, n, s):
            bricks, cone = n
            return march_bricks_v3(
                d, p, bricks, s, steps=steps, light_steps=light_steps,
                chunk=16384, cell_keep_frac=ck, hot_keep_frac=hk,
                cone_cache=cone, ray_keep_frac=rk, prepass_steps=ps,
                ray_stride=2, axis_name=axis_name,
            )

        return f3
    if kernel == "fast2":
        from cloudscape_tpu.models.march_fast import march_bricks_v2

        def f(d, p, n, s):
            bricks, cone = n
            return march_bricks_v2(
                d, p, bricks, s, steps=steps, light_steps=light_steps,
                chunk=16384, capacity_frac=0.3, cone_cache=cone,
            )

        return f
    if kernel == "fast":
        from cloudscape_tpu.models.march_fast import march_bricks

        return lambda d, p, n, s: march_bricks(
            d, p, n, s, steps=steps, light_steps=light_steps,
            chunk=16384, capacity_frac=0.3,
        )
    return lambda d, p, n, s: march(d, p, n, s, steps=steps,
                                    light_steps=light_steps)


@partial(jax.jit, static_argnames=("steps", "light_steps", "mesh",
                                   "axis_name", "kernel", "v3_policy"))
def _render_sharded(dirs, params, noise, sky_img, *, steps, light_steps, mesh,
                    axis_name, kernel, v3_policy=(1.0, 0.75, 0.75)):
    shard = jax.shard_map(
        _march_for(kernel, steps, light_steps, axis_name, v3_policy),
        mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P()),
        out_specs=P(axis_name),
    )
    return shard(dirs, params, noise, sky_img)


def render_hemisphere_sharded(mesh: Mesh, texture_size: int,
                              params: MarchParams, noise, sky_img,
                              steps: int = 128, light_steps: int = 6,
                              axis_name: str = "rays",
                              kernel: str = "reference",
                              v3_policy=(1.0, 0.75, 0.75)):
    """Monolithic full-hemisphere render with rows sharded over the mesh.

    texture_size rows must divide the mesh size. `noise` is a NoisePack
    (kernel="reference") or BrickPack (kernel="fast"); both are replicated.
    Returns [N, N, 4] with the row axis sharded (device_put'ed lazily by
    XLA; call jax.device_get or np.asarray to assemble on host).
    """
    n_dev = mesh.devices.size
    if texture_size % n_dev != 0:
        raise ValueError(
            f"texture_size {texture_size} must divide the mesh size {n_dev}"
        )
    dirs = texel_directions(texture_size)
    dirs = jax.device_put(
        dirs, jax.sharding.NamedSharding(mesh, P(axis_name, None, None))
    )
    return _render_sharded(dirs, params, noise, sky_img, steps=steps,
                           light_steps=light_steps, mesh=mesh,
                           axis_name=axis_name, kernel=kernel,
                           v3_policy=tuple(v3_policy))


@partial(jax.jit, static_argnames=("texture_size", "steps", "light_steps",
                                   "mesh", "axis_name"))
def full_frame_step_sharded(params: MarchParams, noise: NoisePack, tlut,
                            sun_direction, *, texture_size: int, steps: int,
                            light_steps: int, mesh: Mesh,
                            axis_name: str = "rays"):
    """One complete multi-chip frame step — the renderer's analog of a jitted
    "training step" over the mesh:

    1. sky-view LUT render, replicated (tiny: 20k rays — cheaper to replicate
       than to shard + all_gather);
    2. hemisphere cloud march, rows sharded over ICI;
    3. a psum'd whole-frame mean-luminance reduction (the only collective a
       frame needs — rides ICI).

    Returns (hemisphere [N,N,4] row-sharded, sky_lut [100,200,4] replicated,
    mean_luminance scalar).
    """
    sky_img = atmosphere.sky_lut(tlut, sun_direction)

    def shard_fn(dirs, p, n, s):
        tile = march(dirs, p, n, s, steps=steps, light_steps=light_steps)
        local_sum = jnp.sum(tile[..., :3])
        total = jax.lax.psum(local_sum, axis_name)
        mean_lum = total / (3.0 * texture_size * texture_size)
        return tile, mean_lum

    dirs = texel_directions(texture_size)
    out_tile, mean_lum = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P()),
        out_specs=(P(axis_name), P()),
    )(dirs, params, noise, sky_img)
    return out_tile, sky_img, mean_lum
