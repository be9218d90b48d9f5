"""CloudSkyEngine: host-side driver of the TPU cloudscape pipeline.

The TPU-native equivalent of the reference's orchestration layer
(`cloud_sky/cloud_sky.gd` + `sky_lut.gd` + `transmittance_lut.gd` + `sun.gd`):
owns the device-resident texture rings, schedules the amortized tile updates,
integrates wind, snapshots kernel parameters once per cycle, and exposes the
user API (sun/config setters, view rendering, save/restore).

Mapping from the reference (SURVEY.md §1 "TPU mapping"):
- render-thread marshalling (`call_on_render_thread`)  → jitted dispatches;
- Vulkan push constants                                → `MarchParams` pytree;
- storage-image binding + tile dispatch                → donated
  `lax.dynamic_update_slice` into a (3, N, N, 4) ring array;
- `Texture2DRD` handle rebinds for the display blend   → ring role indices;
- resource teardown on performance changes             → new jit executables.

State is one pytree: `save()`/`restore()` make checkpoint/resume explicit
(the reference reconstructs everything from `.tres` params + warm re-render;
SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import copy
import dataclasses
import time as _time
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState
from cloudscape_tpu.models import atmosphere
from cloudscape_tpu.models.compositor import composite
from cloudscape_tpu.models.density import MarchParams, NoisePack
from cloudscape_tpu.models.march import march
from cloudscape_tpu.models.packs import reference_noise_pack
from cloudscape_tpu.ops.octmap import texel_directions
from cloudscape_tpu.temporal import FrameData, RingState


import functools


def _ceil_to(v: int, mult: int) -> int:
    return (v + mult - 1) // mult * mult


@functools.lru_cache(maxsize=None)
def _cone_builder(light_steps: int, res):
    """Jitted per-(light_steps, res) cone-cache builder — cached so repeated
    cycle-boundary rebuilds reuse one compiled executable."""
    from cloudscape_tpu.models.march_fast import build_cone_cache

    return jax.jit(
        partial(build_cone_cache, light_steps=light_steps, res=res,
                chunk=65536)
    )


def _build_cone_jit(params, bricks, *, light_steps: int, res):
    return _cone_builder(light_steps, tuple(res))(params, bricks)


@functools.lru_cache(maxsize=None)
def _cone_idx_jit(res):
    """Jitted stage-1 of the amortized cone bake: the global pre>0 dilated
    occupancy compaction (bitwise the full build's index vector — same
    chunk/capacity as `_cone_builder`)."""
    from cloudscape_tpu.models.march_fast import cone_occupancy_indices

    return jax.jit(
        partial(cone_occupancy_indices, res=res, chunk=65536)
    )


@functools.lru_cache(maxsize=None)
def _cell_baker(light_steps: int, res, count: int):
    """Jitted stage-2 step: cone-march one `count`-cell slice of the
    compacted index vector into the flat pending volume (donated in
    place). One executable serves every slice of every cycle (the slice
    offset is traced)."""
    from cloudscape_tpu.models.march_fast import bake_cone_cells

    @partial(jax.jit, donate_argnums=(0,))
    def bake(vol, idx, i0, params, bricks):
        return bake_cone_cells(vol, idx, i0, params, bricks, count=count,
                               light_steps=light_steps, res=res,
                               chunk=min(count, 65536))

    return bake


@functools.lru_cache(maxsize=None)
def _asm_baker(res, count: int):
    """Jitted stage-3 step: write one `count`-row slice of the cone brick
    table (donated; the row offset is traced — one executable per cycle
    schedule)."""
    from cloudscape_tpu.models.march_fast import cone_table_rows

    @partial(jax.jit, donate_argnums=(0,))
    def asm(table, vol, b0):
        rows = cone_table_rows(vol.reshape(res), b0, count)
        return jax.lax.dynamic_update_slice(table, rows, (b0, 0))

    return asm


@functools.lru_cache(maxsize=None)
def _sky_lut_jit():
    return jax.jit(atmosphere.sky_lut)


@functools.lru_cache(maxsize=None)
def _sky_rows_jit(rows: int):
    """One row band of the sky-view LUT (row0 traced — one executable
    serves every band). Every engine sky render goes through THIS
    executable (full renders = all bands back to back), so the amortized
    slice-built LUT is bitwise the synchronous one by construction on any
    backend."""
    return jax.jit(partial(atmosphere.sky_lut_rows, rows=rows))


@functools.lru_cache(maxsize=None)
def _occ_slice_jit(res, count: int):
    """Stage-0 step of the amortized cone bake: evaluate one `count`-cell
    slice of the pre>0 occupancy predicate into the donated flat bool
    buffer (the one-shot occupancy pass measured ~112 ms — the largest
    single prebake spike; VERDICT r4 #3)."""
    from cloudscape_tpu.models.march_fast import cone_occupancy_slice

    @partial(jax.jit, donate_argnums=(0,))
    def occ(buf, i0, params, bricks):
        return cone_occupancy_slice(buf, i0, params, bricks, count=count,
                                    res=res, chunk=65536)

    return occ


@functools.lru_cache(maxsize=None)
def _occ_finalize_jit(res):
    """Dilation + compaction tail — bitwise `cone_occupancy_indices`."""
    from cloudscape_tpu.models.march_fast import cone_occupancy_finalize

    return jax.jit(partial(cone_occupancy_finalize, res=res, chunk=65536))


@functools.lru_cache(maxsize=None)
def _cull_raw_jit(count: int, steps: int, prepass_steps: int):
    from cloudscape_tpu.models.march_fast import cull_raw_slice

    @partial(jax.jit, donate_argnums=(0,))
    def raw(buf, dirs_sub, i0, params, bricks):
        return cull_raw_slice(buf, dirs_sub, i0, params, bricks,
                              count=count, steps=steps,
                              prepass_steps=prepass_steps)

    return raw


@functools.lru_cache(maxsize=None)
def _cull_finalize_jit(region: int, ray_stride: int):
    from cloudscape_tpu.models.march_fast import cull_finalize

    return jax.jit(partial(cull_finalize, region=region,
                           ray_stride=ray_stride))


@dataclasses.dataclass
class _PendingCycle:
    """The NEXT cycle's state, frozen one rotation ahead and baked
    incrementally across the current cycle's ticks (VERDICT r2 #2: the
    reference's frame cost is flat — `cloud_sky.gd:129-163` dispatches one
    tile every frame — while a synchronous per-rotation cone bake stalls the
    boundary frame ~0.7 s at shipped defaults). Stage order per tick
    (`_advance_prebake`): occupancy idx → cone-march slices → brick-table
    row slices → sky-LUT slot → cull prepass slices → cull finalize
    (dispatch) → cull readback (host). Every stage is sized to stay under
    ~1× the steady tile tick; `fresh` skips the boundary tick itself."""

    frame_data: FrameData
    march_params: MarchParams
    vol: Optional[jax.Array]          # flat [nd*nh*nw] cone volume being baked
    occ: Any = None                   # flat bool occupancy buffer being filled
    occ_done: int = 0
    idx: Any = None                   # compacted occupied-cell indices
    slices_done: int = 0
    table: Any = None                 # [n_bricks, 128] cone table being written
    asm_done: int = 0
    cone: Any = None                  # assembled ConeCache once complete
    sky_rows: Any = None              # list of prebaked sky-LUT row bands
    sky: Any = None                   # prebaked sky-LUT image for the pickup
    raw: Any = None                   # [n_sub, prepass_steps] raw cull buffer
    cull_done: int = 0
    prio: Any = None                  # tile-cull priority map (if tile_cull)
    tile_keep: Any = None             # device tile-keep fractions (pre-read)
    tile_cell: Any = None             # device tile live-cell fractions
    buckets: Optional[List[float]] = None
    fresh: bool = True                # created this tick — skip one advance


@functools.lru_cache(maxsize=8)
def cubemap_directions(size: int):
    """[6, size, size, 3] unit directions, GL cubemap face convention."""
    t = (np.arange(size, dtype=np.float32) + 0.5) / size * 2.0 - 1.0
    u, v = np.meshgrid(t, t, indexing="xy")
    one = np.ones_like(u)
    faces = [
        np.stack([one, -v, -u], -1),   # +X
        np.stack([-one, -v, u], -1),   # -X
        np.stack([u, one, v], -1),     # +Y
        np.stack([u, -one, -v], -1),   # -Y
        np.stack([u, -v, one], -1),    # +Z
        np.stack([-u, -v, -one], -1),  # -Z
    ]
    d = np.stack(faces)
    return jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                       jnp.float32)


@functools.lru_cache(maxsize=8)
def cubemap_solid_angles(size: int):
    """[6, size, size] per-texel solid angles (cosine-cubed approximation
    sa ≈ (2/size)² / ‖(u, v, 1)‖³ — exact enough at probe sizes)."""
    t = (np.arange(size, dtype=np.float32) + 0.5) / size * 2.0 - 1.0
    u, v = np.meshgrid(t, t, indexing="xy")
    sa = (2.0 / size) ** 2 / np.power(u * u + v * v + 1.0, 1.5)
    return jnp.asarray(np.broadcast_to(sa, (6, size, size)), jnp.float32)


@partial(jax.jit, static_argnames=("exponent",))
def _prefilter_mip(colors, dirs_in, sa_in, dirs_out, *, exponent: float):
    """One roughness mip by spherical convolution: every output direction
    integrates the WHOLE base cubemap under a normalized Phong lobe
    max(d_out·d_in, 0)^exponent (the cosine-power stand-in for Godot's GGX
    prefilter at probe sizes — `clouds_sky.tres:8` radiance semantics).
    Computed as one [n_out, n_in] matmul — MXU-shaped, seam-free (no
    per-face boundary handling needed)."""
    w = jnp.maximum(dirs_out @ dirs_in.T, 0.0)
    if exponent != 1.0:
        w = jnp.power(w, exponent)
    w = w * sa_in[None, :]
    out = w @ colors
    return out / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)


@partial(
    jax.jit,
    static_argnames=("texture_size", "region", "steps", "light_steps",
                     "kernel", "capacity_frac", "ray_keep_frac"),
    donate_argnums=(0,),
)
def _update_tile(ring, tex_idx, x0, y0, params: MarchParams, noise, sky_img,
                 prio_map=None, *, texture_size: int, region: int,
                 steps: int, light_steps: int, kernel: str = "reference",
                 capacity_frac: float = 0.5,
                 ray_keep_frac: float | None = None):
    """Render one region² tile into ring[tex_idx] at (x0, y0) — the analog of
    the reference's per-frame compute dispatch (`cloud_sky.gd:234-248`).

    The ring buffer is donated: XLA updates it in place, exactly like
    rendering into a bound storage image. tex_idx/x0/y0 are traced so a single
    executable serves every tile of every cycle. kernel selects the
    scan-based reference march ("reference", takes a NoisePack) or the
    brick-table fast march ("fast", takes a BrickPack).
    """
    dirs = texel_directions(texture_size, x0=x0, y0=y0, width=region, height=region)
    cull_prio = None
    if prio_map is not None and ray_keep_frac is not None:
        # Per-cycle priority map (frozen FrameData ⇒ valid all cycle):
        # slice this tile's window — per-tile culling with ZERO prepass.
        cull_prio = jax.lax.dynamic_slice(prio_map, (y0, x0),
                                          (region, region))
    tile = _march_tile(dirs, params, noise, sky_img, region=region,
                       steps=steps, light_steps=light_steps, kernel=kernel,
                       capacity_frac=capacity_frac,
                       ray_keep_frac=ray_keep_frac, cull_prio=cull_prio)
    return jax.lax.dynamic_update_slice(ring, tile[None], (tex_idx, y0, x0, 0))


# fast3 tile-dispatch policy thresholds. V3_TILE_MIN_RAYS bounds the
# bucket-less fallbacks only (dense below, staged v2 above): with a
# per-tile CELL bucket available (tile_cull on), the v3 cell-gated march
# wins at EVERY measured scale — 96²: 15.0 ms v3 vs 36.9 dense vs 24.5
# v2-cull; 192²: 47.8 vs 192.1; 384²: 202.8 vs 541.0
# (bench/probe_tile_kernels.py, v5e, docs/PERF_NOTES.md round 4) — so
# bucketed tiles always take v3. Buckets ≥ ~0.9 fall back to dense (a
# nearly-all-live tile leaves the cell gate nothing to remove).
V3_TILE_MIN_RAYS = 65536
# Per-tile CELL capacity tiers for the fast3 arm (static jit args —
# coarse on purpose: each distinct bucket is one warmed executable).
V3_TILE_CELL_BUCKETS = (0.25, 0.375, 0.5, 0.65, 0.8)


def _march_tile(dirs, params, noise, sky_img, *, region: int, steps: int,
                light_steps: int, kernel: str, capacity_frac: float = 0.5,
                ray_keep_frac: float | None = None, cull_prio=None,
                axis_name: str | None = None):
    """Shared tile march body: kernel selects the scan-based reference march
    ("reference", takes a NoisePack), the exact brick-table march ("fast",
    takes a BrickPack), the row-lean staged march ("fast2", takes a
    (BrickPack, ConeCache) tuple — cone cache rebuilt per cycle), or the
    scale-adaptive production kernel ("fast3", same tuple — see below;
    monolithic fast3 renders go through the measured-policy v3 headline
    kernel in `CloudSkyEngine.render_full_hemisphere`).

    ray_keep_frac + cull_prio (fast2) enable per-tile ray culling from a
    precomputed priority window. For fast3 the SAME per-tile static rides a
    different meaning: it is the tile's live-CELL capacity bucket (measured
    per cycle from the cull prepass's dilated occupancy,
    `cull_finalize`/`cull_priority_map` tile_cell), dispatching the v3
    cell-gated march with that capacity — the measured-fastest kernel at
    every tile scale. Without a bucket (tile_cull off / batch sweeps),
    fast3 falls back to the dense machinery-free arm below
    V3_TILE_MIN_RAYS and staged v2 above. axis_name (inside shard_map):
    forwarded to the v3 prepass so its dilation halo-exchanges across the
    mesh rows."""
    if kernel == "fast3":
        import numpy as _np

        from cloudscape_tpu.models.march_fast import (
            march_bricks_v2, march_bricks_v3, march_tile_dense,
        )

        bricks, cone_cache = noise
        n = int(_np.prod(dirs.shape[:-1]))
        if (ray_keep_frac is not None and 0.0 < ray_keep_frac < 1.0
                and len(dirs.shape) == 3):
            ps = max(1, steps // 4)
            while steps % ps:
                ps -= 1
            return march_bricks_v3(
                dirs, params, bricks, sky_img, steps=steps,
                light_steps=light_steps, chunk=min(n, 16384),
                cell_keep_frac=float(ray_keep_frac), hot_keep_frac=0.5,
                cone_cache=cone_cache, ray_keep_frac=None,
                prepass_steps=ps, ray_stride=2, cell_margin=0.1,
                axis_name=axis_name)
        if n < V3_TILE_MIN_RAYS:
            return march_tile_dense(dirs, params, bricks, sky_img,
                                    steps=steps, light_steps=light_steps,
                                    chunk=min(n, 16384),
                                    cone_cache=cone_cache)
        return march_bricks_v2(dirs, params, bricks, sky_img, steps=steps,
                               light_steps=light_steps,
                               chunk=min(n, 16384),
                               capacity_frac=capacity_frac,
                               cone_cache=cone_cache,
                               ray_keep_frac=ray_keep_frac,
                               cull_prio=cull_prio)
    if kernel == "hier":
        # Servable config-5 arm (VERDICT r4 #1): the window-lattice v3
        # march per tile — each ray's step budget redistributed over its
        # occupied [a, b] t-window (adaptive resolution, the reference's
        # own top TODO). Capacity buckets deliberately uncapped (ck=hk=1.0,
        # no ray select): the engine's per-tile cell buckets are measured
        # on the STANDARD lattice and undercount window-lattice occupancy
        # (docs/PERF_NOTES.md round 5), so capping here would soft-drop
        # live cells. Dead rays (empty window / below horizon) are still
        # hard-killed via above&any_occ. ray_stride MUST stay 1 on the
        # window lattice (measured −4.5 dB at 2, PERF_NOTES round 5).
        from cloudscape_tpu.models.march_fast import march_hierarchical_v3

        bricks, cone_cache = noise
        n = int(np.prod(dirs.shape[:-1]))
        ps = max(1, steps // 4)
        while steps % ps:
            ps -= 1
        return march_hierarchical_v3(
            dirs, params, bricks, sky_img, steps=steps,
            light_steps=light_steps, chunk=min(n, 16384),
            coarse_steps=min(32, max(8, steps // 4)),
            cell_keep_frac=1.0, hot_keep_frac=1.0, ray_keep_frac=None,
            cone_cache=cone_cache, prepass_steps=ps, ray_stride=1)
    if kernel == "fast2":
        from cloudscape_tpu.models.march_fast import march_bricks_v2

        bricks, cone_cache = noise
        return march_bricks_v2(dirs, params, bricks, sky_img, steps=steps,
                               light_steps=light_steps,
                               chunk=min(region * region, 16384),
                               capacity_frac=capacity_frac,
                               cone_cache=cone_cache,
                               ray_keep_frac=ray_keep_frac,
                               cull_prio=cull_prio)
    if kernel == "fast":
        from cloudscape_tpu.models.march_fast import march_bricks

        # Generous compaction capacity: engine tiles are small, so headroom
        # costs little. 0.5 covers every measured scene with ~9× margin, but
        # is NOT a hard guarantee: an optically thin overcast scene (low
        # density, coverage≈1) can keep >50% of (ray, step) samples active,
        # at which point overflowed samples lose their sun term (gated in
        # tests/test_engine.py::test_tile_capacity_thin_overcast).
        return march_bricks(dirs, params, noise, sky_img, steps=steps,
                            light_steps=light_steps,
                            chunk=min(region * region, 16384),
                            capacity_frac=0.5)
    return march(dirs, params, noise, sky_img, steps=steps,
                 light_steps=light_steps)


@partial(
    jax.jit,
    static_argnames=("texture_size", "region", "steps", "light_steps",
                     "kernel", "mesh", "axis_name", "capacity_frac",
                     "ray_keep_frac"),
    donate_argnums=(0,),
)
def _update_tile_mesh(ring, tex_idx, x0, y0, params: MarchParams, noise,
                      sky_img, prio_map=None, *, texture_size: int,
                      region: int, steps: int, light_steps: int, kernel: str,
                      mesh, axis_name: str, capacity_frac: float = 0.5,
                      ray_keep_frac: float | None = None):
    """Multi-chip tile update: the tile's rays are sharded over the mesh
    rows (shard_map, zero collectives inside the march — rays share only
    replicated read-only inputs), the ring stays replicated (28 MB at the
    reference's 768² default — cheaper than sharding state that every
    display composite reads in full).

    prio_map + ray_keep_frac enable per-tile ray culling under the mesh:
    the per-cycle priority map is computed once (replicated — one 768² f32
    is 2.3 MB), the tile's window is sliced here and sharded with the rays,
    and each shard culls its own row block to the shared bucket (the
    histogram threshold is per-shard, so a sharded culled tile is
    tolerance-equal, not bitwise-equal, to the unsharded culled tile —
    gated in tests/test_sharding.py)."""
    from jax.sharding import PartitionSpec as P

    dirs = texel_directions(texture_size, x0=x0, y0=y0, width=region,
                            height=region)
    cull_prio = None
    if prio_map is not None and ray_keep_frac is not None:
        cull_prio = jax.lax.dynamic_slice(prio_map, (y0, x0),
                                          (region, region))

    def shard_fn(d, p, n, s, cp=None):
        return _march_tile(d, p, n, s, region=max(d.shape[0], 1),
                           steps=steps, light_steps=light_steps,
                           kernel=kernel, capacity_frac=capacity_frac,
                           ray_keep_frac=ray_keep_frac, cull_prio=cp,
                           axis_name=axis_name)

    if cull_prio is None:
        tile = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis_name), P(), P(), P()),
            out_specs=P(axis_name),
        )(dirs, params, noise, sky_img)
    else:
        tile = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis_name), P(), P(), P(), P(axis_name)),
            out_specs=P(axis_name),
        )(dirs, params, noise, sky_img, cull_prio)
    return jax.lax.dynamic_update_slice(ring, tile[None], (tex_idx, y0, x0, 0))


@partial(jax.jit, static_argnames=("region",), donate_argnums=(0,))
def _clear_tile(ring, tex_idx, x0, y0, *, region: int):
    """Empty-sky tile write (the tile-cull 0.0 bucket): a tile whose whole
    priority window sits below the cull margin renders exactly what the
    march returns for all-culled rays — zeros — so the march is skipped
    entirely."""
    zeros = jnp.zeros((1, region, region, 4), jnp.float32)
    return jax.lax.dynamic_update_slice(ring, zeros, (tex_idx, y0, x0, 0))


@partial(
    jax.jit,
    static_argnames=("texture_size", "region", "steps", "light_steps",
                     "kernel", "count", "capacity_frac"),
    donate_argnums=(0,),
)
def _update_tiles_batch(ring, tex_idx, start_tile, params: MarchParams, noise,
                        sky_img, *, texture_size: int, region: int,
                        steps: int, light_steps: int, kernel: str,
                        count: int, capacity_frac: float = 0.5):
    """Render `count` consecutive tiles of the row-major sweep in ONE
    dispatch (a fori_loop of tile updates over the donated ring).

    The reference necessarily dispatches one tile per frame; for batch /
    offline / warm-start use the whole cycle collapses into a single
    executable — no per-tile host round trips.
    """
    tiles_per_row = texture_size // region

    def body(k, ring):
        tile = start_tile + k
        x0 = (tile % tiles_per_row) * region
        y0 = (tile // tiles_per_row) * region
        dirs = texel_directions(texture_size, x0=x0, y0=y0,
                                width=region, height=region)
        out = _march_tile(dirs, params, noise, sky_img, region=region,
                          steps=steps, light_steps=light_steps, kernel=kernel,
                          capacity_frac=capacity_frac)
        return jax.lax.dynamic_update_slice(
            ring, out[None], (tex_idx, y0, x0, 0)
        )

    return jax.lax.fori_loop(0, count, body, ring)


@jax.jit
def _build_display_pair(cloud_ring, cfrom, cto, sky_ring, b0, b1):
    """Once-per-cycle display-pair brick tables: the blend pair textures
    are FROZEN between rotations (only `texture_to_update` is written
    mid-cycle), so the serving composite's fetch sources can be packed
    once — each 128-lane row = from rgba (channels 0-3) ‖ to rgba (4-7)
    over a (4, 4) brick — and every tick's blend happens per PIXEL after
    the fetch (the same order as the split-path `composite`). This
    removes the per-tick pair pre-blend + rebrick, measured 16.3 of the
    31.7 ms serving tick (bench/probe_tile_split.py, VERDICT r4 #2)."""
    from cloudscape_tpu.ops.brick import build_brick2_device

    cp = build_brick2_device(
        jnp.concatenate([cloud_ring[cfrom], cloud_ring[cto]], axis=-1),
        (4, 4), (3, 3), wrap="clamp")
    sp = build_brick2_device(
        jnp.concatenate([sky_ring[b0], sky_ring[b1]], axis=-1),
        (4, 4), (3, 3), wrap="clamp")
    return cp, sp


@partial(
    jax.jit,
    static_argnames=("texture_size", "region", "steps", "light_steps",
                     "kernel", "deband", "capacity_frac", "ray_keep_frac",
                     "skip_march"),
    donate_argnums=(0,),
)
def _render_frame_fused(ring, sky_ring, tex_idx, x0, y0, cloud_pair,
                        sky_pair, params: MarchParams, noise, sky_slot,
                        tlut, eyedirs, blend_amount, light_dir,
                        sun_disk_scale, prio_map=None, *, texture_size: int,
                        region: int, steps: int, light_steps: int,
                        kernel: str, deband: bool = False,
                        capacity_frac: float = 0.5,
                        ray_keep_frac: float | None = None,
                        skip_march: bool = False):
    """One display frame in ONE device dispatch: tile update + composite.

    The split `update_sky()` + `render_view()` path pays two dispatches
    (~60 ms relay RTT each through the axon tunnel); the serving path fuses
    them (VERDICT r1 next-#5). skip_march (the tile-cull 0.0 bucket) writes
    the provably-empty tile as zeros — exactly the all-culled march result —
    and keeps only the composite. cloud_pair/sky_pair: the cycle's
    8-channel pair brick tables (`_build_display_pair`). Returns
    (new_ring, frame)."""
    from cloudscape_tpu.models.compositor import composite_display

    if skip_march:
        tile = jnp.zeros((region, region, 4), jnp.float32)
    else:
        dirs = texel_directions(texture_size, x0=x0, y0=y0, width=region,
                                height=region)
        cull_prio = None
        if prio_map is not None and ray_keep_frac is not None:
            cull_prio = jax.lax.dynamic_slice(prio_map, (y0, x0),
                                              (region, region))
        tile = _march_tile(dirs, params, noise, sky_ring[sky_slot],
                           region=region, steps=steps,
                           light_steps=light_steps, kernel=kernel,
                           capacity_frac=capacity_frac,
                           ray_keep_frac=ray_keep_frac, cull_prio=cull_prio)
    ring = jax.lax.dynamic_update_slice(ring, tile[None], (tex_idx, y0, x0, 0))
    # tlut stays raw: since the constant-position hoist in get_atmo the
    # composite reads it exactly once per frame — rebricking the whole LUT
    # to serve one fetch was pure overhead.
    frame = composite_display(eyedirs, cloud_pair, sky_pair, tlut, light_dir,
                              sun_disk_scale, blend_amount, deband=deband)
    return ring, frame


@partial(jax.jit, donate_argnums=(0,))
def _update_sky_lut_slot(sky_ring, slot_idx, tlut, sun_direction):
    """Render the 200×100 sky-view LUT into ring[slot_idx]
    (`sky_lut.gd:122-141`). Kept for probes/back-compat; the engine now
    renders via `_sky_lut_jit` + `_write_sky_slot` so the boundary write
    can consume a slot prebaked during the previous cycle."""
    img = atmosphere.sky_lut(tlut, sun_direction)
    return jax.lax.dynamic_update_slice(
        sky_ring, img[None], (slot_idx, 0, 0, 0)
    )


@partial(jax.jit, donate_argnums=(0,))
def _write_sky_slot(sky_ring, slot_idx, img):
    """Write a prerendered sky-LUT image into ring[slot_idx] (near-zero
    device work — the pickup half of the pipelined sky render)."""
    return jax.lax.dynamic_update_slice(
        sky_ring, img[None], (slot_idx, 0, 0, 0)
    )


class CloudSkyEngine:
    """User-facing engine with the reference's parameter surface and
    scheduling semantics."""

    SKY_LUT_SHAPE = (100, 200, 4)

    def __init__(
        self,
        perf: PerfConfig = PerfConfig(),
        config: CloudConfig = CloudConfig(),
        sun: SunState = SunState(direction=(0.0, 0.5, -1.0)),
        noise: Optional[NoisePack] = None,
        now: float = 0.0,
        kernel: str = "fast3",
        mesh=None,
        cone_res=(32, 512, 512),
        tile_cull: bool = False,
        cone_prebake: Optional[bool] = None,
    ):
        """kernel: "fast3" (the default — the production/headline kernel,
        matching the reference's one-shipped-kernel stance
        `cloud_sky.gd:234-248`: bucketed tiles take the v3 cell-gated march,
        bucket-less tiles below V3_TILE_MIN_RAYS march DENSE with zero
        machinery, larger bucket-less tiles take the staged v2 path, and
        monolithic renders go through the measured-policy v3 cell-gated
        march — the same kernel bench.py times), "hier" (the hierarchical
        window-lattice march through the v3 cell-gated core — BASELINE
        config 5's adaptive-step kernel, the reference's own top TODO,
        servable per tile and monolithic; ≥40 dB gated in
        tests/test_hierarchical.py), "fast2" (row-lean staged
        march + per-cycle cone-density cache), "fast" (brick-table,
        occupancy-compacted march — exact vs the scan anchor), or
        "reference" (scan-based march, the numerics anchor; all gated
        against the f64 oracle).

        cone_res: (hf, z, x) resolution of the fast2 cone cache, rebuilt at
        every cycle boundary ((32, 512, 512) holds 42 dB at the full bench
        scale; cost ~0.6 s/cycle on a v5e, amortized over frames_to_update).

        mesh: an optional `jax.sharding.Mesh` — tile updates compute with
        rays sharded over the mesh's first axis (ICI), state replicated.
        The tile edge must divide the mesh size.

        tile_cull (fast2): per-tile ray culling from a per-cycle priority
        map — FrameData is frozen for a whole cycle, so one cheap prepass
        at rotation scores every texel, and each tile dispatch marches only
        its scored-occupied rays (bucketed capacity, soft degradation;
        ≥40 dB gated in tests/test_engine.py). A tile whose whole window
        scores empty takes the 0.0 bucket: the march is skipped and zeros
        (exactly the all-culled result) are written. Composes with `mesh`
        (the priority map is computed replicated and each shard culls its
        row block — tests/test_sharding.py). Default off: culled tiles are
        not bitwise-identical to unculled ones (the amortized ≡ monolithic
        invariant holds only within a mode)."""
        if kernel not in ("fast", "fast2", "fast3", "hier", "reference"):
            raise ValueError(f"unknown kernel {kernel!r}")
        self.kernel = kernel
        # "Staged" kernels march against the per-cycle cone-density cache
        # (fast2's row-lean staged march; fast3's dense/v2/v3 tile policy;
        # hier's window-lattice march).
        self._staged = kernel in ("fast2", "fast3", "hier")
        self.cone_res = tuple(cone_res)
        self.mesh = mesh
        self.tile_cull = bool(tile_cull) and self._staged
        # cone_prebake (fast2, default ON): amortize the per-cycle cone bake
        # over the cycle's ticks by freezing FrameData one rotation ahead
        # (see _PendingCycle). With a static scene the output is bitwise
        # identical to the synchronous bake; with moving sun/wind/config the
        # parameters take effect one cycle later than the reference's
        # boundary pickup (documented in docs/PARITY.md). Set False for
        # exact reference pickup latency (and the boundary-frame stall).
        self.cone_prebake = self._staged if cone_prebake is None \
            else (bool(cone_prebake) and self._staged)
        self._pending: Optional[_PendingCycle] = None
        self._v3_policy_cache = None
        self._prio_map = None
        self._tile_buckets = None
        self.perf = perf.validate()
        if mesh is not None and self.perf.update_region_size % mesh.devices.size:
            raise ValueError(
                f"update_region_size {self.perf.update_region_size} must "
                f"divide the mesh size {mesh.devices.size}"
            )
        self.config = config
        self.sun = sun
        self.noise = noise if noise is not None else reference_noise_pack()
        if kernel in ("fast", "fast2", "fast3", "hier"):
            from cloudscape_tpu.models.march_fast import BrickPack

            self._bricks = BrickPack.from_noise(self.noise)
        else:
            self._bricks = None
        self._cone_cache = None

        # Baked once at load, like `transmittance_lut.gd:51-78`.
        self.transmittance = atmosphere.transmittance_lut()

        n = self.perf.texture_size
        self.cloud_ring = jnp.zeros((3, n, n, 4), jnp.float32)
        self.sky_ring = jnp.zeros((3,) + self.SKY_LUT_SHAPE, jnp.float32)
        self._display_pair = None

        self.frame_data = FrameData()
        self._head_frame_data = self.frame_data  # replaced by a copy at refresh
        self._picked_sky = None
        self._derive_prebake_schedule()
        self.ring = RingState()
        self._start_time: Optional[float] = None
        self.needs_full_sky_init = True
        self._sky_lut_needs_full_update = True  # sky_lut.gd `needs_full_update`
        self._refresh_frame_data(now)

        # Validate-then-enable, like the reference's invalid-shader guard
        # (`cloud_sky.gd:362-364`: a kernel that fails to build sets
        # can_run=false and the driver no-ops instead of crashing).
        self.can_run = self._validate_kernels()

    def _validate_kernels(self) -> bool:
        """Abstract-eval the tile-update kernel with this engine's shapes —
        the mesh-sharded variant when a mesh is configured, since that is the
        kernel the render loop will actually dispatch; a trace/shape error
        disables the engine rather than raising from the loop."""
        try:
            noise_arg = self._noise_arg
            common = dict(
                texture_size=self.perf.texture_size,
                region=self.perf.update_region_size,
                steps=self.perf.march_steps,
                light_steps=self.perf.light_steps,
                kernel=self.kernel,
                capacity_frac=0.5,
            )
            if self.mesh is not None:
                fn = partial(_update_tile_mesh, mesh=self.mesh,
                             axis_name=self.mesh.axis_names[0], **common)
            else:
                fn = partial(_update_tile, **common)
            jax.eval_shape(
                fn,
                self.cloud_ring, jnp.int32(0), jnp.int32(0), jnp.int32(0),
                self._march_params, noise_arg, self.sky_ring[0],
            )
            return True
        except Exception as e:
            print(f"cloudscape_tpu: kernel validation failed, engine disabled: {e}")
            return False

    # ------------------------------------------------------------------ API

    def set_sun(self, direction, energy: float = 1.0, color=(1.0, 1.0, 1.0),
                srgb_color: bool = False) -> None:
        """The `sun.gd` binding: update the light; picked up at the next
        texture-swap boundary (`cloud_sky.gd:165-167`)."""
        self.sun = SunState(tuple(direction), float(energy), tuple(color))
        self._sun_srgb = srgb_color

    def set_config(self, config: CloudConfig) -> None:
        """Dynamic parameter change; snapshotted at the next cycle boundary
        (FrameData semantics)."""
        self.config = config

    def set_performance(self, perf: PerfConfig) -> None:
        """Performance-settings change — the analog of the reference's
        `frames_to_update` / `texture_size` setters (`cloud_sky.gd:35-50`):
        tear down the texture rings, re-derive tile math (with the
        divisibility auto-correction), and request a full warm re-init.
        Jitted executables for the new shapes compile on the next tick."""
        corrected = perf.validate()
        if corrected.texture_size != perf.texture_size:
            # `cloud_sky.gd:114` prints the same correction notice.
            print(
                "cloudscape_tpu: texture_size is not a multiple of "
                f"sqrt(frames_to_update), changing to: {corrected.texture_size}"
            )
        if self.mesh is not None and \
                corrected.update_region_size % self.mesh.devices.size:
            raise ValueError(
                f"update_region_size {corrected.update_region_size} must "
                f"divide the mesh size {self.mesh.devices.size}"
            )
        self.perf = corrected
        n = self.perf.texture_size
        self.cloud_ring = jnp.zeros((3, n, n, 4), jnp.float32)
        self._display_pair = None
        self.ring.reset()
        self._pending = None  # stale snapshot/slab schedule
        self._picked_sky = None
        self._derive_prebake_schedule()
        self.request_full_sky_init()
        self.can_run = self._validate_kernels()

    def request_full_sky_init(self) -> None:
        """`cloud_sky.gd:120-121`."""
        self.needs_full_sky_init = True

    # ------------------------------------------------------------ scheduling

    def _now(self, now: Optional[float]) -> float:
        if now is not None:
            return float(now)
        if self._start_time is None:
            self._start_time = _time.monotonic()
        return _time.monotonic() - self._start_time

    # Measured per-unit device costs on a v5e (bench/probe_prebake2.py +
    # the round-5 re-measurement after the display-pair/segscan work;
    # docs/PERF_NOTES.md). Used ONLY for slice sizing — correctness never
    # depends on them (every slice schedule reproduces the synchronous
    # bake bitwise; see tests/test_cone_prebake.py).
    _BAKE_COSTS = {
        "cone_us_per_cell": 0.06,    # cone-march per compacted cell
        "asm_us_per_row": 1.9,       # cone brick-table assembly per row
        "occ_us_per_cell": 0.0105,   # pre>0 occupancy eval per grid cell
        "sky_ms_per_row": 0.2,       # sky-LUT in-scattering per row
        "cull_us_per_ray": 0.7,      # cull-prepass raw per scored ray
    }
    # Per-tick added-device-work budget: ≲0.4× a steady serving tick, so
    # the flat-frame-cost gate (per_tile_hitch ≤ 1.4, VERDICT r4 #3) holds
    # with margin for relay jitter.
    _BAKE_TICK_MS = 14.0

    def _derive_prebake_schedule(self) -> None:
        """Per-tick stage sizing for the amortized cycle bake, derived from
        the measured per-unit costs above: every stage step is sized to
        ≲_BAKE_TICK_MS of device work. When the resulting step count
        doesn't fit in frames_to_update ticks, the per-tick budget scales
        up until it does (the per-cycle bake total is fixed; fewer ticks
        just means each carries more). When even that fails (tiny cycles),
        the pending bake simply isn't ready at the boundary and the
        synchronous fallback runs — correctness never depends on the
        schedule fitting."""
        from cloudscape_tpu.models.march_fast import cone_capacity
        from cloudscape_tpu.ops.brick import brick3_grid

        c = self._BAKE_COSTS
        n = int(np.prod(self.cone_res))
        self._cone_capacity = cone_capacity(n, 0.45, 65536)
        self._n_bricks = int(np.prod(brick3_grid(self.cone_res, (7, 3, 3))))
        if self.tile_cull:
            stride = 2 if self.perf.texture_size % 2 == 0 else 1
            self._cull_stride = stride
            self._n_sub = (self.perf.texture_size // stride) ** 2
            ps = max(1, self.perf.march_steps // 4)
            while self.perf.march_steps % ps:
                ps -= 1
            self._cull_ps = ps
            self._dirs_sub = texel_directions(
                self.perf.texture_size
            )[::stride, ::stride].reshape(-1, 3)
        else:
            self._n_sub = 0

        def plan(budget_ms: float):
            """Stage-step counts/sizes at one per-tick budget."""
            occ_slice = max(int(budget_ms * 1e3 / c["occ_us_per_cell"]), 1)
            cone_slice = max(int(budget_ms * 1e3 / c["cone_us_per_cell"]), 1)
            asm_slice = max(int(budget_ms * 1e3 / c["asm_us_per_row"]), 1)
            sky_rows = max(int(budget_ms / c["sky_ms_per_row"]), 1)
            # Slice sizes ride jit cache keys — quantize so nearby budgets
            # (and the clamped final slice) share executables.
            occ_slice = min(_ceil_to(occ_slice, 65536), n)
            cone_slice = min(_ceil_to(cone_slice, 16384),
                             self._cone_capacity)
            asm_slice = min(_ceil_to(asm_slice, 2048), self._n_bricks)
            sky_rows = min(sky_rows, self.SKY_LUT_SHAPE[0])
            while self.SKY_LUT_SHAPE[0] % sky_rows:
                sky_rows -= 1
            counts = {
                "occ": -(-n // occ_slice),
                "cone": -(-self._cone_capacity // cone_slice),
                "asm": -(-self._n_bricks // asm_slice),
                "sky": self.SKY_LUT_SHAPE[0] // sky_rows,
            }
            if self.tile_cull:
                cull_slice = max(int(budget_ms * 1e3 / c["cull_us_per_ray"]),
                                 1)
                cull_slice = min(_ceil_to(cull_slice, 4096), self._n_sub)
                counts["cull"] = -(-self._n_sub // cull_slice)
            else:
                cull_slice = 0
                counts["cull"] = 0
            # skip, idx-finalize, wrap, (cull finalize + readback), slack
            fixed = 1 + 1 + 1 + (2 if self.tile_cull else 0) + 1
            total = fixed + sum(counts.values())
            return total, counts, occ_slice, cone_slice, asm_slice, \
                sky_rows, cull_slice

        # Seed at the larger of the flatness budget and the ideal uniform
        # load (total bake work / available ticks), then step up finely
        # until the integer step counts fit — coarse steps would leave
        # idle ticks that a smaller budget could have used for flatness.
        total_var_ms = (
            self._cone_capacity * c["cone_us_per_cell"]
            + n * c["occ_us_per_cell"]
            + self._n_bricks * c["asm_us_per_row"]
        ) * 1e-3 + self.SKY_LUT_SHAPE[0] * c["sky_ms_per_row"] \
            + self._n_sub * c["cull_us_per_ray"] * 1e-3
        avail = max(self.perf.frames_to_update - 6, 1)
        budget = max(self._BAKE_TICK_MS, total_var_ms / avail)
        total, counts, occ_s, cone_s, asm_s, sky_r, cull_s = plan(budget)
        while total > self.perf.frames_to_update and budget < 4096.0:
            budget *= 1.1
            total, counts, occ_s, cone_s, asm_s, sky_r, cull_s = plan(budget)
        self._occ_slice, self._n_occ = occ_s, counts["occ"]
        self._cone_slice, self._n_cone_slices = cone_s, counts["cone"]
        self._asm_slice, self._n_asm = asm_s, counts["asm"]
        self._sky_rows, self._n_sky = sky_r, counts["sky"]
        if self.tile_cull:
            self._cull_slice, self._n_cull = cull_s, counts["cull"]

    def _refresh_frame_data(self, now: float) -> None:
        """`_update_per_frame_data` (`cloud_sky.gd:165-187`) minus the LUT
        dispatch (handled by the caller).

        With cone_prebake (fast2 default): the snapshot pipeline is one
        cycle deep — the snapshot frozen at THIS rotation becomes active at
        the NEXT one, so its cone cache (and tile-cull priority map) can be
        baked incrementally across this cycle's ticks instead of stalling
        the boundary frame. Falls back to the synchronous bake whenever the
        pending bake didn't finish (cold start, update_cycle-driven use)."""
        self._v3_policy_cache = None  # per-snapshot (fast3 monolithic path)
        if not (self.cone_prebake and self._staged):
            self.frame_data.update_light_data(
                self.sun, getattr(self, "_sun_srgb", False))
            self.frame_data.update_config(self.config)
            self.frame_data.integrate_wind(now)
            self._march_params = self.frame_data.to_march_params()
            if self._staged:
                # The cone-density cache is valid for exactly one FrameData
                # snapshot; rebuild at every refresh (cycle boundary / warm
                # start). Cost amortizes over frames_to_update tile ticks.
                self._cone_cache = _build_cone_jit(
                    self._march_params, self._bricks,
                    light_steps=self.perf.light_steps, res=self.cone_res,
                )
                if self.tile_cull:
                    self._refresh_tile_cull()
            return

        # Pipelined: the head snapshot advances with reference semantics
        # (light + config + wind at every rotation, `cloud_sky.gd:165-187`);
        # what RENDERS is the head as of the previous rotation.
        head = self._head_frame_data
        head.update_light_data(self.sun, getattr(self, "_sun_srgb", False))
        head.update_config(self.config)
        head.integrate_wind(now)
        pend = self._pending
        ready = (pend is not None and pend.cone is not None
                 and pend.sky is not None
                 and (not self.tile_cull or pend.buckets is not None))
        if ready:
            self.frame_data = pend.frame_data
            self._march_params = pend.march_params
            self._cone_cache = pend.cone
            self._picked_sky = pend.sky
            if self.tile_cull:
                self._prio_map = pend.prio
                self._tile_buckets = pend.buckets
                self._warm_tile_cull_variants()
        else:
            # Synchronous fallback: freeze at the head (no latency) and pay
            # the boundary bake, exactly the non-prebake behavior.
            self._picked_sky = None
            self.frame_data = copy.deepcopy(head)
            self._march_params = self.frame_data.to_march_params()
            self._cone_cache = _build_cone_jit(
                self._march_params, self._bricks,
                light_steps=self.perf.light_steps, res=self.cone_res,
            )
            if self.tile_cull:
                self._refresh_tile_cull()
        fd = copy.deepcopy(head)
        self._pending = _PendingCycle(
            frame_data=fd,
            march_params=fd.to_march_params(),
            vol=jnp.zeros((int(np.prod(self.cone_res)),), jnp.float32),
        )

    _TILE_BUCKETS = (0.0, 0.25, 0.5, 0.75, 1.0)

    def _compute_tile_cull(self, params):
        """Tile-cull state for one frozen snapshot: a full-texture priority
        prepass + one host transfer of the per-tile keep fractions, bucketed
        with a 1.1 margin. Capacity shortfalls degrade softly (thinnest rays
        drop first). Returns (prio_map, buckets)."""
        from cloudscape_tpu.models.march_fast import cull_priority_map

        steps = self.perf.march_steps
        ps = max(1, steps // 4)
        while steps % ps:
            ps -= 1
        region = self.perf.update_region_size
        stride = 2 if self.perf.texture_size % 2 == 0 else 1
        if self.kernel == "fast3":
            prio, tile_keep, tile_cell = cull_priority_map(
                texel_directions(self.perf.texture_size), params,
                self._bricks, steps=steps, prepass_steps=ps,
                ray_stride=stride, region=region, cell_margin=0.1,
            )
            keep = np.asarray(tile_keep).reshape(-1)
            cell = np.asarray(tile_cell).reshape(-1)
            return prio, self._buckets_from_keep(keep, cell)
        prio, tile_keep = cull_priority_map(
            texel_directions(self.perf.texture_size), params,
            self._bricks, steps=steps, prepass_steps=ps,
            ray_stride=stride, region=region,
        )
        keep = np.asarray(tile_keep).reshape(-1)  # row-major tile order
        return prio, self._buckets_from_keep(keep)

    def _buckets_from_keep(self, keep, cell=None):
        """Quantize per-tile fractions into the warmed capacity buckets
        (shared by the synchronous and amortized cull paths).

        fast2 ("fast"-family staged): RAY-keep buckets, 1.1 margin.
        fast3: the bucket is the tile's live-CELL capacity for the v3
        cell-gated arm (V3_TILE_CELL_BUCKETS, 1.12 margin — matching
        `select_cell_keep_frac`'s; overflow soft-drops far cells): 0.0 for
        a provably-empty tile (whole-tile skip), 1.0 for tiles above the
        top bucket (cell frac > 0.8/1.12 ≈ 0.71 live → dense arm, too
        little for the cell gate to remove) otherwise."""
        if self.kernel == "fast3":
            buckets = []
            for k, c in zip(keep, cell):
                if k * 1.1 <= 0.0:
                    buckets.append(0.0)
                    continue
                for b in V3_TILE_CELL_BUCKETS:
                    if c * 1.12 <= b:
                        buckets.append(b)
                        break
                else:
                    buckets.append(1.0)
            return buckets
        buckets = []
        for k in keep:
            for b in self._TILE_BUCKETS:
                if k * 1.1 <= b:
                    buckets.append(b)
                    break
            else:
                buckets.append(1.0)
        return buckets

    def _refresh_tile_cull(self) -> None:
        prio, buckets = self._compute_tile_cull(self._march_params)
        self._prio_map = prio
        self._tile_buckets = buckets
        self._warm_tile_cull_variants()

    def _advance_prebake(self) -> None:
        """One tick of the pending cycle's amortized bake (cone_prebake) —
        one stage step per tick, each sized ≲1 steady tile tick of device
        work so NO tick of the cycle spikes (VERDICT r2 #2; decomposition
        measured in bench/probe_prebake2.py): the boundary tick itself is
        skipped (`fresh`), then occupancy compaction, cone-march slices,
        brick-table row slices (the former one-shot assembly was ~240 ms),
        metadata wrap (free), the pipelined sky-LUT slot, cull prepass
        slices, cull finalize (dispatch only), and the tile-keep host
        readback (tiny — the prepass itself completed ticks ago)."""
        pend = self._pending
        if pend is None or not (self.cone_prebake and self._staged):
            return
        if pend.fresh:
            pend.fresh = False
            return
        if pend.cone is None:
            if pend.idx is None and pend.occ_done < self._n_occ:
                # Occupancy pre>0 eval, sliced (the one-shot form measured
                # ~112 ms — the single largest prebake-tick spike).
                if pend.occ is None:
                    pend.occ = jnp.zeros((int(np.prod(self.cone_res)),),
                                         bool)
                n = int(np.prod(self.cone_res))
                i0 = min(pend.occ_done * self._occ_slice,
                         max(n - self._occ_slice, 0))
                pend.occ = _occ_slice_jit(self.cone_res, self._occ_slice)(
                    pend.occ, jnp.int32(i0), pend.march_params, self._bricks)
                pend.occ_done += 1
            elif pend.idx is None:
                pend.idx = _occ_finalize_jit(self.cone_res)(pend.occ)
                pend.occ = None
            elif pend.slices_done < self._n_cone_slices:
                i0 = min(pend.slices_done * self._cone_slice,
                         max(self._cone_capacity - self._cone_slice, 0))
                pend.vol = _cell_baker(
                    self.perf.light_steps, self.cone_res, self._cone_slice
                )(pend.vol, pend.idx, jnp.int32(i0), pend.march_params,
                  self._bricks)
                pend.slices_done += 1
            elif pend.asm_done < self._n_asm:
                if pend.table is None:
                    pend.table = jnp.zeros((self._n_bricks, 128),
                                           jnp.float32)
                b0 = min(pend.asm_done * self._asm_slice,
                         max(self._n_bricks - self._asm_slice, 0))
                pend.table = _asm_baker(self.cone_res, self._asm_slice)(
                    pend.table, pend.vol, jnp.int32(b0))
                pend.asm_done += 1
            else:
                from cloudscape_tpu.models.march_fast import wrap_cone_table

                pend.cone = wrap_cone_table(pend.table, self.cone_res)
                pend.table = None
                pend.vol = None
                pend.idx = None
        elif pend.sky is None:
            # Sky-view LUT in row bands (the one-shot render measured
            # ~48 ms); every engine sky render uses the same banded
            # executable, so the prebaked image is bitwise the boundary
            # fallback's by construction.
            if pend.sky_rows is None:
                pend.sky_rows = []
            r0 = len(pend.sky_rows) * self._sky_rows
            pend.sky_rows.append(_sky_rows_jit(self._sky_rows)(
                self.transmittance,
                jnp.asarray(pend.frame_data.light_direction, jnp.float32),
                jnp.int32(r0)))
            if len(pend.sky_rows) >= self._n_sky:
                pend.sky = jnp.concatenate(pend.sky_rows, axis=0)
                pend.sky_rows = None
        elif self.tile_cull and pend.buckets is None:
            if pend.prio is None and pend.cull_done < self._n_cull:
                if pend.raw is None:
                    pend.raw = jnp.zeros((self._n_sub, self._cull_ps),
                                         jnp.float32)
                i0 = min(pend.cull_done * self._cull_slice,
                         max(self._n_sub - self._cull_slice, 0))
                pend.raw = _cull_raw_jit(
                    self._cull_slice, self.perf.march_steps, self._cull_ps
                )(pend.raw, self._dirs_sub, jnp.int32(i0),
                  pend.march_params, self._bricks)
                pend.cull_done += 1
            elif pend.prio is None:
                pend.prio, pend.tile_keep, pend.tile_cell = \
                    _cull_finalize_jit(
                        self.perf.update_region_size, self._cull_stride
                    )(pend.raw, texel_directions(self.perf.texture_size))
                pend.raw = None
            else:
                keep = np.asarray(pend.tile_keep).reshape(-1)
                cell = np.asarray(pend.tile_cell).reshape(-1)
                pend.tile_keep = None
                pend.tile_cell = None
                pend.buckets = self._buckets_from_keep(keep, cell)

    def _warm_tile_cull_variants(self) -> None:
        """Compile every culled tile-update executable this cycle can
        dispatch, on a scratch ring — a remote TPU compile is 20-60 s, and
        paying it mid-flight would stall the serving loop for whole
        seconds (seen directly in per-tile timings). The reference's
        analog is shader precompilation at load."""
        want = set(self._tile_buckets)
        done = getattr(self, "_warmed_tile_buckets", set())
        for b in sorted(want - done):
            scratch = self.cloud_ring + 0.0  # donated away by the call
            if b == 0.0:
                _clear_tile(scratch, jnp.int32(0), jnp.int32(0), jnp.int32(0),
                            region=self.perf.update_region_size)
                continue
            common = dict(
                texture_size=self.perf.texture_size,
                region=self.perf.update_region_size,
                steps=self.perf.march_steps,
                light_steps=self.perf.light_steps,
                kernel=self.kernel,
                capacity_frac=0.5,
                # Bucket 1.0 dispatches the uncull variant (prio None,
                # rk None) — it must be warmed too or the first full tile
                # of a cycle stalls on a 20-60 s remote compile.
                ray_keep_frac=None if b >= 1.0 else b,
            )
            prio = None if b >= 1.0 else self._prio_map
            if self.mesh is not None:
                _update_tile_mesh(
                    scratch, jnp.int32(0), jnp.int32(0), jnp.int32(0),
                    self._march_params, self._noise_arg, self.sky_ring[0],
                    prio, mesh=self.mesh,
                    axis_name=self.mesh.axis_names[0], **common,
                )
            else:
                _update_tile(
                    scratch, jnp.int32(0), jnp.int32(0), jnp.int32(0),
                    self._march_params, self._noise_arg, self.sky_ring[0],
                    prio, **common,
                )
        self._warmed_tile_buckets = done | want

    def _display_pair_tables(self):
        """The cycle's 8-channel display-pair brick tables (lazy; rebuilt
        once per rotation — every ring-mutation site nulls the cache). See
        `_build_display_pair`."""
        if self._display_pair is None:
            b0, b1 = self.ring.sky_back_textures
            self._display_pair = _build_display_pair(
                self.cloud_ring,
                jnp.int32(self.ring.texture_to_blend_from),
                jnp.int32(self.ring.texture_to_blend_to),
                self.sky_ring, jnp.int32(b0), jnp.int32(b1))
        return self._display_pair

    def _warm_fused_variants(self, eyedirs, deband: bool) -> None:
        """Compile the fused serving executable for every cull bucket this
        cycle can dispatch at this camera shape (see
        `_warm_tile_cull_variants` — a mid-flight remote compile stalls
        serving for ~20-60 s)."""
        want = set(self._tile_buckets)
        key = (eyedirs.shape, bool(deband))
        warmed = getattr(self, "_warmed_fused", {})
        done = warmed.get(key, set())
        cloud_pair, sky_pair = self._display_pair_tables()
        for b in sorted(want - done):
            scratch = self.cloud_ring + 0.0
            if b == 0.0:
                _render_frame_fused(
                    scratch, self.sky_ring, jnp.int32(0), jnp.int32(0),
                    jnp.int32(0), cloud_pair, sky_pair,
                    self._march_params, self._noise_arg,
                    jnp.int32(0), self.transmittance, eyedirs,
                    jnp.float32(0.5),
                    jnp.asarray(self.frame_data.light_direction, jnp.float32),
                    jnp.float32(self.config.sun_disk_scale),
                    None,
                    texture_size=self.perf.texture_size,
                    region=self.perf.update_region_size,
                    steps=self.perf.march_steps,
                    light_steps=self.perf.light_steps,
                    kernel=self.kernel,
                    deband=deband,
                    capacity_frac=0.5,
                    ray_keep_frac=None,
                    skip_march=True,
                )
                continue
            # Bucket 1.0 dispatches the uncull variant (prio None, rk
            # None) — warm it too (see _warm_tile_cull_variants).
            _render_frame_fused(
                scratch, self.sky_ring, jnp.int32(0), jnp.int32(0),
                jnp.int32(0), cloud_pair, sky_pair,
                self._march_params, self._noise_arg,
                jnp.int32(0), self.transmittance, eyedirs,
                jnp.float32(0.5),
                jnp.asarray(self.frame_data.light_direction, jnp.float32),
                jnp.float32(self.config.sun_disk_scale),
                None if b >= 1.0 else self._prio_map,
                texture_size=self.perf.texture_size,
                region=self.perf.update_region_size,
                steps=self.perf.march_steps,
                light_steps=self.perf.light_steps,
                kernel=self.kernel,
                deband=deband,
                capacity_frac=0.5,
                ray_keep_frac=None if b >= 1.0 else b,
                # The real dispatch always passes skip_march explicitly;
                # kwarg PRESENCE is part of the jit cache key.
                skip_march=False,
            )
        warmed[key] = done | want
        self._warmed_fused = warmed

    def _tile_cull_args(self, x0: int, y0: int):
        """(prio_map, ray_keep_frac) for the tile at (x0, y0) — (None,
        None) when culling is off or the tile's bucket is 1.0; ray_keep_frac
        == 0.0 means the tile is provably empty sky (skip the march and
        write zeros)."""
        if not self.tile_cull or self._tile_buckets is None:
            return None, None
        region = self.perf.update_region_size
        tiles_per_row = self.perf.texture_size // region
        b = self._tile_buckets[(y0 // region) * tiles_per_row
                               + (x0 // region)]
        if b >= 1.0:
            return None, None
        if b == 0.0:
            return None, 0.0
        return self._prio_map, b

    @property
    def _noise_arg(self):
        """The `noise` argument the tile kernels expect for this engine's
        kernel mode."""
        if self._staged:
            return (self._bricks, self._cone_cache)
        if self.kernel == "fast":
            return self._bricks
        return self.noise

    def _render_sky_image(self, sun_dir) -> jax.Array:
        """One full sky-view LUT image through the banded executable the
        amortized prebake uses (`_sky_rows_jit`) — full render = all bands
        back to back, so prebaked ≡ synchronous bitwise on any backend."""
        rows = getattr(self, "_sky_rows", self.SKY_LUT_SHAPE[0])
        bands = [
            _sky_rows_jit(rows)(self.transmittance, sun_dir, jnp.int32(r0))
            for r0 in range(0, self.SKY_LUT_SHAPE[0], rows)
        ]
        return bands[0] if len(bands) == 1 \
            else jnp.concatenate(bands, axis=0)

    def _render_sky_lut(self) -> None:
        """One LUT render + ring rotation (`sky_lut.gd:122-148`), three times
        on first use so all slots are valid (`sky_lut.gd:49-52`)."""
        renders = 3 if self._sky_lut_needs_full_update else 1
        self._sky_lut_needs_full_update = False
        sun_dir = jnp.asarray(self.frame_data.light_direction, jnp.float32)
        picked = getattr(self, "_picked_sky", None)
        for _ in range(renders):
            # The pipelined slot (prebaked last cycle from the SAME
            # frame_data sun this boundary picks up) when available;
            # identical executables either way, so values are bitwise.
            img = picked if (renders == 1 and picked is not None) \
                else self._render_sky_image(sun_dir)
            self.sky_ring = _write_sky_slot(
                self.sky_ring, self.ring.sky_lut_current, img
            )
            self.ring.advance_sky_lut()
        self._picked_sky = None

    def _batch_remaining_tiles(self) -> None:
        """Render every remaining tile of the current cycle in one dispatch
        and advance the cursor/frame state to the cycle end."""
        n_frames = self.perf.frames_to_update
        region = self.perf.update_region_size
        tiles_per_row = self.perf.texture_size // region
        x, y = self.ring.update_position
        start_tile = (y // region) * tiles_per_row + (x // region)
        remaining = n_frames - self.ring.frame
        if remaining <= 0:
            return
        self.cloud_ring = _update_tiles_batch(
            self.cloud_ring,
            jnp.int32(self.ring.texture_to_update),
            jnp.int32(start_tile),
            self._march_params,
            self._noise_arg,
            self.sky_ring[self.ring.cloud_kernel_sky_slot],
            texture_size=self.perf.texture_size,
            region=region,
            steps=self.perf.march_steps,
            light_steps=self.perf.light_steps,
            kernel=self.kernel,
            count=remaining,
            capacity_frac=0.5,
        )
        self.ring.update_position = (0, 0)
        self.ring.frame = n_frames
        self._blend_amount = 1.0

    def update_cycle(self, now: Optional[float] = None) -> None:
        """Complete one full amortized cycle in a single device dispatch.

        Batch/offline counterpart of the per-frame `update_sky` (the
        reference has no analog — it must spread work over frames for a
        60 Hz display; a serving deployment rendering discrete frames wants
        the whole hemisphere per call without per-tile host round trips).
        Scheduling semantics (rotation, FrameData snapshot, LUT phasing)
        are identical.
        """
        if not getattr(self, "can_run", True):
            return
        now = self._now(now)
        if self.needs_full_sky_init:
            self.needs_full_sky_init = False
            self.initialize_sky(now)
        if self.ring.frame >= self.perf.frames_to_update:
            self.ring.rotate_cloud()
            self._display_pair = None
            self._refresh_frame_data(now)
            self._render_sky_lut()
        self._batch_remaining_tiles()

    def initialize_sky(self, now: float) -> None:
        """Warm start (`cloud_sky.gd:123-127`): two full synchronous cycles
        so the sky is complete on the first visible frame — batched into two
        dispatches."""
        self._display_pair = None
        self._refresh_frame_data(now)
        self._render_sky_lut()
        for _ in range(2):
            if self.ring.frame >= self.perf.frames_to_update:
                self.ring.rotate_cloud()
                self._refresh_frame_data(now)
                self._render_sky_lut()
            self._batch_remaining_tiles()

    def update_sky(self, now: Optional[float] = None) -> None:
        """One per-frame tick (`cloud_sky.gd:129-163`): rotate rings at cycle
        boundaries, refresh FrameData + sky LUT, dispatch one tile update,
        advance the cursor."""
        if not getattr(self, "can_run", True):  # `cloud_sky.gd:130-131`
            return
        now = self._now(now)
        if self.needs_full_sky_init:
            self.needs_full_sky_init = False
            self.initialize_sky(now)

        if self.ring.frame >= self.perf.frames_to_update:
            self.ring.rotate_cloud()
            self._display_pair = None
            self._refresh_frame_data(now)
            self._render_sky_lut()

        # Captured before the dispatch, exactly like `cloud_sky.gd:152`: the
        # display this frame blends with frame/N for the tile count *before*
        # this update.
        self._blend_amount = self.ring.blend_amount(self.perf.frames_to_update)

        common = dict(
            texture_size=self.perf.texture_size,
            region=self.perf.update_region_size,
            steps=self.perf.march_steps,
            light_steps=self.perf.light_steps,
            kernel=self.kernel,
            capacity_frac=0.5,
        )
        args = (
            self.cloud_ring,
            jnp.int32(self.ring.texture_to_update),
            jnp.int32(self.ring.update_position[0]),
            jnp.int32(self.ring.update_position[1]),
            self._march_params,
            self._noise_arg,
            self.sky_ring[self.ring.cloud_kernel_sky_slot],
        )
        prio_map, rk = self._tile_cull_args(*self.ring.update_position)
        if rk is not None and rk == 0.0:
            self.cloud_ring = _clear_tile(
                self.cloud_ring,
                jnp.int32(self.ring.texture_to_update),
                jnp.int32(self.ring.update_position[0]),
                jnp.int32(self.ring.update_position[1]),
                region=self.perf.update_region_size,
            )
        elif self.mesh is not None:
            self.cloud_ring = _update_tile_mesh(
                *args, prio_map, ray_keep_frac=rk, mesh=self.mesh,
                axis_name=self.mesh.axis_names[0], **common,
            )
        else:
            self.cloud_ring = _update_tile(*args, prio_map,
                                           ray_keep_frac=rk, **common)
        self.ring.advance_cursor(self.perf.update_region_size, self.perf.texture_size)
        self._advance_prebake()

    # --------------------------------------------------------------- display

    @property
    def blend_amount(self) -> float:
        return getattr(
            self, "_blend_amount", self.ring.blend_amount(self.perf.frames_to_update)
        )

    def render_view(self, eyedirs, deband: bool = False) -> jax.Array:
        """Composite the current sky for arbitrary view directions
        (`clouds.gdshader:104-116` equivalent). eyedirs: [..., 3] world.
        deband adds the reference's zero-mean display dither
        (`clouds.gdshader:1` `render_mode use_debanding`)."""
        b0, b1 = self.ring.sky_back_textures
        return composite(
            jnp.asarray(eyedirs, jnp.float32),
            self.cloud_ring[self.ring.texture_to_blend_from],
            self.cloud_ring[self.ring.texture_to_blend_to],
            self.sky_ring[b0],
            self.sky_ring[b1],
            self.transmittance,
            jnp.float32(self.blend_amount),
            jnp.asarray(self.frame_data.light_direction, jnp.float32),
            jnp.float32(self.config.sun_disk_scale),
            deband=deband,
        )

    def render_radiance_map(self, size: int = 32, prefilter: bool = False):
        """Environment-probe render — the analog of the Sky resource's
        radiance cubemap (`cloud_sky/clouds_sky.tres:8` `radiance_size = 1`,
        Godot's RADIANCE_SIZE_32): the current sky composited over a 6-face
        cubemap so scene reflections can sample it. Face order/orientation
        follows the GL cubemap convention (+X, -X, +Y, -Y, +Z, -Z).

        prefilter=False returns the sharp [6, size, size, 3] linear-HDR
        cubemap. prefilter=True returns the full roughness mip chain Godot's
        Sky resource bakes for specular IBL — a list of [6, s, s, 3] levels
        at s = size, size/2, …, 4; level k is the base level convolved with
        a normalized cosine-power lobe whose exponent follows the standard
        roughness ladder α = 2/r² − 2 at r = k / n_mips (spherical
        convolution over the whole sphere, so face seams are exact)."""
        base = self.render_view(cubemap_directions(size))
        if not prefilter:
            return base
        mips = [base]
        n_in = 6 * size * size
        dirs_in = cubemap_directions(size).reshape(n_in, 3)
        sa_in = cubemap_solid_angles(size).reshape(n_in)
        colors = base.reshape(n_in, 3)
        sizes = []
        s = size
        while s > 4:
            s //= 2
            sizes.append(s)
        if not sizes:
            sizes = [max(size // 2, 1)]
        n_mips = len(sizes)
        for k, s in enumerate(sizes, start=1):
            r = k / n_mips
            exponent = max(2.0 / (r * r) - 2.0, 1.0) if r < 1.0 else 1.0
            out = _prefilter_mip(colors, dirs_in, sa_in,
                                 cubemap_directions(s).reshape(-1, 3),
                                 exponent=float(exponent))
            mips.append(out.reshape(6, s, s, 3))
        return mips

    def render_frame(self, eyedirs, now: Optional[float] = None,
                     amortized: bool = True, fused: Optional[bool] = None,
                     deband: bool = False) -> jax.Array:
        """One-call serving API: advance the sim and composite a camera frame.

        amortized=True ticks one tile (the reference's per-display-frame
        cost); amortized=False completes a whole cycle first (discrete-frame
        rendering, e.g. offline sequences).

        fused (default: on for the amortized single-chip path) runs the tile
        update AND the composite in ONE device dispatch — the split path pays
        two host→device round trips per frame (~60 ms each through the axon
        relay). Bit-identical to the split path (tested).
        """
        if fused is None:
            fused = amortized and self.mesh is None
        if not amortized:
            self.update_cycle(now)
            return self.render_view(eyedirs, deband=deband)
        if not fused or self.mesh is not None:
            self.update_sky(now)
            return self.render_view(eyedirs, deband=deband)

        # Fused single-dispatch tick+composite. Host-side scheduling is
        # identical to update_sky().
        if not getattr(self, "can_run", True):
            return self.render_view(eyedirs, deband=deband)
        now = self._now(now)
        if self.needs_full_sky_init:
            self.needs_full_sky_init = False
            self.initialize_sky(now)
        if self.ring.frame >= self.perf.frames_to_update:
            self.ring.rotate_cloud()
            self._display_pair = None
            self._refresh_frame_data(now)
            self._render_sky_lut()
        self._blend_amount = self.ring.blend_amount(self.perf.frames_to_update)
        prio_map, rk = self._tile_cull_args(*self.ring.update_position)
        skip = rk is not None and rk == 0.0
        if skip:
            rk = None
        eyedirs = jnp.asarray(eyedirs, jnp.float32)
        if self.tile_cull and self._tile_buckets is not None:
            self._warm_fused_variants(eyedirs, deband)
        cloud_pair, sky_pair = self._display_pair_tables()
        self.cloud_ring, frame = _render_frame_fused(
            self.cloud_ring,
            self.sky_ring,
            jnp.int32(self.ring.texture_to_update),
            jnp.int32(self.ring.update_position[0]),
            jnp.int32(self.ring.update_position[1]),
            cloud_pair,
            sky_pair,
            self._march_params,
            self._noise_arg,
            jnp.int32(self.ring.cloud_kernel_sky_slot),
            self.transmittance,
            jnp.asarray(eyedirs, jnp.float32),
            jnp.float32(self._blend_amount),
            jnp.asarray(self.frame_data.light_direction, jnp.float32),
            jnp.float32(self.config.sun_disk_scale),
            prio_map,
            texture_size=self.perf.texture_size,
            region=self.perf.update_region_size,
            steps=self.perf.march_steps,
            light_steps=self.perf.light_steps,
            kernel=self.kernel,
            deband=deband,
            capacity_frac=0.5,
            ray_keep_frac=rk,
            skip_march=skip,
        )
        self.ring.advance_cursor(self.perf.update_region_size,
                                 self.perf.texture_size)
        self._advance_prebake()
        return frame

    def _v3_march_knobs(self):
        """(prepass_steps, ray_stride) for the v3 march at this engine's
        shapes: the largest divisor of march_steps ≤ steps/4 (the cull/cell
        grid), stride 2 when the texture edge allows it."""
        steps = self.perf.march_steps
        ps = max(1, steps // 4)
        while steps % ps:
            ps -= 1
        return ps, (2 if self.perf.texture_size % 2 == 0 else 1)

    def _v3_policy(self, params):
        """Measured capacity buckets for the fast3 monolithic (v3) render —
        `v3_auto_policy` over the full texel grid (two probe-scale device
        calls), cached for the frozen cycle snapshot (recomputed whenever
        explicit params are passed; quantized buckets keep the executable
        count bounded)."""
        cycle = params is self._march_params
        if cycle and self._v3_policy_cache is not None:
            return self._v3_policy_cache
        from cloudscape_tpu.models.march_fast import (
            select_cell_keep_frac, v3_auto_policy,
        )

        ps, stride = self._v3_march_knobs()
        rk, ck, hk, cell_frac, hot_frac = v3_auto_policy(
            texel_directions(self.perf.texture_size), params, self._bricks,
            steps=self.perf.march_steps, ray_stride=stride,
            prepass_steps=ps)
        if ps < 8:
            # Too few prepass probes to RANK rays reliably: the cull
            # priority is max-pre over ps samples, and at ps < 8 the
            # margin band misses occupied rays — whole-ray (binary)
            # errors, measured 22.8 dB at steps=16/ps=4 vs 61.5 dB at the
            # production 128/32. Keep every ray (cheap) and let the cell
            # gate (per-cell conservative: margin + dilation) do the
            # skipping; rebase the cell/hot buckets to the uncull totals.
            rk = 1.0
            ck = select_cell_keep_frac(float(cell_frac))
            hk = select_cell_keep_frac(float(hot_frac) / max(ck, 1e-6),
                                       margin=1.2)
        if cycle:
            self._v3_policy_cache = (rk, ck, hk)
        return rk, ck, hk

    def render_full_hemisphere(self, params: Optional[MarchParams] = None,
                               sky_img=None) -> jax.Array:
        """Monolithic full-map render (no amortization) — the benchmark path
        and the oracle for temporal-consistency tests.

        kernel="fast3" routes through the v3 cell-gated headline march with
        per-cycle measured capacity buckets — exactly the kernel/policy
        bench.py times (VERDICT r3 #2), gated ≥ 40 dB vs the exact march
        (tests/test_bench_config.py). The other kernels render their own
        exact/staged math (bitwise the amortized cycle's tiling)."""
        if params is None:
            params = self._march_params
        if sky_img is None:
            sky_img = self.sky_ring[self.ring.cloud_kernel_sky_slot]
        dirs = texel_directions(self.perf.texture_size)
        if self.kernel == "fast3":
            from cloudscape_tpu.models.march_fast import march_bricks_v3

            rk, ck, hk = self._v3_policy(params)
            ps, stride = self._v3_march_knobs()
            n = self.perf.texture_size ** 2
            return march_bricks_v3(
                dirs, params, self._bricks, sky_img,
                steps=self.perf.march_steps,
                light_steps=self.perf.light_steps,
                chunk=min(n, 32768), cell_keep_frac=ck, hot_keep_frac=hk,
                cone_cache=self._cone_cache, ray_keep_frac=rk,
                prepass_steps=ps, ray_stride=stride,
            )
        if self.kernel == "hier":
            from cloudscape_tpu.models.march_fast import (
                hier_v3_auto_policy, march_hierarchical_v3_banded,
            )

            n_tex = self.perf.texture_size
            steps = self.perf.march_steps
            bands = 4 if n_tex % 4 == 0 and n_tex >= 256 else 1
            coarse = min(32, max(8, steps // 4))
            ps, _ = self._v3_march_knobs()  # stride is ALWAYS 1 on the
            # window lattice (measured −4.5 dB at 2, PERF_NOTES round 5)
            if self._v3_policy_cache is not None and \
                    params is self._march_params:
                rk, ck, hk = self._v3_policy_cache
            else:
                rk, ck, hk, _, _ = hier_v3_auto_policy(
                    dirs, params, self._bricks, steps=steps,
                    coarse_steps=coarse, bands=bands, prepass_steps=ps)
                if params is self._march_params:
                    self._v3_policy_cache = (rk, ck, hk)
            return march_hierarchical_v3_banded(
                dirs, params, self._bricks, sky_img, bands=bands,
                steps=steps, light_steps=self.perf.light_steps,
                chunk=min(n_tex * n_tex // bands, 32768),
                coarse_steps=coarse, cell_keep_frac=ck, hot_keep_frac=hk,
                ray_keep_frac=rk, cone_cache=self._cone_cache,
                prepass_steps=ps, ray_stride=1)
        if self.kernel in ("fast", "fast2"):
            noise_arg = self._noise_arg if self.kernel == "fast2" else \
                self._bricks
            return _march_tile(
                dirs, params, noise_arg, sky_img,
                region=self.perf.update_region_size,
                steps=self.perf.march_steps,
                light_steps=self.perf.light_steps,
                kernel=self.kernel,
                capacity_frac=0.5,
            )
        return march(dirs, params, self.noise, sky_img,
                     steps=self.perf.march_steps,
                     light_steps=self.perf.light_steps)

    # ------------------------------------------------------------ checkpoint

    def save(self) -> Dict[str, Any]:
        """Checkpointable state pytree: parameters, wind integrals, ring
        indices, and the texture rings (SURVEY.md §5 checkpoint/resume)."""
        return {
            "perf": dataclasses.asdict(self.perf),
            "config": dataclasses.asdict(self.config),
            "sun": dataclasses.asdict(self.sun),
            "frame_data": dataclasses.asdict(self.frame_data),
            "ring": dataclasses.asdict(self.ring),
            "cloud_ring": np.asarray(self.cloud_ring),
            "sky_ring": np.asarray(self.sky_ring),
            "sky_lut_needs_full_update": self._sky_lut_needs_full_update,
            "needs_full_sky_init": self.needs_full_sky_init,
            "blend_amount": self.blend_amount,
        }

    def save_file(self, path: str) -> None:
        """Persist the checkpoint to one .npz (arrays + JSON header)."""
        import json

        state = self.save()
        header = {
            k: v for k, v in state.items() if k not in ("cloud_ring", "sky_ring")
        }
        for section in ("frame_data",):
            header[section] = {
                k: (v.tolist() if isinstance(v, np.ndarray) else v)
                for k, v in header[section].items()
            }
        np.savez_compressed(
            path,
            cloud_ring=state["cloud_ring"],
            sky_ring=state["sky_ring"],
            header=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
        )

    def load_file(self, path: str) -> None:
        import json

        with np.load(path) as z:
            header = json.loads(bytes(z["header"]).decode())
            header["cloud_ring"] = z["cloud_ring"]
            header["sky_ring"] = z["sky_ring"]
        self.restore(header)

    def restore(self, state: Dict[str, Any]) -> None:
        self.perf = PerfConfig(**state["perf"]).validate()
        self.config = CloudConfig(**{
            k: tuple(v) if isinstance(v, (list, tuple)) else v
            for k, v in state["config"].items()
        })
        self.sun = SunState(**{
            k: tuple(v) if isinstance(v, (list, tuple)) else v
            for k, v in state["sun"].items()
        })
        fd = FrameData()
        for k, v in state["frame_data"].items():
            setattr(fd, k, np.asarray(v) if isinstance(v, (list, np.ndarray)) else v)
        self.frame_data = fd
        ring = RingState()
        for k, v in state["ring"].items():
            setattr(ring, k, tuple(v) if isinstance(v, (list, tuple)) else v)
        self.ring = ring
        self.cloud_ring = jnp.asarray(state["cloud_ring"])
        self.sky_ring = jnp.asarray(state["sky_ring"])
        self._display_pair = None
        self._sky_lut_needs_full_update = state["sky_lut_needs_full_update"]
        self._blend_amount = state.get("blend_amount", 0.0)
        # A checkpoint taken before the first tick must restore to an engine
        # that still performs the warm start — otherwise the sky fades in from
        # black instead of being complete on the first visible frame. Old
        # checkpoints (no flag recorded): infer from whether the cloud ring
        # holds any rendered content.
        self.needs_full_sky_init = state.get(
            "needs_full_sky_init",
            not bool(np.any(np.asarray(state["cloud_ring"]))),
        )
        self._march_params = self.frame_data.to_march_params()
        # Prebake pipeline restarts from the restored snapshot (the next
        # rotation takes the synchronous fallback once).
        self._head_frame_data = copy.deepcopy(self.frame_data)
        self._pending = None
        self._picked_sky = None
        self._v3_policy_cache = None
        self._derive_prebake_schedule()
        if self._staged:
            # Derived per-cycle state: rebuild for the restored snapshot.
            self._cone_cache = _build_cone_jit(
                self._march_params, self._bricks,
                light_steps=self.perf.light_steps, res=self.cone_res,
            )
