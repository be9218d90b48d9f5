"""Gates for the amortized per-cycle cone bake (VERDICT r2 #2).

The reference's per-frame cost is flat — `cloud_sky.gd:129-163` dispatches
exactly one tile every frame — while a synchronous per-rotation cone-cache
rebuild stalls the boundary frame ~0.7 s at shipped defaults. The fix bakes
the NEXT cycle's cone volume across the current cycle's ticks: one global
occupancy compaction (`cone_occupancy_indices` — bitwise the full build's
index vector, so overflow behavior is identical regardless of occupancy
skew), then one compacted-cell slice of the cone march per tick
(`bake_cone_cells`), then `assemble_cone_cache` — driven by
`CloudSkyEngine._advance_prebake`. Gates:

- slice-by-slice baking reproduces `build_cone_cache` bitwise (including
  the clamped overlapping final slice and the capacity-overflow case —
  same global compaction, same drops);
- a prebaked engine on a static scene is bitwise-identical to the
  synchronous engine (the pipelined snapshot is the same snapshot);
- after the warm-up rotation the pending cone is ready before every
  boundary, and the boundary consumes it (no synchronous fallback).
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState
from cloudscape_tpu.engine import CloudSkyEngine
from cloudscape_tpu.models.density import MarchParams
from cloudscape_tpu.models.march_fast import (
    BrickPack,
    assemble_cone_cache,
    bake_cone_cells,
    build_cone_cache,
    cone_capacity,
    cone_occupancy_indices,
)
from cloudscape_tpu.models.packs import make_noise_pack


@pytest.fixture(scope="module")
def tiny_setup():
    from cloudscape_tpu.ops.noise import (
        generate_base_noise,
        generate_detail_noise,
    )
    from cloudscape_tpu.utils.assets import load_bmp

    noise = make_noise_pack(
        generate_base_noise(16, seed=1),
        generate_detail_noise(16, seed=2),
        load_bmp("/root/reference/cloud_sky/weather.bmp"),
    )
    bp = BrickPack.from_noise(noise)
    sun = np.array([0.3, 0.4, -0.85])
    sun /= np.linalg.norm(sun)
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]), detailed_pos=np.array([0.4, 0.2]),
        weather_pos=np.array([0.01, 0.02]), time=12.5, cloud_coverage=0.45,
        light_direction=sun, ground_color=np.array([0.27, 0.19, 0.027]),
    )
    return noise, bp, params


def _assemble_from_slices(params, bp, res, n_ticks, light_steps=2,
                          chunk=512, frac=0.45):
    """The engine's slice schedule: ceil-division sweep over the compacted
    capacity, final slice clamped (overlapping cells re-baked) — mirrors
    `_advance_prebake`."""
    nd, nh, nw = res
    capacity = cone_capacity(nd * nh * nw, frac, chunk)
    idx = cone_occupancy_indices(params, bp, res=res, chunk=chunk,
                                 sparse_capacity_frac=frac)
    count = min(-(-capacity // n_ticks), capacity)
    vol = jnp.zeros((nd * nh * nw,), jnp.float32)
    for i in range(-(-capacity // count)):
        i0 = min(i * count, max(capacity - count, 0))
        vol = bake_cone_cells(vol, idx, jnp.int32(i0), params, bp,
                              count=count, light_steps=light_steps,
                              res=res, chunk=chunk)
    return assemble_cone_cache(vol.reshape(res))


def _assert_cone_equal(a, b):
    la = jax.tree_util.tree_leaves(a.table)
    lb = jax.tree_util.tree_leaves(b.table)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_slice_assembly_matches_full_sparse(tiny_setup):
    """Incremental slice bake vs the full sparse build: bitwise — including
    under capacity OVERFLOW (this scene's dilated occupancy 6480 exceeds
    the 0.45-frac capacity 4608, so both paths drop the same tail cells;
    the global compaction guarantees identical drops). 7 ticks does not
    divide the capacity evenly → exercises the clamped overlapping final
    slice."""
    _, bp, params = tiny_setup
    res = (8, 40, 32)
    full = build_cone_cache(params, bp, 2, res=res, chunk=512)
    inc = _assemble_from_slices(params, bp, res, 7, light_steps=2,
                                chunk=512)
    _assert_cone_equal(full, inc)


def test_slice_assembly_matches_full_ample(tiny_setup):
    """Same gate with ample capacity (no overflow): every occupied cell is
    baked, still bitwise vs the full build."""
    _, bp, params = tiny_setup
    res = (8, 40, 32)
    full = build_cone_cache(params, bp, 2, res=res, chunk=512,
                            sparse_capacity_frac=0.8)
    inc = _assemble_from_slices(params, bp, res, 5, light_steps=2,
                                chunk=512, frac=0.8)
    _assert_cone_equal(full, inc)


def _tiny_engine(noise, **kw):
    return CloudSkyEngine(
        perf=PerfConfig(texture_size=32, frames_to_update=16, march_steps=4,
                        light_steps=2),
        config=CloudConfig(cloud_coverage=0.6),
        sun=SunState(direction=(0.3, 0.5, -0.8)),
        noise=noise,
        kernel="fast2",
        cone_res=(4, 16, 16),
        **kw,
    )


def test_prebake_engine_matches_sync_static(tiny_setup):
    """Static scene: the pipelined snapshot IS the synchronous snapshot, so
    the prebaked engine must be bitwise-identical to cone_prebake=False
    across multiple rotations (warm start + 2 full cycles + boundary)."""
    noise, _, _ = tiny_setup
    a = _tiny_engine(noise, cone_prebake=False)
    b = _tiny_engine(noise)  # default ON for fast2
    assert b.cone_prebake and not a.cone_prebake
    for _ in range(2 * 16 + 2):
        a.update_sky(now=0.0)
        b.update_sky(now=0.0)
    np.testing.assert_array_equal(np.asarray(a.cloud_ring),
                                  np.asarray(b.cloud_ring))
    np.testing.assert_array_equal(np.asarray(a.sky_ring),
                                  np.asarray(b.sky_ring))


def test_prebake_ready_before_boundary(tiny_setup):
    """After the warm-up rotation, the pending cycle's cone must be fully
    assembled before every rotation, and the boundary must consume it (the
    object the engine marches with IS the prebaked one — no fallback)."""
    noise, _, _ = tiny_setup
    e = _tiny_engine(noise)
    e.update_sky(now=0.0)  # warm start (tick 1 of cycle 0)
    for _ in range(e.perf.frames_to_update - 1):
        e.update_sky(now=0.0)
    # Cycle 0 complete: pending cone baked with ticks to spare.
    assert e._pending is not None and e._pending.cone is not None
    assert e._pending.sky is not None
    pend_cone = e._pending.cone
    e.update_sky(now=0.0)  # rotation: must pick up the pending cone
    assert e._cone_cache is pend_cone
    # And the next pending cycle restarts from scratch (the boundary tick
    # itself is stage-skipped — `fresh` — so no spike lands on it).
    assert e._pending.cone is None and e._pending.idx is None
    assert not e._pending.fresh  # the skip was consumed by the boundary tick


def test_prebake_tile_cull_matches_sync(tiny_setup):
    """tile_cull engines: the amortized cull prepass (raw slices + finalize
    + deferred readback) must reproduce the synchronous per-boundary cull —
    same BUCKETS every cycle (the functionally binding output; the raw
    priorities match to float-reassociation level across the different
    executable shapes), and the rendered rings equal to float tolerance."""
    noise, _, _ = tiny_setup
    a = _tiny_engine(noise, cone_prebake=False, tile_cull=True)
    b = _tiny_engine(noise, tile_cull=True)
    a.update_sky(now=0.0)
    b.update_sky(now=0.0)  # warm start
    for _ in range(2 * b.perf.frames_to_update - 1):  # to one tick before
        a.update_sky(now=0.0)                         # the 2nd rotation
        b.update_sky(now=0.0)
    assert b.ring.frame == b.perf.frames_to_update
    pend = b._pending
    assert pend is not None and pend.buckets is not None  # ready in time
    a.update_sky(now=0.0)  # boundary: a runs the sync cull,
    b.update_sky(now=0.0)  # b consumes the amortized one
    assert b._tile_buckets is pend.buckets
    assert a._tile_buckets == b._tile_buckets
    np.testing.assert_allclose(np.asarray(b.cloud_ring),
                               np.asarray(a.cloud_ring), atol=1e-5, rtol=0.0)


def test_prebake_restore_resets_pipeline(tiny_setup):
    """save()/restore() must restart the prebake pipeline from the restored
    snapshot (one synchronous boundary, then steady pipelining) — and stay
    numerically identical to a never-saved engine on a static scene."""
    noise, _, _ = tiny_setup
    a = _tiny_engine(noise)
    for _ in range(10):
        a.update_sky(now=0.0)
    state = a.save()
    b = _tiny_engine(noise)
    b.restore(state)
    assert b._pending is None
    for _ in range(12):  # crosses the next rotation
        a.update_sky(now=0.0)
        b.update_sky(now=0.0)
    np.testing.assert_array_equal(np.asarray(a.cloud_ring),
                                  np.asarray(b.cloud_ring))
