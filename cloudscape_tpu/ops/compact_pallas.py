"""Pallas TPU kernel for stream compaction (the march's `_compact_indices`).

STATUS: PRODUCTION on TPU (the march routes sample compaction here when
shapes permit): bit-identical to the XLA `_compact_indices` on hardware
and **152 vs 245 ms** at headline scale (42M samples → 8.4M capacity).
Five Mosaic hazards were found and worked around on the way (each
bisected with micro-kernels on a v5e — see bench/ probes):

1. no `cumsum` primitive → roll-doubling prefix sums;
2. `tpu.dynamic_rotate` has no i1 support → int32 0/1 masks;
3. a 128-way unrolled one-hot pack blew the 16 MB kernel stack
   (~20.6 MB of live temporaries) → butterfly shift packing;
4. dynamic-offset DMA with a non-8-multiple sublane offset or size dies
   at RUNTIME with an opaque 'TPU backend error (Internal)' → all
   windows 8-row aligned, 8-multiple sizes, an 8-row carry;
5. `input_output_aliases` + a pl.when-guarded DMA (each fine alone)
   also dies at runtime → no alias; the fill tail is masked in the
   wrapper from the active count instead.

Emits the flat indices of the first `capacity` True entries of a
[nb, 128] mask plane, ascending, fill = total — plus each element's
exclusive global rank (the march's overflow coverage test). The XLA
formulation's per-slot resolve (fat-row gather + argmax + cummax
forward-fills) costs ~150-200 ms at headline scale (docs/PERF_NOTES.md);
this kernel makes compaction a single streaming pass:

- per tile of ROWS source rows: in-register exclusive lane ranks (7
  masked `pltpu.roll` doublings), then a 128-step unrolled one-hot reduce
  packs each row's active flat indices to its front;
- a running WRITE CURSOR lives in SMEM scratch — the TPU grid executes
  sequentially, so cross-tile ordering is free. Each row's packed run is
  rotated to the cursor's lane phase (dynamic `pltpu.roll`) and blended
  into a VMEM staging buffer at a dynamic sublane offset;
- one sliced DMA per tile ships the staging rows to the HBM output; a
  carry row holds the in-progress partial output row between tiles, so
  the kernel never read-modifies HBM. The output aliases a
  `total`-prefilled array, so slots past the final cursor keep the fill.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 256          # source rows per grid step
STAGE_ROWS = ROWS + 16   # 8-row aligned head + worst-case appended span


def _kernel(mask_ref, idx_ref, rank_ref, cursor_ref, stage_ref,
            carry_ref, aux_ref, sem_ref, *, capacity: int, total: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cursor_ref[0] = 0
        carry_ref[:] = jnp.full((8, LANES), total, jnp.int32)

    m = (mask_ref[:] > 0).astype(jnp.int32)        # [ROWS, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)

    # Exclusive lane ranks via 7 masked roll-doublings.
    inc = m
    k = 1
    while k < LANES:
        inc = inc + jnp.where(lane >= k, pltpu.roll(inc, k, axis=1), 0)
        k *= 2
    rank = inc - m
    cnt_full = jnp.broadcast_to(inc[:, LANES - 1:LANES], m.shape)

    # Row-offset prefix over the sublane axis, same doubling trick
    # (Mosaic has no cumsum primitive).
    cum = cnt_full
    k = 1
    while k < ROWS:
        cum = cum + jnp.where(rowi >= k, pltpu.roll(cum, k, axis=0), 0)
        k *= 2
    row_off_full = cum - cnt_full                   # exclusive, per row
    cur0 = cursor_ref[0]
    rank_ref[:] = cur0 + row_off_full + rank
    # Per-row scalars for the append loop: lane0 = cnt, lane1 = row_off.
    aux_ref[:] = jnp.where(lane == 0, cnt_full,
                           jnp.where(lane == 1, row_off_full, 0))

    # Pack each row's active flat indices to the front: butterfly shift —
    # every active element must move left by deficit = lane − rank;
    # process the deficit bit by bit (LSB first). Deficits are
    # non-decreasing along each row's active order, so the per-step moves
    # are collision-free and stable. 7 rounds of ~6 vector ops (an
    # unrolled 128-way one-hot reduce blew the Mosaic stack: 20.6 MB of
    # live temporaries).
    base = (i * ROWS + jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)) \
        * LANES
    val = base + lane
    d = lane - rank
    a = m  # int32 0/1 — tpu.dynamic_rotate has no i1 support
    k = 1
    while k < LANES:
        rv = pltpu.roll(val, LANES - k, axis=1)   # shift left by k
        rd = pltpu.roll(d, LANES - k, axis=1)
        ra = pltpu.roll(a, LANES - k, axis=1)
        take = (ra > 0) & ((rd & k) != 0)
        keep = (a > 0) & ((d & k) == 0)
        val = jnp.where(take, rv, jnp.where(keep, val, 0))
        d = jnp.where(take, rd - k, jnp.where(keep, d, 0))
        a = (take | keep).astype(jnp.int32)
        k *= 2
    packed = jnp.where(a > 0, val, 0)

    def scoped(packed_ref):
        packed_ref[:] = packed
        # Mosaic DMA hazard #1 (measured): dynamic-offset transfers must be
        # 8-sublane-ALIGNED with 8-multiple sizes, or the kernel dies at
        # runtime with an opaque Internal error. All windows here are
        # aligned: the tile writes STAGE_ROWS rows at align8(cursor row),
        # and an 8-row carry holds that aligned head across tiles.
        r0a = (cur0 // LANES) & ~7     # aligned first output row
        stage_ref[:] = jnp.full((STAGE_ROWS, LANES), total, jnp.int32)
        stage_ref[0:8, :] = carry_ref[:]

        pos = jax.lax.broadcasted_iota(jnp.int32, (2, LANES), 1) \
            + jax.lax.broadcasted_iota(jnp.int32, (2, LANES), 0) * LANES

        def body(r, _):
            c = aux_ref[r, 0]
            cur = cur0 + aux_ref[r, 1]

            @pl.when((c > 0) & (cur < capacity))
            def _():
                loc = cur - r0a * LANES
                d0 = loc // LANES
                l0 = loc % LANES
                rot = pltpu.roll(packed_ref[pl.ds(r, 1), :], l0, axis=1)
                win = stage_ref[pl.ds(d0, 2), :]
                sel = (pos >= l0) & (pos < l0 + c)
                stage_ref[pl.ds(d0, 2), :] = jnp.where(
                    sel, jnp.concatenate([rot, rot], axis=0), win)

            return 0

        jax.lax.fori_loop(0, ROWS, body, 0)
        cur_end = cur0 + aux_ref[ROWS - 1, 0] + aux_ref[ROWS - 1, 1]
        cursor_ref[0] = cur_end

        cap_rows = idx_ref.shape[0]

        # Mosaic DMA hazard #2 (measured): a pl.when-guarded DMA is only
        # safe WITHOUT input_output_aliases (the combination also dies at
        # runtime); the output is therefore NOT alias-prefilled — the
        # wrapper masks the tail with the active count instead.
        @pl.when(r0a <= cap_rows - STAGE_ROWS)
        def _():
            dma = pltpu.make_async_copy(
                stage_ref, idx_ref.at[pl.ds(r0a, STAGE_ROWS), :], sem_ref)
            dma.start()
            dma.wait()

        # Carry = the 8-row aligned head of the NEXT tile's window (already
        # holds fill beyond the cursor — the stage was fill-initialized).
        end_c = jnp.minimum(cur_end, capacity)
        new_r0a = (end_c // LANES) & ~7
        d_c = jnp.clip(new_r0a - r0a, 0, STAGE_ROWS - 8)
        carry_ref[:] = stage_ref[pl.ds(d_c, 8), :]

    pl.run_scoped(scoped, pltpu.VMEM((ROWS, LANES), jnp.int32))


@partial(jax.jit, static_argnames=("capacity", "total", "interpret"))
def compact_indices_pallas(mask, capacity: int, total: int,
                           interpret: bool = False):
    """mask: [nb, 128] (bool/int; nb a ROWS multiple — callers pad).
    Returns (idx [capacity] int32 ascending with fill=total;
             rank [nb, 128] int32 exclusive global ranks)."""
    nb = mask.shape[0]
    assert mask.shape[1] == LANES and nb % ROWS == 0, mask.shape
    assert capacity % LANES == 0
    cap_rows = capacity // LANES + STAGE_ROWS + 8
    grid = (nb // ROWS,)
    idx, rank = pl.pallas_call(
        partial(_kernel, capacity=capacity, total=total),
        out_shape=(
            jax.ShapeDtypeStruct((cap_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb, LANES), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((STAGE_ROWS, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
            pltpu.VMEM((ROWS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(mask.astype(jnp.int32))
    # Tail fixup (replaces the alias-prefill — Mosaic hazard #2): slots at
    # or past the active count are fill by definition; rows the kernel
    # never DMA'd would otherwise hold garbage.
    n_occ = jnp.minimum(jnp.sum((mask > 0).astype(jnp.int32)), capacity)
    idx = idx.reshape(-1)[:capacity]
    return jnp.where(jnp.arange(capacity, dtype=jnp.int32) < n_occ, idx,
                     total), rank
