"""Pallas TPU kernel for the segmented inclusive prefix sum.

The v3 march's hot-list accumulation (`_accumulate_segmented`,
march_fast.py) needs, per hot cell, the sum of per-cell log-transmittance
over the SAME RAY's earlier hot cells — a segmented scan over a flat
~1-2M-element list with segment-head flags. The XLA form
(`lax.associative_scan` over a (value, head) monoid) lowers to ~21
full-array passes ≈ 700 MB of HBM traffic at the headline scale; this
kernel does it in ONE streaming pass (read value+head, write prefix):

- per [ROWS, 128] tile: lane-axis segmented inclusive scan via 7 masked
  `pltpu.roll` doublings carrying (value f32, head-prefix int32) — the
  standard segmented-scan monoid, head doubling as the OR-prefix;
- sublane-axis combine: the per-row (total, any-head) pairs get the same
  doubling treatment across rows; each element then adds its preceding
  rows' carry iff no head precedes it within its own row;
- cross-tile: a single SMEM f32 carry (the TPU grid is sequential, like
  compact_pallas' write cursor). After in-tile combine the carry applies
  to elements with no head anywhere before them in the tile, and the next
  carry is just the tile's last element (it already includes the old
  carry exactly when the tile is headless).

Mosaic notes (inherited from ops/compact_pallas.py's hazard list): flags
ride as int32 (no i1 rotate support); no dynamic-offset DMA is needed at
all here — in/out blocks are statically tiled.

Numerics: bit-identical to `lax.associative_scan`'s result is NOT
guaranteed in general (different combine-tree shapes reassociate float
adds), but both are exact prefix reassociations of the same ≤0 log-dt
terms; tests gate the Pallas form against the XLA form at 1e-6 and the
march's 40 dB referee is unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 256


def _kernel(val_ref, head_ref, out_ref, carry_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0] = 0.0

    v = val_ref[:]                                  # [ROWS, 128] f32
    f = (head_ref[:] > 0).astype(jnp.int32)        # head flags
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)

    # Lane-axis segmented inclusive scan: after step k, v_i = sum since
    # max(row start, last head) over (i-2k, i]; f_i = any head in
    # [row start ... i] once k reaches LANES.
    k = 1
    while k < LANES:
        rv = pltpu.roll(v, k, axis=1)
        rf = pltpu.roll(f, k, axis=1)
        ok = (lane >= k) & (f == 0)
        v = v + jnp.where(ok, rv, 0.0)
        f = f | jnp.where(lane >= k, rf, 0)
        k *= 2

    # Per-row (total since last head, any head) live in lane 127.
    vrow = jnp.broadcast_to(v[:, LANES - 1:LANES], v.shape)
    frow = jnp.broadcast_to(f[:, LANES - 1:LANES], v.shape)

    # Sublane-axis EXCLUSIVE segmented scan over the row pairs: shift the
    # pairs down one row first, then scan inclusively — a post-hoc
    # "subtract own row" would zero the carry for any row with an internal
    # head, starving that row's pre-head elements of earlier rows' sums.
    cv = jnp.where(rowi >= 1, pltpu.roll(vrow, 1, axis=0), 0.0)
    cf = jnp.where(rowi >= 1, pltpu.roll(frow, 1, axis=0), 0)
    k = 1
    while k < ROWS:
        rv = pltpu.roll(cv, k, axis=0)
        rf = pltpu.roll(cf, k, axis=0)
        ok = (rowi >= k) & (cf == 0)
        cv = cv + jnp.where(ok, rv, 0.0)
        cf = cf | jnp.where(rowi >= k, rf, 0)
        k *= 2
    row_excl = cv          # sum since last head strictly before row r
    rowf_excl = cf         # any head strictly before row r

    # Element combine: rows' carry applies iff no head at ≤ lane in-row;
    # the SMEM tile carry applies iff additionally no head in any earlier
    # row of the tile.
    no_head_in_row = f == 0
    v = v + jnp.where(no_head_in_row, row_excl, 0.0)
    tile_mask = no_head_in_row & (rowf_excl == 0)
    v = v + jnp.where(tile_mask, carry_ref[0], 0.0)

    out_ref[:] = v
    # Next carry: the tile's last element (includes the old carry exactly
    # when the tile had no head anywhere).
    carry_ref[0] = v[ROWS - 1, LANES - 1]


@partial(jax.jit, static_argnames=("interpret",))
def segscan_sum_pallas(values, heads, interpret: bool = False):
    """Segmented INCLUSIVE prefix sum of `values` (flat f32 [N]) with
    segment starts marked by `heads` (flat bool/int [N]). Pads internally
    to the kernel's [ROWS·LANES] grid multiple (padding heads=1 so the
    tail never inherits a live segment)."""
    n = values.shape[0]
    tile = ROWS * LANES
    pad = (-n) % tile
    v = values.astype(jnp.float32)
    h = heads.astype(jnp.int32)
    if pad:
        v = jnp.concatenate([v, jnp.zeros((pad,), jnp.float32)])
        h = jnp.concatenate([h, jnp.ones((pad,), jnp.int32)])
    nb = v.shape[0] // LANES
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((nb, LANES), jnp.float32),
        grid=(nb // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(v.reshape(nb, LANES), h.reshape(nb, LANES))
    return out.reshape(-1)[:n]
