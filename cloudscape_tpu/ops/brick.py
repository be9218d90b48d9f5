"""Brick-row texture tables: TPU-shaped filtered texture sampling.

XLA's TPU gather is row-latency-bound (~3 ns/row) and pads gathered rows to
128 lanes (docs/PERF_NOTES.md), so the fast sampling path reshapes each noise
texture into a table of 128-lane *bricks*:

- 3D, 2 channels:  4×4×4 texels × 2ch  = 128 lanes, brick stride 3
- 3D, 1 channel :  8×4×4 texels × 1ch  = 128 lanes, strides (7, 3, 3)
- 2D, 2 channels:  8×8 texels   × 2ch  = 128 lanes, brick stride 7

Brick stride ≤ brick_dim - 1 guarantees any trilinear/bilinear footprint
(cells i0, i0+1 per axis) lies inside a single brick; bricks are built
wrap-aware (texels taken mod N) so GL_REPEAT sampling works across edges.
One gather row per filtered sample replaces the 8 corner gathers + mip
stacking of `ops/sampling.py` (which remains the semantics reference).

Filtering happens as a lane-weight reduction: per-sample weights are built by
comparing static lane iotas against the sample's local corner index and
fraction, then the gathered row is reduced over lanes — no second gather.

Volumes small enough to fit one row (≤ 4³×2ch / 8×4×4×1ch) skip the gather
entirely: the whole volume is a broadcast constant row with modular-wrap
corner weights (`sample_tiny3`).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _static_field(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BrickTable3D:
    """[n_bricks, lanes] table of 3D bricks. Lane order: c-major blocks of
    (z*by + y)*bx + x."""

    table: jax.Array
    dims: Tuple[int, int, int] = _static_field(default=(0, 0, 0))  # (D, H, W)
    brick: Tuple[int, int, int] = _static_field(default=(4, 4, 4))  # (bz, by, bx)
    stride: Tuple[int, int, int] = _static_field(default=(3, 3, 3))
    grid: Tuple[int, int, int] = _static_field(default=(0, 0, 0))  # brick counts
    channels: int = _static_field(default=2)
    wrap: str = _static_field(default="repeat")  # "repeat" | "clamp"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BrickTable2D:
    table: jax.Array
    dims: Tuple[int, int] = _static_field(default=(0, 0))  # (H, W)
    brick: Tuple[int, int] = _static_field(default=(8, 8))  # (by, bx)
    stride: Tuple[int, int] = _static_field(default=(7, 7))
    grid: Tuple[int, int] = _static_field(default=(0, 0))
    channels: int = _static_field(default=2)
    wrap: str = _static_field(default="repeat")  # "repeat" | "clamp"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TinyVolume3D:
    """A whole ≤1-row volume, kept as a flat constant row (no gather)."""

    row: jax.Array  # [D*H*W*C] flattened, c-major blocks
    dims: Tuple[int, int, int] = _static_field(default=(0, 0, 0))
    channels: int = _static_field(default=1)


def _cdiv(a, b):
    return -(-a // b)


def build_brick3(volume: np.ndarray, brick=(4, 4, 4), stride=(3, 3, 3)
                 ) -> BrickTable3D:
    """volume: [D, H, W, C] float; returns the brick table (host-built;
    native/assetio.cpp fast path when built)."""
    volume = np.asarray(volume, np.float32)
    d, h, w, c = volume.shape
    bz, by, bx = brick
    sz, sy, sx = stride
    assert sz <= bz - 1 and sy <= by - 1 and sx <= bx - 1
    nz, ny, nx = _cdiv(d, sz), _cdiv(h, sy), _cdiv(w, sx)

    try:
        from cloudscape_tpu.utils import _native

        lanes = _native.pack_bricks3d(volume, brick, stride)
        if lanes is not None:
            return BrickTable3D(
                table=jnp.asarray(lanes), dims=(d, h, w), brick=brick,
                stride=stride, grid=(nz, ny, nx), channels=c,
            )
    except Exception:
        pass

    zz = (np.arange(nz)[:, None] * sz + np.arange(bz)[None, :]) % d  # [nz, bz]
    yy = (np.arange(ny)[:, None] * sy + np.arange(by)[None, :]) % h
    xx = (np.arange(nx)[:, None] * sx + np.arange(bx)[None, :]) % w
    # bricks[nz, ny, nx, bz, by, bx, c]
    bricks = volume[
        zz[:, None, None, :, None, None],
        yy[None, :, None, None, :, None],
        xx[None, None, :, None, None, :],
    ]
    # lane order: channel-major, then (z, y, x)
    lanes = bricks.transpose(0, 1, 2, 6, 3, 4, 5).reshape(nz * ny * nx, c * bz * by * bx)
    return BrickTable3D(
        table=jnp.asarray(lanes), dims=(d, h, w), brick=brick, stride=stride,
        grid=(nz, ny, nx), channels=c,
    )


def build_brick2(image: np.ndarray, brick=(8, 8), stride=(7, 7)) -> BrickTable2D:
    image = np.asarray(image, np.float32)
    h, w, c = image.shape
    by, bx = brick
    sy, sx = stride
    assert sy <= by - 1 and sx <= bx - 1
    ny, nx = _cdiv(h, sy), _cdiv(w, sx)
    yy = (np.arange(ny)[:, None] * sy + np.arange(by)[None, :]) % h
    xx = (np.arange(nx)[:, None] * sx + np.arange(bx)[None, :]) % w
    bricks = image[yy[:, None, :, None], xx[None, :, None, :]]  # [ny,nx,by,bx,c]
    lanes = bricks.transpose(0, 1, 4, 2, 3).reshape(ny * nx, c * by * bx)
    return BrickTable2D(
        table=jnp.asarray(lanes), dims=(h, w), brick=brick, stride=stride,
        grid=(ny, nx), channels=c,
    )


def build_tiny3(volume: np.ndarray) -> TinyVolume3D:
    volume = np.asarray(volume, np.float32)
    d, h, w, c = volume.shape
    row = volume.transpose(3, 0, 1, 2).reshape(-1)
    return TinyVolume3D(row=jnp.asarray(row), dims=(d, h, w), channels=c)


def _axis_coords(q, n, wrap: str = "repeat"):
    """GL filtering coords for one axis: returns (cell i0 [int32], fraction).

    repeat: i0 mod n (corners wrap via wrap-aware brick contents).
    clamp: i0 clipped to [0, n-2] so both corners stay in-volume (index
    clamping ≡ GL CLAMP_TO_EDGE; bricks must be built with `clamp` too)."""
    cx = q * n - 0.5
    i0 = jnp.floor(cx)
    f = cx - i0
    i0 = i0.astype(jnp.int32)
    if wrap == "clamp":
        # Out-of-range fractions collapse to the edge texel: clamp f as well
        # so q < 0 reads texel 0 exactly (f=0) and q > 1 reads texel n-1.
        f = jnp.where(i0 < 0, 0.0, jnp.where(i0 > n - 2, 1.0, f))
        i0 = jnp.clip(i0, 0, max(n - 2, 0))
    else:
        i0 = jnp.remainder(i0, n)
    return i0, f


def build_brick3_device(volume, brick=(4, 4, 4), stride=(3, 3, 3),
                        wrap: str = "repeat") -> "BrickTable3D":
    """Device-side brick packing (jnp gathers — no host round trip).

    Used for per-cycle dynamic tables (e.g. the cone-density cache) where a
    host build would pay relay transfers. `wrap` controls how brick texels
    past the volume edge are filled: "repeat" (mod) or "clamp" (edge)."""
    d, h, w, c = volume.shape
    bz, by, bx = brick
    sz, sy, sx = stride
    assert sz <= bz - 1 and sy <= by - 1 and sx <= bx - 1
    nz, ny, nx = _cdiv(d, sz), _cdiv(h, sy), _cdiv(w, sx)

    def idx(n_bricks, s, b, n):
        i = jnp.arange(n_bricks)[:, None] * s + jnp.arange(b)[None, :]
        return jnp.clip(i, 0, n - 1) if wrap == "clamp" else jnp.remainder(i, n)

    zz = idx(nz, sz, bz, d)
    yy = idx(ny, sy, by, h)
    xx = idx(nx, sx, bx, w)
    bricks = volume[
        zz[:, None, None, :, None, None],
        yy[None, :, None, None, :, None],
        xx[None, None, :, None, None, :],
    ]
    lanes = bricks.transpose(0, 1, 2, 6, 3, 4, 5).reshape(
        nz * ny * nx, c * bz * by * bx
    )
    return BrickTable3D(
        table=lanes, dims=(d, h, w), brick=brick, stride=stride,
        grid=(nz, ny, nx), channels=c, wrap=wrap,
    )


def build_brick3_rows(volume, b0, count: int, brick=(4, 4, 4),
                      stride=(3, 3, 3), wrap: str = "repeat"):
    """Rows [b0, b0 + count) of `build_brick3_device`'s table (b0 traced,
    count static) — the sliceable form the engine uses to amortize large
    per-cycle table builds (the cone-density cache) across ticks instead of
    stalling one frame on the full ~150k-row gather. Flat brick index
    decodes as ((iz·ny) + iy)·nx + ix over the same grid; writing every row
    range reproduces the full table bitwise (tests/test_cone_prebake.py).
    Callers must keep b0 + count ≤ n_bricks (clamp the final slice)."""
    d, h, w, c = volume.shape
    bz, by, bx = brick
    sz, sy, sx = stride
    assert sz <= bz - 1 and sy <= by - 1 and sx <= bx - 1
    nz, ny, nx = _cdiv(d, sz), _cdiv(h, sy), _cdiv(w, sx)
    bi = b0 + jnp.arange(count)
    iz = bi // (ny * nx)
    iy = (bi // nx) % ny
    ix = bi % nx

    def idx(i, s, b, n):
        a = i[:, None] * s + jnp.arange(b)[None, :]
        return jnp.clip(a, 0, n - 1) if wrap == "clamp" else jnp.remainder(a, n)

    zz = idx(iz, sz, bz, d)
    yy = idx(iy, sy, by, h)
    xx = idx(ix, sx, bx, w)
    rows = volume[zz[:, :, None, None], yy[:, None, :, None],
                  xx[:, None, None, :]]  # [count, bz, by, bx, c]
    return rows.transpose(0, 4, 1, 2, 3).reshape(count, c * bz * by * bx)


def brick3_grid(dims, stride=(3, 3, 3)):
    """Brick-grid shape (nz, ny, nx) for a volume of `dims` — the row count
    of its brick table is the product (used to size sliced builds)."""
    return tuple(_cdiv(d, s) for d, s in zip(dims, stride))


def build_brick2_device(image, brick=(8, 8), stride=(7, 7),
                        wrap: str = "repeat") -> "BrickTable2D":
    """Device-side 2D brick packing (jnp gathers — no host round trip).

    Used for per-frame dynamic tables (e.g. the display path's pre-blended
    cloud map): a 768² rebrick is ~11k gather rows — trivial next to the
    per-pixel fetches it converts from 4 narrow corner gathers to 1 fat row.
    """
    h, w, c = image.shape
    by, bx = brick
    sy, sx = stride
    assert sy <= by - 1 and sx <= bx - 1
    ny, nx = _cdiv(h, sy), _cdiv(w, sx)

    def idx(n_bricks, s, b, n):
        i = jnp.arange(n_bricks)[:, None] * s + jnp.arange(b)[None, :]
        return jnp.clip(i, 0, n - 1) if wrap == "clamp" else jnp.remainder(i, n)

    yy = idx(ny, sy, by, h)
    xx = idx(nx, sx, bx, w)
    bricks = image[yy[:, None, :, None], xx[None, :, None, :]]
    lanes = bricks.transpose(0, 1, 4, 2, 3).reshape(ny * nx, c * by * bx)
    return BrickTable2D(
        table=lanes, dims=(h, w), brick=brick, stride=stride,
        grid=(ny, nx), channels=c, wrap=wrap,
    )


def _axis_weight(lane_idx, local0, frac, length):
    """[..., L] weights for one axis: (1-f) at local0, f at local0+1.

    Computed as the linear hat max(0, 1 - |local0 + f - lane|): identical
    values (lane = l0 → 1-f, lane = l0+1 → f, else ≤ 0 → clamped), ~30%
    fewer vector ops than the two-compare/two-select form — the lane-weight
    build is the dominant filter cost (docs/PERF_NOTES.md round 2). No wrap
    handling needed: brick stride ≤ brick-1 keeps l0+1 inside the brick.
    """
    a = local0.astype(jnp.float32)[..., None] + frac[..., None]
    return jnp.maximum(0.0, 1.0 - jnp.abs(a - lane_idx.astype(jnp.float32)))


def sample_brick3(bt: BrickTable3D, q):
    """Repeat-wrap trilinear fetch. q: [..., 3] (x, y, z) uv → [..., C]."""
    return sample_brick3_xyz(bt, q[..., 0], q[..., 1], q[..., 2])


def sample_brick3_xyz(bt: BrickTable3D, qx, qy, qz):
    """Component-plane variant of `sample_brick3`.

    The hot march paths carry coordinates as separate (x, y, z) planes:
    [..., 3]-stacked tensors force lane-padded layouts and explicit copies on
    the (8, 128) vreg tiling (~0.45 s of `copy` ops per frame in device
    traces), whereas same-shape planes fuse cleanly."""
    d, h, w = bt.dims
    bz, by, bx = bt.brick
    sz, sy, sx = bt.stride
    nz, ny, nx = bt.grid

    ix0, fx = _axis_coords(qx, w, bt.wrap)
    iy0, fy = _axis_coords(qy, h, bt.wrap)
    iz0, fz = _axis_coords(qz, d, bt.wrap)
    gx, lx = ix0 // sx, ix0 % sx
    gy, ly = iy0 // sy, iy0 % sy
    gz, lz = iz0 // sz, iz0 % sz
    fb = (gz * ny + gy) * nx + gx

    rows = jnp.take(bt.table, fb, axis=0)  # [..., C*L]
    L = bz * by * bx
    lanes = np.arange(L)
    lane_x = jnp.asarray(lanes % bx, jnp.int32)
    lane_y = jnp.asarray((lanes // bx) % by, jnp.int32)
    lane_z = jnp.asarray(lanes // (bx * by), jnp.int32)

    wgt = (
        _axis_weight(lane_x, lx, fx, bx)
        * _axis_weight(lane_y, ly, fy, by)
        * _axis_weight(lane_z, lz, fz, bz)
    )  # [..., L]
    rows = rows.reshape(rows.shape[:-1] + (bt.channels, L))
    return jnp.sum(rows * wgt[..., None, :], axis=-1)


def sample_brick2(bt: BrickTable2D, uv):
    """Repeat-wrap bilinear fetch. uv: [..., 2] → [..., C]."""
    return sample_brick2_xy(bt, uv[..., 0], uv[..., 1])


def sample_brick2_xy(bt: BrickTable2D, qu, qv):
    """Component-plane variant of `sample_brick2` (see sample_brick3_xyz)."""
    h, w = bt.dims
    by, bx = bt.brick
    sy, sx = bt.stride
    ny, nx = bt.grid

    ix0, fx = _axis_coords(qu, w, bt.wrap)
    iy0, fy = _axis_coords(qv, h, bt.wrap)
    gx, lx = ix0 // sx, ix0 % sx
    gy, ly = iy0 // sy, iy0 % sy
    fb = gy * nx + gx

    rows = jnp.take(bt.table, fb, axis=0)
    L = by * bx
    lanes = np.arange(L)
    lane_x = jnp.asarray(lanes % bx, jnp.int32)
    lane_y = jnp.asarray(lanes // bx, jnp.int32)
    wgt = _axis_weight(lane_x, lx, fx, bx) * _axis_weight(lane_y, ly, fy, by)
    rows = rows.reshape(rows.shape[:-1] + (bt.channels, L))
    return jnp.sum(rows * wgt[..., None, :], axis=-1)


def sample_tiny3(tv: TinyVolume3D, q):
    """Gather-free trilinear fetch from a ≤1-row volume with modular wrap."""
    return sample_tiny3_xyz(tv, q[..., 0], q[..., 1], q[..., 2])


def sample_tiny3_xyz(tv: TinyVolume3D, qx, qy, qz):
    """Component-plane variant of `sample_tiny3`."""
    d, h, w = tv.dims
    ix0, fx = _axis_coords(qx, w)
    iy0, fy = _axis_coords(qy, h)
    iz0, fz = _axis_coords(qz, d)

    L = d * h * w
    lanes = np.arange(L)
    lane_x = jnp.asarray(lanes % w, jnp.int32)
    lane_y = jnp.asarray((lanes // w) % h, jnp.int32)
    lane_z = jnp.asarray(lanes // (w * h), jnp.int32)

    def axis_w(lane_idx, i0, f, n):
        i0e = i0[..., None]
        fe = f[..., None]
        return jnp.where(lane_idx == i0e, 1.0 - fe, 0.0) + jnp.where(
            lane_idx == jnp.remainder(i0e + 1, n), fe, 0.0
        )

    wgt = (
        axis_w(lane_x, ix0, fx, w)
        * axis_w(lane_y, iy0, fy, h)
        * axis_w(lane_z, iz0, fz, d)
    )  # [..., L]
    row = tv.row.reshape(tv.channels, L)
    return jnp.sum(row * wgt[..., None, :], axis=-1)
