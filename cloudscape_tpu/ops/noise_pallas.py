"""Pallas TPU kernels for procedural noise synthesis (BASELINE config 4).

Lattice noise is the one hot op here that is a *perfect* Pallas fit: pure
VPU arithmetic (uint32 PCG hashing + FBM accumulation), zero memory gathers,
and an embarrassingly tileable output — so the generator runs as a Pallas
grid over z-slices with each [H, W] tile resident in VMEM, instead of
materializing the full octave stack through HBM as the jnp version does.

The math mirrors `ops/noise.py` exactly (same PCG3D hash, same lattice
wrapping, same octave weights) and is validated against it in
tests/test_noise_pallas.py. Components are carried as separate (x, y, z)
planes rather than [..., 3] vectors — last-dim-3 tensors tile poorly on the
(8, 128) vreg layout.

On non-TPU backends the kernels run in interpreter mode (slow but exact),
keeping the CPU test suite meaningful.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Component-wise lattice primitives (uint32 PCG3D, as ops/noise.py).


def _pcg3d_xyz(x, y, z):
    x = x * jnp.uint32(1664525) + jnp.uint32(1013904223)
    y = y * jnp.uint32(1664525) + jnp.uint32(1013904223)
    z = z * jnp.uint32(1664525) + jnp.uint32(1013904223)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return x, y, z


def _to_unit(h):
    # Mosaic has no uint32 → f32 cast; the shifted hash is < 2^24, so a
    # bitcast to int32 is value-preserving and int32 → f32 is supported.
    h24 = jax.lax.bitcast_convert_type(h >> jnp.uint32(8), jnp.int32)
    return h24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _lattice_rand3_xyz(ix, iy, iz, period, seed):
    s = jnp.uint32(seed) * jnp.uint32(0x9E3779B9)
    wx = jnp.remainder(ix, period).astype(jnp.uint32) + s
    wy = jnp.remainder(iy, period).astype(jnp.uint32) + s
    wz = jnp.remainder(iz, period).astype(jnp.uint32) + s
    hx, hy, hz = _pcg3d_xyz(wx, wy, wz)
    return _to_unit(hx), _to_unit(hy), _to_unit(hz)


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def perlin3_xyz(px, py, pz, period: int, seed: int):
    """Periodic Perlin noise on component planes (lattice units)."""
    ix = jnp.floor(px)
    iy = jnp.floor(py)
    iz = jnp.floor(pz)
    fx, fy, fz = px - ix, py - iy, pz - iz
    ix = ix.astype(jnp.int32)
    iy = iy.astype(jnp.int32)
    iz = iz.astype(jnp.int32)
    ux, uy, uz = _fade(fx), _fade(fy), _fade(fz)

    total = None
    for cz in (0, 1):
        for cy in (0, 1):
            for cx in (0, 1):
                rx, ry, rz = _lattice_rand3_xyz(ix + cx, iy + cy, iz + cz,
                                                period, seed)
                gx, gy, gz = rx * 2.0 - 1.0, ry * 2.0 - 1.0, rz * 2.0 - 1.0
                # Match ops/noise._lattice_grad3 exactly: r / max(|r|, 1e-5).
                norm = jnp.maximum(jnp.sqrt(gx * gx + gy * gy + gz * gz), 1e-5)
                gx, gy, gz = gx / norm, gy / norm, gz / norm
                v = gx * (fx - cx) + gy * (fy - cy) + gz * (fz - cz)
                w = (
                    (ux if cx else (1.0 - ux))
                    * (uy if cy else (1.0 - uy))
                    * (uz if cz else (1.0 - uz))
                )
                total = v * w if total is None else total + v * w
    return total


def perlin_fbm3_xyz(x, y, z, base_period: int, octaves: int, seed: int,
                    persistence: float = 0.5):
    acc = None
    amp = 1.0
    norm = 0.0
    freq = base_period
    for o in range(octaves):
        v = perlin3_xyz(x * freq, y * freq, z * freq, freq, seed * 31 + o) * amp
        acc = v if acc is None else acc + v
        norm += amp
        amp *= persistence
        freq *= 2
    return acc / norm


def worley3_xyz(x, y, z, period: int, seed: int):
    """Periodic inverted Worley on component planes ([0,1) coords)."""
    qx, qy, qz = x * period, y * period, z * period
    ix = jnp.floor(qx)
    iy = jnp.floor(qy)
    iz = jnp.floor(qz)
    fx, fy, fz = qx - ix, qy - iy, qz - iz
    ix = ix.astype(jnp.int32)
    iy = iy.astype(jnp.int32)
    iz = iz.astype(jnp.int32)

    min_d2 = None
    for cz in (-1, 0, 1):
        for cy in (-1, 0, 1):
            for cx in (-1, 0, 1):
                rx, ry, rz = _lattice_rand3_xyz(ix + cx, iy + cy, iz + cz,
                                                period, seed)
                dx = rx + cx - fx
                dy = ry + cy - fy
                dz = rz + cz - fz
                d2 = dx * dx + dy * dy + dz * dz
                min_d2 = d2 if min_d2 is None else jnp.minimum(min_d2, d2)
    return 1.0 - jnp.minimum(jnp.sqrt(min_d2), 1.0)


def worley_fbm3_xyz(x, y, z, base_period: int, seed: int):
    return (
        worley3_xyz(x, y, z, base_period, seed) * 0.625
        + worley3_xyz(x, y, z, base_period * 2, seed + 7) * 0.25
        + worley3_xyz(x, y, z, base_period * 4, seed + 13) * 0.125
    )


def _remap(v, lo, hi, nlo, nhi):
    return nlo + ((v - lo) / (hi - lo)) * (nhi - nlo)


# ---------------------------------------------------------------------------
# Kernels. Grid = z-slices; each program computes one [H, W] plane per
# channel, fully in VMEM/registers.


def _base_noise_kernel(r_ref, g_ref, b_ref, a_ref, *, size: int, seed: int):
    z = pl.program_id(0)
    n = size
    # iota must be integer-typed on TPU; cast after.
    xs = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 1).astype(jnp.float32) + 0.5) / n
    ys = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0).astype(jnp.float32) + 0.5) / n
    zs = jnp.full((n, n), (z.astype(jnp.float32) + 0.5) / n, jnp.float32)

    pfbm = perlin_fbm3_xyz(xs, ys, zs, 4, 7, seed) * 0.5 + 0.5
    pfbm = jnp.clip(_remap(pfbm, 0.32, 0.68, 0.0, 1.0), 0.0, 1.0)
    wlow = worley_fbm3_xyz(xs, ys, zs, 4, seed + 101)
    raw = _remap(pfbm, wlow - 1.0, 1.0, 0.0, 1.0)
    r_ref[0] = jnp.clip(_remap(raw, 0.45, 0.95, 0.0, 1.0), 0.0, 1.0)
    g_ref[0] = worley_fbm3_xyz(xs, ys, zs, 8, seed + 211)
    b_ref[0] = worley_fbm3_xyz(xs, ys, zs, 16, seed + 307)
    a_ref[0] = worley_fbm3_xyz(xs, ys, zs, 32, seed + 401)


@partial(jax.jit, static_argnames=("size", "seed"))
def generate_base_noise_pallas(size: int = 128, seed: int = 0) -> jax.Array:
    """Pallas Perlin-Worley base volume, [size]³ × RGBA (ops/noise.py
    contract; one grid program per z-slice)."""
    n = size
    spec = pl.BlockSpec((1, n, n), lambda z: (z, 0, 0),
                        memory_space=pltpu.VMEM)
    shapes = [jax.ShapeDtypeStruct((n, n, n), jnp.float32)] * 4
    r, g, b, a = pl.pallas_call(
        partial(_base_noise_kernel, size=size, seed=seed),
        grid=(n,),
        out_shape=shapes,
        out_specs=[spec] * 4,
        interpret=_interpret(),
    )()
    return jnp.stack([r, g, b, a], axis=-1)


def _detail_noise_kernel(r_ref, g_ref, b_ref, *, size: int, seed: int):
    z = pl.program_id(0)
    n = size
    # iota must be integer-typed on TPU; cast after.
    xs = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 1).astype(jnp.float32) + 0.5) / n
    ys = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0).astype(jnp.float32) + 0.5) / n
    zs = jnp.full((n, n), (z.astype(jnp.float32) + 0.5) / n, jnp.float32)
    r_ref[0] = worley3_xyz(xs, ys, zs, 2, seed + 17)
    g_ref[0] = worley3_xyz(xs, ys, zs, 4, seed + 23)
    b_ref[0] = worley3_xyz(xs, ys, zs, 8, seed + 29)


@partial(jax.jit, static_argnames=("size", "seed"))
def generate_detail_noise_pallas(size: int = 32, seed: int = 0) -> jax.Array:
    n = size
    spec = pl.BlockSpec((1, n, n), lambda z: (z, 0, 0),
                        memory_space=pltpu.VMEM)
    r, g, b = pl.pallas_call(
        partial(_detail_noise_kernel, size=size, seed=seed),
        grid=(n,),
        out_shape=[jax.ShapeDtypeStruct((n, n, n), jnp.float32)] * 3,
        out_specs=[spec] * 3,
        interpret=_interpret(),
    )()
    return jnp.stack([r, g, b], axis=-1)


def _weather_kernel(t_ref, s_ref, c_ref, *, size: int, seed: int):
    n = size
    xs = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 1).astype(jnp.float32) + 0.5) / n
    ys = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0).astype(jnp.float32) + 0.5) / n
    zs = jnp.full((n, n), 0.37, jnp.float32)
    t_ref[...] = perlin_fbm3_xyz(xs, ys, zs, 3, 4, seed + 5) * 0.5 + 0.5
    s_ref[...] = perlin_fbm3_xyz(xs, ys, zs, 6, 4, seed + 11) * 0.5 + 0.5
    cov = perlin_fbm3_xyz(xs, ys, zs, 4, 5, seed + 3) * 0.5 + 0.5
    t = jnp.clip((cov - 0.35) / (0.85 - 0.35), 0.0, 1.0)
    c_ref[...] = t * t * (3.0 - 2.0 * t)


@partial(jax.jit, static_argnames=("size", "seed"))
def generate_weather_pallas(size: int = 512, seed: int = 0) -> jax.Array:
    n = size
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    t, s, c = pl.pallas_call(
        partial(_weather_kernel, size=size, seed=seed),
        out_shape=[jax.ShapeDtypeStruct((n, n), jnp.float32)] * 3,
        out_specs=[spec] * 3,
        interpret=_interpret(),
    )()
    return jnp.stack([t, s, c], axis=-1)
