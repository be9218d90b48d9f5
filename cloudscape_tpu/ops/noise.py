"""On-device procedural noise: periodic Perlin, Worley, Perlin-Worley, weather.

The reference bakes its density-field noise into textures
(`perlworlnoise.tga` 128³ RGBA, `worlnoise.bmp` 32³ RGB, `weather.bmp` 512²;
SURVEY.md §2.9) — and `perlworlnoise.tga` is absent from the mount, so the
base volume MUST be generated procedurally (README TODO #3 of the reference,
made mandatory here). All generators are tileable (lattice coordinates wrap at
the period) so the repeat-wrap samplers see seamless volumes, run fully
vectorized on device, and are deterministic in (seed, shape).

Channel semantics match the reference's usage exactly:
- base volume R = Perlin-Worley cloud shape (`clouds.glsl:122` reads `.r`),
  G/B/A = Worley FBM octaves combined with weights .625/.25/.125
  (`clouds.glsl:118`);
- detail volume RGB = 3 Worley octaves, weights .625/.25/.125
  (`clouds.glsl:133`);
- weather R = cloud type, B = coverage (`clouds.glsl:121-123`); G is unused by
  the kernel and carries an extra FBM field for forward-compat.

Hashing is the PCG3D mix (Jarzynski & Olano, "Hash Functions for GPU
Rendering", JCGT 2020) on wrapped uint32 lattice coords.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _pcg3d(v):
    """PCG3D uint32 mix; v: [..., 3] uint32 → [..., 3] uint32."""
    v = v * jnp.uint32(1664525) + jnp.uint32(1013904223)
    x = v[..., 0] + v[..., 1] * v[..., 2]
    y = v[..., 1] + v[..., 2] * x
    z = v[..., 2] + x * y
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return jnp.stack([x, y, z], axis=-1)


def _hash_to_unit(h):
    """uint32 → float32 in [0, 1)."""
    return (h >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _lattice_rand3(cell, period, seed):
    """Random [0,1)³ per (wrapped) integer lattice cell. cell: [..., 3] int32."""
    wrapped = jnp.remainder(cell, period).astype(jnp.uint32)
    seeded = wrapped + jnp.uint32(seed) * jnp.uint32(0x9E3779B9)
    return _hash_to_unit(_pcg3d(seeded))


def _lattice_grad3(cell, period, seed):
    """Quasi-uniform unit gradient per lattice cell."""
    r = _lattice_rand3(cell, period, seed) * 2.0 - 1.0
    n = jnp.sqrt(jnp.sum(r * r, axis=-1, keepdims=True))
    return r / jnp.maximum(n, 1e-5)


def _fade(t):
    """Perlin quintic fade t³(6t²-15t+10)."""
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def perlin3(p, period: int, seed: int = 0):
    """Periodic 3D Perlin gradient noise, p: [..., 3] in lattice units
    (one period = `period` lattice cells). Returns [...] roughly in [-1, 1]."""
    pi = jnp.floor(p)
    pf = p - pi
    pi = pi.astype(jnp.int32)

    total = None
    u = _fade(pf)
    for cz in (0, 1):
        for cy in (0, 1):
            for cx in (0, 1):
                corner = jnp.array([cx, cy, cz], jnp.int32)
                g = _lattice_grad3(pi + corner, period, seed)
                d = pf - corner.astype(jnp.float32)
                v = jnp.sum(g * d, axis=-1)
                w = (
                    (u[..., 0] if cx else (1.0 - u[..., 0]))
                    * (u[..., 1] if cy else (1.0 - u[..., 1]))
                    * (u[..., 2] if cz else (1.0 - u[..., 2]))
                )
                total = v * w if total is None else total + v * w
    return total


def perlin_fbm3(p, base_period: int, octaves: int, seed: int = 0,
                persistence: float = 0.5):
    """Periodic Perlin FBM; p in [0,1)³; returns [...] roughly in [-1, 1]."""
    acc = None
    amp = 1.0
    norm = 0.0
    freq = base_period
    for o in range(octaves):
        v = perlin3(p * freq, freq, seed=seed * 31 + o) * amp
        acc = v if acc is None else acc + v
        norm += amp
        amp *= persistence
        freq *= 2
    return acc / norm


def worley3(p, period: int, seed: int = 0):
    """Periodic 3D Worley (cellular) noise, inverted: 1 at feature points,
    0 far away. p: [..., 3] in [0,1)³. One feature point per lattice cell;
    distance in cell units clamped to 1."""
    q = p * period
    qi = jnp.floor(q).astype(jnp.int32)
    qf = q - jnp.floor(q)

    min_d2 = None
    for cz in (-1, 0, 1):
        for cy in (-1, 0, 1):
            for cx in (-1, 0, 1):
                offset = jnp.array([cx, cy, cz], jnp.int32)
                feature = _lattice_rand3(qi + offset, period, seed)
                d = feature + offset.astype(jnp.float32) - qf
                d2 = jnp.sum(d * d, axis=-1)
                min_d2 = d2 if min_d2 is None else jnp.minimum(min_d2, d2)
    return 1.0 - jnp.minimum(jnp.sqrt(min_d2), 1.0)


def worley_fbm3(p, base_period: int, seed: int = 0):
    """Three-octave Worley FBM with the Schneider weights (matching how the
    kernel combines its pre-baked octaves, `clouds.glsl:118,133`)."""
    return (
        worley3(p, base_period, seed) * 0.625
        + worley3(p, base_period * 2, seed + 7) * 0.25
        + worley3(p, base_period * 4, seed + 13) * 0.125
    )


def _remap(v, lo, hi, nlo, nhi):
    return nlo + ((v - lo) / (hi - lo)) * (nhi - nlo)


def _grid3(n: int):
    """Texel-center sample grid [n, n, n, 3] in [0,1)³ (x,y,z order)."""
    c = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    z, y, x = jnp.meshgrid(c, c, c, indexing="ij")
    return jnp.stack([x, y, z], axis=-1)


@partial(jax.jit, static_argnames=("size", "seed"))
def generate_base_noise(size: int = 128, seed: int = 0) -> jax.Array:
    """The Perlin-Worley base volume replacing the missing perlworlnoise.tga.

    [size, size, size, 4] float32 in [0,1]:
    R = Perlin FBM dilated by low-frequency Worley (the classic Schneider
    "Perlin-Worley"), G/B/A = Worley FBM at rising frequencies.
    """
    p = _grid3(size)
    pfbm = perlin_fbm3(p, base_period=4, octaves=7, seed=seed) * 0.5 + 0.5
    # FBM normalization compresses the range (~[0.32, 0.68] measured);
    # stretch to full [0,1] so the in-kernel coverage remap
    # (`clouds.glsl:122-125`) sees both voids and solid cores.
    pfbm = jnp.clip(_remap(pfbm, 0.32, 0.68, 0.0, 1.0), 0.0, 1.0)
    wlow = worley_fbm3(p, 4, seed=seed + 101)
    # Dilate the Perlin shape with Worley billows: remap onto the Worley floor,
    # then contrast-stretch back to [0,1] (fixed constants from the measured
    # raw distribution, keeping the generator deterministic and jit-static).
    raw = _remap(pfbm, wlow - 1.0, 1.0, 0.0, 1.0)
    r = jnp.clip(_remap(raw, 0.45, 0.95, 0.0, 1.0), 0.0, 1.0)
    g = worley_fbm3(p, 8, seed=seed + 211)
    b = worley_fbm3(p, 16, seed=seed + 307)
    a = worley_fbm3(p, 32, seed=seed + 401)
    return jnp.stack([r, g, b, a], axis=-1)


@partial(jax.jit, static_argnames=("size", "seed"))
def generate_detail_noise(size: int = 32, seed: int = 0) -> jax.Array:
    """Worley detail volume, the procedural analog of worlnoise.bmp.

    [size, size, size, 3] float32 in [0,1]: three Worley octaves at rising
    frequency (combined by the kernel with weights .625/.25/.125).
    """
    p = _grid3(size)
    r = worley3(p, 2, seed=seed + 17)
    g = worley3(p, 4, seed=seed + 23)
    b = worley3(p, 8, seed=seed + 29)
    return jnp.stack([r, g, b], axis=-1)


@partial(jax.jit, static_argnames=("size", "seed"))
def generate_weather(size: int = 512, seed: int = 0) -> jax.Array:
    """Procedural weather map, the analog of weather.bmp.

    [size, size, 3] float32 in [0,1]: R = cloud type (0 stratus → 1 cumulus),
    G = spare FBM field, B = coverage.
    """
    c = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    y, x = jnp.meshgrid(c, c, indexing="ij")
    # Evaluate 2D fields as z=const slices of periodic 3D FBM.
    p = jnp.stack([x, y, jnp.full_like(x, 0.37)], axis=-1)
    cloud_type = perlin_fbm3(p, base_period=3, octaves=4, seed=seed + 5) * 0.5 + 0.5
    spare = perlin_fbm3(p, base_period=6, octaves=4, seed=seed + 11) * 0.5 + 0.5
    coverage_raw = perlin_fbm3(p, base_period=4, octaves=5, seed=seed + 3) * 0.5 + 0.5
    # Push coverage toward a patchy cumulus distribution.
    t = jnp.clip((coverage_raw - 0.35) / (0.85 - 0.35), 0.0, 1.0)
    coverage = t * t * (3.0 - 2.0 * t)
    return jnp.stack([cloud_type, spare, coverage], axis=-1)
