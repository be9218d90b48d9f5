"""Octahedral hemisphere mapping: round-trip and oracle parity.

The compute kernel decodes (`clouds.glsl:239-256`) and the display shader
encodes (`clouds.gdshader:22-32`); they must be exact inverses (SURVEY.md §4).
"""

import numpy as np
import jax.numpy as jnp

from cloudscape_tpu.ops import octmap
from oracle import reference as ref


def test_decode_matches_oracle(rng):
    uv = rng.uniform(0, 1, size=(64, 64, 2))
    got = np.asarray(octmap.oct_to_vec3(jnp.asarray(uv, jnp.float32)))
    want = ref.oct_to_vec3_np(uv)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_encode_matches_oracle(rng):
    d = rng.normal(size=(2000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    got = np.asarray(octmap.vec3_to_oct(jnp.asarray(d, jnp.float32)))
    want = ref.vec3_to_oct_np(d)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_roundtrip_uv_dir_uv(rng):
    uv = rng.uniform(0.01, 0.99, size=(5000, 2))
    d = octmap.oct_to_vec3(jnp.asarray(uv, jnp.float32))
    uv2 = np.asarray(octmap.vec3_to_oct(d))
    np.testing.assert_allclose(uv2, uv, atol=1e-5)


def test_roundtrip_world(rng):
    d = rng.normal(size=(5000, 3))
    d[:, 1] = np.abs(d[:, 1]) + 1e-3  # upper hemisphere (what the sky uses)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    uv = octmap.world_dir_to_uv(jnp.asarray(d, jnp.float32))
    d2 = np.asarray(octmap.uv_to_world_dir(uv))
    np.testing.assert_allclose(d2, d, atol=1e-4)


def test_texel_directions_matches_kernel_formula():
    n = 64
    dirs = np.asarray(octmap.texel_directions(n))
    assert dirs.shape == (n, n, 3)
    # Spot-check against the oracle decode at raw texel uv (no half-texel
    # offset, `clouds.glsl:260-262`).
    ys, xs = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    uv = np.stack([xs / n, ys / n], axis=-1)
    want = ref.oct_to_vec3_np(uv)[..., [0, 2, 1]]
    np.testing.assert_allclose(dirs, want, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)


def test_texel_directions_tile_offset():
    n = 128
    full = np.asarray(octmap.texel_directions(n))
    tile = np.asarray(octmap.texel_directions(n, x0=32, y0=64, width=16, height=16))
    np.testing.assert_array_equal(tile, full[64:80, 32:48])
