"""Brick-row sampling (the TPU fast path) vs the reference samplers, and the
scan-free fast march vs the reference march (SURVEY.md §4 kernel golden
tests for the performance path).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cloudscape_tpu.ops import brick, sampling
from cloudscape_tpu.utils.image import psnr


def test_brick3_matches_trilinear(worlnoise_volume, rng):
    bt = brick.build_brick3(worlnoise_volume[..., :2], (4, 4, 4), (3, 3, 3))
    q = rng.uniform(-2, 2, size=(5000, 3)).astype(np.float32)
    got = np.asarray(brick.sample_brick3(bt, jnp.asarray(q)))
    want = np.asarray(
        sampling.sample3d(jnp.asarray(worlnoise_volume[..., :2]), jnp.asarray(q))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_brick3_single_channel_8x4x4(worlnoise_volume, rng):
    vol = worlnoise_volume[..., :1]
    bt = brick.build_brick3(vol, (8, 4, 4), (7, 3, 3))
    q = rng.uniform(-1, 1, size=(3000, 3)).astype(np.float32)
    got = np.asarray(brick.sample_brick3(bt, jnp.asarray(q)))
    want = np.asarray(sampling.sample3d(jnp.asarray(vol), jnp.asarray(q)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_brick2_matches_bilinear(weather_image, rng):
    img = weather_image[..., :2]
    bt = brick.build_brick2(img, (8, 8), (7, 7))
    uv = rng.uniform(-2, 2, size=(5000, 2)).astype(np.float32)
    got = np.asarray(brick.sample_brick2(bt, jnp.asarray(uv)))
    want = np.asarray(sampling.sample2d(jnp.asarray(img), jnp.asarray(uv)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_tiny3_matches_trilinear(rng):
    vol = rng.uniform(size=(4, 4, 4, 1)).astype(np.float32)
    tv = brick.build_tiny3(vol)
    q = rng.uniform(-1, 2, size=(2000, 3)).astype(np.float32)
    got = np.asarray(brick.sample_tiny3(tv, jnp.asarray(q)))
    want = np.asarray(sampling.sample3d(jnp.asarray(vol), jnp.asarray(q)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_tiny3_2ch(rng):
    vol = rng.uniform(size=(2, 2, 2, 2)).astype(np.float32)
    tv = brick.build_tiny3(vol)
    q = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    got = np.asarray(brick.sample_tiny3(tv, jnp.asarray(q)))
    want = np.asarray(sampling.sample3d(jnp.asarray(vol), jnp.asarray(q)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_brick_wrap_edges(worlnoise_volume):
    """Samples straddling the wrap seam (i0 = N-1, corner wraps to 0)."""
    vol = worlnoise_volume[..., :2]
    n = vol.shape[0]
    bt = brick.build_brick3(vol, (4, 4, 4), (3, 3, 3))
    # uv placing the cell index exactly at n-1 with fraction 0.5
    c = (n - 1 + 0.5 + 0.5) / n  # cell n-1, frac 0.5
    q = np.array([[c, c, c], [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], np.float32)
    got = np.asarray(brick.sample_brick3(bt, jnp.asarray(q)))
    want = np.asarray(sampling.sample3d(jnp.asarray(vol), jnp.asarray(q)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.fixture(scope="module")
def march_setup():
    from cloudscape_tpu.models import atmosphere
    from cloudscape_tpu.models.density import MarchParams
    from cloudscape_tpu.models.packs import make_noise_pack
    from cloudscape_tpu.ops.noise import generate_base_noise
    from cloudscape_tpu.utils.assets import load_bmp, slice_horizontal_3d

    small = slice_horizontal_3d(
        load_bmp("/root/reference/cloud_sky/worlnoise.bmp"), 32
    )
    weather = load_bmp("/root/reference/cloud_sky/weather.bmp")
    base = np.asarray(generate_base_noise(32, seed=0))
    noise = make_noise_pack(base, small, weather)

    tlut = atmosphere.transmittance_lut()
    sun = np.array([0.3, 0.4, -0.85])
    sun /= np.linalg.norm(sun)
    slut = atmosphere.sky_lut(tlut, jnp.asarray(sun, jnp.float32))
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]), detailed_pos=np.array([0.4, 0.2]),
        weather_pos=np.array([0.01, 0.02]), time=12.5, cloud_coverage=0.35,
        light_direction=sun, ground_color=np.array([0.27, 0.19, 0.027]),
    )
    return noise, slut, params


def test_march_bricks_matches_march(march_setup):
    from cloudscape_tpu.models.march import march
    from cloudscape_tpu.models.march_fast import BrickPack, march_bricks
    from cloudscape_tpu.ops.octmap import texel_directions

    noise, slut, params = march_setup
    bp = BrickPack.from_noise(noise)
    dirs = texel_directions(32)

    ref = np.asarray(march(dirs, params, noise, slut, steps=16, light_steps=6))
    fast = np.asarray(march_bricks(dirs, params, bp, slut, steps=16, light_steps=6))
    assert fast.shape == ref.shape
    p = psnr(fast, ref)
    assert p > 40.0, f"fast-march PSNR {p:.1f} dB vs reference march"
    assert (ref[..., 3] > 0.1).mean() > 0.03  # scene non-trivial


def test_march_bricks_bf16_tables_hold_gate(march_setup):
    """bf16 noise-table storage (opt-in, ~10% faster dense phase) must stay
    above the 40 dB fidelity gate vs the f32 tables."""
    import jax.numpy as jnp

    from cloudscape_tpu.models.march_fast import BrickPack, march_bricks
    from cloudscape_tpu.ops.octmap import texel_directions

    noise, slut, params = march_setup
    bp32 = BrickPack.from_noise(noise)
    bp16 = BrickPack.from_noise(noise, dtype=jnp.bfloat16)
    dirs = texel_directions(32)
    a = np.asarray(march_bricks(dirs, params, bp32, slut, steps=16))
    b = np.asarray(march_bricks(dirs, params, bp16, slut, steps=16))
    p = psnr(b, a)
    assert p > 40.0, f"bf16 tables: {p:.1f} dB"


def test_march_bricks_approx_light_holds_gate(march_setup):
    """approx_light (shared cone weather) saves 6/17 light rows; the cone
    spans ≲0.1 weather texel so the deltas must stay far above the gate."""
    from cloudscape_tpu.models.march_fast import BrickPack, march_bricks
    from cloudscape_tpu.ops.octmap import texel_directions

    noise, slut, params = march_setup
    bp = BrickPack.from_noise(noise)
    dirs = texel_directions(32)
    exact = np.asarray(march_bricks(dirs, params, bp, slut, steps=16))
    approx = np.asarray(
        march_bricks(dirs, params, bp, slut, steps=16, approx_light=True)
    )
    p = psnr(approx, exact)
    assert p > 45.0, f"approx_light: {p:.1f} dB"


def test_march_bricks_chunking_invariance(march_setup):
    """Chunked (lax.map) and unchunked paths must agree to fp-reassociation
    precision (different chunk shapes fuse differently → 1-ULP deltas)."""
    from cloudscape_tpu.models.march_fast import BrickPack, march_bricks
    from cloudscape_tpu.ops.octmap import texel_directions

    noise, slut, params = march_setup
    bp = BrickPack.from_noise(noise)
    dirs = texel_directions(16)  # 256 rays
    a = np.asarray(march_bricks(dirs, params, bp, slut, steps=8, chunk=1 << 20))
    b = np.asarray(march_bricks(dirs, params, bp, slut, steps=8, chunk=64))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_march_bricks_compact_matches_dense(march_setup):
    """The occupancy-compacted pipeline must reproduce the dense Phase A+B
    (with cutoff 0 it is the same math modulo scatter order)."""
    from cloudscape_tpu.models.march_fast import BrickPack, march_bricks
    from cloudscape_tpu.ops.octmap import texel_directions

    noise, slut, params = march_setup
    bp = BrickPack.from_noise(noise)
    dirs = texel_directions(32)
    dense = np.asarray(
        march_bricks(dirs, params, bp, slut, steps=16, compact=False)
    )
    comp = np.asarray(
        march_bricks(dirs, params, bp, slut, steps=16, compact=True,
                     capacity_frac=0.5, t_cutoff=0.0)
    )
    np.testing.assert_allclose(comp, dense, atol=1e-6)
    # And the default cutoff must stay visually identical (>60 dB).
    comp2 = np.asarray(
        march_bricks(dirs, params, bp, slut, steps=16, compact=True,
                     capacity_frac=0.5, t_cutoff=1e-4)
    )
    assert psnr(comp2, dense) > 60.0
