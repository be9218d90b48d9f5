"""Native asset pipeline (C++ assetio) vs the pure-Python fallbacks.

Builds the shared library with the in-repo toolchain; if the build fails in
this environment the suite still validates the Python path (the native layer
is an accelerator, not a dependency).
"""

import numpy as np
import pytest

from cloudscape_tpu.utils import build_native


@pytest.fixture(scope="module")
def native():
    if not build_native.build(verbose=False):
        pytest.skip("native toolchain unavailable")
    import cloudscape_tpu.utils._native as n

    n._TRIED = False  # re-probe after the fresh build
    n._LIB = None
    if n._lib() is None:
        pytest.skip("libassetio.so failed to load")
    return n


def test_native_bmp_matches_python(native):
    from cloudscape_tpu.utils.assets import _load_bmp_py

    path = "/root/reference/cloud_sky/weather.bmp"
    got = native.load_bmp(path)
    want = _load_bmp_py(path)
    assert got is not None
    np.testing.assert_array_equal(got, want)


def test_native_bmp_worlnoise(native):
    from cloudscape_tpu.utils.assets import _load_bmp_py

    path = "/root/reference/cloud_sky/worlnoise.bmp"
    np.testing.assert_array_equal(native.load_bmp(path), _load_bmp_py(path))


def test_native_slice3d(native, rng):
    img = rng.uniform(size=(32, 1024, 3)).astype(np.float32)
    got = native.slice3d(img, 32)
    want = np.ascontiguousarray(
        img.reshape(32, 32, 32, 3).transpose(1, 0, 2, 3)
    )
    np.testing.assert_array_equal(got, want)


def test_native_mip3d(native, rng):
    vol = rng.uniform(size=(16, 8, 32, 4)).astype(np.float32)
    got = native.mip3d(vol)
    want = vol.reshape(8, 2, 4, 2, 16, 2, 4).mean(axis=(1, 3, 5), dtype=np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_pack_bricks(native, rng):
    vol = rng.uniform(size=(32, 32, 32, 2)).astype(np.float32)
    got = native.pack_bricks3d(vol, (4, 4, 4), (3, 3, 3))
    # Python reference packing (mirrors ops/brick.py fallback).
    d = h = w = 32
    nz = ny = nx = -(-32 // 3)
    zz = (np.arange(nz)[:, None] * 3 + np.arange(4)[None, :]) % d
    yy = (np.arange(ny)[:, None] * 3 + np.arange(4)[None, :]) % h
    xx = (np.arange(nx)[:, None] * 3 + np.arange(4)[None, :]) % w
    bricks = vol[
        zz[:, None, None, :, None, None],
        yy[None, :, None, None, :, None],
        xx[None, None, :, None, None, :],
    ]
    want = bricks.transpose(0, 1, 2, 6, 3, 4, 5).reshape(nz * ny * nx, 2 * 64)
    np.testing.assert_array_equal(got, want)


def test_brick_build_uses_native_transparently(native, worlnoise_volume):
    """build_brick3 must produce identical tables with and without native."""
    from cloudscape_tpu.ops import brick

    vol = worlnoise_volume[..., :2]
    with_native = np.asarray(brick.build_brick3(vol).table)
    # Disable native and rebuild.
    lib = native._LIB
    native._LIB = None
    try:
        without = np.asarray(brick.build_brick3(vol).table)
    finally:
        native._LIB = lib
    np.testing.assert_array_equal(with_native, without)
