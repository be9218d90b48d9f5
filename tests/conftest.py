"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
`--xla_force_host_platform_device_count=8`, the JAX analog of a fake
multi-node backend (SURVEY.md §4). Benchmarks (`bench.py`) run on real TPU and
do NOT import this.
"""

import os

# Force CPU with 8 virtual devices. NOTE: the session sitecustomize imports
# jax at interpreter startup with JAX_PLATFORMS=axon (the real-TPU tunnel), so
# plain env mutation here is too late — the config update below is what
# actually takes effect. The suite must never touch the TPU: it runs
# concurrently with other work and the TPU claim is single-process (concurrent
# use deadlocks on a futex).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

# Import robustness for fresh checkouts (pytest puts tests/ on sys.path, not
# the repo root; an editable install also works but don't require it).
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "test suite must run on CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

# Persistent compilation cache: the suite compiles many small jitted stages;
# warm reruns skip all of that.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_DIR = "/root/reference/cloud_sky"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)


@pytest.fixture(scope="session")
def worlnoise_volume():
    """The shipped 32³ RGB Worley volume — a pixel-exact sampler fixture."""
    from cloudscape_tpu.utils.assets import load_bmp, slice_horizontal_3d

    img = load_bmp(os.path.join(REFERENCE_DIR, "worlnoise.bmp"))
    return slice_horizontal_3d(img, 32)


@pytest.fixture(scope="session")
def weather_image():
    """The shipped 512² RGB weather map fixture."""
    from cloudscape_tpu.utils.assets import load_bmp

    return load_bmp(os.path.join(REFERENCE_DIR, "weather.bmp"))
