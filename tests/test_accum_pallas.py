"""Pallas phase-3 accumulation kernel ≡ its jnp mirror (Mosaic interpreter
on CPU), including the below-horizon/empty-ray and block-padding cases.
On TPU at steps=128 `_march_core2` routes phase 3 through this kernel
(~17% faster than the XLA form and immune to fusion-choice regressions)."""

import numpy as np
import jax.numpy as jnp

from cloudscape_tpu.ops.accum_pallas import (
    BLOCK, STEPS, accumulate_pallas, accumulate_reference,
)


def _inputs(n, seed=0, occ_frac=0.2):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(
        -np.abs(rng.random((n, STEPS))) * 0.1
        * (rng.random((n, STEPS)) < occ_frac),
        jnp.float32,
    )
    cd3 = jnp.asarray(-rng.random((n, STEPS)) * 0.5, jnp.float32)
    hf = jnp.asarray(rng.random((n, STEPS)), jnp.float32)
    ph = jnp.asarray(
        np.broadcast_to(rng.random((n, 1)), (n, STEPS)).copy(), jnp.float32
    )
    scal = jnp.asarray(rng.random((1, 12)), jnp.float32)
    return A, cd3, hf, ph, scal


def test_kernel_matches_reference():
    args = _inputs(2 * BLOCK)
    ref = np.asarray(accumulate_reference(*args))
    got = np.asarray(accumulate_pallas(*args, interpret=True))
    assert got.shape == ref.shape == (2 * BLOCK, 4)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_empty_rays_are_exactly_zero():
    A, cd3, hf, ph, scal = _inputs(BLOCK, seed=3)
    A = A.at[: BLOCK // 2].set(0.0)  # empty/below-horizon rays: A ≡ 0
    got = np.asarray(accumulate_pallas(A, cd3, hf, ph, scal,
                                       interpret=True))
    np.testing.assert_array_equal(got[: BLOCK // 2], 0.0)


def test_dense_occupancy():
    args = _inputs(BLOCK, seed=7, occ_frac=0.95)
    ref = np.asarray(accumulate_reference(*args))
    got = np.asarray(accumulate_pallas(*args, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    assert (ref[:, 3] > 0.5).mean() > 0.5  # the scene actually saturates
