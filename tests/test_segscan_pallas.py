"""Pallas segmented prefix-sum kernel ≡ the XLA associative_scan monoid
(Mosaic interpreter on the CPU lane; tests/test_march_v3.py's TPU-lane
bench gates cover the march-integrated path)."""

import numpy as np
import jax.numpy as jnp
from jax import lax

from cloudscape_tpu.ops.segscan_pallas import LANES, ROWS, segscan_sum_pallas


def _xla_segscan(values, heads):
    def seg_sum(a, b):
        return jnp.where(b[1], b[0], a[0] + b[0]), a[1] | b[1]

    incl, _ = lax.associative_scan(
        seg_sum, (jnp.asarray(values, jnp.float32),
                  jnp.asarray(heads, bool)))
    return np.asarray(incl)


def _ref_segscan(values, heads):
    out = np.zeros_like(values, dtype=np.float64)
    run = 0.0
    for i, (v, h) in enumerate(zip(values, heads)):
        run = v if h else run + v
        out[i] = run
    return out


def _check(values, heads):
    got = np.asarray(segscan_sum_pallas(jnp.asarray(values, jnp.float32),
                                        jnp.asarray(heads),
                                        interpret=True))
    # vs XLA: same math, different combine-tree shape — pure f32
    # reassociation noise (measured ≤1.5e-5 on a 65k-element segment).
    want = _xla_segscan(values, heads)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)
    ref = _ref_segscan(np.asarray(values, np.float64), heads)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-4)


def test_single_tile_random_segments():
    rng = np.random.default_rng(0)
    n = ROWS * LANES
    values = rng.normal(size=n).astype(np.float32)
    heads = rng.random(n) < 0.01
    heads[0] = True
    _check(values, heads)


def test_multi_tile_cross_tile_carry():
    rng = np.random.default_rng(1)
    n = 3 * ROWS * LANES
    values = rng.normal(size=n).astype(np.float32) * 0.1
    # One enormous segment spanning tiles plus a few short ones: exercises
    # the SMEM carry and the headless-tile update.
    heads = np.zeros(n, bool)
    heads[0] = True
    heads[5] = True
    heads[n - 100] = True
    _check(values, heads)


def test_heads_mid_row_inherit_earlier_rows():
    # A head mid-row must NOT starve that row's pre-head elements of the
    # carry from earlier rows (the exclusive-scan-by-shift fix).
    n = ROWS * LANES
    values = np.ones(n, np.float32)
    heads = np.zeros(n, bool)
    heads[0] = True
    heads[LANES + 50] = True   # row 1, lane 50
    _check(values, heads)


def test_ragged_tail_padding():
    rng = np.random.default_rng(2)
    n = ROWS * LANES + 777     # non-multiple: wrapper pads with head=1
    values = rng.normal(size=n).astype(np.float32)
    heads = rng.random(n) < 0.002
    heads[0] = True
    _check(values, heads)


def test_every_element_its_own_segment():
    rng = np.random.default_rng(3)
    n = ROWS * LANES
    values = rng.normal(size=n).astype(np.float32)
    heads = np.ones(n, bool)
    got = np.asarray(segscan_sum_pallas(jnp.asarray(values),
                                        jnp.asarray(heads), interpret=True))
    np.testing.assert_array_equal(got, values)
