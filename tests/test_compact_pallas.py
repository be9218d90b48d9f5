"""Pallas streaming compaction ≡ jnp.nonzero (Mosaic interpreter on the CPU
suite). The kernel is PRODUCTION on TPU — `_march_core2` routes sample
compaction through it when shapes permit (152 vs 245 ms isolated at headline
scale, bit-identical on hardware; the five Mosaic hazards worked around on
the way are listed in the ops/compact_pallas.py module docstring)."""

import numpy as np
import jax.numpy as jnp

from cloudscape_tpu.ops.compact_pallas import (
    LANES, ROWS, compact_indices_pallas,
)


def test_matches_nonzero_across_occupancies():
    rng = np.random.default_rng(0)
    cases = [
        (ROWS, 4, 0.1),
        (2 * ROWS, 8, 0.3),
        (2 * ROWS, 2, 0.5),   # overflow: capacity < active count
        (ROWS, 4, 0.0),       # empty
        (ROWS, 4, 1.0),       # full
    ]
    for nb, capr, p in cases:
        total = nb * LANES
        cap = capr * LANES
        mask = jnp.asarray(rng.random((nb, LANES)) < p)
        want = np.asarray(
            jnp.nonzero(mask.reshape(-1), size=cap, fill_value=total)[0]
        )
        idx, rank = compact_indices_pallas(mask, cap, total, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx), want)
        mnp = np.asarray(mask).reshape(-1)
        want_rank = np.cumsum(mnp) - mnp
        np.testing.assert_array_equal(
            np.asarray(rank).reshape(-1)[mnp], want_rank[mnp]
        )
