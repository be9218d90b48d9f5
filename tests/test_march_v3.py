"""Gates for the window-staged v3 march (`_march_core3` /
`march_bricks_v3` — VERDICT r2 #1).

v3 is position-matched to `march_bricks` / `march_bricks_v2` (identical
fine sample placement — the cell gate skips samples, never moves them);
its approximations are gated here:

- the coarse-cell LIVE gate (`pre > -cell_margin` at the shared cull
  prepass's probes, dilated 3×3 across rays and ±1 along the ray) — a
  sample outside a live cell is assumed `pre ≤ 0` (density exactly 0);
  margin conservatism quality-gated vs the exact march;
- the HOT sub-gate (`pre > 0` per evaluated cell) — exact by construction
  (same predicate as v2's staged erosion), only capacity overflow can
  degrade it (overflow drops the highest-index hot cells, no fallback —
  unlike v2; covered by `v3_auto_policy`'s 1.5× margin);
- ray culling — shared machinery with v2 (`_select_top_rays`).

With every gate disabled (cell_margin → ∞, full capacities) v3 matches v2
to reduction-order noise: the per-sample math is identical, but the
lane-major evaluation shapes give XLA different reduction trees in the
trilinear lane-weight filter (~1 ulp on t, amplified through the exp
accumulation to ≤ ~1e-3 on the image).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cloudscape_tpu.models import atmosphere
from cloudscape_tpu.models.density import MarchParams
from cloudscape_tpu.models.march_fast import (
    BrickPack,
    build_cone_cache,
    cull_cell_stats,
    hot_cell_fraction,
    march_bricks,
    march_bricks_v2,
    march_bricks_v3,
    select_cell_keep_frac,
    v3_auto_policy,
)
from cloudscape_tpu.models.packs import make_noise_pack
from cloudscape_tpu.utils.image import psnr

CONE_RES = (32, 512, 512)


def hemisphere_dirs(width: int, height: int) -> np.ndarray:
    az = (np.arange(width) + 0.5) / width * 2.0 * np.pi - np.pi
    el = (np.arange(height) + 0.5) / height * (np.pi / 2.0)
    cos_el = np.cos(el)[:, None]
    d = np.stack(
        [cos_el * np.cos(az)[None, :],
         np.broadcast_to(np.sin(el)[:, None], (height, width)),
         cos_el * np.sin(az)[None, :]], axis=-1)
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    from cloudscape_tpu.ops.noise import generate_base_noise
    from cloudscape_tpu.utils.assets import load_bmp, slice_horizontal_3d

    small = slice_horizontal_3d(
        load_bmp("/root/reference/cloud_sky/worlnoise.bmp"), 32
    )
    weather = load_bmp("/root/reference/cloud_sky/weather.bmp")
    noise = make_noise_pack(
        np.asarray(generate_base_noise(32, seed=0)), small, weather
    )
    bp = BrickPack.from_noise(noise)
    tlut = atmosphere.transmittance_lut()
    sun = np.array([0.3, 0.4, -0.85])
    sun /= np.linalg.norm(sun)
    slut = atmosphere.sky_lut(tlut, jnp.asarray(sun, jnp.float32))
    params = MarchParams.create(
        cloud_pos=np.array([1.5, -0.3]), detailed_pos=np.array([0.4, 0.2]),
        weather_pos=np.array([0.01, 0.02]), time=12.5, cloud_coverage=0.35,
        light_direction=sun, ground_color=np.array([0.27, 0.19, 0.027]),
    )
    # A hemisphere grid (the bench geometry) rather than the oct map: the
    # cell gate's dilation footprint is ray-grid-relative, and the bench is
    # the scale v3 serves.
    dirs = jnp.asarray(hemisphere_dirs(64, 32))
    exact = np.asarray(
        march_bricks(dirs, params, bp, slut, steps=64, chunk=1024,
                     capacity_frac=0.5)
    )
    cc = build_cone_cache(params, bp, 6, res=CONE_RES, chunk=16384)
    return bp, slut, params, dirs, exact, cc


def test_v3_gates_off_matches_v2(setup):
    """cell_margin → ∞ + full capacities disables every v3 gate: the result
    must match v2 (same knobs) to reduction-order noise (see module
    docstring) — this pins the machinery (compaction, lane expansion,
    scatters) as a pure re-plumbing of v2's math."""
    bp, slut, params, dirs, _, cc = setup
    v2 = np.asarray(
        march_bricks_v2(dirs, params, bp, slut, steps=64, chunk=1024,
                        capacity_frac=1.0, weather_every=1, t_cutoff=0.0,
                        cone_cache=cc))
    v3 = np.asarray(
        march_bricks_v3(dirs, params, bp, slut, steps=64, chunk=1024,
                        cell_keep_frac=1.0, hot_keep_frac=1.0,
                        cone_cache=cc, prepass_steps=16, cell_margin=1e9))
    assert np.abs(v3 - v2).max() < 1e-2
    p = psnr(v3, v2)
    assert p > 60.0, f"gates-off v3 vs v2 only {p:.1f} dB"


def test_v3_segmented_accum_matches_planes(setup):
    """accum="segmented" (hot-list exp∘segmented-cumsum prefix + per-ray
    scatter-add reductions) vs accum="planes" (scatter to [n, steps]
    planes + dense accumulation): mathematically identical — dead samples
    contribute dt = 1 and zero radiance — so the outputs must agree to
    reduction-order noise."""
    bp, slut, params, dirs, _, cc = setup
    kw = dict(steps=64, chunk=1024, cell_keep_frac=0.5, hot_keep_frac=0.5,
              cone_cache=cc, ray_keep_frac=0.55, prepass_steps=16,
              ray_stride=2, cell_margin=0.1)
    planes = np.asarray(
        march_bricks_v3(dirs, params, bp, slut, accum="planes", **kw))
    seg = np.asarray(
        march_bricks_v3(dirs, params, bp, slut, accum="segmented", **kw))
    assert np.isfinite(seg).all()
    assert np.abs(seg - planes).max() < 1e-3
    p = psnr(seg, planes)
    assert p > 80.0, f"segmented vs planes only {p:.1f} dB"


def test_v3_policy_matches_exact(setup):
    """The shipped configuration: auto-policy buckets, ray cull + cell gate
    + hot sub-gate, ≥ 40 dB vs the exact fixed-step march."""
    bp, slut, params, dirs, exact, cc = setup
    rk, ck, hk, cell_frac, hot_frac = v3_auto_policy(
        dirs, params, bp, steps=64, ray_stride=2, prepass_steps=16)
    assert 0.0 < hot_frac <= cell_frac <= 1.0
    got = np.asarray(
        march_bricks_v3(dirs, params, bp, slut, steps=64, chunk=1024,
                        cell_keep_frac=ck, hot_keep_frac=hk,
                        cone_cache=cc, ray_keep_frac=rk,
                        prepass_steps=16, ray_stride=2))
    p = psnr(got, exact)
    assert p > 40.0, f"v3 policy PSNR {p:.1f} dB < 40 dB vs exact march"
    assert np.isfinite(got).all()


def test_v3_gate_actually_gates(setup):
    """The live-cell fraction must be genuinely below 1 within kept rays on
    the bench-style scene — otherwise the cell gate is structurally inert
    (the ADVICE-r2 failure mode, this time for cells)."""
    bp, slut, params, dirs, _, _ = setup
    keep, cell_frac = (float(v) for v in cull_cell_stats(
        dirs, params, bp, steps=64, prepass_steps=16, ray_stride=2))
    assert cell_frac < 0.85 * keep + 0.2, (
        f"cell gate inert: live {cell_frac:.2f} vs keep {keep:.2f}")
    hot = float(hot_cell_fraction(dirs, params, bp, steps=64,
                                  prepass_steps=16))
    assert hot < cell_frac, "hot cells must be a strict subset of live"


def test_v3_no_grid_fallback(setup):
    """Flat (non-2D) ray lists take the no-dilation path: margin-ONLY
    conservatism, so the cell margin must carry what the 3×3 dilation
    normally covers (0.1 with dilation ≈ 0.35 without — measured on this
    scene): still ≥ 40 dB at the wider margin."""
    bp, slut, params, dirs, exact, cc = setup
    flat = jnp.reshape(dirs, (-1, 3))
    got = np.asarray(
        march_bricks_v3(flat, params, bp, slut, steps=64, chunk=1024,
                        cell_keep_frac=0.9, hot_keep_frac=0.5,
                        cone_cache=cc, prepass_steps=16, cell_margin=0.35))
    p = psnr(got.reshape(exact.shape), exact)
    assert p > 40.0, f"no-grid v3 PSNR {p:.1f} dB"


def test_v3_hot_overflow_drops_softly(setup):
    """Hot capacity far below the hot fraction: output stays finite and
    degrades (PSNR drops) rather than corrupting — documents the
    no-fallback overflow semantics the policy margin guards against."""
    bp, slut, params, dirs, exact, cc = setup
    got = np.asarray(
        march_bricks_v3(dirs, params, bp, slut, steps=64, chunk=256,
                        cell_keep_frac=1.0, hot_keep_frac=0.02,
                        cone_cache=cc, prepass_steps=16))
    assert np.isfinite(got).all()
    assert psnr(got, exact) < 40.0, "overflow test is vacuous"


def test_select_cell_keep_frac_buckets():
    assert select_cell_keep_frac(0.0) == 0.1
    assert select_cell_keep_frac(0.3) == 0.35
    assert select_cell_keep_frac(0.9) == 1.0
    assert select_cell_keep_frac(0.3, margin=1.5) == 0.45


def test_seg_end_reduce_matches_scatter_add():
    """The TPU accum tail's segment-end extraction (`_seg_end_reduce`:
    3 segmented scans + compacted end gather + ≤n unique scatter) must
    equal the scatter-add per-ray reductions — driven here with an XLA
    segmented scan injected as scan_fn, so the exact shipped code path
    (minus the Pallas kernel, gated in tests/test_segscan_pallas.py) is
    covered on CPU."""
    import jax

    from cloudscape_tpu.models.march_fast import _seg_end_reduce

    rng = np.random.default_rng(7)
    n, cap_h = 256, 1024
    # Sorted ray ids in contiguous runs over a subset of rays, fill suffix
    # tagged n-1 (exactly what cidx_h // P + min produces after fills).
    n_real = 800
    ids = np.sort(rng.integers(0, n, size=n_real))
    ray_h = np.concatenate([ids, np.full(cap_h - n_real, n - 1)])
    valid = np.arange(cap_h) < n_real
    head = np.concatenate([[True], ray_h[1:] != ray_h[:-1]])
    cellsums = [
        jnp.asarray(np.where(valid, rng.normal(size=cap_h), 0.0), jnp.float32)
        for _ in range(3)
    ]
    logdt = jnp.asarray(np.where(valid, -np.abs(rng.normal(size=cap_h)), 0.0),
                        jnp.float32)

    def xla_segscan(vals, hd):
        def seg_sum(a, b):
            return jnp.where(b[1], b[0], a[0] + b[0]), a[1] | b[1]

        incl, _ = jax.lax.associative_scan(seg_sum, (vals, hd))
        return incl

    head_j = jnp.asarray(head)
    incl = xla_segscan(logdt, head_j)
    bufs, logT = _seg_end_reduce(cellsums, incl, head_j,
                                 jnp.asarray(ray_h, jnp.int32), n, cap_h,
                                 xla_segscan)
    ridx = jnp.where(jnp.asarray(valid), jnp.asarray(ray_h, jnp.int32), n)
    for c in range(3):
        want = jnp.zeros((n,), jnp.float32).at[ridx].add(
            cellsums[c], mode="drop", indices_are_sorted=True)
        np.testing.assert_allclose(np.asarray(bufs[c]), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
    want_logT = jnp.zeros((n,), jnp.float32).at[ridx].add(
        logdt, mode="drop", indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(logT), np.asarray(want_logT),
                               rtol=1e-5, atol=1e-6)
