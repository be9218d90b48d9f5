"""Engine scheduling semantics: amortized updates, triple-buffering, wind
integration, warm start, checkpoint/resume (SURVEY.md §4 integration tests).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState
from cloudscape_tpu.engine import CloudSkyEngine
from cloudscape_tpu.models.packs import make_noise_pack
from cloudscape_tpu.temporal import FrameData, RingState


TINY_PERF = PerfConfig(texture_size=32, frames_to_update=16, march_steps=4,
                       light_steps=2)


@pytest.fixture(scope="module")
def tiny_noise():
    from cloudscape_tpu.ops.noise import generate_base_noise, generate_detail_noise
    from cloudscape_tpu.utils.assets import load_bmp

    # Shipped weather map + tiny procedural volumes: guarantees actual cloud
    # coverage so the buffers are visibly non-empty.
    return make_noise_pack(
        generate_base_noise(16, seed=1),
        generate_detail_noise(16, seed=2),
        load_bmp("/root/reference/cloud_sky/weather.bmp"),
    )


@pytest.fixture()
def engine(tiny_noise):
    # kernel="fast" (the exact brick-table march, no cone_prebake): these
    # tests assert the REFERENCE's scheduling semantics bitwise — amortized
    # ≡ monolithic (a pure tiling of the same math) and boundary-frame
    # parameter pickup. The production fast3 default intentionally relaxes
    # both (scale-adaptive tile policy ≠ monolithic v3 kernel; cone_prebake
    # defers pickup one cycle — documented in CloudSkyEngine.__init__/
    # docs/PARITY.md); its own gates live in tests/test_tile_dense.py and
    # test_bench_config.py.
    return CloudSkyEngine(
        perf=TINY_PERF,
        config=CloudConfig(cloud_coverage=0.6),
        sun=SunState(direction=(0.3, 0.5, -0.8)),
        noise=tiny_noise,
        kernel="fast",
    )


def test_perf_validation_auto_corrects():
    # 100 is not a multiple of sqrt(16)=4 → corrected down like
    # `cloud_sky.gd:110-115`.
    p = PerfConfig(texture_size=102, frames_to_update=16).validate()
    assert p.texture_size == 100
    assert p.update_region_size == 25
    with pytest.raises(ValueError):
        PerfConfig(frames_to_update=7).validate()


def test_wind_integration_formula():
    fd = FrameData()
    fd.update_config(CloudConfig(wind_direction=np.pi / 2, wind_speed=10.0,
                                 time_offset=2.0))
    fd.time = 100.0
    fd.integrate_wind(103.0)  # delta = 3
    w = np.array([np.cos(np.pi / 2), np.sin(np.pi / 2)])
    np.testing.assert_allclose(fd.detailed_pos, 3.0 * w, atol=1e-12)
    np.testing.assert_allclose(fd.cloud_pos, 3.0 * w * 10.0, atol=1e-12)
    np.testing.assert_allclose(
        fd.weather_pos, (3.0 * 0.001 + 0.005 * 2.0) * w * 10.0, atol=1e-12
    )
    assert fd.time == 103.0


def test_ring_rotation_and_lut_phasing():
    r = RingState()
    assert (r.texture_to_update, r.texture_to_blend_from, r.texture_to_blend_to) == (0, 1, 2)
    r.rotate_cloud()
    assert (r.texture_to_update, r.texture_to_blend_from, r.texture_to_blend_to) == (1, 2, 0)
    # Sky LUT ring: after writing slot s the kernel must read the newest slot
    # (`cloud_sky.gd:242`: (current+2)%3 == just-written).
    for _ in range(5):
        written = r.sky_lut_current
        r.advance_sky_lut()
        assert r.cloud_kernel_sky_slot == written
        assert r.sky_back_textures == ((written + 1) % 3, (written + 2) % 3)


def test_cursor_sweep_row_major():
    r = RingState()
    seen = []
    for _ in range(16):
        seen.append(r.update_position)
        r.advance_cursor(8, 32)
    assert seen[:5] == [(0, 0), (8, 0), (16, 0), (24, 0), (0, 8)]
    assert seen[-1] == (24, 24)
    assert r.update_position == (0, 0)  # wrapped
    assert r.frame == 16


def test_warm_start_fills_all_buffers(engine):
    engine.update_sky(now=0.0)  # triggers initialize_sky
    # All three cloud buffers must contain a complete sky (alpha rendered
    # everywhere above horizon → some nonzero texels in every buffer).
    ring = np.asarray(engine.cloud_ring)
    for i in range(3):
        assert np.abs(ring[i]).max() > 0.0, f"buffer {i} empty after warm start"
    assert not engine.needs_full_sky_init


def test_amortized_cycle_equals_monolithic(engine):
    """After one full cycle at a static scene, the completed buffer must be
    bitwise-identical to a monolithic full-hemisphere render with the same
    snapshot (the amortizer is a pure tiling of the same math)."""
    engine.update_sky(now=0.0)  # warm start
    # Step to the next rotation boundary.
    while engine.ring.frame < engine.perf.frames_to_update:
        engine.update_sky(now=0.0)
    engine.update_sky(now=0.0)  # rotates, then renders tile 0
    completed = np.asarray(engine.cloud_ring)[engine.ring.texture_to_blend_to]
    mono = np.asarray(engine.render_full_hemisphere())
    np.testing.assert_array_equal(completed, mono)


@pytest.mark.slow
def test_tile_cull_matches_unculled(tiny_noise):
    """fast2 + tile_cull: per-tile ray culling from the per-cycle priority
    map must stay ≥ 40 dB against the unculled fast2 engine over a full
    cycle, and leave empty-sky texels exactly empty."""
    kw = dict(
        perf=PerfConfig(texture_size=64, frames_to_update=16, march_steps=16,
                        light_steps=2),
        config=CloudConfig(cloud_coverage=0.45),
        sun=SunState(direction=(0.3, 0.5, -0.8)),
        noise=tiny_noise,
        kernel="fast2",
        cone_res=(8, 64, 64),
    )
    a = CloudSkyEngine(**kw)
    b = CloudSkyEngine(**kw, tile_cull=True)
    assert b.tile_cull
    for i in range(18):
        a.update_sky(now=0.0)
        b.update_sky(now=0.0)
    assert b._tile_buckets is not None
    assert any(x < 1.0 for x in b._tile_buckets), "no tile actually culled"
    ra = np.asarray(a.cloud_ring)[a.ring.texture_to_blend_to]
    rb = np.asarray(b.cloud_ring)[b.ring.texture_to_blend_to]
    assert np.isfinite(rb).all()
    mse = float(((ra - rb) ** 2).mean())
    peak = max(float(np.abs(ra).max()), 1e-9)
    p = 10.0 * np.log10(peak * peak / max(mse, 1e-20))
    assert p > 40.0, f"tile-culled engine {p:.1f} dB vs unculled"


def test_tile_cull_actually_culls():
    """ADVICE r2 (medium): the round-2 ray-capacity floor of a full lax.map
    chunk made engine tile culling structurally inert (ray_cap == n for every
    region ≤ chunk). The alignment floor must produce a genuinely smaller
    kept-ray capacity at the shipped tile scale."""
    from cloudscape_tpu.models.march_fast import _ray_capacity

    # Shipped defaults: 768² map / 64 frames → 96² tiles = 9216 rays; the
    # engine tile chunk is min(region², 16384) = 9216 (the inert case).
    assert _ray_capacity(9216, 0.25) == 2304
    assert _ray_capacity(9216, 0.5) == 4608
    assert _ray_capacity(9216, 0.75) == 6912
    # Floor: one alignment block; cap: never more than n.
    assert _ray_capacity(256, 0.25) == 256
    assert _ray_capacity(100, 0.5) == 100
    # Headline scale rounds UP to the alignment.
    assert _ray_capacity(524288, 0.55) == 288512
    # ray_cap·steps stays divisible by the Pallas compaction tile (8·128).
    assert (_ray_capacity(9216, 0.25) * 128) % 1024 == 0


@pytest.mark.slow
def test_tile_cull_skip_bucket(tiny_noise):
    """The 0.0 bucket: a tile whose whole priority window is empty sky skips
    the march entirely and writes zeros — bitwise what the march returns for
    all-culled rays. Forcing every bucket to 0.0 exercises both the
    update_sky skip path (_clear_tile) and the fused render_frame skip
    variant deterministically."""
    region = 8
    b = CloudSkyEngine(
        perf=PerfConfig(texture_size=32, frames_to_update=16, march_steps=4,
                        light_steps=2),
        config=CloudConfig(cloud_coverage=0.6),
        sun=SunState(direction=(0.3, 0.5, -0.8)),
        noise=tiny_noise,
        kernel="fast2",
        cone_res=(4, 16, 16),
        tile_cull=True,
    )
    b.update_sky(now=0.0)  # warm start + first tick (cursor now at tile 1)
    b._tile_buckets = [0.0] * len(b._tile_buckets)

    tex = b.ring.texture_to_update
    x0, y0 = b.ring.update_position
    b.update_sky(now=0.0)
    tile = np.asarray(b.cloud_ring)[tex, y0:y0 + region, x0:x0 + region]
    np.testing.assert_array_equal(tile, 0.0)

    # Fused serving path with the skip variant.
    tex = b.ring.texture_to_update
    x0, y0 = b.ring.update_position
    gx, gy = np.meshgrid(np.linspace(-0.3, 0.3, 8),
                         np.linspace(0.1, 0.5, 8), indexing="xy")
    eye = np.stack([gx, gy, np.full((8, 8), -1.0)], axis=-1)
    frame = b.render_frame(eye.astype(np.float32), now=0.0)
    assert np.isfinite(np.asarray(frame)).all()
    tile = np.asarray(b.cloud_ring)[tex, y0:y0 + region, x0:x0 + region]
    np.testing.assert_array_equal(tile, 0.0)


@pytest.mark.slow
def test_warm_covers_every_bucket_variant(tiny_noise):
    """Serving must never hit a mid-cycle compile: the per-cycle warm-up has
    to cover EVERY bucket the cycle can dispatch — including 1.0 (the uncull
    variant, prio=None/rk=None), which round 3 initially missed (a 1.0 tile
    reached mid-cycle stalled ~30 s on a remote compile, seen directly in
    bench tile_all_ms). Forces mixed buckets, re-warms, then asserts zero
    jit-cache growth across a cycle's worth of fused ticks."""
    from cloudscape_tpu.engine import _render_frame_fused

    b = CloudSkyEngine(
        perf=PerfConfig(texture_size=32, frames_to_update=16, march_steps=4,
                        light_steps=2),
        config=CloudConfig(cloud_coverage=0.45),
        sun=SunState(direction=(0.3, 0.5, -0.8)),
        noise=tiny_noise,
        kernel="fast2",
        cone_res=(4, 16, 16),
        tile_cull=True,
    )
    gx, gy = np.meshgrid(np.linspace(-0.3, 0.3, 8),
                         np.linspace(0.1, 0.5, 8), indexing="xy")
    eye = jnp.asarray(
        np.stack([gx, gy, np.full((8, 8), -1.0)], axis=-1), jnp.float32)
    b.render_frame(eye, now=0.0)  # warm start + first tick
    # Mixed buckets covering skip, cull, and the full/uncull variant.
    nb = len(b._tile_buckets)
    b._tile_buckets = ([1.0, 0.5, 0.0] * nb)[:nb]
    b._warmed_fused = {}
    b._warmed_tile_buckets = set()
    b.render_frame(eye, now=0.01)  # re-warm with the forced buckets
    c0 = _render_frame_fused._cache_size()
    # The rest of the cycle (no rotation): every bucket gets dispatched.
    remaining = b.perf.frames_to_update - b.ring.frame
    for i in range(remaining):
        b.render_frame(eye, now=0.02 + i * 0.01)
    assert _render_frame_fused._cache_size() == c0, \
        "fused serving compiled a new variant mid-cycle"


@pytest.mark.slow
def test_shipped_geometry_ratio_amortized_cycle(tiny_noise):
    """Geometry-faithful ratio of the reference's shipped operating point
    (768², 64 frames — `clouds_sky.tres`): 256² map / 64-frame amortization
    exercises the REAL tile math (update_region_size = 256/√64 = 32, a
    64-tile row-major sweep) rather than the tiny 32²/16 used elsewhere
    (VERDICT r1 weak #6). Asserts the full cycle tiles the hemisphere
    exactly (amortized ≡ monolithic)."""
    eng = CloudSkyEngine(
        perf=PerfConfig(texture_size=256, frames_to_update=64,
                        march_steps=16, light_steps=2),
        config=CloudConfig(cloud_coverage=0.6),
        sun=SunState(direction=(0.3, 0.5, -0.8)),
        noise=tiny_noise,
    )
    assert eng.perf.update_region_size == 32
    eng.update_sky(now=0.0)  # warm start (2×64 synchronous tile updates)
    while eng.ring.frame < eng.perf.frames_to_update:
        eng.update_sky(now=0.0)
    eng.update_sky(now=0.0)  # rotates, then renders tile 0
    completed = np.asarray(eng.cloud_ring)[eng.ring.texture_to_blend_to]
    mono = np.asarray(eng.render_full_hemisphere())
    np.testing.assert_array_equal(completed, mono)
    assert np.abs(completed).max() > 0.0


def test_blend_amount_progression(engine):
    engine.update_sky(now=0.0)
    n = engine.perf.frames_to_update
    # Next tick after warm start: blend restarts from frame/N progression.
    values = []
    for _ in range(n):
        engine.update_sky(now=0.0)
        values.append(engine.blend_amount)
    # Must sweep k/N for k = frame-before-dispatch; strictly monotone within a
    # cycle, resetting to 0 at rotation.
    assert max(values) <= 1.0 - 1.0 / n + 1e-9
    assert min(values) >= 0.0
    diffs = np.diff(values)
    resets = (diffs < 0).sum()
    assert resets <= 1  # at most one rotation in n ticks
    assert np.all((np.abs(diffs - 1.0 / n) < 1e-9) | (diffs < 0))


def test_render_view_shapes(engine):
    engine.update_sky(now=0.0)
    dirs = np.array([[0.0, 1.0, 0.0], [0.7, 0.3, 0.6], [0.0, -1.0, 0.0]])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    img = np.asarray(engine.render_view(jnp.asarray(dirs, jnp.float32)))
    assert img.shape == (3, 3)
    assert np.all(np.isfinite(img))
    assert img.min() >= 0.0


def test_save_restore_roundtrip(engine, tiny_noise):
    engine.update_sky(now=0.0)
    for i in range(5):
        engine.update_sky(now=0.1 * i)
    state = engine.save()

    fresh = CloudSkyEngine(perf=TINY_PERF, noise=tiny_noise, kernel="fast")
    fresh.restore(state)
    assert fresh.ring.frame == engine.ring.frame
    assert fresh.ring.update_position == engine.ring.update_position
    np.testing.assert_array_equal(
        np.asarray(fresh.cloud_ring), np.asarray(engine.cloud_ring)
    )

    # Continued stepping must agree exactly.
    engine.update_sky(now=1.0)
    fresh.update_sky(now=1.0)
    np.testing.assert_array_equal(
        np.asarray(fresh.cloud_ring), np.asarray(engine.cloud_ring)
    )
    assert fresh.blend_amount == engine.blend_amount


def test_update_cycle_equals_ticked_cycle(tiny_noise):
    """One batched `update_cycle` dispatch must produce the same ring
    contents as N individual `update_sky` ticks at a static scene."""
    kw = dict(perf=TINY_PERF, config=CloudConfig(cloud_coverage=0.6),
              sun=SunState(direction=(0.3, 0.5, -0.8)), noise=tiny_noise,
              kernel="fast")  # exact kernel: see the engine fixture note
    a = CloudSkyEngine(**kw)
    b = CloudSkyEngine(**kw)

    a.update_sky(now=0.0)  # warm start + first tile of the new cycle
    while a.ring.frame < a.perf.frames_to_update:
        a.update_sky(now=0.0)

    b.update_cycle(now=0.0)  # warm start + one batched cycle

    assert a.ring.texture_to_update == b.ring.texture_to_update
    np.testing.assert_allclose(
        np.asarray(a.cloud_ring), np.asarray(b.cloud_ring), atol=1e-6
    )
    # Continued stepping stays consistent.
    a.update_sky(now=0.5)
    b.update_sky(now=0.5)
    assert a.ring.frame == b.ring.frame
    np.testing.assert_allclose(
        np.asarray(a.cloud_ring), np.asarray(b.cloud_ring), atol=1e-6
    )


def test_render_view_blend_pair_wiring(engine):
    """render_view must composite exactly mix(blend_from, blend_to, frame/N)
    with the two sky-LUT backbuffers (SURVEY.md §4: the triple-buffer blend
    matches the reference's shader bindings, `cloud_sky.gd:144-152`)."""
    from cloudscape_tpu.models.compositor import composite

    engine.update_sky(now=0.0)
    for _ in range(3):
        engine.update_sky(now=0.0)

    dirs = np.array([[0.2, 0.7, -0.6], [0.8, 0.1, 0.5], [-0.4, 0.4, 0.8]])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    d = jnp.asarray(dirs, jnp.float32)

    got = np.asarray(engine.render_view(d))
    b0, b1 = engine.ring.sky_back_textures
    want = np.asarray(composite(
        d,
        engine.cloud_ring[engine.ring.texture_to_blend_from],
        engine.cloud_ring[engine.ring.texture_to_blend_to],
        engine.sky_ring[b0],
        engine.sky_ring[b1],
        engine.transmittance,
        jnp.float32(engine.blend_amount),
        jnp.asarray(engine.frame_data.light_direction, jnp.float32),
        jnp.float32(engine.config.sun_disk_scale),
    ))
    np.testing.assert_array_equal(got, want)
    # blend_amount must reflect the pre-dispatch frame count.
    assert engine.blend_amount == (engine.ring.frame - 1) / engine.perf.frames_to_update


def test_render_frame_api(engine):
    dirs = np.array([[0.1, 0.8, -0.5], [0.9, 0.2, 0.3]])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    d = jnp.asarray(dirs, jnp.float32)
    img = np.asarray(engine.render_frame(d, now=0.0))  # amortized tick
    assert img.shape == (2, 3) and np.isfinite(img).all()
    frame_after_tick = engine.ring.frame
    img2 = np.asarray(engine.render_frame(d, now=0.1, amortized=False))
    assert engine.ring.frame == engine.perf.frames_to_update  # full cycle
    assert np.isfinite(img2).all()
    assert frame_after_tick != engine.ring.frame


def test_set_performance_rebuilds(engine):
    """Performance setters tear down and warm-rebuild (`cloud_sky.gd:35-50`)."""
    engine.update_sky(now=0.0)
    engine.set_performance(PerfConfig(texture_size=16, frames_to_update=4,
                                      march_steps=4, light_steps=2))
    assert engine.needs_full_sky_init
    assert engine.cloud_ring.shape == (3, 16, 16, 4)
    assert engine.ring.frame == 0 and engine.ring.update_position == (0, 0)
    engine.update_sky(now=1.0)  # warm re-init at the new shapes
    ring = np.asarray(engine.cloud_ring)
    assert np.abs(ring).max() > 0.0
    # Auto-correction path (36 % sqrt(16) == 0 is fine; 38 is not).
    engine.set_performance(PerfConfig(texture_size=38, frames_to_update=16,
                                      march_steps=4, light_steps=2))
    assert engine.perf.texture_size == 36


def test_can_run_gate(engine):
    """Validate-then-enable (`cloud_sky.gd:362-364` analog): a disabled
    engine no-ops instead of crashing."""
    assert engine.can_run  # validation passed for a healthy config
    engine.update_sky(now=0.0)
    frame_before = engine.ring.frame
    engine.can_run = False
    engine.update_sky(now=1.0)
    assert engine.ring.frame == frame_before  # no-op
    engine.can_run = True
    engine.update_sky(now=1.0)
    assert engine.ring.frame != frame_before


def test_sun_change_picked_up_at_cycle_boundary(engine):
    engine.update_sky(now=0.0)
    old_dir = engine.frame_data.light_direction.copy()
    engine.set_sun((0.9, 0.2, 0.1), energy=2.0)
    # Mid-cycle: snapshot unchanged (FrameData semantics).
    engine.update_sky(now=0.0)
    np.testing.assert_array_equal(engine.frame_data.light_direction, old_dir)
    # Cross the boundary: snapshot refreshes.
    while engine.ring.frame < engine.perf.frames_to_update:
        engine.update_sky(now=0.0)
    engine.update_sky(now=0.0)
    assert not np.allclose(engine.frame_data.light_direction, old_dir)
    assert engine.frame_data.light_energy == 2.0


def test_tile_capacity_thin_overcast(tiny_noise):
    """The tile path's capacity_frac=0.5 is generous but NOT a hard
    guarantee (engine.py comment): gate the adversarial regime — optically
    thin (low density ⇒ t_prefix stays high all march) at full coverage —
    against the exact (compact=False) march."""
    from cloudscape_tpu.models import atmosphere
    from cloudscape_tpu.models.density import MarchParams
    from cloudscape_tpu.models.march_fast import BrickPack, march_bricks
    from cloudscape_tpu.ops.octmap import texel_directions
    from cloudscape_tpu.utils.image import psnr

    bp = BrickPack.from_noise(tiny_noise)
    tlut = atmosphere.transmittance_lut()
    sun = np.array([0.3, 0.5, -0.8])
    sun /= np.linalg.norm(sun)
    slut = atmosphere.sky_lut(tlut, jnp.asarray(sun, jnp.float32))
    params = MarchParams.create(cloud_coverage=1.0, density=0.004,
                                light_direction=sun)
    dirs = texel_directions(32)
    exact = np.asarray(
        march_bricks(dirs, params, bp, slut, steps=16, chunk=256,
                     compact=False)
    )
    got = np.asarray(
        march_bricks(dirs, params, bp, slut, steps=16, chunk=256,
                     capacity_frac=0.5)
    )
    active = float(np.mean(exact[..., 3] > 0))
    assert active > 0.5, f"scene not overcast enough to stress capacity ({active:.2f})"
    p = psnr(got, exact)
    assert p > 40.0, f"thin-overcast tile PSNR {p:.1f} dB < 40 dB"


def test_mesh_validation_disables_engine(tiny_noise, monkeypatch):
    """A mesh-path kernel failure must trip can_run=False at construction
    (validate-then-enable) instead of raising from the render loop."""
    import jax
    from jax.sharding import Mesh

    import cloudscape_tpu.engine as eng_mod

    def boom(*a, **k):
        raise ValueError("deliberately broken mesh kernel")

    monkeypatch.setattr(eng_mod, "_update_tile_mesh", boom)
    mesh = Mesh(np.array(jax.devices()[:4]), ("rays",))
    eng = CloudSkyEngine(perf=TINY_PERF, noise=tiny_noise, mesh=mesh)
    assert not eng.can_run
    frame_before = eng.ring.frame
    eng.update_sky(now=0.0)  # must no-op, not raise
    assert eng.ring.frame == frame_before


def test_restore_before_first_tick_warm_starts(tmp_path, tiny_noise):
    """A checkpoint taken before the first tick must restore to an engine
    that still performs the warm start (sky complete on first frame)."""
    e1 = CloudSkyEngine(perf=TINY_PERF, config=CloudConfig(cloud_coverage=0.6),
                        sun=SunState(direction=(0.3, 0.5, -0.8)),
                        noise=tiny_noise)
    assert e1.needs_full_sky_init
    path = str(tmp_path / "pre_tick.npz")
    e1.save_file(path)

    e2 = CloudSkyEngine(perf=TINY_PERF, noise=tiny_noise)
    e2.load_file(path)
    assert e2.needs_full_sky_init
    e2.update_sky(now=0.0)
    assert np.any(np.asarray(e2.cloud_ring)), "warm start did not run"

    # And a post-tick checkpoint must NOT re-run the warm start.
    path2 = str(tmp_path / "post_tick.npz")
    e2.save_file(path2)
    e3 = CloudSkyEngine(perf=TINY_PERF, noise=tiny_noise)
    e3.load_file(path2)
    assert not e3.needs_full_sky_init


def test_fast2_kernel_matches_fast(tiny_noise):
    """The fast2 (staged + cone-cache) engine mode tracks the exact fast
    mode within the documented gate on a full warm-started sky."""
    from cloudscape_tpu.utils.image import psnr

    kw = dict(perf=TINY_PERF, config=CloudConfig(cloud_coverage=0.6),
              sun=SunState(direction=(0.3, 0.5, -0.8)), noise=tiny_noise)
    e1 = CloudSkyEngine(kernel="fast", **kw)
    e2 = CloudSkyEngine(kernel="fast2", cone_res=(16, 128, 128), **kw)
    for e in (e1, e2):
        e.update_sky(now=0.0)
    a = np.asarray(e1.cloud_ring)
    b = np.asarray(e2.cloud_ring)
    assert np.isfinite(b).all()
    p = psnr(b, a)
    assert p > 35.0, f"fast2 vs fast PSNR {p:.1f} dB"  # tiny cone grid


def test_render_frame_fused_matches_split(tiny_noise):
    """The single-dispatch fused render_frame must be bit-identical to the
    split update_sky + render_view path, frame after frame."""
    kw = dict(perf=TINY_PERF, config=CloudConfig(cloud_coverage=0.6),
              sun=SunState(direction=(0.3, 0.5, -0.8)), noise=tiny_noise)
    gx, gy = np.meshgrid(np.linspace(-0.4, 0.4, 8),
                         np.linspace(0.1, 0.8, 6), indexing="xy")
    d = np.stack([gx, gy, np.ones((6, 8))], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)

    e_fused = CloudSkyEngine(kernel="fast", **kw)
    e_split = CloudSkyEngine(kernel="fast", **kw)
    for i in range(3):
        f = np.asarray(e_fused.render_frame(d, now=i / 60.0, fused=True))
        e_split.update_sky(now=i / 60.0)
        g = np.asarray(e_split.render_view(d))
        # The fused path pre-blends + rebricks the display textures (blend
        # commutes with the bilinear fetch up to fp reassociation) — equal
        # to a few ulps, bit-identical on the ring itself.
        np.testing.assert_allclose(f, g, atol=2e-5, rtol=1e-5,
                                   err_msg=f"frame {i}")
        np.testing.assert_array_equal(
            np.asarray(e_fused.cloud_ring), np.asarray(e_split.cloud_ring),
            err_msg=f"ring {i}",
        )


def test_render_radiance_map(engine):
    """Environment-probe output (`clouds_sky.tres:8` radiance_size analog):
    6-face cubemap, finite, sky-colored above the horizon."""
    engine.update_sky(now=0.0)
    rad = np.asarray(engine.render_radiance_map(size=8))
    assert rad.shape == (6, 8, 8, 3)
    assert np.isfinite(rad).all()
    assert (rad >= 0).all()
    # +Y (up) face must be sky, not black.
    assert rad[2].mean() > 1e-4
    from cloudscape_tpu.engine import cubemap_directions

    d = np.asarray(cubemap_directions(8))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)
    assert (d[2][..., 1] > 0).all() and (d[3][..., 1] < 0).all()


def test_render_radiance_map_prefilter(engine):
    """Prefiltered radiance mips (VERDICT r2 #9, `clouds_sky.tres:8`
    radiance semantics): each level must be a plausibly-filtered version of
    the one above — smaller, energy-preserving (the convolution lobes are
    normalized), finite, and with monotonically shrinking contrast."""
    engine.update_sky(now=0.0)
    mips = engine.render_radiance_map(size=16, prefilter=True)
    assert [np.asarray(m).shape for m in mips] == [
        (6, 16, 16, 3), (6, 8, 8, 3), (6, 4, 4, 3)]
    mips = [np.asarray(m) for m in mips]
    for m in mips:
        assert np.isfinite(m).all() and (m >= 0).all()

    from cloudscape_tpu.engine import cubemap_solid_angles

    # Solid angles tile the sphere: Σ sa = 4π.
    for s in (8, 16):
        np.testing.assert_allclose(float(cubemap_solid_angles(s).sum()),
                                   4.0 * np.pi, rtol=1e-2)
    # Energy: the solid-angle-weighted mean radiance is preserved by the
    # normalized convolution (loose tolerance — lobes overlap the horizon).
    def wmean(m, s):
        sa = np.asarray(cubemap_solid_angles(s))
        return (m * sa[..., None]).sum() / sa.sum() / 3.0

    m0, m1 = wmean(mips[0], 16), wmean(mips[1], 8)
    assert abs(m1 - m0) < 0.35 * max(m0, 1e-9)
    # Contrast shrinks down the chain (low-pass filtering).
    assert mips[1].std() < mips[0].std() + 1e-9
    assert mips[2].std() < mips[1].std() + 1e-9


def test_fused_frame_loop_matches_sequential(tiny_noise):
    """bench.py's device-only per-tile metric runs K fused frame ticks
    inside ONE lax.fori_loop with the ring as loop carry. Guard its
    validity: the loop-carried sweep must produce the same ring and
    composite checksum as K sequential fused dispatches with the same
    scalars, to ~1 ulp (XLA fuses the loop body slightly differently than
    the standalone executable). Guards the in-loop tile index arithmetic
    and the carried-ring plumbing."""
    import jax

    from cloudscape_tpu.engine import _render_frame_fused

    kw = dict(perf=TINY_PERF, config=CloudConfig(cloud_coverage=0.6),
              sun=SunState(direction=(0.3, 0.5, -0.8)), noise=tiny_noise,
              kernel="fast2", cone_res=(4, 16, 16))
    eng = CloudSkyEngine(**kw)
    gx, gy = np.meshgrid(np.linspace(-0.4, 0.4, 8),
                         np.linspace(0.1, 0.8, 6), indexing="xy")
    d = np.stack([gx, gy, np.ones((6, 8))], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    eng.render_frame(d, now=0.0)  # warm state

    K = 3
    region = eng.perf.update_region_size
    tiles_per_row = eng.perf.texture_size // region
    n_tiles = tiles_per_row * tiles_per_row
    common = dict(texture_size=eng.perf.texture_size, region=region,
                  steps=eng.perf.march_steps,
                  light_steps=eng.perf.light_steps, kernel="fast2",
                  deband=False, capacity_frac=0.5, ray_keep_frac=None,
                  skip_march=False)
    params = eng._march_params
    noise_arg = eng._noise_arg
    sky_slot = jnp.int32(eng.ring.cloud_kernel_sky_slot)
    light = jnp.asarray(eng.frame_data.light_direction, jnp.float32)
    disk = jnp.float32(eng.config.sun_disk_scale)
    blend = jnp.float32(0.5)
    cloud_pair, sky_pair = eng._display_pair_tables()

    def one(ring, tile):
        return _render_frame_fused(
            ring, eng.sky_ring, jnp.int32(0),
            (tile % tiles_per_row) * region,
            (tile // tiles_per_row) * region,
            cloud_pair, sky_pair, params, noise_arg, sky_slot,
            eng.transmittance, d, blend, light, disk, None, **common)

    # Sequential: K separate dispatches.
    ring_seq = eng.cloud_ring + 0.0
    acc_seq = np.float32(0.0)
    for i in range(K):
        ring_seq, fr = one(ring_seq, jnp.int32(i % n_tiles))
        acc_seq += np.asarray(fr[0, 0, 0])

    # Looped: same K ticks inside one jit.
    @jax.jit
    def looped(ring):
        def body(i, carry):
            ring, acc = carry
            ring, fr = one(ring, i % n_tiles)
            return ring, acc + fr[0, 0, 0]
        return jax.lax.fori_loop(0, K, body, (ring, jnp.float32(0.0)))

    ring_loop, acc_loop = looped(eng.cloud_ring + 0.0)
    np.testing.assert_allclose(np.asarray(ring_seq), np.asarray(ring_loop),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(acc_seq, float(acc_loop), rtol=1e-5)


def test_hier_kernel_serves_and_renders(tiny_noise):
    """kernel="hier" (VERDICT r4 #1: the config-5 adaptive-step path,
    servable from the engine): amortized ticks fill the ring with finite
    non-empty tiles, and the monolithic render (banded window-lattice
    march with the band-aware auto policy) is finite and covers the same
    texels to tile-policy tolerance. Amortized is NOT bitwise monolithic
    here (per-tile vs banded capacity pools and dilation neighborhoods —
    documented in the _march_tile hier arm)."""
    eng = CloudSkyEngine(
        perf=PerfConfig(texture_size=32, frames_to_update=16, march_steps=8,
                        light_steps=2),
        config=CloudConfig(cloud_coverage=0.6),
        sun=SunState(direction=(0.3, 0.5, -0.8)),
        noise=tiny_noise,
        kernel="hier",
        cone_res=(8, 64, 64),
    )
    assert eng.can_run, "hier kernel failed shape validation"
    eng.update_sky(now=0.0)  # warm start fills all three buffers
    ring = np.asarray(eng.cloud_ring)
    assert np.isfinite(ring).all()
    assert np.abs(ring).max() > 0.0, "hier warm start left the ring empty"
    for i in range(1, 18):  # one full cycle + rotation
        eng.update_sky(now=i / 60.0)
    assert np.isfinite(np.asarray(eng.cloud_ring)).all()
    mono = np.asarray(eng.render_full_hemisphere())
    assert np.isfinite(mono).all()
    assert (mono[..., 3] > 0.0).mean() > 0.05, "hier monolithic is empty"


def test_perf_validation_rejects_nonpositive_size():
    """validate() must raise (not silently derive a non-positive tile
    region) when texture_size has no positive clamp target."""
    with pytest.raises(ValueError):
        PerfConfig(texture_size=-4).validate()
    with pytest.raises(ValueError, match="frames_to_update"):
        PerfConfig(frames_to_update=7).validate()
