"""Multi-chip tile sharding on the virtual 8-device CPU mesh (SURVEY.md §4:
sharded rendering must be bitwise-identical to single-chip — a pure reshard).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cloudscape_tpu.models import atmosphere
from cloudscape_tpu.models.density import MarchParams
from cloudscape_tpu.models.march import march
from cloudscape_tpu.models.packs import make_noise_pack
from cloudscape_tpu.ops.octmap import texel_directions
from cloudscape_tpu.parallel import sharding


@pytest.fixture(scope="module")
def setup():
    from cloudscape_tpu.ops.noise import generate_base_noise, generate_detail_noise
    from cloudscape_tpu.utils.assets import load_bmp

    noise = make_noise_pack(
        generate_base_noise(16, seed=1),
        generate_detail_noise(16, seed=2),
        load_bmp("/root/reference/cloud_sky/weather.bmp"),
    )
    tlut = atmosphere.transmittance_lut()
    sun = np.array([0.3, 0.5, -0.8])
    sun /= np.linalg.norm(sun)
    slut = atmosphere.sky_lut(tlut, jnp.asarray(sun, jnp.float32))
    params = MarchParams.create(cloud_coverage=0.6, light_direction=sun)
    return noise, tlut, slut, params, sun


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_render_bitwise_equals_single(setup):
    noise, _, slut, params, _ = setup
    mesh = sharding.make_mesh()
    n = 64
    sharded = np.asarray(
        sharding.render_hemisphere_sharded(mesh, n, params, noise, slut,
                                           steps=8, light_steps=2)
    )
    single = np.asarray(
        march(texel_directions(n), params, noise, slut, steps=8, light_steps=2)
    )
    np.testing.assert_array_equal(sharded, single)


def test_sharded_fast_kernel_matches_single(setup):
    """The production (brick/compacted) kernel under shard_map: sharded ≡
    unsharded to fp-reassociation tolerance."""
    from cloudscape_tpu.models.march_fast import BrickPack, march_bricks

    noise, _, slut, params, _ = setup
    bp = BrickPack.from_noise(noise)
    mesh = sharding.make_mesh()
    n = 64
    shard = np.asarray(
        sharding.render_hemisphere_sharded(mesh, n, params, bp, slut,
                                           steps=8, light_steps=2,
                                           kernel="fast")
    )
    single = np.asarray(
        march_bricks(texel_directions(n), params, bp, slut, steps=8,
                     light_steps=2, chunk=16384, capacity_frac=0.3)
    )
    np.testing.assert_allclose(shard, single, atol=1e-6)


def test_sharded_fast2_kernel_matches_single(setup):
    """The row-lean v2 (headline/serving) kernel under shard_map, cone
    cache replicated: sharded ≡ unsharded to fp-reassociation tolerance."""
    from cloudscape_tpu.models.march_fast import (
        BrickPack, build_cone_cache, march_bricks_v2,
    )

    noise, _, slut, params, _ = setup
    bp = BrickPack.from_noise(noise)
    cone = build_cone_cache(params, bp, 2, res=(8, 64, 64), chunk=4096)
    mesh = sharding.make_mesh()
    n = 64
    shard = np.asarray(
        sharding.render_hemisphere_sharded(mesh, n, params, (bp, cone), slut,
                                           steps=8, light_steps=2,
                                           kernel="fast2")
    )
    single = np.asarray(
        march_bricks_v2(texel_directions(n), params, bp, slut, steps=8,
                        light_steps=2, chunk=16384, capacity_frac=0.3,
                        cone_cache=cone)
    )
    np.testing.assert_allclose(shard, single, atol=1e-6)


def test_sharded_v3_prepass_gate_bitwise(setup):
    """The v3 cell gate under shard_map — VERDICT r3 #2. The prepass
    dilations halo-exchange their boundary rows over the mesh
    (`_halo_rows`: a cyclic ppermute ring reproducing jnp.roll's wrap), so
    the sharded cull priority AND cell-occupancy gate are BITWISE the
    unsharded ones — whole-ray/whole-cell decisions never depend on the
    sharding."""
    from jax.sharding import PartitionSpec as P

    from cloudscape_tpu.models.march_fast import (
        BrickPack, _cull_prepass, _ray_setup,
    )

    noise, _, _, params, _ = setup
    bp = BrickPack.from_noise(noise)
    mesh = sharding.make_mesh()
    dirs = texel_directions(64)

    def prepass(d, axis_name=None):
        H, W = d.shape[0], d.shape[1]
        flat = d.reshape(-1, 3)
        above, ndir, ss, p0, _, _ = _ray_setup(flat, params, 8)
        prio, occ, _ = _cull_prepass(above, ndir, ss, p0, params, bp, 8, 2,
                                     min(16384, flat.shape[0]), (H, W), 2,
                                     0.1, axis_name)
        return prio.reshape(H, W), occ.reshape(H // 2, W // 2, 2)

    prio_s, occ_s = jax.shard_map(
        lambda d: prepass(d, "rays"), mesh=mesh,
        in_specs=(P("rays"),), out_specs=(P("rays"), P("rays")))(dirs)
    prio_1, occ_1 = prepass(dirs)
    np.testing.assert_array_equal(np.asarray(occ_s), np.asarray(occ_1))
    np.testing.assert_array_equal(np.asarray(prio_s), np.asarray(prio_1))
    assert np.asarray(occ_1).any() and not np.asarray(occ_1).all()


def test_sharded_fast3_kernel_matches_single(setup):
    """The v3 (headline) kernel under shard_map — VERDICT r3 #2 / r4 #7.

    The gate is bitwise (test above). The rendered VALUES under an SPMD
    (>1-device) compile are tolerance-equal to the single compile, and the
    round-5 isolation (docs/PERF_NOTES.md round 5) pinned the divergence's
    shape precisely:

    - NOT capacity/threshold flips: identical diff set with every gate at
      1.0 (rk=ck=hk) and under both accumulation paths;
    - NOT the halo collective or per-shard shapes: a 1-device shard_map
      (same body, same collectives, same shapes) is BITWISE the single
      compile, and every stream sub-chain (positions, weather, pre,
      erosion) probed in isolation under shard_map is bitwise;
    - it IS the XLA SPMD partitioner's whole-module fusion/contraction
      choices: any >1-device mesh produces ONE deterministic alternative
      rendering — asserted below as mesh-size invariance (2-device ≡
      8-device bitwise), which is the deployable claim: the result does
      not depend on HOW MANY chips.

    Bound: ≤ ~1.3e-2 absolute on an image with peak ~1, > 60 dB, > 90 %
    of texels exactly equal."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from cloudscape_tpu.models.march_fast import (
        BrickPack, build_cone_cache, march_bricks_v3,
    )
    from cloudscape_tpu.utils.image import psnr

    noise, _, slut, params, _ = setup
    bp = BrickPack.from_noise(noise)
    cone = build_cone_cache(params, bp, 2, res=(8, 64, 64), chunk=4096)
    mesh = sharding.make_mesh()
    n = 64
    shard = np.asarray(
        sharding.render_hemisphere_sharded(mesh, n, params, (bp, cone), slut,
                                           steps=8, light_steps=2,
                                           kernel="fast3")
    )
    # Same knobs as sharding._march_for's fast3 arm (default v3_policy).
    single = np.asarray(
        march_bricks_v3(texel_directions(n), params, bp, slut, steps=8,
                        light_steps=2, chunk=16384, cell_keep_frac=0.75,
                        hot_keep_frac=0.75, cone_cache=cone,
                        ray_keep_frac=1.0, prepass_steps=2, ray_stride=2)
    )
    np.testing.assert_allclose(shard, single, atol=2e-2)
    p = psnr(shard, single)
    assert p > 60.0, f"sharded v3 vs single {p:.1f} dB"
    # The gate being bitwise shows up as most texels exactly equal.
    assert (shard == single).all(axis=-1).mean() > 0.9
    assert np.abs(single).max() > 0.0, "sharded v3 test is vacuous"
    # Mesh-size invariance: the SPMD result is ONE deterministic rendering
    # for any >1-device mesh (round-5 isolation) — a reshard from 8 chips
    # to 2 must be bitwise.
    mesh2 = sharding.make_mesh(list(mesh.devices.flat)[:2])
    shard2 = np.asarray(
        sharding.render_hemisphere_sharded(mesh2, n, params, (bp, cone),
                                           slut, steps=8, light_steps=2,
                                           kernel="fast3")
    )
    np.testing.assert_array_equal(shard2, shard)


def test_mesh_engine_fast3_matches_single(setup):
    """CloudSkyEngine(mesh=..., kernel='fast3'): the dense tile arm is pure
    per-ray math, so the mesh engine must step identically to the
    single-device fast3 engine."""
    from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState
    from cloudscape_tpu.engine import CloudSkyEngine

    noise, _, _, _, sun = setup
    kw = dict(
        perf=PerfConfig(texture_size=32, frames_to_update=16, march_steps=4,
                        light_steps=2),
        config=CloudConfig(cloud_coverage=0.6),
        sun=SunState(direction=tuple(sun)),
        noise=noise,
        kernel="fast3",
        cone_res=(8, 64, 64),
    )
    a = CloudSkyEngine(**kw)
    b = CloudSkyEngine(**kw, mesh=sharding.make_mesh())
    for k in range(3):
        a.update_sky(now=0.1 * k)
        b.update_sky(now=0.1 * k)
    np.testing.assert_allclose(
        np.asarray(a.cloud_ring), np.asarray(b.cloud_ring), atol=1e-6
    )


def test_mesh_engine_hier_matches_single(setup):
    """CloudSkyEngine(mesh=..., kernel='hier'): the window-lattice v3 tile
    arm under the mesh. Not gated bitwise: the per-shard window probe and
    prepass dilation see only in-shard rows (the same documented seam
    trade as `march_hierarchical_v3_banded`), and SPMD partitioning picks
    its own whole-module fusion rendering (docs/PERF_NOTES.md round 5 —
    the same ≤~1.3e-2 class as the fast3 test above). Measured here:
    ~98.7% of texels bitwise-equal, stray texels ≤3e-3."""
    from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState
    from cloudscape_tpu.engine import CloudSkyEngine

    noise, _, _, _, sun = setup
    kw = dict(
        perf=PerfConfig(texture_size=32, frames_to_update=4, march_steps=8,
                        light_steps=2),
        config=CloudConfig(cloud_coverage=0.6),
        sun=SunState(direction=tuple(sun)),
        noise=noise,
        kernel="hier",
        cone_res=(8, 64, 64),
    )
    a = CloudSkyEngine(**kw)
    b = CloudSkyEngine(**kw, mesh=sharding.make_mesh())
    a.update_sky(now=0.0)
    b.update_sky(now=0.0)
    ar = np.asarray(a.cloud_ring)
    br = np.asarray(b.cloud_ring)
    assert np.isfinite(br).all()
    assert np.abs(ar).max() > 0.0, "hier mesh test is vacuous"
    np.testing.assert_allclose(ar, br, atol=2e-2)
    assert (ar == br).mean() > 0.9


def test_indivisible_rows_raise(setup):
    noise, _, slut, params, _ = setup
    mesh = sharding.make_mesh()
    with pytest.raises(ValueError):
        sharding.render_hemisphere_sharded(mesh, 60, params, noise, slut)


def test_mesh_engine_matches_single_device(setup):
    """CloudSkyEngine(mesh=...) must step identically to the single-device
    engine (tile compute sharded, state replicated)."""
    from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState
    from cloudscape_tpu.engine import CloudSkyEngine

    noise, _, _, _, sun = setup
    kw = dict(
        perf=PerfConfig(texture_size=32, frames_to_update=16, march_steps=4,
                        light_steps=2),
        config=CloudConfig(cloud_coverage=0.6),
        sun=SunState(direction=tuple(sun)),
        noise=noise,
    )
    a = CloudSkyEngine(**kw)
    b = CloudSkyEngine(**kw, mesh=sharding.make_mesh())
    for k in range(3):
        a.update_sky(now=0.1 * k)
        b.update_sky(now=0.1 * k)
    np.testing.assert_allclose(
        np.asarray(a.cloud_ring), np.asarray(b.cloud_ring), atol=1e-6
    )


@pytest.mark.slow
def test_mesh_engine_composes_with_tile_cull(setup):
    """VERDICT r2 #5: tile_cull and mesh must compose. The priority map is
    computed replicated; each shard culls its own row block, so the sharded
    culled engine is tolerance-equal (not bitwise) to the single-device
    culled engine — and both hold the cull quality gate vs the unculled
    engine."""
    from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState
    from cloudscape_tpu.engine import CloudSkyEngine

    noise, _, _, _, sun = setup
    kw = dict(
        perf=PerfConfig(texture_size=64, frames_to_update=16, march_steps=16,
                        light_steps=2),
        config=CloudConfig(cloud_coverage=0.45),
        sun=SunState(direction=tuple(sun)),
        noise=noise,
        kernel="fast2",
        cone_res=(8, 64, 64),
    )
    plain = CloudSkyEngine(**kw)
    culled = CloudSkyEngine(**kw, tile_cull=True)
    mesh_culled = CloudSkyEngine(**kw, tile_cull=True,
                                 mesh=sharding.make_mesh())
    assert mesh_culled.tile_cull, "tile_cull must not be disabled by mesh"
    for _ in range(18):
        plain.update_sky(now=0.0)
        culled.update_sky(now=0.0)
        mesh_culled.update_sky(now=0.0)
    assert mesh_culled._tile_buckets == culled._tile_buckets
    assert any(0.0 < x < 1.0 for x in mesh_culled._tile_buckets), \
        "no tile actually culled — the composability test is vacuous"
    rp = np.asarray(plain.cloud_ring)[plain.ring.texture_to_blend_to]
    rc = np.asarray(culled.cloud_ring)[culled.ring.texture_to_blend_to]
    rm = np.asarray(mesh_culled.cloud_ring)[
        mesh_culled.ring.texture_to_blend_to]
    assert np.isfinite(rm).all()
    peak = max(float(np.abs(rp).max()), 1e-9)

    def psnr(a, b):
        mse = float(((a - b) ** 2).mean())
        return 10.0 * np.log10(peak * peak / max(mse, 1e-20))

    # Sharded-culled vs single-culled: same algorithm, per-shard histogram
    # thresholds — near-identical.
    assert psnr(rc, rm) > 40.0, f"sharded vs single culled {psnr(rc, rm):.1f} dB"
    # And the sharded culled engine holds the cull gate vs unculled.
    assert psnr(rp, rm) > 40.0, f"sharded culled vs unculled {psnr(rp, rm):.1f} dB"


def test_full_frame_step_sharded(setup):
    noise, tlut, _, params, sun = setup
    mesh = sharding.make_mesh()
    n = 32
    tile, sky_img, mean_lum = sharding.full_frame_step_sharded(
        params, noise, tlut, jnp.asarray(sun, jnp.float32),
        texture_size=n, steps=8, light_steps=2, mesh=mesh,
    )
    tile = np.asarray(tile)
    assert tile.shape == (n, n, 4)
    assert np.asarray(sky_img).shape == (100, 200, 4)
    # The psum'd luminance must equal the host-side reduction exactly.
    np.testing.assert_allclose(
        float(mean_lum), tile[..., :3].mean(), rtol=1e-6
    )
    assert np.isfinite(tile).all()
