"""End-to-end integration: the full engine chain vs the pure-f64 oracle chain.

Renders a complete frame through CloudSkyEngine (transmittance LUT → sky LUT
→ amortized cloud map → composite) and compares against the oracle pipeline
built exclusively from oracle/reference.py — the strongest whole-system gate
(SURVEY.md §4 integration level, PSNR ≥ 40 dB per BASELINE.json).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState
from cloudscape_tpu.engine import CloudSkyEngine
from cloudscape_tpu.models.packs import make_noise_pack
from cloudscape_tpu.utils.image import psnr
from oracle import reference as ref


@pytest.fixture(scope="module")
def setup():
    from cloudscape_tpu.ops.noise import generate_base_noise
    from cloudscape_tpu.utils.assets import load_bmp, slice_horizontal_3d

    small = slice_horizontal_3d(
        load_bmp("/root/reference/cloud_sky/worlnoise.bmp"), 32
    )
    weather = load_bmp("/root/reference/cloud_sky/weather.bmp")
    base = np.asarray(generate_base_noise(16, seed=5))
    noise = make_noise_pack(base, small, weather)

    sun = np.array([0.45, 0.35, -0.82])
    sun /= np.linalg.norm(sun)
    perf = PerfConfig(texture_size=48, frames_to_update=16, march_steps=8,
                      light_steps=6)
    config = CloudConfig(cloud_coverage=0.5, sun_disk_scale=2.0,
                         ground_color=(0.27, 0.19, 0.027, 1.0))
    engine = CloudSkyEngine(perf=perf, config=config,
                            sun=SunState(direction=tuple(sun)), noise=noise,
                            kernel="reference")
    engine.update_sky(now=0.0)  # warm start
    return engine, noise, sun


def test_full_frame_vs_oracle_chain(setup):
    engine, noise, sun = setup

    # View grid over the upper hemisphere.
    az = np.linspace(-np.pi, np.pi, 64, endpoint=False)
    el = np.linspace(0.05, 1.2, 32)
    d = np.stack(
        [
            np.cos(el)[:, None] * np.cos(az)[None, :],
            np.broadcast_to(np.sin(el)[:, None], (32, 64)),
            np.cos(el)[:, None] * np.sin(az)[None, :],
        ],
        axis=-1,
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    got = np.asarray(engine.render_view(jnp.asarray(d, jnp.float32)))

    # Oracle chain, entirely f64: LUTs → cloud maps → composite. The engine
    # is at a static scene, so both blend buffers equal the monolithic map.
    tlut_o = ref.transmittance_lut_ref()
    sky_o = ref.sky_lut_ref(tlut_o, sun)
    params = dict(
        cloud_pos=np.asarray(engine.frame_data.cloud_pos),
        detailed_pos=np.asarray(engine.frame_data.detailed_pos),
        weather_pos=np.asarray(engine.frame_data.weather_pos),
        time=engine.frame_data.time,
        density=engine.frame_data.density,
        cloud_coverage=engine.frame_data.cloud_coverage,
        light_direction=sun,
        light_energy=1.0,
        light_color=np.ones(3),
        ground_color=np.asarray(engine.frame_data.ground_color),
    )
    large_np = [np.asarray(l, np.float64) for l in noise.large]
    small_np = [np.asarray(l, np.float64) for l in noise.small]
    weather_np = np.asarray(noise.weather, np.float64)

    n = engine.perf.texture_size
    ys, xs = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    uv = np.stack([xs / n, ys / n], axis=-1)
    dirs_map = ref.oct_to_vec3_np(uv)[..., [0, 2, 1]]
    cloud_map_o = ref.cloud_march_ref(
        dirs_map, params, large_np, small_np, weather_np, sky_o,
        steps=engine.perf.march_steps,
    )

    want = ref.composite_ref(
        d, cloud_map_o, cloud_map_o, sky_o, sky_o, tlut_o,
        engine.blend_amount, 2.0, sun,
    )
    p = psnr(got, want)
    assert p > 40.0, f"full-chain PSNR {p:.1f} dB < 40 dB gate"
    assert np.isfinite(got).all()


def test_save_file_roundtrip(tmp_path, setup):
    engine, noise, _ = setup
    path = str(tmp_path / "ckpt.npz")
    engine.save_file(path)

    fresh = CloudSkyEngine(perf=engine.perf, noise=noise, kernel="reference")
    fresh.load_file(path)
    np.testing.assert_array_equal(
        np.asarray(fresh.cloud_ring), np.asarray(engine.cloud_ring)
    )
    assert fresh.ring.frame == engine.ring.frame
    d = np.array([[0.1, 0.8, -0.3]])
    d /= np.linalg.norm(d)
    np.testing.assert_array_equal(
        np.asarray(fresh.render_view(jnp.asarray(d, jnp.float32))),
        np.asarray(engine.render_view(jnp.asarray(d, jnp.float32))),
    )


def test_sunset_composite_chain_warm_shift(setup):
    """Low-sun fidelity gate (VERDICT r1 weak #5): at a sunset sun
    (elevation ≈ 8°), the composited clouds must take the oracle's warm
    color shift — gated both in PSNR and in the R/B color-temperature ratio
    of the cloud-covered texels."""
    _, noise, _ = setup
    sun = np.array([0.99, np.sin(np.deg2rad(8.0)), -0.1])
    sun /= np.linalg.norm(sun)

    perf = PerfConfig(texture_size=48, frames_to_update=16, march_steps=8,
                      light_steps=6)
    engine = CloudSkyEngine(
        perf=perf,
        config=CloudConfig(cloud_coverage=0.55, sun_disk_scale=2.0,
                           ground_color=(0.27, 0.19, 0.027, 1.0)),
        sun=SunState(direction=tuple(sun)), noise=noise, kernel="reference",
    )
    engine.update_sky(now=0.0)

    az = np.linspace(-np.pi, np.pi, 64, endpoint=False)
    el = np.linspace(0.08, 0.9, 32)
    d = np.stack(
        [
            np.cos(el)[:, None] * np.cos(az)[None, :],
            np.broadcast_to(np.sin(el)[:, None], (32, 64)),
            np.cos(el)[:, None] * np.sin(az)[None, :],
        ],
        axis=-1,
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    got = np.asarray(engine.render_view(jnp.asarray(d, jnp.float32)))

    tlut_o = ref.transmittance_lut_ref()
    sky_o = ref.sky_lut_ref(tlut_o, sun)
    params = dict(
        cloud_pos=np.asarray(engine.frame_data.cloud_pos),
        detailed_pos=np.asarray(engine.frame_data.detailed_pos),
        weather_pos=np.asarray(engine.frame_data.weather_pos),
        time=engine.frame_data.time,
        density=engine.frame_data.density,
        cloud_coverage=engine.frame_data.cloud_coverage,
        light_direction=sun,
        light_energy=1.0,
        light_color=np.ones(3),
        ground_color=np.asarray(engine.frame_data.ground_color),
    )
    large_np = [np.asarray(l, np.float64) for l in noise.large]
    small_np = [np.asarray(l, np.float64) for l in noise.small]
    weather_np = np.asarray(noise.weather, np.float64)
    n = engine.perf.texture_size
    ys, xs = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    uv = np.stack([xs / n, ys / n], axis=-1)
    dirs_map = ref.oct_to_vec3_np(uv)[..., [0, 2, 1]]
    cloud_map_o = ref.cloud_march_ref(
        dirs_map, params, large_np, small_np, weather_np, sky_o,
        steps=engine.perf.march_steps,
    )
    want = ref.composite_ref(
        d, cloud_map_o, cloud_map_o, sky_o, sky_o, tlut_o,
        engine.blend_amount, 2.0, sun,
    )
    p = psnr(got, want)
    assert p > 40.0, f"sunset full-chain PSNR {p:.1f} dB < 40 dB gate"

    # Color-temperature of the clouded texels: warm, and tracking the oracle.
    # Resample the engine's cloud alpha at the view grid to find cloudy texels.
    from cloudscape_tpu.ops.octmap import world_dir_to_uv
    from cloudscape_tpu.ops.sampling import sample2d

    alpha = np.asarray(
        sample2d(
            engine.cloud_ring[engine.ring.texture_to_blend_to],
            world_dir_to_uv(jnp.asarray(d, jnp.float32)),
            wrap="clamp",
        )
    )[..., 3]
    cloudy = alpha > 0.4
    assert cloudy.mean() > 0.05, "sunset scene rendered too few clouds to gate"
    rb_got = got[cloudy, 0].mean() / max(got[cloudy, 2].mean(), 1e-6)
    rb_want = want[cloudy, 0].mean() / max(want[cloudy, 2].mean(), 1e-6)
    assert rb_got > 1.05, f"sunset clouds not warm (R/B = {rb_got:.3f})"
    assert abs(rb_got - rb_want) / rb_want < 0.05, (
        f"warm shift diverges from oracle: got R/B {rb_got:.3f}, "
        f"oracle {rb_want:.3f}"
    )
