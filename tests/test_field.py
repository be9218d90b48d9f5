"""Gates for the baked-density-field experiment (models/field.py — a
documented measured negative, kept reproducible; see the module docstring
and docs/PERF_NOTES.md round-2 negatives)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cloudscape_tpu.models import atmosphere
from cloudscape_tpu.models.density import MarchParams
from cloudscape_tpu.models.field import (
    build_density_field,
    march_baked,
    occupied_ray_fraction,
    sample_field_xyz,
)
from cloudscape_tpu.models.march_fast import BrickPack, march_bricks
from cloudscape_tpu.models.packs import make_noise_pack
from cloudscape_tpu.ops.octmap import texel_directions
from cloudscape_tpu.utils.image import psnr


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
    dirs = texel_directions(32)
    field = build_density_field(params, bp, res=(16, 256, 256),
                                cone_res=(8, 96, 96), chunk=16384)
    return bp, slut, params, dirs, field


@pytest.mark.slow
def test_march_baked_documented_band(setup):
    """march_baked renders plausibly but BELOW the 40 dB production gate —
    the documented negative. If this band moves, update PERF_NOTES."""
    bp, slut, params, dirs, field = setup
    exact = np.asarray(
        march_bricks(dirs, params, bp, slut, steps=64, chunk=1024,
                     capacity_frac=0.5)
    )
    got = np.asarray(
        march_baked(dirs, params, bp, field, slut, steps=64, chunk=1024)
    )
    assert np.isfinite(got).all()
    p = psnr(got, exact)
    assert 15.0 < p < 40.0, f"baked-field PSNR {p:.1f} dB — update the band"


def test_field_lookup_matches_bake_points(setup):
    """At grid cell centers the field returns the baked values (trilinear is
    exact at cell centers, up to the f32 warp→unwarp roundtrip nudging the
    query a fraction of a cell)."""
    bp, slut, params, dirs, field = setup
    from cloudscape_tpu.models.field import _grid_positions
    from cloudscape_tpu.models.march_fast import (
        _density_pre_xyz, _weather_rb_xy,
    )

    px, py, pz = _grid_positions((16, 256, 256), field.extent)
    sel = slice(1000, 1512)  # a band of cells
    f = sample_field_xyz(field, px[sel], py[sel], pz[sel])
    w = _weather_rb_xy(bp, px[sel], pz[sel], params.weather_pos)
    pre, _ = _density_pre_xyz(px[sel], py[sel], pz[sel], w, 0.0, params, bp)
    np.testing.assert_allclose(np.asarray(f[..., 0]), np.asarray(pre),
                               atol=5e-3, rtol=1e-2)


@pytest.mark.slow
def test_occupied_ray_fraction_bounds(setup):
    bp, slut, params, dirs, field = setup
    occ = float(occupied_ray_fraction(dirs, params, field))
    assert 0.0 < occ <= 1.0
    # An empty scene has zero occupied rays.
    empty = MarchParams.create(cloud_coverage=0.0,
                               light_direction=np.array([0.3, 0.4, -0.85]))
    field0 = build_density_field(empty, bp, res=(8, 64, 64),
                                 cone_res=(8, 32, 32), chunk=4096)
    occ0 = float(occupied_ray_fraction(dirs, empty, field0,
                                       occupancy_margin=0.0))
    assert occ0 == 0.0
