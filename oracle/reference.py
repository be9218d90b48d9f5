"""NumPy float64 transcriptions of the reference GLSL kernels (the oracle).

Structured as close, independent re-statements of the shader math so the JAX
engine can be validated texel-by-texel. Citations point into /root/reference.

Conventions: images are [H, W, C] numpy arrays with u→W, v→H; volumes are
[D, H, W, C] with texture p.x→W, p.y→H, p.z→D. All math in float64.
"""

from __future__ import annotations

import numpy as np

# ----------------------------------------------------------------------------
# Sampler emulation (GLSL/Vulkan semantics, float64)


def _wrap(i, n, mode):
    return np.remainder(i, n) if mode == "repeat" else np.clip(i, 0, n - 1)


def sample2d_np(tex, uv, wrap="repeat"):
    """Bilinear fetch; tex [H,W,C], uv [...,2]."""
    h, w = tex.shape[:2]
    cx = uv[..., 0] * w - 0.5
    cy = uv[..., 1] * h - 0.5
    ix0 = np.floor(cx).astype(np.int64)
    iy0 = np.floor(cy).astype(np.int64)
    fx = (cx - ix0)[..., None]
    fy = (cy - iy0)[..., None]
    ix1 = _wrap(ix0 + 1, w, wrap)
    iy1 = _wrap(iy0 + 1, h, wrap)
    ix0 = _wrap(ix0, w, wrap)
    iy0 = _wrap(iy0, h, wrap)
    c00 = tex[iy0, ix0]
    c10 = tex[iy0, ix1]
    c01 = tex[iy1, ix0]
    c11 = tex[iy1, ix1]
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return top + (bot - top) * fy


def sample3d_np(tex, p, wrap="repeat"):
    """Trilinear fetch; tex [D,H,W,C], p [...,3] = (x,y,z)."""
    d, h, w = tex.shape[:3]
    cx = p[..., 0] * w - 0.5
    cy = p[..., 1] * h - 0.5
    cz = p[..., 2] * d - 0.5
    ix0 = np.floor(cx).astype(np.int64)
    iy0 = np.floor(cy).astype(np.int64)
    iz0 = np.floor(cz).astype(np.int64)
    fx = (cx - ix0)[..., None]
    fy = (cy - iy0)[..., None]
    fz = (cz - iz0)[..., None]
    ix1 = _wrap(ix0 + 1, w, wrap)
    iy1 = _wrap(iy0 + 1, h, wrap)
    iz1 = _wrap(iz0 + 1, d, wrap)
    ix0 = _wrap(ix0, w, wrap)
    iy0 = _wrap(iy0, h, wrap)
    iz0 = _wrap(iz0, d, wrap)

    def tx(iz, iy):
        c0 = tex[iz, iy, ix0]
        c1 = tex[iz, iy, ix1]
        return c0 + (c1 - c0) * fx

    cy0 = tx(iz0, iy0) + (tx(iz0, iy1) - tx(iz0, iy0)) * fy
    cy1 = tx(iz1, iy0) + (tx(iz1, iy1) - tx(iz1, iy0)) * fy
    return cy0 + (cy1 - cy0) * fz


def build_pyramid3d_np(tex):
    levels = [tex]
    while min(tex.shape[:3]) > 1:
        d, h, w, c = tex.shape
        tex = tex.reshape(d // 2, 2, h // 2, 2, w // 2, 2, c).mean(axis=(1, 3, 5))
        levels.append(tex)
    return levels


def sample3d_lod_np(pyr, p, lod, wrap="repeat"):
    """textureLod with linear mip filter; lod may be fractional."""
    lod = min(max(float(lod), 0.0), float(len(pyr) - 1))
    d0 = int(lod)
    f = lod - d0
    lo = sample3d_np(pyr[d0], p, wrap)
    if f == 0.0:
        return lo
    hi = sample3d_np(pyr[min(d0 + 1, len(pyr) - 1)], p, wrap)
    return lo + (hi - lo) * f


# ----------------------------------------------------------------------------
# Shared atmosphere physics (`sky-lut.glsl:44-91` == `transmittance-lut.glsl:44-80`)

EARTH_RADIUS = 6371.0
ATMOSPHERE_THICKNESS = 100.0
ATMOSPHERE_RADIUS = EARTH_RADIUS + ATMOSPHERE_THICKNESS
EYE_ALTITUDE = 0.5
EYE_DISTANCE_TO_EARTH_CENTER = EARTH_RADIUS + EYE_ALTITUDE
GROUND_ALBEDO = 0.3

SUN_SPECTRAL_IRRADIANCE = np.array([1.679, 1.828, 1.986, 1.307])
MOLECULAR_SCATTERING_BASE = np.array([6.605e-3, 1.067e-2, 1.842e-2, 3.156e-2])
OZONE_CROSS_SECTION = np.array([3.472e-21, 3.914e-21, 1.349e-21, 11.03e-23]) * 1e-4
OZONE_MEAN_DOBSON = 350.0
AEROSOL_ABSORPTION_CROSS_SECTION = np.array([2.8722e-24, 4.6168e-24, 7.9706e-24, 1.3578e-23])
AEROSOL_SCATTERING_CROSS_SECTION = np.array([1.5908e-22, 1.7711e-22, 2.0942e-22, 2.4033e-22])
AEROSOL_BASE_DENSITY = 1.3681e20
AEROSOL_BACKGROUND_DENSITY = 2e6
AEROSOL_HEIGHT_SCALE = 0.73
AEROSOL_BG_OVER_BASE = AEROSOL_BACKGROUND_DENSITY / AEROSOL_BASE_DENSITY

# Spectral (630/560/490/430 nm) → linear sRGB (`sky-lut.glsl:207-217`).
# GLSL mat4x3 is column-major: each GLSL column is one spectral sample's rgb.
SPECTRAL_TO_SRGB = np.array(
    [
        [137.672389239975, -8.632904716299537, -1.7181567391931372],
        [32.549094028629234, 91.29801417199785, -12.005406444382531],
        [-38.91428392614275, 34.31665471469816, 29.89044807197628],
        [8.572844237945445, -11.103384660054624, 117.47585277566478],
    ]
).T  # [3, 4]: rgb = SPECTRAL_TO_SRGB @ L


def ray_sphere_intersection_np(ro, rd, radius):
    """First-hit/-1 ray-sphere (`sky-lut.glsl:100-109`). ro/rd [...,3]."""
    b = np.sum(ro * rd, axis=-1)
    c = np.sum(ro * ro, axis=-1) - radius * radius
    d = b * b - c
    sqrt_d = np.sqrt(np.maximum(d, 0.0))
    hit = np.where(d > b * b, -b + sqrt_d, -b - sqrt_d)
    miss = ((c > 0.0) & (b > 0.0)) | (d < 0.0)
    return np.where(miss, -1.0, hit)


def get_molecular_scattering_coefficient_np(h):
    return MOLECULAR_SCATTERING_BASE * np.exp(
        -0.07771971 * np.power(h, 1.16364243)
    )[..., None]


def get_molecular_absorption_coefficient_np(h):
    h = h + 1e-4
    t = np.log(h) - 3.22261
    density = 3.78547397e20 * (1.0 / h) * np.exp(-t * t * 5.55555555)
    return OZONE_CROSS_SECTION * OZONE_MEAN_DOBSON * density[..., None]


def get_aerosol_density_np(h):
    return AEROSOL_BASE_DENSITY * (np.exp(-h / AEROSOL_HEIGHT_SCALE) + AEROSOL_BG_OVER_BASE)


def atmosphere_coefficients_np(h):
    """Returns (aerosol_abs, aerosol_scat, mol_abs, mol_scat, extinction),
    each [..., 4] (`sky-lut.glsl:188-202`)."""
    h = np.maximum(h, 0.0)
    ad = get_aerosol_density_np(h)[..., None]
    aerosol_absorption = AEROSOL_ABSORPTION_CROSS_SECTION * ad
    aerosol_scattering = AEROSOL_SCATTERING_CROSS_SECTION * ad
    molecular_absorption = get_molecular_absorption_coefficient_np(h)
    molecular_scattering = get_molecular_scattering_coefficient_np(h)
    extinction = (
        aerosol_absorption + aerosol_scattering + molecular_absorption + molecular_scattering
    )
    return aerosol_absorption, aerosol_scattering, molecular_absorption, molecular_scattering, extinction


# ----------------------------------------------------------------------------
# Transmittance LUT (`transmittance-lut.glsl:157-196`)

TRANSMITTANCE_STEPS = 40


def transmittance_lut_ref(width=256, height=64):
    """Spectral sun transmittance LUT, [height, width, 4].

    u encodes sun cos-zenith (2u-1), v encodes start altitude
    (`transmittance-lut.glsl:164-168`); 40-step midpoint march to the
    atmosphere boundary (`:175-191`)."""
    xs = np.arange(width, dtype=np.float64)
    ys = np.arange(height, dtype=np.float64)
    u = xs[None, :, None] / width
    v = ys[:, None, None] / height
    u, v = np.broadcast_arrays(u, v)
    uv = np.concatenate([u, v], axis=-1)

    sun_cos_theta = uv[..., 0] * 2.0 - 1.0
    sun_dir = np.stack(
        [
            -np.sqrt(np.maximum(1.0 - sun_cos_theta * sun_cos_theta, 0.0)),
            np.zeros_like(sun_cos_theta),
            sun_cos_theta,
        ],
        axis=-1,
    )
    distance_to_earth_center = EARTH_RADIUS + (ATMOSPHERE_RADIUS - EARTH_RADIUS) * uv[..., 1]
    ray_origin = np.zeros(uv.shape[:-1] + (3,))
    ray_origin[..., 2] = distance_to_earth_center

    t_d = ray_sphere_intersection_np(ray_origin, sun_dir, ATMOSPHERE_RADIUS)
    dt = t_d / TRANSMITTANCE_STEPS

    result = np.zeros(uv.shape[:-1] + (4,))
    for i in range(TRANSMITTANCE_STEPS):
        t = (i + 0.5) * dt
        x_t = ray_origin + sun_dir * t[..., None]
        altitude = np.linalg.norm(x_t, axis=-1) - EARTH_RADIUS
        extinction = atmosphere_coefficients_np(altitude)[4]
        result += extinction * dt[..., None]
    return np.exp(-result)


# ----------------------------------------------------------------------------
# Sky-view LUT (`sky-lut.glsl:219-315`)

IN_SCATTERING_STEPS = 30
PI64 = np.pi
INV_4PI = 0.25 / PI64
PHASE_ISOTROPIC = INV_4PI
RAYLEIGH_PHASE_SCALE = (3.0 / 16.0) / PI64
AEROSOL_G = 0.8


def transmittance_from_lut_np(lut, cos_theta, normalized_altitude):
    """`sky-lut.glsl:137-142`: clamp-to-edge bilinear at (cosθ*0.5+0.5, alt)."""
    u = np.clip(cos_theta * 0.5 + 0.5, 0.0, 1.0)
    v = np.clip(normalized_altitude, 0.0, 1.0)
    uv = np.stack(np.broadcast_arrays(u, v), axis=-1)
    return sample2d_np(lut, uv, wrap="clamp")


def get_multiple_scattering_np(tlut, cos_theta, normalized_height, d):
    """`sky-lut.glsl:144-164`."""
    omega = 2.0 * PI64 * (1.0 - np.sqrt(np.maximum(d * d - EARTH_RADIUS**2, 0.0)) / d)
    t_to_ground = transmittance_from_lut_np(tlut, cos_theta, 0.0)
    t_ground_to_sample = transmittance_from_lut_np(tlut, 1.0, np.zeros_like(normalized_height)) / \
        transmittance_from_lut_np(tlut, 1.0, normalized_height)
    l_ground = (
        PHASE_ISOTROPIC
        * omega[..., None]
        * (GROUND_ALBEDO / PI64)
        * t_to_ground
        * t_ground_to_sample
        * cos_theta[..., None]
    )
    l_ms = 0.02 * np.array([0.217, 0.347, 0.594, 1.0]) * (
        1.0 / (1.0 + 5.0 * np.exp(-17.92 * cos_theta))
    )[..., None]
    return l_ms + l_ground


def compute_inscattering_np(tlut, ray_origin, ray_dir, t_d, sun_direction_world):
    """`sky-lut.glsl:219-276`. sun_direction_world is the Godot y-up vector the
    driver pushes (`sky_lut.gd:129-131`); the shader converts it via a
    negated .xzy swizzle (`sky-lut.glsl:221-223`)."""
    s = np.asarray(sun_direction_world, dtype=np.float64)
    sun_dir = np.array([-s[0], -s[2], s[1]])

    cos_theta = np.sum(-ray_dir * sun_dir, axis=-1)
    molecular_phase = RAYLEIGH_PHASE_SCALE * (1.0 + cos_theta * cos_theta)
    den = 1.0 + AEROSOL_G**2 + 2.0 * AEROSOL_G * cos_theta
    aerosol_phase = INV_4PI * (1.0 - AEROSOL_G**2) / (den * np.sqrt(den))

    dt = t_d / IN_SCATTERING_STEPS
    l_inscattering = np.zeros(ray_dir.shape[:-1] + (4,))
    transmittance = np.ones(ray_dir.shape[:-1] + (4,))

    for i in range(IN_SCATTERING_STEPS):
        t = (i + 0.5) * dt
        x_t = ray_origin + ray_dir * t[..., None]
        distance_to_earth_center = np.linalg.norm(x_t, axis=-1)
        zenith_dir = x_t / distance_to_earth_center[..., None]
        altitude = distance_to_earth_center - EARTH_RADIUS
        normalized_altitude = altitude / ATMOSPHERE_THICKNESS
        sample_cos_theta = np.sum(zenith_dir * sun_dir, axis=-1)

        _, aerosol_scattering, _, molecular_scattering, extinction = (
            atmosphere_coefficients_np(altitude)
        )
        transmittance_to_sun = transmittance_from_lut_np(
            tlut, sample_cos_theta, normalized_altitude
        )
        ms = get_multiple_scattering_np(
            tlut, sample_cos_theta, normalized_altitude, distance_to_earth_center
        )
        s_term = SUN_SPECTRAL_IRRADIANCE * (
            molecular_scattering * (molecular_phase[..., None] * transmittance_to_sun + ms)
            + aerosol_scattering * (aerosol_phase[..., None] * transmittance_to_sun + ms)
        )
        step_transmittance = np.exp(-dt[..., None] * extinction)
        s_int = (s_term - s_term * step_transmittance) / np.maximum(extinction, 1e-7)
        l_inscattering += transmittance * s_int
        transmittance *= step_transmittance
    return l_inscattering


def sky_lut_ref(tlut, sun_direction_world, width=200, height=100):
    """Sky-view LUT, [height, width, 4] (rgb + alpha=1), `sky-lut.glsl:278-315`.

    Full-sphere lat-long with sqrt-warped elevation: azimuth = 2π·u,
    elev = (2v-1)²·sign(2v-1)·π/2."""
    xs = np.arange(width, dtype=np.float64)
    ys = np.arange(height, dtype=np.float64)
    u = (xs[None, :] / width) * np.ones((height, 1))
    v = (ys[:, None] / height) * np.ones((1, width))

    azimuth = 2.0 * PI64 * u
    l = v * 2.0 - 1.0
    elev = l * l * np.sign(l) * PI64 * 0.5

    ray_dir = np.stack(
        [
            np.cos(elev) * np.cos(azimuth),
            np.cos(elev) * np.sin(azimuth),
            np.sin(elev),
        ],
        axis=-1,
    )
    ray_origin = np.array([0.0, 0.0, EYE_DISTANCE_TO_EARTH_CENTER])

    atmos_dist = ray_sphere_intersection_np(ray_origin, ray_dir, ATMOSPHERE_RADIUS)
    ground_dist = ray_sphere_intersection_np(ray_origin, ray_dir, EARTH_RADIUS)
    t_d = np.where(ground_dist < 0.0, atmos_dist, ground_dist)

    l_spec = compute_inscattering_np(tlut, ray_origin, ray_dir, t_d, sun_direction_world)
    rgb = l_spec @ SPECTRAL_TO_SRGB.T
    out = np.ones((height, width, 4))
    out[..., :3] = rgb
    return out


# ----------------------------------------------------------------------------
# Cloud raymarch kernel (`clouds.glsl`)

G_RADIUS = 6000000.0
SKY_B_RADIUS = 6001500.0
SKY_T_RADIUS = 6004000.0
PI_CLOUDS = 3.141592  # truncated constant as spelled at `clouds.glsl:47`

RANDOM_VECTORS = np.array(
    [
        [0.38051305, 0.92453449, -0.02111345],
        [-0.50625799, -0.03590792, -0.86163418],
        [-0.32509218, -0.94557439, 0.01428793],
        [0.09026238, -0.27376545, 0.95755165],
        [0.28128598, 0.42443639, -0.86065785],
        [-0.16852403, 0.14748697, 0.97460106],
    ]
)  # `clouds.glsl:140`


def hash_np(p):
    """iq hash (`clouds.glsl:60-64`).

    Evaluated in float32 like the GPU: the map is chaotic (fract of large
    products), so matching the reference's bit patterns requires matching its
    precision — a f64 evaluation would diverge from any f32 implementation.
    """
    p = np.asarray(p, dtype=np.float32)
    p = (p * np.float32(0.3183099) + np.float32(0.1)) % np.float32(1.0)
    p = p * np.float32(17.0)
    out = (p[..., 0] * p[..., 1] * p[..., 2] * (p[..., 0] + p[..., 1] + p[..., 2])) % np.float32(1.0)
    return out.astype(np.float64)


def remap_np(v, lo, hi, nlo, nhi):
    return nlo + ((v - lo) / (hi - lo)) * (nhi - nlo)


def smoothstep_np(e0, e1, x):
    t = np.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def henyey_greenstein_np(cos_theta, g):
    k = 0.0795774715459
    return k * (1.0 - g * g) / np.power(1.0 + g * g - 2.0 * g * cos_theta, 1.5)


def height_fraction_np(r):
    return np.clip((r - SKY_B_RADIUS) / (SKY_T_RADIUS - SKY_B_RADIUS), 0.0, 1.0)


def mix_gradients_np(cloud_type):
    stratus_g = np.array([0.02, 0.05, 0.09, 0.11])
    strato_g = np.array([0.02, 0.2, 0.48, 0.625])
    cumulus_g = np.array([0.01, 0.0625, 0.78, 1.0])
    stratus = 1.0 - np.clip(cloud_type * 2.0, 0.0, 1.0)
    strato = 1.0 - np.abs(cloud_type - 0.5) * 2.0
    cumulus = np.clip(cloud_type - 0.5, 0.0, 1.0) * 2.0
    return (
        stratus_g * stratus[..., None]
        + strato_g * strato[..., None]
        + cumulus_g * cumulus[..., None]
    )


def density_height_gradient_np(h, cloud_type):
    g = mix_gradients_np(cloud_type)
    return smoothstep_np(g[..., 0], g[..., 1], h) - smoothstep_np(g[..., 2], g[..., 3], h)


def intersect_sphere_far_np(pos, dir, r):
    """Far-root solver (`clouds.glsl:97-105`)."""
    a = np.sum(dir * dir, axis=-1)
    b = 2.0 * np.sum(dir * pos, axis=-1)
    c = np.sum(pos * pos, axis=-1) - r * r
    d = np.sqrt(b * b - 4.0 * a * c)
    return np.maximum(-b - d, -b + d) / (2.0 * a)


def density_np(p, weather, mip, params, large_pyr, small_pyr):
    """Schneider density model (`clouds.glsl:107-137`). p [...,3]; weather [...,3]."""
    hf = height_fraction_np(np.linalg.norm(p, axis=-1))
    p = p.copy()
    p[..., [0, 2]] += 20.0 * np.asarray(params["cloud_pos"]) * 0.6

    n = sample3d_lod_np(large_pyr, p * 0.00008, mip - 2.0)
    fbm = n[..., 1] * 0.625 + n[..., 2] * 0.25 + n[..., 3] * 0.125

    g = density_height_gradient_np(hf, weather[..., 0])
    base_cloud = remap_np(n[..., 0], -(1.0 - fbm), 1.0, 0.0, 1.0)
    weather_coverage = params["cloud_coverage"] * weather[..., 2]
    # Epsilon-guarded denominator mirroring the engine (the GLSL divides by
    # zero where coverage is 0; GPU min/max clamps absorb the NaN to 0).
    base_cloud = (base_cloud * g - (1.0 - weather_coverage)) / np.maximum(
        weather_coverage, 1e-6
    )
    base_cloud = base_cloud * weather_coverage

    p[..., [0, 2]] -= np.asarray(params["detailed_pos"]) * 40.0
    p[..., 1] -= params["time"] * 40.0

    hn = sample3d_lod_np(small_pyr, p * 0.001, mip)
    hfbm = hn[..., 0] * 0.625 + hn[..., 1] * 0.25 + hn[..., 2] * 0.125
    hfbm = hfbm + (1.0 - 2.0 * hfbm) * np.clip(hf * 4.0, 0.0, 1.0)
    base_cloud = remap_np(base_cloud, hfbm * 0.4 * hf, 1.0, 0.0, 1.0)
    return np.power(np.clip(base_cloud, 0.0, 1.0), (1.0 - hf) * 0.8 + 0.5)


def get_val_from_sky_lut_np(sky_lut_img, ray_dir):
    """`clouds.glsl:49-57` (uses the truncated PI constant)."""
    ray_dir = np.asarray(ray_dir, dtype=np.float64)
    phi = np.arctan2(ray_dir[..., 2], ray_dir[..., 0])
    theta = np.arcsin(np.clip(ray_dir[..., 1], -1.0, 1.0))
    u = phi / PI_CLOUDS * 0.5 + 0.5
    v = np.sqrt(np.abs(theta) / (PI_CLOUDS * 0.5)) * np.sign(theta) * 0.5 + 0.5
    uv = np.stack(np.broadcast_arrays(u, v), axis=-1)
    return sample2d_np(sky_lut_img, uv, wrap="clamp")[..., :3]


def cloud_march_ref(dirs, params, large_pyr, small_pyr, weather_img, sky_lut_img,
                    steps=128):
    """Full cloud kernel for a batch of world directions (`clouds.glsl:139-237`).

    dirs: [..., 3] world (y-up) unit directions. Returns [..., 4] (L.rgb, alpha).
    params: dict with cloud_pos, detailed_pos, weather_pos (each 2-vec),
    time, density, cloud_coverage, light_direction (3-vec toward sun),
    light_energy, light_color (3-vec linear), ground_color (3-vec).

    The `if (t > 0)` guard around lighting (`clouds.glsl:184`) is a pure
    optimization — when t == 0 every guarded update is an exact no-op — so this
    oracle evaluates unconditionally (bit-identical in exact arithmetic).
    """
    dirs = np.asarray(dirs, dtype=np.float64)
    shape = dirs.shape[:-1]

    cam = np.array([0.0, G_RADIUS, 0.0])
    above = dirs[..., 1] > 0.0

    # Avoid NaNs for below-horizon rays; masked out at the end.
    safe_dir = np.where(above[..., None], dirs, np.array([0.0, 1.0, 0.0]))
    start = cam + safe_dir * intersect_sphere_far_np(cam, safe_dir, SKY_B_RADIUS)[..., None]
    end = cam + safe_dir * intersect_sphere_far_np(cam, safe_dir, SKY_T_RADIUS)[..., None]
    shelldist = np.linalg.norm(end - start, axis=-1)

    ss = shelldist / steps  # length of dir * shelldist / steps
    ndir = safe_dir  # already unit length

    p = start + ndir * (hash_np(start * 10.0) * ss)[..., None]

    t_dist = SKY_T_RADIUS - SKY_B_RADIUS
    lss = t_dist / 64.0
    ldir = np.asarray(params["light_direction"], dtype=np.float64)
    ldir = ldir / np.linalg.norm(ldir)

    T = np.ones(shape)
    alpha = np.zeros(shape)
    L = np.zeros(shape + (3,))

    costheta = np.sum(ldir * ndir, axis=-1)
    phase = np.maximum(
        np.maximum(
            henyey_greenstein_np(costheta, 0.6),
            henyey_greenstein_np(costheta, 0.4 - 1.4 * ldir[1]),
        ),
        henyey_greenstein_np(costheta, -0.2),
    )

    atmosphere_sun = (
        get_val_from_sky_lut_np(sky_lut_img, np.asarray(params["light_direction"]))
        * 0.1
        * params["light_energy"]
        * np.asarray(params["light_color"])
    )
    amb_dir = np.array([1.0, 1.0, 0.0]) / np.sqrt(2.0)
    atmosphere_ambient = get_val_from_sky_lut_np(sky_lut_img, amb_dir) * 0.05
    atmosphere_ambient = 0.5 * (
        atmosphere_ambient + np.linalg.norm(atmosphere_ambient)
    )
    gnd_dir = np.array([1.0, -1.0, 0.0]) / np.sqrt(2.0)
    atmosphere_ground = get_val_from_sky_lut_np(sky_lut_img, gnd_dir) * 5.0 * 0.05
    atmosphere_ground = 0.5 * (
        atmosphere_ground
        + np.asarray(params["ground_color"]) * np.linalg.norm(atmosphere_ground)
    )

    weather_scale = 0.00006
    weather_pos = np.asarray(params["weather_pos"])

    for _ in range(steps):
        p = p + ndir * ss[..., None]
        weather_sample = sample2d_np(
            weather_img, p[..., [0, 2]] * weather_scale + 0.5 + weather_pos
        )
        hf = height_fraction_np(np.linalg.norm(p, axis=-1))

        t = density_np(p, weather_sample, 0.0, params, large_pyr, small_pyr)
        dt = np.exp(-params["density"] * t * ss)

        lp = p.copy()
        cd = np.zeros(shape)
        for j in range(6):
            lp = lp + (ldir + RANDOM_VECTORS[j] * float(j)) * lss
            lweather = sample2d_np(
                weather_img, lp[..., [0, 2]] * weather_scale + 0.5 + weather_pos
            )
            cd += density_np(lp, lweather, float(j), params, large_pyr, small_pyr)

        # Distant sample; note: its weather lookup omits + weather_pos
        # (`clouds.glsl:197`) — shipped behavior, reproduced as-is.
        lp = p + ldir * (18.0 * lss)
        lheight_fraction = height_fraction_np(np.linalg.norm(lp, axis=-1))
        lweather = sample2d_np(weather_img, lp[..., [0, 2]] * weather_scale + 0.5)
        lt = np.power(
            density_np(lp, lweather, 5.0, params, large_pyr, small_pyr),
            (1.0 - lheight_fraction) * 0.8 + 0.5,
        )
        cd += lt

        beers = np.exp(-params["density"] * cd * lss * 3.0)
        powder = 1.0 - np.exp(-params["density"] * cd * lss * 3.0 * 2.0)
        beers_total = 2.0 * beers * powder

        ambient = atmosphere_ground + (atmosphere_ambient - atmosphere_ground) * \
            smoothstep_np(0.0, 1.0, hf)[..., None]
        alpha = alpha + (1.0 - dt) * (1.0 - alpha)
        radiance = (ambient + (beers_total * phase)[..., None] * atmosphere_sun) * t[..., None]
        L = L + T[..., None] * (radiance - radiance * dt[..., None]) / np.maximum(
            1e-7, t
        )[..., None]
        T = T * dt

    alpha = np.clip(alpha, 0.0, 1.0)
    out = np.concatenate([L, alpha[..., None]], axis=-1)
    return np.where(above[..., None], out, 0.0)


# ----------------------------------------------------------------------------
# Composite / display shader (`clouds.gdshader`)

GROUND_RADIUS_MM = 6.360
ATMOSPHERE_RADIUS_MM = 6.460
VIEW_POS_MM = np.array([0.0, GROUND_RADIUS_MM + 0.0002, 0.0])
TLUT_RES = np.array([256.0, 64.0])


def _oct_wrap_np(v):
    sign_val = np.where(v >= 0.0, 1.0, -1.0)
    return (1.0 - np.abs(v[..., ::-1])) * sign_val


def vec3_to_oct_np(e):
    """`clouds.gdshader:22-32`; e in oct (z-up) frame."""
    e = e / np.sum(np.abs(e), axis=-1, keepdims=True)
    exy = np.where(e[..., 2:3] >= 0.0, e[..., :2], _oct_wrap_np(e[..., :2]))
    ny = exy[..., 1] * 0.5 + 0.5
    nx = exy[..., 0] * 0.5 + ny
    ny2 = exy[..., 0] * -0.5 + ny
    return np.stack([nx, ny2], axis=-1)


def oct_to_vec3_np(e):
    """`clouds.glsl:248-256`; returns oct (z-up) frame unit vectors."""
    nx = e[..., 0] - e[..., 1]
    ny = (e[..., 0] + e[..., 1]) - 1.0
    nz = 1.0 - np.abs(nx) - np.abs(ny)
    nxy = np.stack([nx, ny], axis=-1)
    nxy = np.where(nz[..., None] >= 0.0, nxy, _oct_wrap_np(nxy))
    n = np.concatenate([nxy, nz[..., None]], axis=-1)
    return n / np.linalg.norm(n, axis=-1, keepdims=True)


def sky_lut_sample_blend_np(sky_from, sky_to, ray_dir, blend_amount):
    """`clouds.gdshader:34-45` — note the /50 exposure constant and the full-
    precision PI (Godot shader built-in, unlike clouds.glsl's 3.141592)."""
    phi = np.arctan2(ray_dir[..., 2], ray_dir[..., 0])
    theta = np.arcsin(np.clip(ray_dir[..., 1], -1.0, 1.0))
    u = phi / np.pi * 0.5 + 0.5
    v = np.sqrt(np.abs(theta) / (np.pi * 0.5)) * np.sign(theta) * 0.5 + 0.5
    uv = np.stack(np.broadcast_arrays(u, v), axis=-1)
    a = sample2d_np(sky_from, uv, wrap="clamp")[..., :3]
    b = sample2d_np(sky_to, uv, wrap="clamp")[..., :3]
    return (a + (b - a) * blend_amount) / 50.0


def sun_with_bloom_np(ray_dir, sun_dir, sun_disk_scale):
    """`clouds.gdshader:47-59`."""
    sun_solid_angle = sun_disk_scale * 0.53 * np.pi / 180.0
    min_sun_cos_theta = np.cos(sun_solid_angle)
    cos_theta = np.sum(ray_dir * sun_dir, axis=-1)
    offset = min_sun_cos_theta - cos_theta
    # Clamp for the masked-out inside-disk branch (avoids exp overflow; the
    # GLSL early-returns 1.0 there).
    offset_pos = np.maximum(offset, 0.0)
    gaussian_bloom = np.exp(-offset_pos * 50000.0) * 0.5
    inv_bloom = 1.0 / (0.02 + offset_pos * 300.0) * 0.01
    bloom = gaussian_bloom + inv_bloom
    return np.where(cos_theta >= min_sun_cos_theta, 1.0, bloom)[..., None] * np.ones(3)


def get_val_from_tlut_np(tlut, pos_mm, sun_dir):
    """`clouds.gdshader:77-85` (megameter units)."""
    height = np.linalg.norm(pos_mm, axis=-1)
    up = pos_mm / height[..., None]
    sun_cos_zenith = np.sum(up * sun_dir, axis=-1)
    u = TLUT_RES[0] * np.clip(0.5 + 0.5 * sun_cos_zenith, 0.0, 1.0) / TLUT_RES[0]
    v = (
        TLUT_RES[1]
        * np.clip((height - GROUND_RADIUS_MM) / (ATMOSPHERE_RADIUS_MM - GROUND_RADIUS_MM), 0.0, 1.0)
        / TLUT_RES[1]
    )
    uv = np.stack(np.broadcast_arrays(u, v), axis=-1)
    return sample2d_np(tlut, uv, wrap="clamp")[..., :3]


def composite_ref(eyedir, cloud_from, cloud_to, sky_from, sky_to, tlut,
                  blend_amount, sun_disk_scale, sun_dir):
    """Per-pixel composite (`clouds.gdshader:87-116`). eyedir [...,3] world."""
    eyedir = np.asarray(eyedir, dtype=np.float64)
    norm = eyedir.copy()
    norm[..., 1] = np.maximum(0.0, norm[..., 1])
    # Guard the straight-down degenerate case like the engine compositor
    # (those pixels are fully horizon-faded).
    n_len = np.linalg.norm(norm, axis=-1, keepdims=True)
    norm = np.where(n_len > 0.0, norm / np.maximum(n_len, 1e-300), [1.0, 0.0, 0.0])

    oct_uv = vec3_to_oct_np(norm[..., [0, 2, 1]])
    blend_from = sample2d_np(cloud_from, oct_uv, wrap="clamp")
    blend_to = sample2d_np(cloud_to, oct_uv, wrap="clamp")
    clouds = blend_from + (blend_to - blend_from) * blend_amount

    # get_atmo (`clouds.gdshader:87-102`)
    view_pos = np.broadcast_to(VIEW_POS_MM, eyedir.shape)
    col = sky_lut_sample_blend_np(sky_from, sky_to, eyedir, blend_amount)
    sun_lum = sun_with_bloom_np(eyedir, sun_dir, sun_disk_scale)
    sun_lum = smoothstep_np(0.002, 1.0, sun_lum)
    hits_ground = ray_sphere_intersection_np(view_pos, eyedir, GROUND_RADIUS_MM) >= 0.0
    tl = get_val_from_tlut_np(tlut, view_pos, sun_dir)
    sun_lum = np.where(
        (np.linalg.norm(sun_lum, axis=-1) > 0.0)[..., None],
        np.where(hits_ground[..., None], 0.0, sun_lum * tl),
        sun_lum,
    )
    background = col + sun_lum

    color = background * (1.0 - clouds[..., 3:4]) + clouds[..., :3]
    fade = smoothstep_np(0.6, 1.0, 1.0 - eyedir[..., 1])[..., None]
    color = np.clip(color, 0.0, 100.0) + (
        np.clip(background, 0.0, 100.0) - np.clip(color, 0.0, 100.0)
    ) * fade
    return color
