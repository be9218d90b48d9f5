"""Configuration pytrees for the cloudscape engine.

Mirrors the user-facing parameter surface of the reference driver
(`cloud_sky/cloud_sky.gd:5-52` exports) and its derived-config invariants
(`cloud_sky.gd:109-115` texture-size divisibility auto-correction), as plain
frozen dataclasses instead of Godot `@export` properties persisted in `.tres`
resources (`cloud_sky/clouds_sky.tres:7-18`).

Static/shape-affecting settings (texture size, frame counts, step counts) live
in `PerfConfig`; everything dynamic that feeds kernels as traced scalars lives
in `CloudConfig` / `SunState` so jitted functions never retrace on parameter
changes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax

# Allowed amortization levels, mirroring the reference enum
# "Very Fast(4) / Fast(16) / Default(64) / Performance(256)"
# (`cloud_sky/cloud_sky.gd:36`).
FRAMES_TO_UPDATE_CHOICES = (4, 16, 64, 256)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CloudConfig:
    """Dynamic, user-tweakable cloud parameters (traced kernel inputs).

    Defaults follow the script defaults of `cloud_sky/cloud_sky.gd:5-33`; the
    shipped scene overrides coverage to 0.2, sun_disk_scale to 2.0 and
    ground_color to a brown (`cloud_sky/clouds_sky.tres:13-17`) — use
    `CloudConfig.demo_scene()` for those.
    """

    # Wind direction in radians; 0 = wind from +X ("north"), positive toward
    # +Y of the 2D wind plane (`cloud_sky.gd:7-10`, Vector2.from_angle).
    wind_direction: float = 0.0
    # Wind speed in m/s, nominally 0..120 (`cloud_sky.gd:12-17`).
    wind_speed: float = 1.0
    # Extinction scale (`cloud_sky.gd:19-20`).
    density: float = 0.05
    # Multiplies the weather-map coverage channel (`cloud_sky.gd:21-22`).
    cloud_coverage: float = 0.25
    # Extra weather scroll rate (`cloud_sky.gd:23-24`, used at `:178`).
    time_offset: float = 0.0
    # Forwarded to the composite stage (`cloud_sky.gd:27-31`).
    sun_disk_scale: float = 1.0
    # Tints the cloud-bottom ambient term (`cloud_sky.gd:32-33`,
    # `clouds.glsl:167`). RGBA, linear.
    ground_color: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)

    @staticmethod
    def demo_scene() -> "CloudConfig":
        """The shipped demo-scene values (`cloud_sky/clouds_sky.tres:11-17`)."""
        return CloudConfig(
            cloud_coverage=0.2,
            sun_disk_scale=2.0,
            ground_color=(0.270588, 0.188235, 0.027451, 1.0),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SunState:
    """Directional-light state pulled from the scene's sun.

    The reference reads these from a `DirectionalLight3D` once per texture swap
    (`cloud_sky/cloud_sky.gd:76-79`, injected by `cloud_sky/sun.gd:11-13`):
    direction = basis * (0, 0, 1) normalized (points *toward* the sun),
    energy, and color converted sRGB→linear.
    """

    # Unit vector toward the sun, world frame (y-up).
    direction: Tuple[float, float, float] = (0.0, -1.0, 0.0)
    energy: float = 1.0
    # Linear-space RGB (callers use `srgb_to_linear` when mirroring Godot,
    # `cloud_sky.gd:79`).
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)


def _static_field(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PerfConfig:
    """Static performance/shape settings (recompile on change).

    In the reference, changing these tears down and rebuilds all GPU resources
    (`cloud_sky.gd:35-50` setters → `cleanup()` + `update_performance()` +
    full warm re-init); here they are static jit arguments, so a change simply
    compiles a new executable.
    """

    # Hemisphere octahedral map edge length, 32..8192 step 32
    # (`cloud_sky.gd:44-45`). Must divide by sqrt(frames_to_update); use
    # `validate()` to apply the reference's auto-correction rule.
    texture_size: int = _static_field(default=768)
    # Amortization: full map refreshed over this many frames
    # (`cloud_sky.gd:35-42`). One of FRAMES_TO_UPDATE_CHOICES.
    frames_to_update: int = _static_field(default=64)
    # Primary march steps (`clouds.glsl:228-229`: fixed 128 in the reference;
    # the "fewer steps towards horizon" comment there is stale/unimplemented).
    march_steps: int = _static_field(default=128)
    # Secondary (sun) cone samples (`clouds.glsl:186`: fixed 6) plus one
    # distant sample (`clouds.glsl:195`).
    light_steps: int = _static_field(default=6)

    def validate(self) -> "PerfConfig":
        """Apply the reference's derived-config invariants.

        `texture_size` is clamped to a multiple of sqrt(frames_to_update)
        (`cloud_sky.gd:110-115`); invalid frames_to_update raises.
        """
        if self.frames_to_update not in FRAMES_TO_UPDATE_CHOICES:
            raise ValueError(
                f"frames_to_update must be one of {FRAMES_TO_UPDATE_CHOICES}, "
                f"got {self.frames_to_update}"
            )
        frames_sqrt = int(math.isqrt(self.frames_to_update))
        if self.texture_size < frames_sqrt:
            # Auto-correction (the reference's divisibility clamp) cannot
            # rescue a size with no positive multiple below it — raise
            # instead of silently deriving a non-positive tile region.
            raise ValueError(
                f"texture_size must be >= sqrt(frames_to_update) "
                f"({frames_sqrt}), got {self.texture_size}"
            )
        size = self.texture_size
        if size % frames_sqrt != 0:
            corrected = (size // frames_sqrt) * frames_sqrt
            return dataclasses.replace(self, texture_size=corrected)
        return self

    @property
    def update_region_size(self) -> int:
        """Edge of the square tile updated each frame (`cloud_sky.gd:110-111`)."""
        return self.texture_size // int(math.isqrt(self.frames_to_update))


# Geometry constants of the cloud shell (`clouds.glsl:42-45`), in meters.
GROUND_RADIUS = 6_000_000.0
SKY_B_RADIUS = 6_001_500.0  # bottom of cloud layer
SKY_T_RADIUS = 6_004_000.0  # top of cloud layer
