"""cloudscape_tpu — a TPU-native volumetric cloudscape engine in JAX/Pallas.

A ground-up rebuild of the capabilities of clayjohn/godot-volumetric-cloud-demo-v2
(reference mounted read-only at /root/reference) designed TPU-first:

- the three Vulkan GLSL compute kernels (clouds.glsl, sky-lut.glsl,
  transmittance-lut.glsl) become jitted JAX stages: the raymarch is an
  XLA-gather brick-table design (prefix-product accumulation, occupancy
  compaction, coarse-cell gating) with Pallas kernels where they measurably
  win (accumulation, stream compaction, procedural noise) — a per-row Pallas
  gather march was measured ~200× below XLA's gather path and rejected
  (docs/PERF_NOTES.md);
- the Godot sky composite shader (clouds.gdshader) becomes a jitted
  view-sampling/composite stage;
- the GDScript orchestration (cloud_sky.gd, sky_lut.gd, transmittance_lut.gd,
  sun.gd) becomes a host-side engine driving donated-buffer temporal updates;
- the baked noise assets become on-device procedural generators (the reference's
  perlworlnoise.tga is absent from the mount, so this is mandatory);
- scaling beyond one chip is tile sharding over a `jax.sharding.Mesh` (rays are
  embarrassingly parallel; noise volumes and LUTs are replicated).

See SURVEY.md for the full structural analysis of the reference.
"""

from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState

__version__ = "0.1.0"

__all__ = [
    "CloudConfig",
    "PerfConfig",
    "SunState",
    "CloudSkyEngine",
    "__version__",
]


def __getattr__(name):
    # Lazy import: keeps `import cloudscape_tpu` light for ops-only users.
    if name == "CloudSkyEngine":
        from cloudscape_tpu.engine import CloudSkyEngine

        return CloudSkyEngine
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
