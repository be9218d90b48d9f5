"""NumPy float64 oracle: independent transcriptions of the reference's GLSL
kernels, used as golden sources for the JAX/Pallas implementations.

The reference ships no tests (SURVEY.md §4); these transcriptions of
`cloud_sky/transmittance-lut.glsl`, `cloud_sky/sky-lut.glsl`,
`cloud_sky/clouds.glsl` and `cloud_sky/clouds.gdshader` are the ground truth
the engine is PSNR-gated against.
"""

from oracle.reference import (
    transmittance_lut_ref,
    sky_lut_ref,
    cloud_march_ref,
    composite_ref,
)

__all__ = [
    "transmittance_lut_ref",
    "sky_lut_ref",
    "cloud_march_ref",
    "composite_ref",
]
