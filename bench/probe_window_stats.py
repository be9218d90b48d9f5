"""CPU probe: per-ray live-cell WINDOW statistics on the bench scene.

Quantifies the ceiling of folding per-ray [a,b] step windows into v3
(VERDICT r3 #3): v3's cell gate already skips dead cells anywhere on the
ray, so a window redistribution at budget S' only changes sample SPACING
inside the window. Cost ratio (v4/v3) at equal spacing = (S'/steps)/(b-a);
the lever only pays if mean window fraction >> S'/steps while holding
quality. Measures: window fraction (b-a), live-frac-within-window, and the
interior-dead fraction (cells inside the window that are dead = what the
cell gate saves and windowing alone cannot).
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import hemisphere_dirs
from cloudscape_tpu.models.density import MarchParams
from cloudscape_tpu.models.march_fast import (
    BrickPack, _cull_prepass, _ray_setup,
)
from cloudscape_tpu.models.packs import reference_noise_pack

W, H, STEPS, P = 1024, 512, 128, 32

noise = reference_noise_pack()
bp = BrickPack.from_noise(noise)
sun = np.array([0.3, 0.4, -0.85]); sun /= np.linalg.norm(sun)
params = MarchParams.create(
    cloud_pos=np.array([1.5, -0.3]), detailed_pos=np.array([0.4, 0.2]),
    weather_pos=np.array([0.01, 0.02]), time=12.5, cloud_coverage=0.35,
    light_direction=sun, ground_color=np.array([0.27, 0.19, 0.027]),
)
dirs = jnp.asarray(hemisphere_dirs(W, H)).reshape(-1, 3)
above, ndir, ss, p0, phase, _ = _ray_setup(dirs, params, STEPS)

prio, occ_cells, meta = _cull_prepass(
    above, ndir, ss, p0, params, bp, STEPS, P, 32768, (H, W),
    ray_stride=2, cell_margin=0.1)
occ = np.asarray(occ_cells)          # [n_coarse, P] dilated occupancy
gh, gw, stride = meta
ab = np.asarray(above).reshape(H, W)[::stride, ::stride].reshape(-1)
occ = occ & ab[:, None]
live_any = occ.any(axis=1)
occ_live = occ[live_any]
idx = np.arange(P)
first = np.where(occ_live, idx, P + 1).min(axis=1)
last = np.where(occ_live, idx, -1).max(axis=1)
span = (last - first + 1)                    # window in cells
live = occ_live.sum(axis=1)                  # live cells in window
frac_rays_live = live_any.mean()
wf = span / P                                # window fraction (b-a)
lw = live / span                             # live frac within window
interior_dead = (span - live) / P            # what the cell gate saves vs window

print(f"rays (coarse, stride {stride}): {occ.shape[0]}, live-any: "
      f"{frac_rays_live:.4f}")
print(f"window frac (b-a): mean={wf.mean():.3f} median={np.median(wf):.3f} "
      f"p10={np.percentile(wf,10):.3f} p90={np.percentile(wf,90):.3f}")
print(f"live cells / P   : mean={(live/P).mean():.3f}")
print(f"live frac within window: mean={lw.mean():.3f} "
      f"median={np.median(lw):.3f}")
print(f"interior-dead frac of P: mean={interior_dead.mean():.3f}")
# v4 cost model: window-redistributed at budget S', cell-gated in window
# space. samples_v4/samples_v3 = (S'/steps) / (b-a) per ray (same live
# length, spacing (b-a)L/S' vs L/steps), aggregated over live rays:
for sp in (128, 96, 64):
    ratio = (sp / STEPS) / np.maximum(wf, 1e-6)
    # spacing finer than v3 (ratio>1) adds cost; clip per-ray at the v3
    # sample count only if v4 would ALSO gate cells (it does).
    agg = float(np.average(np.minimum(ratio, 4.0), weights=live))
    print(f"v4@S'={sp}: live-sample cost ratio vs v3 ≈ {agg:.3f} "
          f"(spacing ratio; <1 = cheaper, quality ∝ 1/spacing)")
