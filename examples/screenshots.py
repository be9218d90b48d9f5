"""Render the three golden scenes (the analogs of the reference's
screenshots/Clouds.png, Dusk.png, Sunset.png) through the full engine.

    python examples/screenshots.py --out screenshots
"""

from __future__ import annotations

import argparse
import os

import numpy as np


SCENES = {
    # name: (sun elevation deg, sun azimuth deg, coverage)
    # Display chain = the reference scene's Environment (ACES white 3.53 +
    # sRGB OETF, utils/image.display_encode) — NO per-scene exposure.
    "clouds": (38.0, -25.0, 0.45),
    "dusk": (4.0, -95.0, 0.40),
    "sunset": (11.0, -60.0, 0.50),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="screenshots")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from cloudscape_tpu import CloudConfig, CloudSkyEngine, PerfConfig, SunState
    from cloudscape_tpu.utils.image import display_encode, write_png

    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from demo import camera_rays

    os.makedirs(args.out, exist_ok=True)

    for name, (elev, azim, coverage) in SCENES.items():
        e, a = np.radians(elev), np.radians(azim)
        # Face the sun azimuth (low-sun scenes want the warm horizon in frame).
        eyedirs = jnp.asarray(
            camera_rays(args.width, args.height, yaw=-a, pitch=0.22, fov=1.25),
            jnp.float32,
        )
        sun = np.array(
            [np.cos(e) * np.sin(a), np.sin(e), -np.cos(e) * np.cos(a)]
        )
        engine = CloudSkyEngine(
            perf=PerfConfig(texture_size=args.size, frames_to_update=16,
                            march_steps=args.steps),
            config=CloudConfig(cloud_coverage=coverage, sun_disk_scale=2.0,
                               ground_color=(0.270588, 0.188235, 0.027451, 1.0)),
            sun=SunState(direction=tuple(sun)),
        )
        engine.update_cycle(now=0.0)
        img = np.asarray(engine.render_view(eyedirs, deband=True))
        path = os.path.join(args.out, f"{name}.png")
        write_png(path, display_encode(img))
        print(f"{name}: sun elev {elev}° → {path}")


if __name__ == "__main__":
    main()
