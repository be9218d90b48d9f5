"""CloudSkyEngine: host-side driver of the TPU cloudscape pipeline.

The TPU-native equivalent of the reference's orchestration layer
(`cloud_sky/cloud_sky.gd` + `sky_lut.gd` + `transmittance_lut.gd` + `sun.gd`):
owns the device-resident texture rings, schedules the amortized tile updates,
integrates wind, snapshots kernel parameters once per cycle, and exposes the
user API (sun/config setters, view rendering, save/restore).

Mapping from the reference (SURVEY.md §1 "TPU mapping"):
- render-thread marshalling (`call_on_render_thread`)  → jitted dispatches;
- Vulkan push constants                                → `MarchParams` pytree;
- storage-image binding + tile dispatch                → donated
  `lax.dynamic_update_slice` into a (3, N, N, 4) ring array;
- `Texture2DRD` handle rebinds for the display blend   → ring role indices;
- resource teardown on performance changes             → new jit executables.

State is one pytree: `save()`/`restore()` make checkpoint/resume explicit
(the reference reconstructs everything from `.tres` params + warm re-render;
SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import dataclasses
import time as _time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cloudscape_tpu.config import CloudConfig, PerfConfig, SunState
from cloudscape_tpu.models import atmosphere
from cloudscape_tpu.models.compositor import composite
from cloudscape_tpu.models.density import MarchParams, NoisePack
from cloudscape_tpu.models.march import march
from cloudscape_tpu.models.packs import reference_noise_pack
from cloudscape_tpu.ops.octmap import texel_directions
from cloudscape_tpu.temporal import FrameData, RingState


@partial(
    jax.jit,
    static_argnames=("texture_size", "region", "steps", "light_steps", "kernel"),
    donate_argnums=(0,),
)
def _update_tile(ring, tex_idx, x0, y0, params: MarchParams, noise, sky_img,
                 *, texture_size: int, region: int, steps: int,
                 light_steps: int, kernel: str = "reference"):
    """Render one region² tile into ring[tex_idx] at (x0, y0) — the analog of
    the reference's per-frame compute dispatch (`cloud_sky.gd:234-248`).

    The ring buffer is donated: XLA updates it in place, exactly like
    rendering into a bound storage image. tex_idx/x0/y0 are traced so a single
    executable serves every tile of every cycle. kernel selects the
    scan-based reference march ("reference", takes a NoisePack) or the
    brick-table fast march ("fast", takes a BrickPack).
    """
    dirs = texel_directions(texture_size, x0=x0, y0=y0, width=region, height=region)
    if kernel == "fast":
        from cloudscape_tpu.models.march_fast import march_bricks

        # Generous compaction capacity: engine tiles are small, so headroom
        # costs little. 0.5 covers every measured scene with ~9× margin, but
        # is NOT a hard guarantee: an optically thin overcast scene (low
        # density, coverage≈1) can keep >50% of (ray, step) samples active,
        # at which point overflowed samples lose their sun term (gated in
        # tests/test_engine.py::test_tile_capacity_thin_overcast).
        tile = march_bricks(dirs, params, noise, sky_img, steps=steps,
                            light_steps=light_steps,
                            chunk=min(region * region, 16384),
                            capacity_frac=0.5)
    else:
        tile = march(dirs, params, noise, sky_img, steps=steps,
                     light_steps=light_steps)
    return jax.lax.dynamic_update_slice(ring, tile[None], (tex_idx, y0, x0, 0))


@partial(
    jax.jit,
    static_argnames=("texture_size", "region", "steps", "light_steps",
                     "kernel", "mesh", "axis_name"),
    donate_argnums=(0,),
)
def _update_tile_mesh(ring, tex_idx, x0, y0, params: MarchParams, noise,
                      sky_img, *, texture_size: int, region: int, steps: int,
                      light_steps: int, kernel: str, mesh, axis_name: str):
    """Multi-chip tile update: the tile's rays are sharded over the mesh
    rows (shard_map, zero collectives inside the march — rays share only
    replicated read-only inputs), the ring stays replicated (28 MB at the
    reference's 768² default — cheaper than sharding state that every
    display composite reads in full)."""
    from jax.sharding import PartitionSpec as P

    from cloudscape_tpu.models.march_fast import march_bricks

    dirs = texel_directions(texture_size, x0=x0, y0=y0, width=region,
                            height=region)

    def shard_fn(d, p, n, s):
        if kernel == "fast":
            return march_bricks(d, p, n, s, steps=steps,
                                light_steps=light_steps,
                                chunk=max(d.shape[0] * d.shape[1], 1),
                                capacity_frac=0.5)
        return march(d, p, n, s, steps=steps, light_steps=light_steps)

    tile = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P()),
        out_specs=P(axis_name),
    )(dirs, params, noise, sky_img)
    return jax.lax.dynamic_update_slice(ring, tile[None], (tex_idx, y0, x0, 0))


@partial(
    jax.jit,
    static_argnames=("texture_size", "region", "steps", "light_steps",
                     "kernel", "count"),
    donate_argnums=(0,),
)
def _update_tiles_batch(ring, tex_idx, start_tile, params: MarchParams, noise,
                        sky_img, *, texture_size: int, region: int,
                        steps: int, light_steps: int, kernel: str,
                        count: int):
    """Render `count` consecutive tiles of the row-major sweep in ONE
    dispatch (a fori_loop of tile updates over the donated ring).

    The reference necessarily dispatches one tile per frame; for batch /
    offline / warm-start use the whole cycle collapses into a single
    executable — no per-tile host round trips.
    """
    tiles_per_row = texture_size // region

    def body(k, ring):
        tile = start_tile + k
        x0 = (tile % tiles_per_row) * region
        y0 = (tile // tiles_per_row) * region
        dirs = texel_directions(texture_size, x0=x0, y0=y0,
                                width=region, height=region)
        if kernel == "fast":
            from cloudscape_tpu.models.march_fast import march_bricks

            out = march_bricks(dirs, params, noise, sky_img, steps=steps,
                               light_steps=light_steps,
                               chunk=min(region * region, 16384),
                               capacity_frac=0.5)
        else:
            out = march(dirs, params, noise, sky_img, steps=steps,
                        light_steps=light_steps)
        return jax.lax.dynamic_update_slice(
            ring, out[None], (tex_idx, y0, x0, 0)
        )

    return jax.lax.fori_loop(0, count, body, ring)


@partial(jax.jit, donate_argnums=(0,))
def _update_sky_lut_slot(sky_ring, slot_idx, tlut, sun_direction):
    """Render the 200×100 sky-view LUT into ring[slot_idx]
    (`sky_lut.gd:122-141`)."""
    img = atmosphere.sky_lut(tlut, sun_direction)
    return jax.lax.dynamic_update_slice(
        sky_ring, img[None], (slot_idx, 0, 0, 0)
    )


class CloudSkyEngine:
    """User-facing engine with the reference's parameter surface and
    scheduling semantics."""

    SKY_LUT_SHAPE = (100, 200, 4)

    def __init__(
        self,
        perf: PerfConfig = PerfConfig(),
        config: CloudConfig = CloudConfig(),
        sun: SunState = SunState(direction=(0.0, 0.5, -1.0)),
        noise: Optional[NoisePack] = None,
        now: float = 0.0,
        kernel: str = "fast",
        mesh=None,
    ):
        """kernel: "fast" (brick-table, occupancy-compacted march — the
        production path) or "reference" (scan-based march, the numerics
        anchor; both gated against the f64 oracle).

        mesh: an optional `jax.sharding.Mesh` — tile updates compute with
        rays sharded over the mesh's first axis (ICI), state replicated.
        The tile edge must divide the mesh size."""
        if kernel not in ("fast", "reference"):
            raise ValueError(f"unknown kernel {kernel!r}")
        self.kernel = kernel
        self.mesh = mesh
        self.perf = perf.validate()
        if mesh is not None and self.perf.update_region_size % mesh.devices.size:
            raise ValueError(
                f"update_region_size {self.perf.update_region_size} must "
                f"divide the mesh size {mesh.devices.size}"
            )
        self.config = config
        self.sun = sun
        self.noise = noise if noise is not None else reference_noise_pack()
        if kernel == "fast":
            from cloudscape_tpu.models.march_fast import BrickPack

            self._bricks = BrickPack.from_noise(self.noise)
        else:
            self._bricks = None

        # Baked once at load, like `transmittance_lut.gd:51-78`.
        self.transmittance = atmosphere.transmittance_lut()

        n = self.perf.texture_size
        self.cloud_ring = jnp.zeros((3, n, n, 4), jnp.float32)
        self.sky_ring = jnp.zeros((3,) + self.SKY_LUT_SHAPE, jnp.float32)

        self.frame_data = FrameData()
        self.ring = RingState()
        self._start_time: Optional[float] = None
        self.needs_full_sky_init = True
        self._sky_lut_needs_full_update = True  # sky_lut.gd `needs_full_update`
        self._refresh_frame_data(now)

        # Validate-then-enable, like the reference's invalid-shader guard
        # (`cloud_sky.gd:362-364`: a kernel that fails to build sets
        # can_run=false and the driver no-ops instead of crashing).
        self.can_run = self._validate_kernels()

    def _validate_kernels(self) -> bool:
        """Abstract-eval the tile-update kernel with this engine's shapes —
        the mesh-sharded variant when a mesh is configured, since that is the
        kernel the render loop will actually dispatch; a trace/shape error
        disables the engine rather than raising from the loop."""
        try:
            noise_arg = self._bricks if self.kernel == "fast" else self.noise
            common = dict(
                texture_size=self.perf.texture_size,
                region=self.perf.update_region_size,
                steps=self.perf.march_steps,
                light_steps=self.perf.light_steps,
                kernel=self.kernel,
            )
            if self.mesh is not None:
                fn = partial(_update_tile_mesh, mesh=self.mesh,
                             axis_name=self.mesh.axis_names[0], **common)
            else:
                fn = partial(_update_tile, **common)
            jax.eval_shape(
                fn,
                self.cloud_ring, jnp.int32(0), jnp.int32(0), jnp.int32(0),
                self._march_params, noise_arg, self.sky_ring[0],
            )
            return True
        except Exception as e:
            print(f"cloudscape_tpu: kernel validation failed, engine disabled: {e}")
            return False

    # ------------------------------------------------------------------ API

    def set_sun(self, direction, energy: float = 1.0, color=(1.0, 1.0, 1.0),
                srgb_color: bool = False) -> None:
        """The `sun.gd` binding: update the light; picked up at the next
        texture-swap boundary (`cloud_sky.gd:165-167`)."""
        self.sun = SunState(tuple(direction), float(energy), tuple(color))
        self._sun_srgb = srgb_color

    def set_config(self, config: CloudConfig) -> None:
        """Dynamic parameter change; snapshotted at the next cycle boundary
        (FrameData semantics)."""
        self.config = config

    def set_performance(self, perf: PerfConfig) -> None:
        """Performance-settings change — the analog of the reference's
        `frames_to_update` / `texture_size` setters (`cloud_sky.gd:35-50`):
        tear down the texture rings, re-derive tile math (with the
        divisibility auto-correction), and request a full warm re-init.
        Jitted executables for the new shapes compile on the next tick."""
        corrected = perf.validate()
        if corrected.texture_size != perf.texture_size:
            # `cloud_sky.gd:114` prints the same correction notice.
            print(
                "cloudscape_tpu: texture_size is not a multiple of "
                f"sqrt(frames_to_update), changing to: {corrected.texture_size}"
            )
        if self.mesh is not None and \
                corrected.update_region_size % self.mesh.devices.size:
            raise ValueError(
                f"update_region_size {corrected.update_region_size} must "
                f"divide the mesh size {self.mesh.devices.size}"
            )
        self.perf = corrected
        n = self.perf.texture_size
        self.cloud_ring = jnp.zeros((3, n, n, 4), jnp.float32)
        self.ring.reset()
        self.request_full_sky_init()
        self.can_run = self._validate_kernels()

    def request_full_sky_init(self) -> None:
        """`cloud_sky.gd:120-121`."""
        self.needs_full_sky_init = True

    # ------------------------------------------------------------ scheduling

    def _now(self, now: Optional[float]) -> float:
        if now is not None:
            return float(now)
        if self._start_time is None:
            self._start_time = _time.monotonic()
        return _time.monotonic() - self._start_time

    def _refresh_frame_data(self, now: float) -> None:
        """`_update_per_frame_data` (`cloud_sky.gd:165-187`) minus the LUT
        dispatch (handled by the caller)."""
        self.frame_data.update_light_data(self.sun, getattr(self, "_sun_srgb", False))
        self.frame_data.update_config(self.config)
        self.frame_data.integrate_wind(now)
        self._march_params = self.frame_data.to_march_params()

    def _render_sky_lut(self) -> None:
        """One LUT render + ring rotation (`sky_lut.gd:122-148`), three times
        on first use so all slots are valid (`sky_lut.gd:49-52`)."""
        renders = 3 if self._sky_lut_needs_full_update else 1
        self._sky_lut_needs_full_update = False
        sun_dir = jnp.asarray(self.frame_data.light_direction, jnp.float32)
        for _ in range(renders):
            self.sky_ring = _update_sky_lut_slot(
                self.sky_ring, self.ring.sky_lut_current, self.transmittance, sun_dir
            )
            self.ring.advance_sky_lut()

    def _batch_remaining_tiles(self) -> None:
        """Render every remaining tile of the current cycle in one dispatch
        and advance the cursor/frame state to the cycle end."""
        n_frames = self.perf.frames_to_update
        region = self.perf.update_region_size
        tiles_per_row = self.perf.texture_size // region
        x, y = self.ring.update_position
        start_tile = (y // region) * tiles_per_row + (x // region)
        remaining = n_frames - self.ring.frame
        if remaining <= 0:
            return
        self.cloud_ring = _update_tiles_batch(
            self.cloud_ring,
            jnp.int32(self.ring.texture_to_update),
            jnp.int32(start_tile),
            self._march_params,
            self._bricks if self.kernel == "fast" else self.noise,
            self.sky_ring[self.ring.cloud_kernel_sky_slot],
            texture_size=self.perf.texture_size,
            region=region,
            steps=self.perf.march_steps,
            light_steps=self.perf.light_steps,
            kernel=self.kernel,
            count=remaining,
        )
        self.ring.update_position = (0, 0)
        self.ring.frame = n_frames
        self._blend_amount = 1.0

    def update_cycle(self, now: Optional[float] = None) -> None:
        """Complete one full amortized cycle in a single device dispatch.

        Batch/offline counterpart of the per-frame `update_sky` (the
        reference has no analog — it must spread work over frames for a
        60 Hz display; a serving deployment rendering discrete frames wants
        the whole hemisphere per call without per-tile host round trips).
        Scheduling semantics (rotation, FrameData snapshot, LUT phasing)
        are identical.
        """
        if not getattr(self, "can_run", True):
            return
        now = self._now(now)
        if self.needs_full_sky_init:
            self.needs_full_sky_init = False
            self.initialize_sky(now)
        if self.ring.frame >= self.perf.frames_to_update:
            self.ring.rotate_cloud()
            self._refresh_frame_data(now)
            self._render_sky_lut()
        self._batch_remaining_tiles()

    def initialize_sky(self, now: float) -> None:
        """Warm start (`cloud_sky.gd:123-127`): two full synchronous cycles
        so the sky is complete on the first visible frame — batched into two
        dispatches."""
        self._refresh_frame_data(now)
        self._render_sky_lut()
        for _ in range(2):
            if self.ring.frame >= self.perf.frames_to_update:
                self.ring.rotate_cloud()
                self._refresh_frame_data(now)
                self._render_sky_lut()
            self._batch_remaining_tiles()

    def update_sky(self, now: Optional[float] = None) -> None:
        """One per-frame tick (`cloud_sky.gd:129-163`): rotate rings at cycle
        boundaries, refresh FrameData + sky LUT, dispatch one tile update,
        advance the cursor."""
        if not getattr(self, "can_run", True):  # `cloud_sky.gd:130-131`
            return
        now = self._now(now)
        if self.needs_full_sky_init:
            self.needs_full_sky_init = False
            self.initialize_sky(now)

        if self.ring.frame >= self.perf.frames_to_update:
            self.ring.rotate_cloud()
            self._refresh_frame_data(now)
            self._render_sky_lut()

        # Captured before the dispatch, exactly like `cloud_sky.gd:152`: the
        # display this frame blends with frame/N for the tile count *before*
        # this update.
        self._blend_amount = self.ring.blend_amount(self.perf.frames_to_update)

        common = dict(
            texture_size=self.perf.texture_size,
            region=self.perf.update_region_size,
            steps=self.perf.march_steps,
            light_steps=self.perf.light_steps,
            kernel=self.kernel,
        )
        args = (
            self.cloud_ring,
            jnp.int32(self.ring.texture_to_update),
            jnp.int32(self.ring.update_position[0]),
            jnp.int32(self.ring.update_position[1]),
            self._march_params,
            self._bricks if self.kernel == "fast" else self.noise,
            self.sky_ring[self.ring.cloud_kernel_sky_slot],
        )
        if self.mesh is not None:
            self.cloud_ring = _update_tile_mesh(
                *args, mesh=self.mesh, axis_name=self.mesh.axis_names[0],
                **common,
            )
        else:
            self.cloud_ring = _update_tile(*args, **common)
        self.ring.advance_cursor(self.perf.update_region_size, self.perf.texture_size)

    # --------------------------------------------------------------- display

    @property
    def blend_amount(self) -> float:
        return getattr(
            self, "_blend_amount", self.ring.blend_amount(self.perf.frames_to_update)
        )

    def render_view(self, eyedirs, deband: bool = False) -> jax.Array:
        """Composite the current sky for arbitrary view directions
        (`clouds.gdshader:104-116` equivalent). eyedirs: [..., 3] world.
        deband adds the reference's zero-mean display dither
        (`clouds.gdshader:1` `render_mode use_debanding`)."""
        b0, b1 = self.ring.sky_back_textures
        return composite(
            jnp.asarray(eyedirs, jnp.float32),
            self.cloud_ring[self.ring.texture_to_blend_from],
            self.cloud_ring[self.ring.texture_to_blend_to],
            self.sky_ring[b0],
            self.sky_ring[b1],
            self.transmittance,
            jnp.float32(self.blend_amount),
            jnp.asarray(self.frame_data.light_direction, jnp.float32),
            jnp.float32(self.config.sun_disk_scale),
            deband=deband,
        )

    def render_frame(self, eyedirs, now: Optional[float] = None,
                     amortized: bool = True) -> jax.Array:
        """One-call serving API: advance the sim and composite a camera frame.

        amortized=True ticks one tile (the reference's per-display-frame
        cost); amortized=False completes a whole cycle first (discrete-frame
        rendering, e.g. offline sequences).
        """
        if amortized:
            self.update_sky(now)
        else:
            self.update_cycle(now)
        return self.render_view(eyedirs)

    def render_full_hemisphere(self, params: Optional[MarchParams] = None,
                               sky_img=None) -> jax.Array:
        """Monolithic full-map render (no amortization) — the benchmark path
        and the oracle for temporal-consistency tests."""
        if params is None:
            params = self._march_params
        if sky_img is None:
            sky_img = self.sky_ring[self.ring.cloud_kernel_sky_slot]
        dirs = texel_directions(self.perf.texture_size)
        if self.kernel == "fast":
            from cloudscape_tpu.models.march_fast import march_bricks

            return march_bricks(
                dirs, params, self._bricks, sky_img,
                steps=self.perf.march_steps,
                light_steps=self.perf.light_steps,
                chunk=min(self.perf.update_region_size ** 2, 16384),
                capacity_frac=0.5,
            )
        return march(dirs, params, self.noise, sky_img,
                     steps=self.perf.march_steps,
                     light_steps=self.perf.light_steps)

    # ------------------------------------------------------------ checkpoint

    def save(self) -> Dict[str, Any]:
        """Checkpointable state pytree: parameters, wind integrals, ring
        indices, and the texture rings (SURVEY.md §5 checkpoint/resume)."""
        return {
            "perf": dataclasses.asdict(self.perf),
            "config": dataclasses.asdict(self.config),
            "sun": dataclasses.asdict(self.sun),
            "frame_data": dataclasses.asdict(self.frame_data),
            "ring": dataclasses.asdict(self.ring),
            "cloud_ring": np.asarray(self.cloud_ring),
            "sky_ring": np.asarray(self.sky_ring),
            "sky_lut_needs_full_update": self._sky_lut_needs_full_update,
            "needs_full_sky_init": self.needs_full_sky_init,
            "blend_amount": self.blend_amount,
        }

    def save_file(self, path: str) -> None:
        """Persist the checkpoint to one .npz (arrays + JSON header)."""
        import json

        state = self.save()
        header = {
            k: v for k, v in state.items() if k not in ("cloud_ring", "sky_ring")
        }
        for section in ("frame_data",):
            header[section] = {
                k: (v.tolist() if isinstance(v, np.ndarray) else v)
                for k, v in header[section].items()
            }
        np.savez_compressed(
            path,
            cloud_ring=state["cloud_ring"],
            sky_ring=state["sky_ring"],
            header=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
        )

    def load_file(self, path: str) -> None:
        import json

        with np.load(path) as z:
            header = json.loads(bytes(z["header"]).decode())
            header["cloud_ring"] = z["cloud_ring"]
            header["sky_ring"] = z["sky_ring"]
        self.restore(header)

    def restore(self, state: Dict[str, Any]) -> None:
        self.perf = PerfConfig(**state["perf"]).validate()
        self.config = CloudConfig(**{
            k: tuple(v) if isinstance(v, (list, tuple)) else v
            for k, v in state["config"].items()
        })
        self.sun = SunState(**{
            k: tuple(v) if isinstance(v, (list, tuple)) else v
            for k, v in state["sun"].items()
        })
        fd = FrameData()
        for k, v in state["frame_data"].items():
            setattr(fd, k, np.asarray(v) if isinstance(v, (list, np.ndarray)) else v)
        self.frame_data = fd
        ring = RingState()
        for k, v in state["ring"].items():
            setattr(ring, k, tuple(v) if isinstance(v, (list, tuple)) else v)
        self.ring = ring
        self.cloud_ring = jnp.asarray(state["cloud_ring"])
        self.sky_ring = jnp.asarray(state["sky_ring"])
        self._sky_lut_needs_full_update = state["sky_lut_needs_full_update"]
        self._blend_amount = state.get("blend_amount", 0.0)
        # A checkpoint taken before the first tick must restore to an engine
        # that still performs the warm start — otherwise the sky fades in from
        # black instead of being complete on the first visible frame. Old
        # checkpoints (no flag recorded): infer from whether the cloud ring
        # holds any rendered content.
        self.needs_full_sky_init = state.get(
            "needs_full_sky_init",
            not bool(np.any(np.asarray(state["cloud_ring"]))),
        )
        self._march_params = self.frame_data.to_march_params()
