"""Training: jitted step + host-side orchestration.

The per-iteration work of reference train.py:54-168 splits into:
  * `make_train_step` — one fused jit: render -> loss -> grad -> Adam ->
    densification-stat accumulation. Pure function of (model, adam, camera,
    gt, step). Loss-term schedule gates (normal loss after 7k iters,
    distortion after 3k, train.py:77-78) enter as *dynamic* scalars so the
    program never recompiles mid-run.
  * `make_densify_step` — jitted clone/split/prune every
    `densification_interval` iters (train.py:126-135).
  * `Trainer` — host loop: camera shuffling, cadence decisions, capacity
    growth at recompile boundaries, EMA logging, checkpointing.

Densification gradients: the reference reads `means2D.grad` off a dummy
tensor (train.py:126-131). Here the same quantity is the gradient w.r.t. the
`mean2d_offset` argument, converted from pixel units to the reference's
NDC-half-extent units (the CUDA backward scales by 0.5*W — SURVEY.md §2.10)
so the 2e-4 threshold carries over unchanged.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Optional

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from tpu2dgs.core.cameras import Camera
from tpu2dgs.model import densify as densify_lib
from tpu2dgs.model import optim as optim_lib
from tpu2dgs.model import splats as splats_lib
from tpu2dgs.raster.api import RasterSettings, render
from tpu2dgs.train import losses


# Backend capacity-overflow diagnostics (api.render output keys) and the
# RasterSettings knob each one is healed by (None = no growable knob).
OVERFLOW_KEYS = ("tile_overflow_frac", "bin_overflow_frac",
                 "col_overflow_frac", "grad_pack_overflow_frac",
                 "vis_overflow", "tile_count_max", "bin_count_max",
                 "col_count_max", "grad_pack_max",
                 "xfer_overflow_frac", "xfer_count_max")
OVERFLOW_CAP_OF = {
    "tile_overflow_frac": "tile_capacity",
    "bin_overflow_frac": "bin_capacity",
    "col_overflow_frac": "col_capacity",
    "grad_pack_overflow_frac": "grad_pack_capacity",
    # strip-routed splat exchange (parallel/sharded.py): present in the
    # metrics only when xfer_capacity > 0 enables the routed path
    "xfer_overflow_frac": "xfer_capacity",
}
# True demand maxima reported by the backend: growth sizes the new cap
# directly from these, so healing takes ONE recompile instead of a 1.5x
# ladder of them (each recompile costs minutes cold).
OVERFLOW_DEMAND_OF = {
    "tile_overflow_frac": "tile_count_max",
    "bin_overflow_frac": "bin_count_max",
    "col_overflow_frac": "col_count_max",
    "grad_pack_overflow_frac": "grad_pack_max",
    "xfer_overflow_frac": "xfer_count_max",
}


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization defaults of record (reference arguments/__init__.py:73-95
    + train.py schedule constants)."""

    iterations: int = 30_000
    lambda_dssim: float = 0.2
    lambda_dist: float = 0.0
    lambda_normal: float = 0.05
    normal_from_iter: int = 7_000
    dist_from_iter: int = 3_000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densification_interval: int = 100
    opacity_reset_interval: int = 3_000
    sh_increment_interval: int = 1_000
    grad_threshold: float = 2e-4
    percent_dense: float = 0.01
    opacity_cull: float = 0.05
    random_background: bool = False
    grow_watermark: float = 0.9   # grow capacity when live/capacity exceeds
    camera_batch: int = 1         # views per step (batched SGD; TPU-native)
    loss_sync_interval: int = 10  # host-sync the loss every N steps: a
                                  # per-step float() readback serializes
                                  # the async dispatch pipeline (tens of ms
                                  # through a TPU tunnel)


def make_train_step(
    settings: RasterSettings,
    opt_cfg: optim_lib.OptimConfig,
    lambda_dssim: float,
    spatial_lr_scale: float,
    mesh=None,
    camera_batch: int = 1,
    shard_splats: bool = False,
    indexed_cameras: bool = False,
) -> Callable:
    """Returns jitted step(model, adam, cam, gt, bg, step, lam_normal,
    lam_dist) -> (model, adam, metrics).

    With `indexed_cameras`, `cam` is a (cam_stack, cam_idx) pair — every
    CameraArrays leaf stacked along a leading view axis plus the view
    index (scalar, or (B,) when camera_batch > 1) — and the view is
    selected ON DEVICE. Every step then passes identical camera argument
    buffers plus one tiny index, and batched steps need no per-iteration
    host-side camera stacking. (Measured neutral on throughput — the raw
    loop's apparent per-view cost spread is workload variance across
    views, not argument marshaling; scripts/trainer_overhead_probe.py.)

    With `mesh`, rasterization is tile-row sharded across the mesh's "rows"
    axis and splat-parameter gradients are psum'd by the shard_map transpose
    (tpu2dgs/parallel/sharded.py). `shard_splats=True` additionally shards
    the splat parameter arrays over the same axis (gaussian parallelism —
    1/D params + per-splat work per device, survivors all-gathered).

    With `camera_batch` > 1, `cam` leaves and `gt` carry a leading batch dim
    and the loss is the mean over views (the reference is strictly one
    camera per step, train.py:65-67; batching is the TPU-natural way to fill
    the chip — gradients are averaged, densification stats accumulate the
    batch-mean screen gradient per splat)."""

    half = jnp.array(
        [settings.width * 0.5, settings.height * 0.5], jnp.float32
    )

    def per_view_loss(params, offset, live, cam, gt, bg, lam_normal, lam_dist):
        out = render(
            cam, settings,
            params.xyz,
            jnp.exp(params.scaling),
            params.rotation,
            jax.nn.sigmoid(params.opacity[:, 0]),
            splats_lib.features(params),
            bg,
            mean2d_offset=offset,
            live=live,
            mesh=mesh,
            shard_splats=shard_splats,
        )
        photo, ll1 = losses.photometric_loss(out["render"], gt, lambda_dssim)
        ln = losses.normal_consistency_loss(
            out["rend_normal"], out["surf_normal"])
        ld = losses.distortion_loss(out["rend_dist"])
        total = photo + lam_normal * ln + lam_dist * ld
        # Every capacity-overflow diagnostic the backend reports rides the
        # metrics so the Trainer can close the loop (adaptive cap growth).
        overflow = {
            k: lax.stop_gradient(jnp.asarray(out[k], jnp.float32))
            for k in OVERFLOW_KEYS if k in out
        }
        return total, (out["radii"], ll1, ln, ld, overflow)

    # NOTE: donate_argnums=(0, 1) for the dead model/adam buffers makes the
    # remote-TPU (axon) backend fail readbacks with InvalidArgument;
    # donation is left off until run on directly-attached chips.
    @jax.jit
    def step_fn(model, adam, cam, gt, bg, step, lam_normal, lam_dist):
        if indexed_cameras:
            cam_stack, cam_idx = cam
            cam = jax.tree.map(lambda a: a[cam_idx], cam_stack)
        p = model.params
        zeros_off = jnp.zeros((model.capacity, 2), jnp.float32)

        def loss_fn(params, offset):
            if camera_batch == 1:
                return per_view_loss(params, offset, model.live, cam, gt, bg,
                                     lam_normal, lam_dist)
            if shard_splats:
                # vmap cannot batch over a shard_map region; a sequential
                # lax.map computes the identical per-view terms (mean loss,
                # max radii) with the splat shards resident throughout.
                totals, (radii, ll1, ln, ld, ovf) = lax.map(
                    lambda cg: per_view_loss(
                        params, offset, model.live, cg[0], cg[1], bg,
                        lam_normal, lam_dist),
                    (cam, gt))
            else:
                totals, (radii, ll1, ln, ld, ovf) = jax.vmap(
                    per_view_loss,
                    in_axes=(None, None, None, 0, 0, None, None, None),
                )(params, offset, model.live, cam, gt, bg, lam_normal,
                  lam_dist)
            # max radius over the batch drives visibility/densify stats.
            # Demand maxima (*_count_max / *_pack_max) reduce with MAX over
            # the view batch — _maybe_grow_caps sizes caps from the WORST
            # view's demand, not the mean (a mean would rely on the 1.5x
            # growth floor and take extra recompiles to converge).
            ovf = {k: (jnp.max(v) if k.endswith("_max") else jnp.mean(v))
                   for k, v in ovf.items()}
            return jnp.mean(totals), (
                jnp.max(radii, axis=0), jnp.mean(ll1), jnp.mean(ln),
                jnp.mean(ld), ovf,
            )

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (loss, (radii, ll1, ln, ld, overflow)), (gparams, goffset) = grad_fn(
            p, zeros_off)

        lrs = optim_lib.learning_rates(opt_cfg, step, spatial_lr_scale)
        new_params, new_adam = optim_lib.adam_step(
            opt_cfg, p, gparams, adam, lrs, model.live
        )
        model = model._replace(params=new_params)
        model = densify_lib.add_stats(model, goffset * half[None, :], radii)

        metrics = {
            "loss": loss, "l1": ll1, "normal": ln, "dist": ld,
            "num_visible": jnp.sum(radii > 0),
            **overflow,
        }
        return model, adam, metrics

    return step_fn


def make_densify_step(cfg: densify_lib.DensifyConfig,
                      segments: int = 1) -> Callable:
    @jax.jit
    def densify_fn(model, adam, key, extent, use_size_prune):
        return densify_lib.densify_and_prune(
            cfg, model, adam, key, extent, use_size_prune, segments=segments
        )

    return densify_fn


def grow_with_adam(model, adam: optim_lib.AdamState, new_capacity: int,
                   segments: int = 1):
    """Capacity growth at a recompile boundary: pad params + Adam moments.

    `segments` > 1 (splat sharding) spreads the new free rows across the
    capacity segments so every shard's segment gains free slots — see
    splats.grow_capacity."""
    old_cap = model.capacity
    model = splats_lib.grow_capacity(model, new_capacity, segments=segments)
    extra = new_capacity - old_cap

    def pad(a):
        seg = a.reshape(segments, old_cap // segments, *a.shape[1:])
        widths = ([(0, 0), (0, extra // segments)]
                  + [(0, 0)] * (a.ndim - 1))
        return jnp.pad(seg, widths).reshape(new_capacity, *a.shape[1:])

    adam = optim_lib.AdamState(
        count=adam.count,
        mu=splats_lib.SplatParams(*(pad(a) for a in adam.mu)),
        nu=splats_lib.SplatParams(*(pad(a) for a in adam.nu)),
    )
    return model, adam


class Trainer:
    """Host-side training orchestration (reference train.py:31-168)."""

    def __init__(
        self,
        model: splats_lib.SplatModel,
        cameras: list[Camera],
        width: int,
        height: int,
        spatial_lr_scale: float,
        scene_extent: float,
        train_cfg: TrainConfig = TrainConfig(),
        opt_cfg: optim_lib.OptimConfig = optim_lib.OptimConfig(),
        raster_kwargs: Optional[dict] = None,
        white_background: bool = False,
        max_sh_degree: int = 3,
        seed: int = 0,
        log_fn: Optional[Callable[[int, dict], None]] = None,
        max_capacity: int = 4_194_304,
        mesh=None,
        shard_splats: bool = False,
        profile_dir: str | None = None,
        profile_steps: tuple[int, int] = (100, 110),
        max_caps: Optional[dict] = None,
        gt_cache_mb: Optional[float] = None,
    ):
        self.model = model
        self.max_capacity = max_capacity
        self.adam = optim_lib.init_adam(model.params)
        self.cameras = cameras
        self.width, self.height = width, height
        self.spatial_lr_scale = spatial_lr_scale
        self.scene_extent = scene_extent
        self.cfg = train_cfg
        self.opt_cfg = opt_cfg
        self.raster_kwargs = dict(raster_kwargs or {})
        self.white_background = white_background
        self.max_sh_degree = max_sh_degree
        self.active_sh_degree = 0
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.log_fn = log_fn
        # Multi-chip: a jax.sharding.Mesh with a "rows" axis shards image
        # tile rows across devices and psums splat grads (parallel/sharded).
        # shard_splats additionally shards the parameter arrays over the
        # same axis (gaussian parallelism; pallas backend only).
        self.mesh = mesh
        self.shard_splats = shard_splats
        if shard_splats and mesh is not None:
            # Gaussian parallelism is a MEMORY mode: params + Adam state +
            # densify stats live sharded (1/D per device) from creation on.
            from tpu2dgs.parallel.sharded import shard_model_state

            self.model, self.adam = shard_model_state(
                self.model, self.adam, mesh)
        # §5 observability: jax.profiler trace of steps [a, b) when set
        # (view with tensorboard/xprof), and a rolling Mpix/s counter —
        # the BASELINE.md north-star metric — emitted by training itself.
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        self._tracing = False
        self.mpix_s = 0.0
        self.step = 0
        self.ema_loss = 0.0
        self._cam_stack: list[int] = []
        self._step_fns: dict[Any, Callable] = {}
        self.densify_cfg = densify_lib.DensifyConfig(
            grad_threshold=train_cfg.grad_threshold,
            percent_dense=train_cfg.percent_dense,
            opacity_cull=train_cfg.opacity_cull,
        )
        self._densify_fn = make_densify_step(
            self.densify_cfg,
            segments=(mesh.shape["rows"]
                      if (shard_splats and mesh is not None) else 1))
        self._reset_opacity_fn = jax.jit(densify_lib.reset_opacity)
        self.bg = (
            jnp.ones(3, jnp.float32) if white_background
            else jnp.zeros(3, jnp.float32)
        )
        # Adaptive capacity caps: overflow counters the backend reports are
        # CONSUMED here — any nonzero overflow fraction at a cadence
        # boundary raises the corresponding cap at the next recompile
        # boundary (same watermark pattern as splat-capacity growth). The
        # reference never truncates (CUB sort builds unbounded per-tile
        # lists, SURVEY.md §2.10); this closes the loop so a scene whose
        # depth complexity exceeds the configured caps heals itself instead
        # of silently truncating tails until a human reads the counters.
        # Growth ceilings. col/bin are JOINTLY bounded by scoped-VMEM
        # feasibility of the L2 select kernel, not by HBM: its input block
        # is (24, col_cap) and its output block (24, bin_cap) f32 (~96
        # B/row, both double-buffered), so growth past
        # 2*(col+bin)*96 B ~ 16 MB turns the NEXT recompile into a Mosaic
        # OOM (measured: col 65536 + bin 24576 fails at 16.5M/16M scoped;
        # col 61440 + bin 20480 = 15.7M runs). Scenes whose true column
        # demand exceeds the ceiling (e.g. 100K visible splats on a
        # one-column 128px image) keep a nonzero col overflow counter
        # instead of dying — depth-order column truncation drops the
        # DEEPEST candidates, which alpha saturation makes visually
        # negligible. grad_pack is HBM-resident (no VMEM ceiling).
        self.max_caps = {
            "tile_capacity": 16_384, "bin_capacity": 20_480,
            "col_capacity": 61_440, "grad_pack_capacity": 1 << 22,
            "xfer_capacity": 262_144,
            **(max_caps or {}),
        }
        self.cap_growth_events: list[tuple[int, str, int]] = []
        self.gui = None            # optional viewer.network_gui.NetworkGUI
        self._gui_paused = False   # client sent do_training=False
        self.source_path = ""      # verify string sent to the viewer
        # Camera matrices: staged once AND stacked along a view axis — the
        # step selects the view on device from a cached index scalar
        # (identical argument buffers every step; no host-side stacking
        # for batched steps).
        self._cam_arrays = [c.arrays() for c in cameras]
        self._cam_stacked = (jax.tree.map(
            lambda *xs: jnp.stack(xs), *self._cam_arrays)
            if self._cam_arrays else None)
        self._idx_scalars = [jnp.int32(i) for i in range(len(cameras))]
        self._scalar_cache: dict[float, jax.Array] = {}
        # GT images: pre-staged on device when they fit the budget
        # (repeated host->device image uploads per step are pure waste —
        # the reference re-uploads every iteration, train.py:72). A scene
        # whose GT set exceeds `gt_cache_mb` (e.g. MipNeRF-360 indoor:
        # ~290 views x images_2 ~ 5.6 GB, competing with a multi-million
        # splat model for HBM) falls back to host-resident images with an
        # ASYNC device_put prefetch of the next view, overlapped with the
        # current step's compute — O(1) device memory at ~the reference's
        # upload schedule but off the critical path.
        imgs = [c.image for c in cameras]
        total_mb = sum(float(np.asarray(im).nbytes) / 1e6
                       for im in imgs if im is not None)
        self.gt_prestaged = (gt_cache_mb is None or total_mb <= gt_cache_mb)
        if self.gt_prestaged:
            self._gt_images = [
                jax.device_put(jnp.asarray(im, jnp.float32))
                if im is not None else None
                for im in imgs
            ]
        else:
            self._gt_np = [np.asarray(im, np.float32)
                           if im is not None else None for im in imgs]
            self._gt_prefetch: dict[int, jax.Array] = {}

    # -- helpers -----------------------------------------------------------

    def _settings(self) -> RasterSettings:
        return RasterSettings(
            width=self.width, height=self.height,
            sh_degree=self.active_sh_degree, **self.raster_kwargs,
        )

    def _get_step_fn(self) -> Callable:
        key = (self.active_sh_degree, self.model.capacity)
        if key not in self._step_fns:
            self._step_fns[key] = make_train_step(
                self._settings(), self.opt_cfg, self.cfg.lambda_dssim,
                self.spatial_lr_scale, mesh=self.mesh,
                camera_batch=self.cfg.camera_batch,
                shard_splats=self.shard_splats,
                indexed_cameras=True,
            )
        return self._step_fns[key]

    def _next_camera_index(self) -> int:
        if not self._cam_stack:
            self._cam_stack = list(self.rng.permutation(len(self.cameras)))
        return int(self._cam_stack.pop())

    def _peek_camera_indices(self, k: int) -> list[int]:
        """The next up-to-k indices _next_camera_index will return
        (refilling the shuffled stack if empty) — the prefetch targets.
        Looks only within the current epoch's stack: the next epoch's
        permutation is not drawn early."""
        if not self._cam_stack:
            self._cam_stack = list(self.rng.permutation(len(self.cameras)))
        return [int(x) for x in self._cam_stack[-k:][::-1]]

    def _gt_for(self, ci: int) -> jax.Array:
        """Device GT for view ci; under a gt_cache_mb budget, consume the
        in-flight prefetch (or upload synchronously on a miss) and start
        async uploads for the UPCOMING views so they overlap this step's
        compute — the whole next batch when camera_batch > 1, not just
        the stack top (a top-only peek left B-1 of every batch's uploads
        synchronous)."""
        if self.gt_prestaged:
            return self._gt_images[ci]
        arr = self._gt_prefetch.pop(ci, None)
        if arr is None:
            arr = jax.device_put(self._gt_np[ci])
        depth = max(3, self.cfg.camera_batch)
        for nxt in self._peek_camera_indices(depth):
            if len(self._gt_prefetch) >= depth:
                break
            if nxt not in self._gt_prefetch:
                self._gt_prefetch[nxt] = jax.device_put(self._gt_np[nxt])
        return arr

    def _split_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def _lam_scalar(self, v: float) -> jax.Array:
        if v not in self._scalar_cache:
            self._scalar_cache[v] = jnp.float32(v)
        return self._scalar_cache[v]

    def _current_cap(self, kwarg: str) -> int:
        val = self.raster_kwargs.get(kwarg)
        if val is None:
            val = getattr(RasterSettings, kwarg)  # dataclass field default
        if kwarg == "grad_pack_capacity" and not val:
            # 0 = derived default: 16 * group-rounded tile capacity *
            # image tile columns (mirrors pallas_backend.blend_binned —
            # including the staging-group rounding of capk, so this stays
            # an upper bound of the backend's own derivation; the packed
            # gradient rows are one GLOBAL array)
            from tpu2dgs.raster.pallas_backend import BX, _round_group

            tc = self._current_cap("tile_capacity")
            val = 16 * _round_group(tc) * (-(-self.width // BX))
        return int(val)

    def _maybe_grow_caps(self, it: int, metrics: dict) -> None:
        """Close the capacity-overflow loop: any nonzero overflow fraction
        raises its cap 1.5x (lane-rounded) at the next recompile boundary.
        Device-synced only at cadence boundaries (the caller's)."""
        changed = False
        for key, kwarg in OVERFLOW_CAP_OF.items():
            v = metrics.get(key)
            if v is None or float(v) <= 0.0:
                continue
            cur = self._current_cap(kwarg)
            # size directly to the reported demand (+25% headroom for
            # view-to-view variation); 1.5x fallback when the backend
            # reports no demand maximum
            demand = metrics.get(OVERFLOW_DEMAND_OF[key])
            want = (int(float(demand) * 1.25) if demand is not None
                    else int(cur * 1.5))
            new = min(-(-max(want, int(cur * 1.5)) // 128) * 128,
                      self.max_caps[kwarg])
            if new > cur:
                self.raster_kwargs[kwarg] = new
                self.cap_growth_events.append((it, kwarg, new))
                changed = True
        if changed:
            self._step_fns.clear()  # recompile with the raised caps

    # -- the loop ----------------------------------------------------------

    def train(self, num_iters: Optional[int] = None, progress: bool = False):
        end = self.step + (num_iters or self.cfg.iterations)
        t0 = time.perf_counter()
        t_win, it_win = t0, self.step  # rolling Mpix/s window
        while self.step < end:
            self.step += 1
            it = self.step
            cfg = self.cfg

            if self.profile_dir is not None:
                if it == self.profile_steps[0]:
                    jax.profiler.start_trace(self.profile_dir)
                    self._tracing = True
                elif it == self.profile_steps[1] and self._tracing:
                    jax.profiler.stop_trace()
                    self._tracing = False

            # SH degree warmup: one level every 1000 iters (train.py:60-62).
            if (
                it % cfg.sh_increment_interval == 0
                and self.active_sh_degree < self.max_sh_degree
            ):
                self.active_sh_degree += 1

            if cfg.camera_batch == 1:
                ci = self._next_camera_index()
                cam_arrays = (self._cam_stacked, self._idx_scalars[ci])
                gt = self._gt_for(ci)
            else:
                idxs = [self._next_camera_index()
                        for _ in range(cfg.camera_batch)]
                cam_arrays = (self._cam_stacked,
                              jnp.asarray(idxs, jnp.int32))
                gt = jnp.stack([self._gt_for(i) for i in idxs])
            bg = (
                jax.random.uniform(self._split_key(), (3,))
                if cfg.random_background else self.bg
            )
            # Cached device scalars: the loss-gate lambdas change at most
            # once each per run, and a fresh jnp.float32 per iteration is a
            # host->device upload (milliseconds through a remote-TPU
            # tunnel, pure waste everywhere).
            lam_n = self._lam_scalar(
                cfg.lambda_normal if it > cfg.normal_from_iter else 0.0)
            lam_d = self._lam_scalar(
                cfg.lambda_dist if it > cfg.dist_from_iter else 0.0)

            step_fn = self._get_step_fn()
            self.model, self.adam, metrics = step_fn(
                self.model, self.adam, cam_arrays, gt, bg,
                jnp.float32(it), lam_n, lam_d,
            )

            # Adaptive cap growth: consume the overflow counters at the
            # densification cadence (one host sync per interval).
            if it % cfg.densification_interval == 0:
                self._maybe_grow_caps(it, metrics)

            # Densify / prune / opacity reset (train.py:126-135).
            if it < cfg.densify_until_iter:
                if (
                    it > cfg.densify_from_iter
                    and it % cfg.densification_interval == 0
                ):
                    use_size = it > cfg.opacity_reset_interval
                    self.model, self.adam, info = self._densify_fn(
                        self.model, self.adam, self._split_key(),
                        jnp.float32(self.scene_extent), use_size,
                    )
                    live = int(info.num_live)
                    # Children dropped for lack of free slots are capacity
                    # pressure too: under segment-local compaction (splat
                    # sharding) a full SEGMENT drops even when the global
                    # watermark isn't reached (e.g. create_from_pcd packs
                    # live splats at the front). Growth pads PER SEGMENT
                    # (grow_with_adam segments=D) so every shard's segment
                    # gains free slots — an end-pad would leave previously
                    # full segments full and dense regions unable to
                    # densify forever.
                    if (
                        (live > self.cfg.grow_watermark * self.model.capacity
                         or int(info.num_dropped) > 0)
                        and self.model.capacity < self.max_capacity
                    ):
                        n_seg = (self.mesh.shape["rows"]
                                 if (self.shard_splats
                                     and self.mesh is not None) else 1)
                        new_cap = min(
                            splats_lib.round_capacity(2 * self.model.capacity),
                            self.max_capacity,
                        )
                        self.model, self.adam = grow_with_adam(
                            self.model, self.adam, new_cap, segments=n_seg)
                        if self.shard_splats and self.mesh is not None:
                            from tpu2dgs.parallel.sharded import (
                                shard_model_state)

                            # Re-place after the segmented pad (local: old
                            # segment j's rows stay inside new segment j).
                            self.model, self.adam = shard_model_state(
                                self.model, self.adam, self.mesh)
                if it % cfg.opacity_reset_interval == 0 or (
                    self.white_background and it == cfg.densify_from_iter
                ):
                    self.model, self.adam = self._reset_opacity_fn(
                        self.model, self.adam
                    )

            if it % 50 == 0:
                # rolling Mpix/s (rasterized pixels/s): the BASELINE.md
                # north-star metric, emitted by training itself (§5)
                now = time.perf_counter()
                px = (it - it_win) * self.width * self.height * \
                    cfg.camera_batch
                self.mpix_s = px / max(now - t_win, 1e-9) / 1e6
                t_win, it_win = now, it
                metrics = dict(metrics)
                metrics["mpix_per_s"] = self.mpix_s
            if self.log_fn is not None:
                self.log_fn(it, metrics)
            # The loss EMA is display/GUI-only; sync it periodically so the
            # host never blocks the device's async dispatch queue per step.
            if (it % cfg.loss_sync_interval == 0 or it == end
                    or self.gui is not None):
                loss_val = float(metrics["loss"])
                self.ema_loss = 0.4 * loss_val + 0.6 * self.ema_loss
            if self.gui is not None:
                self._poll_gui(it, end)
            if progress and it % 200 == 0:
                dt = time.perf_counter() - t0
                print(
                    f"[{it}] loss={self.ema_loss:.4f} "
                    f"live={int(self.model.num_live())} "
                    f"({it / dt:.1f} it/s, {self.mpix_s:.2f} Mpix/s)",
                    flush=True,
                )
        if self._tracing:  # training ended inside the profile window
            jax.profiler.stop_trace()
            self._tracing = False
        return self.model

    def _poll_gui(self, it: int, end: int) -> None:
        """Serve pending viewer requests mid-training (reference
        train.py:146-168: render the custom camera, send the frame, break
        back to training when the client allows)."""
        import numpy as np2

        from tpu2dgs.raster.api import render as render_op
        from tpu2dgs.viewer.modes import render_net_image
        from tpu2dgs.viewer.network_gui import image_to_bytes

        import select

        gui = self.gui
        if gui.conn is None:
            gui.try_connect()
        while gui.conn is not None:
            try:
                # Don't let an idle client stall training: only read when a
                # request is already pending — UNLESS the client paused
                # training (do_training=False), in which case block on it
                # until it allows resuming, exactly like the reference's
                # GUI loop (train.py:146-168 loops in receive() and only
                # breaks once do_training is set again).
                timeout = None if self._gui_paused else 0.0
                readable, _, _ = select.select([gui.conn], [], [], timeout)
                if not readable:
                    break
                cam, (w, h), do_training, keep_alive, sm, mode = gui.receive()
                image_bytes = None
                if cam is not None:
                    settings = RasterSettings(
                        width=w, height=h, sh_degree=self.active_sh_degree,
                        scale_modifier=float(sm), **self.raster_kwargs,
                    )
                    p = self.model.params
                    pkg = render_op(
                        cam, settings, p.xyz, jnp.exp(p.scaling), p.rotation,
                        jax.nn.sigmoid(p.opacity[:, 0]),
                        splats_lib.features(p), self.bg, live=self.model.live,
                    )
                    net_image = render_net_image(
                        pkg, ["RGB", "Alpha", "Normal", "Depth", "Edge",
                              "Curvature"], mode)
                    image_bytes = image_to_bytes(np2.asarray(net_image))
                gui.send(image_bytes, self.source_path,
                         {"#": int(self.model.num_live()),
                          "loss": self.ema_loss})
                self._gui_paused = not do_training
                if do_training and (it < end or not keep_alive):
                    break
            except (ConnectionError, OSError):
                gui.disconnect()
                self._gui_paused = False

    # -- rendering for eval -------------------------------------------------

    def render_view(self, cam: Camera, depth_ratio: Optional[float] = None):
        kwargs = dict(self.raster_kwargs)
        if depth_ratio is not None:
            kwargs["depth_ratio"] = depth_ratio
        settings = RasterSettings(
            width=self.width, height=self.height,
            sh_degree=self.active_sh_degree, **kwargs,
        )
        p = self.model.params
        return render(
            cam.arrays(), settings,
            p.xyz, jnp.exp(p.scaling), p.rotation,
            jax.nn.sigmoid(p.opacity[:, 0]), splats_lib.features(p),
            self.bg, live=self.model.live,
        )
