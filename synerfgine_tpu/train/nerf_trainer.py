"""NeRF training loop.

Capability match for `train_nerf`/`train_nerf_step`/`training_prep_nerf`
(src/testbed_nerf.cu:3298-3794): per-step random ray batch across all
training images, occupancy-grid-guided march with sample compaction into a
fixed 2^18 batch, random background color, sRGB-space Huber loss, nested
EMA/decay/Adam optimizer, density-grid update cadence (every step < 256,
then every 16). The handwritten fused loss/gradient kernel
(testbed_nerf.cu:1066-1272) is JAX autodiff here; `jax.checkpoint` on the
network keeps the march memory-light.

Two samplers:
- grid marcher (march/dda.py): DDA over the occupancy bitfield with
  cross-ray compaction — the fast path.
- fixed-step marcher (march/fixed.py): dense stratified sampling — the
  correctness baseline (use_grid=False).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera as cam
from ..core.constants import (
    EVAL_MIN_TRANSMITTANCE,
    NERF_STEPS,
    TRAIN_T_EPS,
)
from ..core.types import BoundingBox, Ray
from ..data.nerf_loader import NerfDataset
from ..grid.occupancy import OccupancyGrid, OccupancyGridState
from ..march.compacted import (
    composite_compacted,
    live_mask_compacted,
    recompact_live,
)
from ..march.composite import composite_rays
from ..march.dda import (
    compact_samples,
    compact_samples_segmented,
    march_rays_grid,
    march_rays_grid_skip,
    scatter_back,
)
from ..march.fixed import sample_fixed_steps
from ..march.windowed import render_march_windowed
from ..nn.losses import get_loss
from ..nn.nerf_network import NerfNetwork, NerfParams
from ..nn.optimizers import NGPOptimizer, NGPOptState


def scene_aabb(aabb_scale: int) -> BoundingBox:
    """NGP scene box: side `aabb_scale`, centered at 0.5 (testbed behavior)."""
    half = 0.5 * aabb_scale
    return BoundingBox(
        jnp.full((3,), 0.5 - half, jnp.float32),
        jnp.full((3,), 0.5 + half, jnp.float32),
    )


from typing import Any

from .camera_opt import (
    CameraOptParams,
    CameraOptState,
    apply_camera_opt,
    camera_opt_update,
    init_camera_opt,
)


def _false_color(v: np.ndarray) -> np.ndarray:
    """Blue->cyan->green->yellow->red ramp for v in [0,1] (the reference's
    error-map false coloring, testbed.cu:4661-4681 overlay_false_color)."""
    v = np.clip(v, 0.0, 1.0)[..., None]
    stops = np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 1.0], [0.0, 1.0, 0.0],
                      [1.0, 1.0, 0.0], [1.0, 0.0, 0.0]], np.float32)
    x = v * (len(stops) - 1)
    i = np.clip(x.astype(np.int32), 0, len(stops) - 2)
    f = x - i
    return stops[i[..., 0]] * (1 - f) + stops[i[..., 0] + 1] * f


def apply_overlay(rgb: np.ndarray, overlay: str, overlay_image=None,
                  overlay_alpha: float = 1.0, error_map_view=None):
    """Eyeball-test overlays (testbed.cu:4630-4681):
    - "gt": blend the ground-truth image over the render (the reference's
      render_ground_truth compositing; alpha = ground-truth alpha knob);
    - "error": false-colored |render - gt| per pixel;
    - "error_map": false-colored trainer error map (E, E) for this view,
      nearest-upsampled over the frame (the importance-sampling CDF
      source, testbed_nerf.cu error-map deposit)."""
    h, w = rgb.shape[:2]

    def prep_gt(img):
        if img is None:
            raise ValueError(f"overlay={overlay!r} needs overlay_image")
        gt = np.asarray(img, np.float32)
        if gt.ndim == 3 and gt.shape[-1] == 4:
            gt = gt[..., :3] * gt[..., 3:]
        if gt.shape[:2] != (h, w):
            from PIL import Image

            gt = np.asarray(Image.fromarray(
                (np.clip(gt, 0, 1) * 255).astype(np.uint8)).resize((w, h)),
                np.float32) / 255.0
        return gt

    if overlay == "gt":
        gt = prep_gt(overlay_image)
        return rgb * (1.0 - overlay_alpha) + gt * overlay_alpha
    if overlay == "error":
        gt = prep_gt(overlay_image)
        err = np.mean((rgb - gt) ** 2, axis=-1)
        scale = max(float(err.max()), 1e-9)
        return _false_color(err / scale)
    if overlay == "error_map":
        if error_map_view is None:
            raise ValueError("overlay='error_map' needs error_map_view")
        em = np.asarray(error_map_view, np.float32)
        ys = (np.arange(h) * em.shape[0]) // h
        xs = (np.arange(w) * em.shape[1]) // w
        up = em[ys[:, None], xs[None, :]]
        return _false_color(up / max(float(up.max()), 1e-9))
    raise ValueError(f"unknown overlay mode {overlay!r}")


class NerfTrainState(NamedTuple):
    params: NerfParams
    opt_state: NGPOptState
    grid: OccupancyGridState
    key: jax.Array
    cam_opt: Any = None      # CameraOptState when pose/exposure opt is on
    error_map: Any = None    # (N_img, E, E) loss map when importance sampling


class NerfTrainer:
    def __init__(
        self,
        network: NerfNetwork,
        dataset: NerfDataset,
        n_rays: int = 4096,
        batch_size: int = 1 << 18,
        n_march_steps: int = NERF_STEPS,
        n_steps_per_ray: int = 128,      # fixed-step path only
        use_grid: bool = True,
        loss_name: str | None = None,
        random_bg: bool = True,
        grid_update_cadence: int = 16,
        grid_warmup_steps: int = 256,
        optimize_extrinsics: bool = False,
        optimize_exposure: bool = False,
        use_error_map: bool = False,
        train_envmap: bool = False,
        train_distortion: bool = False,
        n_extra_dims: int = 0,
        depth_supervision_lambda: float = 0.0,
        segment_compaction: bool = True,
        linear_colors: bool = False,
        near_distance: float = 0.1,
        adam_skip_zero_grad: bool = False,
        snap_to_pixel_centers: bool = True,
        scan_block_steps: int | None = None,
        sharpness_weighted: bool = False,
        remat: bool = False,
        compacted_composite: bool = True,
        march_skip_steps: int = 0,
        fit_march_span: bool = False,
        spmd_axis: str | None = None,
        n_shards: int = 1,
        adapt_kept: bool = False,
        adapt_two_pass: bool = False,
    ):
        self.network = network
        if n_extra_dims and network.n_extra_dims != n_extra_dims:
            raise ValueError(
                "NerfNetwork must be built with the same n_extra_dims")
        self.n_rays = n_rays
        self.batch_size = batch_size
        self.n_march_steps = n_march_steps
        self.n_steps_per_ray = n_steps_per_ray
        self.use_grid = use_grid
        self.random_bg = random_bg
        self.loss_fn = get_loss(loss_name or network.config.loss)
        self.aabb = scene_aabb(dataset.aabb_scale)
        # Reference cone semantics (testbed_nerf.cu:3083-3085): FIXED
        # fine stepping in unit-cube scenes ("like original NeRF"),
        # exponential 1/256 stepping only when aabb_scale > 1. Round 4
        # briefly cone-marched every scene (testbed.h:861's default is
        # 1/256, and calc_cone_angle returns the constant) — but
        # load_nerf overwrites the constant per dataset, and at lego
        # camera distances cone 1/256 means ~9x coarser dt at the
        # object (t/256 ~ 0.016 vs sqrt(3)/1024): +0.25 dB at step 512
        # (blur-limited regime) then a -0.85 dB FOG REGRESSION by step
        # 2048 as the model converges to the coarse integrator's
        # bloomed optimum (docs/milestone_lego_r4, 1024: 25.36 ->
        # 2048: 24.51). Reverted to the reference's per-dataset rule.
        self.cone_angle = (0.0 if dataset.aabb_scale <= 1
                           else 1.0 / 256.0)
        self.opt = NGPOptimizer(network.config.optimizer,
                                skip_zero_grad=adam_skip_zero_grad)
        self.grid = OccupancyGrid(dataset.aabb_scale)
        self.grid_update_cadence = grid_update_cadence
        self.grid_warmup_steps = grid_warmup_steps
        self.optimize_extrinsics = optimize_extrinsics
        self.optimize_exposure = optimize_exposure
        self.use_error_map = use_error_map
        self.train_envmap = train_envmap
        self.train_distortion = train_distortion
        self.n_extra_dims = n_extra_dims
        self.depth_supervision_lambda = depth_supervision_lambda
        # train_in_linear_colors (testbed_nerf.cu:1125-1131): compare the
        # composite in linear space; LDR targets are linearized per batch
        self.linear_colors = linear_colors
        # near-plane density penalty distance (testbed.h:814 default
        # 0.1): samples closer than this get a constant downward raw-
        # density gradient — "prevents learning of camera-specific fudge
        # right in front of the camera" (floaters). 0 disables.
        self.near_distance = near_distance
        # training rays go through the CENTER of the texel that
        # supervises them (the reference's snap_to_pixel_centers
        # training default, testbed.h:794 +
        # nerf_random_image_pos_training, nerf_device.cuh:553-576).
        # Without the snap, a ray at a random sub-pixel offset is
        # supervised by the point-sampled texel up to half a pixel away
        # - supervision jitter that acts as a blur kernel on fine
        # detail. Eval renders at pixel centers, so snapped training
        # also aligns train and eval sample positions exactly.
        self.snap_to_pixel_centers = snap_to_pixel_centers
        self.remat = remat
        # adapt_kept: adapt the ray count on the POST-TERMINATION sample
        # count (the reference's numsteps_counter_compacted — samples
        # until T < EPSILON, testbed_nerf.cu:1064-1067 — is what
        # update_after_training divides by, testbed_nerf.cu:3276-3293)
        # instead of the generated occupied count. The reference's
        # generation buffer is 16x the target (testbed_nerf.cu:3534), so
        # each of its steps supervises ~1.6x MORE RAYS than a
        # generated-count adapter at the same 2^18 target; under this
        # flag the march capacity doubles (static) so the extra
        # generated samples fit, and whole-ray reservation drop +
        # loss exclusion still guard overflow beyond 2x.
        self.adapt_kept = adapt_kept
        if adapt_kept and not (use_grid and compacted_composite):
            raise ValueError(
                "adapt_kept requires the grid path with the compacted "
                "composite (the live-sample count comes from it)")
        # adapt_two_pass: recover adapt_kept's 2x step cost with the
        # reference's actual two-phase shape (generate at padding
        # capacity, train on a COMPACTED 2^18 batch,
        # testbed_nerf.cu:3272-3296 + :3534): pass 1 runs a no-grad
        # density-only forward (aligned-pair gather — half the encode
        # transactions) on the 2x generation buffer to get the
        # early-termination live mask, then `recompact_live` packs the
        # live samples (a per-ray PREFIX, see live_mask_compacted) into
        # a tight batch_size buffer and the differentiable fwd+bwd runs
        # at 1x. Composite outputs are bit-equivalent for kept rays;
        # the raw-density regularizers now cover exactly the compacted
        # batch — the reference's own coverage (its regularizers run on
        # the compacted samples, testbed_nerf.cu:1210-1265).
        self.adapt_two_pass = adapt_two_pass
        if adapt_two_pass and not adapt_kept:
            raise ValueError("adapt_two_pass requires adapt_kept")
        # composite on the compacted batch (segmented scans) instead of
        # scatter_back to (R, K) + dense composite — bit-equivalent
        # (tests/test_compacted_composite.py), ~16x fewer HBM
        # transactions in the composite stage
        self.compacted_composite = compacted_composite
        # march_skip_steps > 0: coarse first-hit pre-pass + a SHORTER
        # dense march (march_rays_grid_skip) — the saved steps are the
        # empty space before the first occupied region. Steps must cover
        # the scene's largest occupied span along any ray.
        self.march_skip_steps = march_skip_steps
        # Span-fitted K (sample-set-equal march shortening): bound the
        # stepping-space units any training ray spends inside the aabb
        # from the dataset camera origins and clamp n_march_steps to it.
        # Samples past the aabb exit are invalid in the full march too,
        # so the valid set — and therefore training — is unchanged; only
        # the dense (R, K) march tensors shrink (~2.3x at lego ds1 under
        # cone 1/256). See march/dda.py stepping_span_bound.
        if fit_march_span and use_grid and march_skip_steps == 0:
            from ..march.dda import stepping_span_bound

            k_fit = stepping_span_bound(
                self.aabb,
                np.asarray(dataset.xforms)[:, :3, 3],
                self.cone_angle)
            if dataset.xforms_end is not None:
                k_fit = max(k_fit, stepping_span_bound(
                    self.aabb,
                    np.asarray(dataset.xforms_end)[:, :3, 3],
                    self.cone_angle))
            k_fit = max(64, -(-k_fit // 64) * 64)
            self.n_march_steps = min(self.n_march_steps, k_fit)
        # SPMD data parallelism (SURVEY.md §2.4 "first-class" row): when
        # spmd_axis is set, the SAME step functions below run per-shard
        # inside shard_map — rays/batch divided by n_shards, gradients
        # pmean'ed, sample counters psum'ed, grid splats pmax'ed, error-
        # map deposits psum'ed. n_rays/batch_size remain the GLOBAL sizes
        # so the host loop (adaptive rays, cadence) is shard-agnostic.
        self.spmd_axis = spmd_axis
        self.n_shards = n_shards if spmd_axis else 1
        if self.n_shards > 1:
            if n_rays % self.n_shards or batch_size % self.n_shards:
                raise ValueError("n_rays and batch_size must divide n_shards")
        # steps fused per device dispatch; defaults to the grid cadence.
        # Shorter blocks keep single executions under the remote relay's
        # sustained-execution tolerance.
        self.scan_block_steps = min(scan_block_steps or grid_update_cadence,
                                    grid_update_cadence)
        # segment-granular compaction: 8x cheaper prefix/scatter at a
        # small occupancy cost (see march/dda.py)
        self.segment_compaction = segment_compaction and (
            self.n_march_steps % 8 == 0 and batch_size % 8 == 0)
        self.host_step = 0

        # Device-resident dataset (uint8 keeps HBM small; gathers decode).
        # NOTE: these MUST be threaded through jit entry points as explicit
        # arguments — jit-captured device constants are re-materialized on
        # every dispatch by the remote-TPU relay (measured 164 vs 10 ms for
        # a 55 MB capture).
        self.images = jnp.asarray(dataset.images)          # (N, H, W, 4) u8
        self.xforms = jnp.asarray(dataset.xforms)          # (N, 3, 4)
        self.resolution = dataset.resolution               # (W, H)
        self.focal = jnp.asarray(dataset.focal_length)
        self.pp = jnp.asarray(dataset.principal_point)
        # dataset lens model (OpenCV k1k2p1p2 / fisheye / ...): applied in
        # every ray-generation site (reference uv_to_ray Lens path,
        # common_device.cuh:403-455)
        self.lens = getattr(dataset, "lens", None)
        self.data = {"images": self.images, "xforms": self.xforms}
        # per-image intrinsics (TrainingImageMetadata parity): only
        # threaded through when the dataset actually carries overrides
        if getattr(dataset, "focals", None) is not None:
            self.data["focals"] = jnp.asarray(dataset.focals)   # (N, 2)
        if getattr(dataset, "pps", None) is not None:
            self.data["pps"] = jnp.asarray(dataset.pps)         # (N, 2)
        # rolling-shutter / motion-blur frames (TrainingXForm start/end)
        self.rolling_shutter = jnp.asarray(
            getattr(dataset, "rolling_shutter", np.zeros(4)), jnp.float32)
        if getattr(dataset, "xforms_end", None) is not None:
            self.data["xforms_end"] = jnp.asarray(dataset.xforms_end)
        if getattr(dataset, "depths", None) is not None:
            self.data["depths"] = jnp.asarray(dataset.depths)  # (N, H, W)
        # sharpness-weighted error (nerf_loader.h sharpness_data): per-ray
        # loss scaled by the normalized Laplacian sharpness of its pixel's
        # grid cell, so blurry regions contribute less gradient
        self.sharpness_weighted = sharpness_weighted
        if sharpness_weighted:
            from ..data.sharpness import sharpness_maps, sharpness_weights

            self.data["sharpness"] = jnp.asarray(
                sharpness_weights(sharpness_maps(np.asarray(dataset.images))))
        # dynamic_mask_* images: zero the loss on masked-out pixels
        if getattr(dataset, "masks", None) is not None:
            self.data["mask"] = jnp.asarray(dataset.masks)  # (N, H, W)

        self._step = jax.jit(self._train_step, donate_argnums=(0,),
                             static_argnums=(1,))
        self._grid_update = jax.jit(self._grid_update_fn, donate_argnums=(0,),
                                    static_argnums=(1,))
        self._scan_steps = jax.jit(self._train_scan, donate_argnums=(0,),
                                   static_argnums=(2, 3, 4))

    def init(self, key: jax.Array, mark_untrained: bool = True) -> NerfTrainState:
        k1, k2 = jax.random.split(key)
        params = self.network.init(k1)
        if self.train_envmap:
            from ..nn.envmap import init_envmap

            params = params._replace(envmap=init_envmap())
        if self.train_distortion:
            from ..nn.envmap import init_distortion

            params = params._replace(distortion=init_distortion())
        if self.n_extra_dims > 0:
            # per-image latent codes appended to the dir encoding
            # (n_extra_learnable_dims; nerf_network.h extra-dims input)
            params = params._replace(latents=jnp.zeros(
                (int(self.images.shape[0]), self.n_extra_dims)))
        gstate = self.grid.init()
        if self.use_grid and mark_untrained:
            gstate = self.grid.mark_untrained(
                gstate, self.xforms, self.resolution, self.focal, self.pp
            )
            # Before the first density update, every *visible* cell counts as
            # occupied so the first training steps can march everywhere.
            bits = gstate.density >= 0.0
            gstate = gstate._replace(bitfield=bits)
        # distortion training shares the "rays rebuilt inside the loss"
        # pathway, so it rides the camera-opt state (zero-grad pose).
        cam_opt = (init_camera_opt(int(self.images.shape[0]))
                   if (self.optimize_extrinsics or self.optimize_exposure
                       or self.train_distortion)
                   else None)
        from .error_map import init_error_map

        emap = (init_error_map(int(self.images.shape[0]))
                if self.use_error_map else None)
        return NerfTrainState(params, self.opt.init(params), gstate, k2,
                              cam_opt, emap)

    # ------------------------------------------------------------- training
    def _sample_pixels(self, data, key, n_rays: int, error_map=None):
        """Random (image, pixel) picks + their sRGB+alpha targets. With an
        error map, half the pixels come from the per-image error CDF."""
        images = data["images"]
        n_img, h, w = images.shape[:3]
        k_img, k_uv = jax.random.split(key)
        img_idx = jax.random.randint(k_img, (n_rays,), 0, n_img)
        if error_map is not None:
            from .error_map import sample_uv

            uv = sample_uv(k_uv, error_map, img_idx)
        else:
            uv = jax.random.uniform(k_uv, (n_rays, 2))
        px = jnp.minimum((uv[:, 0] * w).astype(jnp.int32), w - 1)
        py = jnp.minimum((uv[:, 1] * h).astype(jnp.int32), h - 1)
        if self.snap_to_pixel_centers:
            # ray through the supervising texel's center (reference
            # training default; see __init__)
            uv = (jnp.stack([px, py], axis=-1).astype(jnp.float32)
                  + 0.5) / jnp.asarray([w, h], jnp.float32)
        texel = images[img_idx, py, px].astype(jnp.float32) / 255.0
        if self.linear_colors:
            from ..io.image import srgb_to_linear

            texel = jnp.concatenate(
                [srgb_to_linear(texel[:, :3]), texel[:, 3:]], axis=-1)
        depth = (data["depths"][img_idx, py, px]
                 if "depths" in data else None)
        return img_idx, uv, texel, depth

    def _rays_for(self, data, img_idx, uv,
                  cam_params: CameraOptParams | None = None,
                  distortion=None, k_motion=None):
        xf = data["xforms"]
        cams = (apply_camera_opt(xf, cam_params, img_idx)
                if cam_params is not None else xf[img_idx])
        if "xforms_end" in data:
            # rolling shutter / motion blur: per-ray pose slerped between
            # the frame's start/end transforms (common_device.cuh:363);
            # motionblur_time is a per-ray uniform like the reference's
            # random_val (testbed_nerf.cu:885)
            motion_t = (jax.random.uniform(k_motion, uv.shape[:1])
                        if k_motion is not None else 0.0)
            cams = cam.rolling_shutter_xform(
                cams, data["xforms_end"][img_idx], uv,
                self.rolling_shutter, motion_t)
        if distortion is not None:
            from ..nn.envmap import apply_distortion

            uv = apply_distortion(distortion, uv)
        fl = data["focals"][img_idx] if "focals" in data else self.focal
        pp = data["pps"][img_idx] if "pps" in data else self.pp
        rays = cam.uv_to_ray_batched(
            uv, cams, self.resolution, fl, pp, lens=self.lens
        )
        d_norm = rays.d / jnp.linalg.norm(rays.d, axis=-1, keepdims=True)
        return Ray(rays.o, d_norm)

    def _sample_rays(self, key, n_rays: int | None = None, data=None):
        data = data if data is not None else self.data
        img_idx, uv, texel, _ = self._sample_pixels(data, key, n_rays or self.n_rays)
        return self._rays_for(data, img_idx, uv), texel

    def loss_and_grads(self, params: NerfParams, bitfield, key,
                       n_rays: int | None = None, batch_size: int | None = None,
                       error_map=None, data=None, n_active=None):
        """Pure core of one training step: sample rays -> march -> loss ->
        grads. Shared by the single-chip jit and the shard_map data-parallel
        path (dist/sharded.py), which calls it per-shard and psums the
        result. Returns (loss, grads, n_samples, aux) with aux =
        (img_idx, uv, per_ray_loss) for the error-map deposit.

        bitfield: the occupancy bitfield, or an OccupancyGridState.

        n_active: optional TRACED ray count <= n_rays. The static n_rays
        is a pow2 shape bucket; only the first n_active rays march/train,
        so the host loop can track the reference's EXACT measured-count
        ray adaptation (testbed_nerf.cu:3272-3296 multiplies by
        target/measured with no bucketing) while jit sees a handful of
        static shapes. Inactive and capacity-dropped rays are excluded
        from the loss entirely, like the reference's reservation-failed
        rays (testbed_nerf.cu:960-968)."""
        mean_density = None
        if hasattr(bitfield, "bitfield"):
            mean_density = bitfield.mean_density
            bitfield = bitfield.bitfield
        n_rays = n_rays or self.n_rays
        batch_size = batch_size or self.batch_size
        data = data if data is not None else self.data
        k_rays, k_march, k_bg, k_u, k_motion = jax.random.split(key, 5)
        img_idx, uv, texel, depth_gt = self._sample_pixels(
            data, k_rays, n_rays, error_map)
        rays = self._rays_for(data, img_idx, uv, k_motion=k_motion)
        R = n_rays
        active = (jnp.arange(R) < n_active) if n_active is not None else None

        if self.random_bg:
            bg0 = jax.random.uniform(k_bg, (R, 3))
        else:
            bg0 = jnp.ones((R, 3))
        dirs_warped = (rays.d + 1.0) * 0.5

        w_sharp = None
        if self.sharpness_weighted and "sharpness" in data:
            sh = data["sharpness"]                  # (N_img, G, G), mean 1
            G = sh.shape[1]
            gx = jnp.minimum((uv[:, 0] * G).astype(jnp.int32), G - 1)
            gy = jnp.minimum((uv[:, 1] * G).astype(jnp.int32), G - 1)
            w_sharp = sh[img_idx, gy, gx]
        if "mask" in data:
            mk = data["mask"]                       # (N_img, H, W), 1 = out
            mh, mw = mk.shape[1], mk.shape[2]
            mx = jnp.minimum((uv[:, 0] * mw).astype(jnp.int32), mw - 1)
            my = jnp.minimum((uv[:, 1] * mh).astype(jnp.int32), mh - 1)
            keep = 1.0 - mk[img_idx, my, mx]
            w_sharp = keep if w_sharp is None else w_sharp * keep

        def make_ray_mean(kept_f):
            # mean over rays IN the batch: the reference averages the loss
            # over the rays actually written to it — inactive rays,
            # reservation-dropped rays, and (without envmap training)
            # zero-sample rays never contribute (testbed_nerf.cu:950-968),
            # so their background-vs-target residual must not leak into
            # envmap/exposure gradients or the error map
            denom = jnp.maximum(jnp.sum(kept_f), 1.0)

            def ray_mean(per_ray):
                w = kept_f if w_sharp is None else kept_f * w_sharp
                return jnp.sum(per_ray * w) / denom

            return ray_mean

        def background(p):
            """Random/fixed bg, with the trainable envmap composited on
            top when enabled (gradients reach p.envmap through here)."""
            if self.train_envmap and p.envmap is not None:
                from ..nn.envmap import envmap_background

                return envmap_background(p.envmap, rays.d, bg0)
            return bg0

        # remat=False (default): saving the forward residuals costs ~200MB
        # of HBM per step but skips re-running the hash gather (the single
        # most expensive op, ~96 ms at 2^18) inside the backward. remat=True
        # restores the round-1 memory-light behavior for small-HBM configs.
        net_fn = (lambda p, x, d, u=None, e=None:
                  self.network.forward(p, x, d, extra=e, grad_u=u))
        net_apply = jax.checkpoint(net_fn) if self.remat else net_fn

        if self.use_grid:
            if self.march_skip_steps > 0:
                samples = march_rays_grid_skip(
                    rays, self.aabb, self.grid, bitfield,
                    self.grid.make_skip_grid(bitfield),
                    self.march_skip_steps, self.cone_angle, k_march,
                )
            else:
                samples = march_rays_grid(
                    rays, self.aabb, self.grid, bitfield,
                    self.n_march_steps, self.cone_angle, k_march,
                )
            if active is not None:
                samples = samples._replace(
                    valid=samples.valid & active[:, None])
            # march/network capacity: 2x the target when adapting on the
            # kept count, so the ~1.6x generated-to-kept ratio fits
            # without pervasive whole-ray drops (see adapt_kept in
            # __init__; the reference's buffer is 16x, testbed_nerf.cu:3534)
            cap = batch_size * (2 if self.adapt_kept else 1)
            if self.segment_compaction:
                comp_in = compact_samples_segmented(
                    samples, dirs_warped, cap, whole_rays=True)
            else:
                comp_in = compact_samples(samples, dirs_warped,
                                          cap, whole_rays=True)
            K = (self.march_skip_steps if self.march_skip_steps > 0
                 else self.n_march_steps)
            n_live_pre = None
            if self.adapt_two_pass:
                # pass 1 (no grad): density-only forward on the 2x
                # generation buffer via the aligned-pair gather, then
                # pack the live prefix of every ray into a tight
                # batch_size buffer for the differentiable pass
                xs_gen = jnp.clip(
                    self.aabb.relative_pos(comp_in.xs), 0.0, 1.0)
                raw16 = jax.lax.stop_gradient(
                    self.network.density(params, xs_gen, paired=True))
                live, n_live_pre = live_mask_compacted(
                    raw16[:, 0], comp_in, R, TRAIN_T_EPS)
                comp_in, _ray_has_live = recompact_live(
                    comp_in, live, R, batch_size)
                cap = batch_size
            xs_unit = jnp.clip(self.aabb.relative_pos(comp_in.xs), 0.0, 1.0)
            grad_u = jax.random.uniform(
                k_u, (self.network.pos_encoding.n_levels, cap))
            # rays in the loss: survived the capacity reservation(s) AND
            # (unless the envmap learns from empty rays) have >=1 sample
            kept = (comp_in.ray_kept if self.train_envmap
                    else comp_in.ray_kept & jnp.any(comp_in.valid, axis=1))
            if active is not None:
                kept = kept & active
            ray_mean = make_ray_mean(kept.astype(jnp.float32))

            if self.n_extra_dims > 0:
                sample_img = img_idx[comp_in.ray_idx]

            def loss_fn(params):
                bg = background(params)
                target = texel[:, :3] * texel[:, 3:] + (1.0 - texel[:, 3:]) * bg
                extra = (params.latents[sample_img]
                         if self.n_extra_dims > 0 else None)
                out = net_apply(params, xs_unit, comp_in.dirs, grad_u, extra)
                if self.compacted_composite:
                    # segmented composite on the compacted batch: no
                    # (R, K) scatter_back gather/scatter pair, no dense
                    # composite (bit-equivalent; march/compacted.py)
                    comp = composite_compacted(out, comp_in, R,
                                               TRAIN_T_EPS)
                else:
                    dense = scatter_back(out, comp_in, R, K)
                    comp = composite_rays(
                        dense[..., :3], dense[..., 3], samples.dt,
                        samples.t, comp_in.valid, TRAIN_T_EPS,
                    )
                pred = comp.rgb + comp.transmittance[:, None] * bg
                per_ray = jnp.mean(self.loss_fn(pred, target), axis=-1)
                # mask BEFORE returning as aux: the error-map deposit must
                # not record spurious high error for dropped rays (which
                # would oversample exactly the rays likeliest to drop)
                per_ray = per_ray * kept
                loss = ray_mean(per_ray)
                # the reference's raw-density output regularizers
                # (testbed_nerf.cu:1210-1265), loss-equivalent form with
                # effective per-sample gradient 1e-4 / default loss
                # scale 128:
                # - while the grid's mean density is below the optical-
                #   thickness floor (early training), L1-pull negative
                #   raw densities toward 0 so exp-saturated cells keep
                #   live gradients;
                # - push density DOWN for samples closer than
                #   near_distance ("camera-specific fudge right in front
                #   of the camera" — floaters), gated at raw > -10.
                raw_sigma = out[:, 3].astype(jnp.float32)
                sv = comp_in.slot_valid
                c_reg = 1e-4 / 128.0
                if mean_density is not None:
                    from ..core.constants import MIN_OPTICAL_THICKNESS

                    l1_on = (mean_density
                             < MIN_OPTICAL_THICKNESS).astype(jnp.float32)
                    loss = loss + c_reg * l1_on * jnp.sum(
                        jnp.where(sv, jax.nn.relu(-raw_sigma), 0.0))
                if self.near_distance > 0:
                    near = (sv & (comp_in.t < self.near_distance)
                            & (raw_sigma > -10.0))
                    loss = loss + c_reg * jnp.sum(
                        jnp.where(near, raw_sigma, 0.0))
                if self.depth_supervision_lambda > 0 and depth_gt is not None:
                    # only supervise rays with valid (>0) depth
                    # (testbed_nerf.cu:1680 target_depth > 0 gate); the
                    # same mask/sharpness weights as the color term apply,
                    # so masked-out dynamic content leaks no depth grads
                    mask = depth_gt > 0
                    dl = jnp.where(mask, (comp.depth - depth_gt) ** 2, 0.0)
                    loss = loss + self.depth_supervision_lambda * ray_mean(dl)
                # adaptation count rides the aux: under adapt_kept it is
                # the composite's live-sample count (known only after
                # the density forward — pass 1's pre-reservation demand
                # under two-pass), else the generated occupied count
                if n_live_pre is not None:
                    n_eff = n_live_pre
                elif self.adapt_kept and self.compacted_composite:
                    n_eff = comp.n_live
                else:
                    n_eff = comp_in.n_valid
                return loss, (per_ray, n_eff)

            n_samples = comp_in.n_valid
        else:
            samples = sample_fixed_steps(rays, self.aabb, self.n_steps_per_ray, k_march)
            K = self.n_steps_per_ray
            if active is not None:
                samples = samples._replace(
                    valid=samples.valid & active[:, None])
            kept = (active.astype(jnp.float32) if active is not None
                    else jnp.ones((R,), jnp.float32))
            ray_mean = make_ray_mean(kept)
            xs_unit = jnp.clip(self.aabb.relative_pos(samples.xs), 0.0, 1.0)

            def loss_fn(params):
                bg = background(params)
                target = texel[:, :3] * texel[:, 3:] + (1.0 - texel[:, 3:]) * bg
                extra = (jnp.repeat(params.latents[img_idx], K, axis=0)
                         if self.n_extra_dims > 0 else None)
                out = net_apply(
                    params,
                    xs_unit.reshape(R * K, 3),
                    jnp.repeat(dirs_warped, K, axis=0),
                    None,
                    extra,
                ).reshape(R, K, 4)
                comp = composite_rays(
                    out[..., :3], out[..., 3], samples.dt, samples.t,
                    samples.valid, TRAIN_T_EPS,
                )
                pred = comp.rgb + comp.transmittance[:, None] * bg
                per_ray = jnp.mean(self.loss_fn(pred, target), axis=-1)
                per_ray = per_ray * kept
                loss = ray_mean(per_ray)
                if self.depth_supervision_lambda > 0 and depth_gt is not None:
                    mask = depth_gt > 0
                    dl = jnp.where(mask, (comp.depth - depth_gt) ** 2, 0.0)
                    loss = loss + self.depth_supervision_lambda * ray_mean(dl)
                return loss, (per_ray, jnp.sum(samples.valid))

            n_samples = jnp.sum(samples.valid)

        (loss, (per_ray, n_eff)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        n_samples = n_eff if self.adapt_kept else n_samples
        return loss, grads, n_samples, (img_idx, uv, per_ray)

    def loss_and_grads_camopt(self, params, cam_params: CameraOptParams,
                              bitfield, key, n_rays=None, batch_size=None,
                              data=None, n_active=None):
        """Joint network + camera (pose/exposure) gradients.

        The march/compaction runs with the CURRENT pose (non-diff, like
        the reference which keeps sample generation fixed within a step);
        inside the loss, sample positions are rebuilt from the corrected
        rays so autodiff yields exact dL/d(pose) through the exact (non-
        stochastic) hash encoding. Exposure scales the target like
        testbed_nerf.cu:1119 (`exp(ln2 * exposure[img])`)."""
        n_rays = n_rays or self.n_rays
        batch_size = batch_size or self.batch_size
        data = data if data is not None else self.data
        k_pix, k_march, k_bg = jax.random.split(key, 3)
        img_idx, uv, texel, _depth_gt = self._sample_pixels(data, k_pix, n_rays)
        rays0 = self._rays_for(data, img_idx, uv, cam_params)
        samples = march_rays_grid(
            Ray(jax.lax.stop_gradient(rays0.o), jax.lax.stop_gradient(rays0.d)),
            self.aabb, self.grid, bitfield,
            self.n_march_steps, self.cone_angle, k_march,
        )
        dirs0 = (rays0.d + 1.0) * 0.5
        if n_active is not None:
            samples = samples._replace(
                valid=samples.valid
                & (jnp.arange(n_rays) < n_active)[:, None])
        comp_in = compact_samples(samples, jax.lax.stop_gradient(dirs0),
                                  batch_size, whole_rays=True)
        R, K = samples.valid.shape
        # exclude dropped/inactive/empty rays from the loss: their
        # background-vs-target residual would otherwise leak into the
        # pose/exposure/envmap gradients (testbed_nerf.cu:950-968 skips
        # them before the ray enters the batch)
        kept = (comp_in.ray_kept if self.train_envmap
                else comp_in.ray_kept & jnp.any(comp_in.valid, axis=1))
        if n_active is not None:
            kept = kept & (jnp.arange(n_rays) < n_active)
        kept_f = kept.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(kept_f), 1.0)
        bg = (jax.random.uniform(k_bg, (n_rays, 3)) if self.random_bg
              else jnp.ones((n_rays, 3)))

        def loss_fn(params, cam_params):
            rays = self._rays_for(
                data, img_idx, uv, cam_params,
                distortion=params.distortion if self.train_distortion else None)
            o_s = rays.o[comp_in.ray_idx]
            d_s = rays.d[comp_in.ray_idx]
            xs = o_s + d_s * comp_in.t[:, None]
            xs_unit = jnp.clip(self.aabb.relative_pos(xs), 0.0, 1.0)
            dirs = (d_s + 1.0) * 0.5
            extra = (params.latents[img_idx[comp_in.ray_idx]]
                     if self.n_extra_dims > 0 else None)
            out = self.network.forward(params, xs_unit, dirs, extra=extra)
            if self.compacted_composite:
                comp = composite_compacted(out, comp_in, R, TRAIN_T_EPS)
            else:
                dense = scatter_back(out, comp_in, R, K)
                comp = composite_rays(
                    dense[..., :3], dense[..., 3], samples.dt, samples.t,
                    comp_in.valid, TRAIN_T_EPS,
                )
            if self.train_envmap and params.envmap is not None:
                from ..nn.envmap import envmap_background

                bg_eff = envmap_background(params.envmap, rays.d, bg)
            else:
                bg_eff = bg
            pred = comp.rgb + comp.transmittance[:, None] * bg_eff
            exposure_scale = jnp.exp2(cam_params.exposure[img_idx])[:, None]
            target = (texel[:, :3] * exposure_scale * texel[:, 3:]
                      + (1.0 - texel[:, 3:]) * bg_eff)
            per_ray = jnp.mean(self.loss_fn(pred, target), axis=-1)
            return jnp.sum(per_ray * kept_f) / denom

        loss, (g_net, g_cam) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            params, cam_params)
        if not self.optimize_extrinsics:
            g_cam = g_cam._replace(rot=jnp.zeros_like(g_cam.rot),
                                   trans=jnp.zeros_like(g_cam.trans))
        if not self.optimize_exposure:
            g_cam = g_cam._replace(exposure=jnp.zeros_like(g_cam.exposure))
        return loss, g_net, g_cam, comp_in.n_valid

    def _train_step(self, state: NerfTrainState, n_rays: int | None = None,
                    data=None, n_active=None):
        key, k_step = jax.random.split(state.key)
        n_rays = n_rays or self.n_rays
        batch_size = self.batch_size
        ax = self.spmd_axis
        if self.n_shards > 1:
            # per-shard slice of the global batch; disjoint RNG streams
            k_step = jax.random.fold_in(k_step, jax.lax.axis_index(ax))
            n_rays = n_rays // self.n_shards
            batch_size = batch_size // self.n_shards
            if n_active is not None:
                n_active = n_active // self.n_shards
        emap = state.error_map
        if state.cam_opt is not None:
            loss, grads, g_cam, n_samples = self.loss_and_grads_camopt(
                state.params, state.cam_opt.params, state.grid.bitfield,
                k_step, n_rays=n_rays, batch_size=batch_size, data=data,
                n_active=n_active)
            if self.n_shards > 1:
                g_cam = jax.lax.pmean(g_cam, ax)
            cam_opt = camera_opt_update(state.cam_opt, g_cam)
        else:
            loss, grads, n_samples, aux = self.loss_and_grads(
                state.params, state.grid, k_step, n_rays=n_rays,
                batch_size=batch_size, error_map=emap, data=data,
                n_active=n_active,
            )
            cam_opt = None
            if emap is not None:
                from .error_map import deposit

                emap = deposit(emap, *aux, axis_name=ax)
        if self.n_shards > 1:
            # XLA overlaps these all-reduces with the backward pass
            loss = jax.lax.pmean(loss, ax)
            grads = jax.lax.pmean(grads, ax)
            n_samples = jax.lax.psum(n_samples, ax)
        params, opt_state = self.opt.update(grads, state.opt_state, state.params)
        return (NerfTrainState(params, opt_state, state.grid, key, cam_opt,
                               emap),
                loss, n_samples)

    def _grid_update_fn(self, state: NerfTrainState, full_sweep: bool):
        M = self.grid.n_cascades * self.grid.G**3
        key, k_grid = jax.random.split(state.key)
        # build the aligned-pair table ONCE for the whole update — the
        # density_fn runs inside a chunked lax.map, and rebuilding the
        # 94 MB table per chunk cost ~33 ms x n_chunks on chip
        pt = self.network.pos_encoding.make_paired_table(
            state.params.hash_table)
        density_fn = lambda xs: self.network.density(
            state.params, xs, paired_table=pt)[:, 0]
        if full_sweep:
            n_uniform, n_nonuniform = M, 0
        else:
            n_uniform = n_nonuniform = M // 4
        if self.n_shards > 1:
            # each shard probes its own slice of cells; pmax combines
            k_grid = jax.random.fold_in(
                k_grid, jax.lax.axis_index(self.spmd_axis))
            n_uniform //= self.n_shards
            n_nonuniform //= self.n_shards
        gstate = self.grid.update(
            state.grid, density_fn, self.aabb, k_grid, n_uniform,
            n_nonuniform, axis_name=self.spmd_axis,
        )
        return state._replace(grid=gstate, key=key)

    def _train_scan(self, state: NerfTrainState, data, n_steps: int,
                    update_grid_every_step: bool, n_rays: int | None = None,
                    n_active=None):
        """n_steps training steps fused into ONE device dispatch via
        lax.scan — removes the per-dispatch host/relay round-trip that
        would otherwise dominate wall-clock (SURVEY.md §7 'host/device
        ping-pong ... the TPU design removes these').

        n_rays is the STATIC pow2 shape bucket; n_active (traced scalar)
        is the exact ray count the adaptive loop tracks — changing it
        never recompiles."""

        def body(s, _):
            if update_grid_every_step and self.use_grid:
                s = self._grid_update_fn(s, False)
            s, loss, n_samples = self._train_step(s, n_rays, data, n_active)
            return s, (loss, n_samples)

        state, (losses, n_samples) = jax.lax.scan(
            body, state, None, length=n_steps
        )
        return state, losses, n_samples

    def step(self, state: NerfTrainState):
        """One full training step incl. the grid-update cadence."""
        if self.use_grid:
            s = self.host_step
            if s < self.grid_warmup_steps or s % self.grid_update_cadence == 0:
                state = self._grid_update(state, s < self.grid_warmup_steps)
        state, loss, n_samples = self._step(state, None, self.data)
        self.host_step += 1
        return state, loss

    def train(self, state: NerfTrainState, n_steps: int, log_every: int = 0,
              log_fn=print, adaptive_rays: bool = True, metrics=None):
        """Fast path: batches `grid_update_cadence` steps per dispatch.
        During grid warmup (host_step < grid_warmup_steps) the grid update
        is fused into every scanned step, matching the reference cadence
        (testbed.cu:4082). With adaptive_rays, the ray count per batch is
        retuned after every block so the compacted sample count tracks
        `batch_size` EXACTLY (`rays * target / measured`,
        testbed_nerf.cu:3272-3296 — no bucketing): the jit shape is the
        next pow2 bucket (bounded recompiles) while the traced n_active
        marches/trains the exact count, so the batch fills to ~100%
        instead of the floor-bucket's worst-case 50%. Overshoot is safe:
        overflow rays are whole-ray-dropped AND excluded from the loss."""
        import math as _math

        losses = []
        done = 0
        cur_rays = self._adaptive_rays if hasattr(self, "_adaptive_rays") else self.n_rays

        def bucket_of(n):
            # static jit shape: smallest pow2 >= the exact count (so at
            # most ~half the marched rays are inactive padding)
            return min(1 << int(_math.ceil(_math.log2(max(n, 1)))), 1 << 16)

        while done < n_steps:
            warmup = self.use_grid and self.host_step < self.grid_warmup_steps
            if warmup:
                n = min(self.grid_warmup_steps - self.host_step,
                        self.scan_block_steps, n_steps - done)
                if self.host_step == 0:
                    state = self._grid_update(state, True)
            else:
                cadence_left = (self.grid_update_cadence
                                - self.host_step % self.grid_update_cadence)
                if self.use_grid and cadence_left == self.grid_update_cadence:
                    state = self._grid_update(state, False)
                n = min(self.scan_block_steps, cadence_left, n_steps - done)
            state, ls, n_samples = self._scan_steps(
                state, self.data, n, warmup, bucket_of(cur_rays),
                jnp.int32(cur_rays))
            # host-sync once per block: the remote-TPU relay treats
            # block_until_ready as a no-op, so an unsynced loop floods the
            # worker's execution queue (observed worker crashes); a scalar
            # fetch paces the loop at negligible cost
            last_loss = float(ls[-1])
            self.host_step += n
            done += n
            if adaptive_rays and self.use_grid and not warmup:
                measured = float(jnp.mean(n_samples))
                if measured > 0:
                    # exact measured-count adaptation (reference
                    # update_after_training): overshoot no longer fogs —
                    # overflow rays are dropped whole AND masked from the
                    # loss — so track the target exactly. Cap keeps the
                    # dense (R, K) march tensors bounded
                    # (~R*K*21 B; 2^16 rays x 1024 steps ~ 1.4 GB).
                    ideal = cur_rays * self.batch_size / measured
                    cur_rays = int(np.clip(round(ideal), 512, 1 << 16))
            if metrics is not None:
                import time as _time

                measured = float(jnp.mean(n_samples))
                metrics.log(self.host_step, loss=last_loss,
                            rays_per_batch=cur_rays,
                            measured_samples=measured,
                            samples_per_ray=measured / max(cur_rays, 1))
            if log_every and (done // log_every) != ((done - n) // log_every):
                losses.append(last_loss)
                log_fn(f"step {self.host_step}: loss {last_loss:.6f} "
                       f"rays/batch {cur_rays}")
        self._adaptive_rays = cur_rays
        if not losses and n_steps > 0:
            losses.append(last_loss)
        return state, losses

    # ------------------------------------------------------------ rendering
    def _memo_render_jit(self, key, build):
        """Cache jitted render programs across render_image calls (one
        per static configuration): per-view calls then reuse one traced
        executable instead of re-jitting a fresh closure every view."""
        cache = getattr(self, "_render_jits", None)
        if cache is None:
            cache = {}
            self._render_jits = cache
        if key not in cache:
            cache[key] = build()
        return cache[key]

    def render_image(
        self,
        params: NerfParams,
        camera_matrix,
        width: int | None = None,
        height: int | None = None,
        grid_state: OccupancyGridState | None = None,
        n_steps: int | None = None,
        bg_color=(0.0, 0.0, 0.0),
        min_transmittance: float = EVAL_MIN_TRANSMITTANCE,
        chunk: int = 1 << 11,
        spp: int = 1,
        aperture_size: float = 0.0,
        focus_z: float = 1.0,
        render_mode: str = "shade",
        render_aabb: BoundingBox | None = None,
        render_aabb_to_local: jnp.ndarray | None = None,
        slice_plane_z: float = 0.0,
        seed: int = 0,
        snap_to_pixel_centers: bool = False,
        overlay: str | None = None,
        overlay_image=None,
        overlay_alpha: float = 1.0,
        error_map_view=None,
        mesh=None,
    ) -> dict:
        """Render a full frame (sRGB rgb + alpha + depth), chunked over
        pixel blocks. Uses the grid marcher when grid_state given.

        Feature parity with the reference renderer (N8/N13):
        - spp > 1 averages jittered sub-pixel + march offsets (and DOF
          aperture samples when aperture_size > 0, testbed.cu DOF path);
        - render_mode in {shade, depth, normals, positions, ao, cost,
          slice, encoding_vis, distortion} (ERenderMode, common.h:56-68) —
          normals are derived from the density gradient, cost is march
          samples per ray, slice shows density on the camera-space plane
          at distance `slice_plane_z` from the camera, encoding_vis shows
          the finest-level hash features at the termination point, and
          distortion false-colors the trained lens-distortion field;
        - render_aabb crops rendering to a sub-box; render_aabb_to_local
          (3,3) rotates the crop about its center (parity with the
          reference's render_aabb_to_local);
        - mesh: a jax.sharding.Mesh fans the pixel chunks out over its
          devices (the reference's multi-GPU render path,
          testbed.cu:5097-5132, rebuilt as shard_map over pixel chunks:
          params/bitfield replicated, chunk axis sharded). Per-chunk RNG
          seeds match the serial path exactly, so the sharded frame is
          bit-identical to the single-device frame."""
        w = width or self.resolution[0]
        h = height or self.resolution[1]
        # focal is stored in dataset pixels; rendering at another
        # resolution keeps the FOV by scaling it (the reference stores a
        # relative focal length and multiplies by the render resolution)
        focal_render = jnp.asarray(self.focal, jnp.float32) * jnp.asarray(
            [w / self.resolution[0], h / self.resolution[1]], jnp.float32)
        use_grid = grid_state is not None
        n_steps = n_steps or (self.n_march_steps if use_grid else 2 * self.n_steps_per_ray)
        cm = jnp.asarray(camera_matrix, jnp.float32)
        uv_all = np.stack(
            np.meshgrid(
                (np.arange(w, dtype=np.float32) + 0.5) / w,
                (np.arange(h, dtype=np.float32) + 0.5) / h,
            ),
            axis=-1,
        ).reshape(-1, 2)
        bg = jnp.asarray(bg_color, jnp.float32)
        # rotated crops can't drive the marcher's slab test; march the
        # scene box and mask samples against the local-frame crop instead
        rotated_crop = (render_aabb is not None
                        and render_aabb_to_local is not None)
        march_aabb = (render_aabb
                      if (render_aabb is not None and not rotated_crop)
                      else self.aabb)
        mode = render_mode.lower()

        # one compiled renderer per STATIC configuration, reused across
        # views/frames: the camera matrix and focal are traced arguments,
        # not baked constants, so per-view calls hit the same executable
        # (previously every view re-jitted a fresh closure with cm baked
        # in => one remote AOT compile per eval view)
        jit_key = (
            w, h, spp, chunk, mode, n_steps, use_grid,
            float(min_transmittance), float(aperture_size), float(focus_z),
            float(slice_plane_z), rotated_crop,
            bool(snap_to_pixel_centers),
            tuple(np.asarray(bg_color, np.float32).ravel().tolist()),
            None if render_aabb is None else (
                tuple(np.asarray(render_aabb.lo).ravel().tolist()),
                tuple(np.asarray(render_aabb.hi).ravel().tolist()),
                None if render_aabb_to_local is None else
                tuple(np.asarray(render_aabb_to_local).ravel().tolist())),
        )

        def crop_mask(xs):
            if not rotated_crop:
                return None
            center = render_aabb.center
            local = jnp.einsum("ij,...j->...i", render_aabb_to_local,
                               xs - center) + center
            return render_aabb.contains(local)

        def one_spp(p, pt, gbits, sgrid, cm, focal_r, uv, key_s):
            R = uv.shape[0]
            if True:  # (indentation shim: body shared with the old loop)
                k_uv, k_ap, k_m = jax.random.split(key_s, 3)
                uv_s = uv
                if spp > 1 and not snap_to_pixel_centers:
                    uv_s = uv + (jax.random.uniform(k_uv, uv.shape) - 0.5) / jnp.asarray([w, h])
                ap_uv = (jax.random.uniform(k_ap, (R, 2))
                         if aperture_size > 0 else None)
                rays = cam.uv_to_ray(uv_s, cm, (w, h), focal_r, self.pp,
                                     aperture_size=aperture_size,
                                     focus_z=focus_z, aperture_uv=ap_uv,
                                     lens=self.lens)
                d_norm = rays.d / jnp.linalg.norm(rays.d, axis=-1, keepdims=True)
                rays = Ray(rays.o, d_norm)
                dirs_warped = (d_norm + 1.0) * 0.5
                if use_grid:
                    # windowed march+compaction (reference trace-loop
                    # semantics, testbed_nerf.cu:2279-2435): no sample
                    # budget can starve a ray — clipped samples are
                    # re-marched next iteration; terminated rays stop
                    # costing network evals. Replaces the single-shot
                    # full-march compaction whose 2^18 cap starved the
                    # tail rays of each chunk (horizontal banding).
                    def net_apply(xs_c, dirs_c):
                        xs_unit = jnp.clip(
                            self.aabb.relative_pos(xs_c), 0.0, 1.0)
                        return self.network.forward(
                            p, xs_unit, dirs_c, paired_table=pt)

                    comp = render_march_windowed(
                        rays, march_aabb, self.grid, gbits, net_apply,
                        n_steps, self.cone_angle,
                        k_m if spp > 1 else None, dirs_warped,
                        window=64,
                        budget=min(chunk * 16, 1 << 16),
                        min_transmittance=min_transmittance,
                        crop_mask=crop_mask if rotated_crop else None,
                        skip_grid=sgrid,
                    )
                    n_marched = comp.n_marched
                else:
                    samples = sample_fixed_steps(rays, march_aabb, n_steps)
                    cmask = crop_mask(samples.xs)
                    if cmask is not None:
                        samples = samples._replace(valid=samples.valid & cmask)
                    xs_unit = jnp.clip(self.aabb.relative_pos(samples.xs), 0.0, 1.0)
                    out = self.network.forward(
                        p, xs_unit.reshape(R * n_steps, 3),
                        jnp.repeat(dirs_warped, n_steps, axis=0),
                        paired_table=pt,
                    ).reshape(R, n_steps, 4)
                    comp = composite_rays(
                        out[..., :3], out[..., 3], samples.dt, samples.t,
                        samples.valid, min_transmittance,
                    )
                    n_marched = jnp.sum(samples.valid, axis=1)

                # unified depth semantics (both render paths + the hybrid
                # engine): opacity-normalized expected depth — the surface
                # distance, not the opacity-attenuated sum. Empty pixels
                # report 0.
                comp = comp._replace(depth=jnp.where(
                    comp.opacity > 0.01,
                    comp.depth / jnp.maximum(comp.opacity, 1e-6), 0.0))

                if mode == "slice":
                    # density on the view-space plane slice_plane_z in
                    # front of the camera (ERenderMode::Slice): grayscale
                    # 1-exp(-sigma*dt) alpha of the plane samples
                    p_sl = rays.o + rays.d * jnp.float32(slice_plane_z)
                    inside = march_aabb.contains(p_sl)
                    xs_sl = jnp.clip(self.aabb.relative_pos(p_sl), 0.0, 1.0)
                    sigma = self.network.density(
                        p, xs_sl, paired_table=pt)[:, 0]
                    a = 1.0 - jnp.exp(-sigma * jnp.float32(
                        np.sqrt(3.0) / 1024.0))
                    a = jnp.where(inside, a, 0.0)
                    rgb = jnp.broadcast_to(a[:, None], (R, 3))
                elif mode == "encoding_vis":
                    # hash-encoding activations at the termination point
                    # (ERenderMode::EncodingVis): finest-level features
                    # mapped to RGB around mid-gray
                    term = rays.o + rays.d * comp.depth[:, None]
                    xs_t = jnp.clip(self.aabb.relative_pos(term), 0.0, 1.0)
                    enc = self.network.pos_encoding(
                        p.hash_table, xs_t)             # (R, L*F)
                    rgb = jnp.clip(0.5 + enc[:, -3:], 0.0, 1.0)
                    rgb = rgb * comp.opacity[:, None]
                elif mode == "distortion":
                    # trained lens-distortion field over the image plane
                    # (ERenderMode::Distortion): uv displacement -> color
                    if p.distortion is not None:
                        from ..nn.envmap import apply_distortion

                        duv = apply_distortion(p.distortion, uv_s) - uv_s
                    else:
                        duv = jnp.zeros_like(uv_s)
                    rgb = jnp.concatenate(
                        [jnp.clip(0.5 + 100.0 * duv, 0.0, 1.0),
                         jnp.full((R, 1), 0.5)], axis=-1)
                elif mode == "depth":
                    rgb = jnp.broadcast_to(comp.depth[:, None], (R, 3))
                elif mode == "positions":
                    term = rays.o + rays.d * comp.depth[:, None]
                    rgb = jnp.clip(self.aabb.relative_pos(term), 0.0, 1.0)
                elif mode == "cost":
                    rgb = jnp.broadcast_to(
                        (n_marched.astype(jnp.float32) / n_steps)[:, None], (R, 3))
                elif mode in ("normals", "ao"):
                    term = rays.o + rays.d * comp.depth[:, None]
                    xs_t = jnp.clip(self.aabb.relative_pos(term), 0.0, 1.0)
                    eps = 2e-3
                    g = []
                    for ax in range(3):
                        e = jnp.zeros(3).at[ax].set(eps)
                        g.append(
                            self.network.density(
                                p, jnp.clip(xs_t + e, 0, 1),
                                paired_table=pt)[:, 0]
                            - self.network.density(
                                p, jnp.clip(xs_t - e, 0, 1),
                                paired_table=pt)[:, 0])
                    n_vec = -jnp.stack(g, -1).astype(jnp.float32)
                    n_vec = n_vec / jnp.maximum(
                        jnp.linalg.norm(n_vec, axis=-1, keepdims=True), 1e-9)
                    if mode == "normals":
                        rgb = 0.5 * (n_vec + 1.0) * comp.opacity[:, None]
                    else:  # ao: headlight-style n.v shading
                        rgb = jnp.broadcast_to(
                            jnp.abs(jnp.sum(n_vec * rays.d, -1))[:, None], (R, 3)
                        ) * comp.opacity[:, None]
                else:
                    if self.train_envmap and p.envmap is not None:
                        from ..nn.envmap import envmap_background

                        bg_r = envmap_background(
                            p.envmap, rays.d, jnp.broadcast_to(bg, (R, 3)))
                    else:
                        bg_r = bg
                    rgb = comp.rgb + comp.transmittance[:, None] * bg_r
                return rgb, comp.opacity, comp.depth

        def render_chunk_impl(p, pt, gbits, sgrid, cm, focal_r, uv, key):
            # one spp per fori iteration. The old Python loop unrolled
            # spp complete march+network copies into a single program;
            # at spp 8 (the eval protocol) the TPU compiler ran out of
            # temp space. The rolled loop compiles one body and reuses
            # its buffers.
            if spp == 1:
                return one_spp(p, pt, gbits, sgrid, cm, focal_r, uv, key)
            R = uv.shape[0]

            def body(s, acc):
                r, a, d = one_spp(p, pt, gbits, sgrid, cm, focal_r, uv,
                                  jax.random.fold_in(key, s))
                return (acc[0] + r, acc[1] + a, acc[2] + d)

            acc = jax.lax.fori_loop(0, spp, body, (
                jnp.zeros((R, 3)), jnp.zeros((R,)), jnp.zeros((R,))))
            return tuple(a / spp for a in acc)

        gbits = grid_state.bitfield if use_grid else None
        # aligned-pair table built once per frame, not per chunk — and the
        # jit wrappers themselves once per TRAINER: a fresh jax.jit() per
        # call would re-trace (and remote-AOT-recompile) every frame
        paired_tbl = self._memo_render_jit(
            "paired_table",
            lambda: jax.jit(self.network.pos_encoding.make_paired_table),
        )(params.hash_table)
        # dilated empty-space skip grid, also once per frame: the
        # windowed march's coarse lookahead proves empty stretches
        # unoccupied with ~cell-sized strides instead of per-step probes
        skip_tbl = (self._memo_render_jit(
            "skip_grid", lambda: jax.jit(self.grid.make_skip_grid))(gbits)
            if use_grid else None)
        n_px = uv_all.shape[0]
        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            n_dev = mesh.devices.size
            n_chunks = -(-n_px // chunk)
            n_chunks = -(-n_chunks // n_dev) * n_dev   # multiple of mesh
            pad = n_chunks * chunk - n_px
            uv_pad = np.concatenate(
                [uv_all, np.zeros((pad, 2), np.float32)])
            uv_chunks = jnp.asarray(uv_pad.reshape(n_chunks, chunk, 2))
            # byte-offset seeds identical to the serial loop below
            seeds = jnp.arange(n_chunks, dtype=jnp.uint32) * chunk + seed

            def dev_body(p, pt, gb, sg, cmx, fr, uvs, sds):
                def one(args):
                    uv_c, sd = args
                    return render_chunk_impl(
                        p, pt, gb, sg, cmx, fr, uv_c,
                        jax.random.PRNGKey(sd))

                return jax.lax.map(one, (uvs, sds))

            spec_in = (P(), P(), P(), P(), P(), P(), P("data"), P("data"))
            # stable mesh identity (axis names + layout + device ids):
            # id(mesh) can be recycled by the GC and silently hit a stale
            # compiled program for a different mesh
            mesh_key = ("mesh", tuple(mesh.axis_names),
                        tuple(mesh.devices.shape),
                        tuple(d.id for d in mesh.devices.flat))
            fan = self._memo_render_jit(
                jit_key + mesh_key,
                lambda: jax.jit(shard_map(
                    dev_body, mesh=mesh, in_specs=spec_in,
                    out_specs=(P("data"), P("data"), P("data")),
                    check_vma=False)))
            if gbits is None:
                gbits_arg = jnp.zeros((), jnp.float32)  # placeholder leaf
                skip_arg = jnp.zeros((), jnp.float32)
            else:
                gbits_arg = gbits
                skip_arg = skip_tbl
            r, a, d = fan(params, paired_tbl, gbits_arg, skip_arg,
                          cm, focal_render, uv_chunks, seeds)
            rgb = np.asarray(r).reshape(-1, 3)[:n_px].reshape(h, w, 3)
            alpha = np.asarray(a).reshape(-1)[:n_px].reshape(h, w)
            depth = np.asarray(d).reshape(-1)[:n_px].reshape(h, w)
            if overlay:
                rgb = apply_overlay(rgb, overlay, overlay_image,
                                    overlay_alpha, error_map_view)
            return {"rgb": rgb, "alpha": alpha, "depth": depth}
        render_chunk = self._memo_render_jit(
            jit_key, lambda: jax.jit(render_chunk_impl))
        rgbs, alphas, depths = [], [], []
        pad = (-n_px) % chunk
        uv_pad = np.concatenate([uv_all, np.zeros((pad, 2), np.float32)])
        for i in range(0, uv_pad.shape[0], chunk):
            uv = jnp.asarray(uv_pad[i : i + chunk])
            r, a, d = render_chunk(params, paired_tbl, gbits, skip_tbl,
                                   cm, focal_render, uv,
                                   jax.random.PRNGKey(seed + i))
            rgbs.append(np.asarray(r))
            alphas.append(np.asarray(a))
            depths.append(np.asarray(d))
        rgb = np.concatenate(rgbs)[:n_px].reshape(h, w, 3)
        alpha = np.concatenate(alphas)[:n_px].reshape(h, w)
        depth = np.concatenate(depths)[:n_px].reshape(h, w)
        if overlay:
            rgb = apply_overlay(rgb, overlay, overlay_image, overlay_alpha,
                                error_map_view)
        return {"rgb": rgb, "alpha": alpha, "depth": depth}

    def autofocus(self, params: NerfParams, camera_matrix,
                  grid_state: OccupancyGridState | None = None) -> float:
        """Depth at the screen center -> DOF focus distance
        (testbed.cu:4733 autofocus behavior)."""
        out = self.render_image(params, camera_matrix, width=8, height=8,
                                grid_state=grid_state, n_steps=256,
                                chunk=64)
        d = out["depth"][3:5, 3:5]
        d = d[np.isfinite(d) & (d > 0)]
        return float(d.mean()) if d.size else 1.0

    def inference_params(self, state: NerfTrainState) -> NerfParams:
        return self.opt.inference_params(state.opt_state)
