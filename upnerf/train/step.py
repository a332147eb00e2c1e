"""The jitted UP-NeRF train step.

One pure function replaces the reference's manual-optimization Lightning
`training_step` (models/nerf_system.py:150-229): ray building from pixel
coords + refined SE(3) poses, the depth prior, rendering, transient
compositing, the scheduled loss, and BOTH optimizer updates, all fused into
a single XLA program. The candidate-schedule phase is a static argument
(three specializations over a whole run); `sched_mult`/`progress` are traced
scalars derived from `state.step`.

Data flow is device-first: the batch is (px, py, img_idx, rgb_u8,
inv_depth) gathered from the compact RayStore; ray directions
(utils/ray.py:5-27), DINO feature bilinear gathers
(datasets/phototourism.py:430-453) and u8->f32 conversion happen on device.
Under a data mesh, the batch is sharded on rays and parameters are
replicated; XLA inserts the gradient all-reduce automatically.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from upnerf.geometry import rays as ray_utils
from upnerf.geometry import se3
from upnerf.models import NeRFConfig, TransientConfig, apply_transient
from upnerf.ops.interp import bilinear_gather
from upnerf.render import RenderConfig, render_rays

from .losses import LossConfig, compute_loss
from .schedules import schedule_mult
from .state import RayStore, SceneConstants, TrainState


class StepConfig(NamedTuple):
    """Static configuration bundle for the train step."""

    nerf: NeRFConfig
    transient: Optional[TransientConfig]
    render: RenderConfig
    loss: LossConfig
    candidate_schedule: Tuple[float, float]
    max_steps: int
    pose_optimize: bool
    near: float  # global clamp bounds for the depth prior
    far: float
    batch_size: int
    prng_impl: str = "rbg"
    # Feature coarse-to-fine window (no reference equivalent, default off):
    # supervise against the low-pass pyramid level of the DINO stack for
    # progress < start, blend linearly to the full-resolution features by
    # progress > end. Requires SceneConstants.feat_maps_coarse (built by
    # make_scene_constants when `feat.pyramid_sigma` > 0). Smoothed
    # feature targets have a spatially smoother loss landscape in the
    # pose variables — the feature-space analog of the BARF PE anneal.
    feat_c2f: Optional[Tuple[float, float]] = None

    @classmethod
    def from_hparams(cls, hp: Dict[str, Any]) -> "StepConfig":
        return cls(
            nerf=NeRFConfig.from_hparams(hp),
            transient=TransientConfig.from_hparams(hp),
            render=RenderConfig.from_hparams(hp),
            loss=LossConfig.from_hparams(hp),
            candidate_schedule=tuple(hp["candidate_schedule"]),
            max_steps=hp["max_steps"],
            pose_optimize=hp["pose.optimize"],
            near=hp["nerf.near"],
            far=hp["nerf.far"],
            batch_size=hp["train.batch_size"],
            prng_impl=hp.get("tpu.prng_impl", "rbg"),
            feat_c2f=(tuple(hp["feat.c2f"]) if hp.get("feat.c2f")
                      else None),
        )


def gather_batch(store: RayStore, idx: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Gather a compact ray batch by flat index (device-side)."""
    return {
        "px": store.px[idx].astype(jnp.float32),
        "py": store.py[idx].astype(jnp.float32),
        "img_idx": store.img_idx[idx],
        "rgb": store.rgb[idx].astype(jnp.float32) / 255.0,
        "inv_depth": store.inv_depth[idx].astype(jnp.float32),
    }


def build_rays(
    pose_params: Dict[str, jnp.ndarray],
    scene: SceneConstants,
    batch: Dict[str, jnp.ndarray],
    pose_optimize: bool,
) -> jnp.ndarray:
    """Pixel coords -> world rays (B, 8) through the refined per-image pose
    (models/nerf_system.py:158-166)."""
    img_idx = batch["img_idx"]
    dirs = ray_utils.pixel_directions(batch["px"], batch["py"], scene.Ks[img_idx])
    pose = scene.poses[img_idx]  # (B, 3, 4)
    if pose_optimize:
        pose_refine = se3.se3_to_SE3(pose_params["se3"][img_idx])
        pose = se3.compose([pose_refine, pose])
    rays_o, rays_d = ray_utils.get_rays(dirs, pose)
    near_far = scene.near_far[img_idx]  # (B, 2)
    return jnp.concatenate([rays_o, rays_d, near_far], axis=-1)


def depth_prior(
    pose_params: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    near: float,
    far: float,
) -> jnp.ndarray:
    """Per-image scale/shift on the DPT inverse depth with clamps
    (models/nerf_system.py:168-177). The clamp gradients vanish on the
    clamped side, matching torch's masked in-place assignment."""
    scale_shift = pose_params["depth_scale"][batch["img_idx"]]
    scale = jnp.exp(scale_shift[:, 0])
    shift = scale_shift[:, 1]
    pred_inv = batch["inv_depth"] * scale + shift
    pred_inv = jnp.maximum(pred_inv, 1.0 / far)
    pred_depth = 1.0 / pred_inv
    return jnp.maximum(pred_depth, near)


def gather_feats(
    scene: SceneConstants,
    batch: Dict[str, jnp.ndarray],
    feat_c2f: Optional[Tuple[float, float]] = None,
    progress: Optional[jnp.ndarray] = None,
) -> Optional[jnp.ndarray]:
    """Bilinear DINO features for the batch pixels (device-side equivalent
    of datasets/phototourism.py:430-453).

    With `feat_c2f=(start, end)` and a coarse pyramid level present, the
    gather blends low-pass -> full-resolution features linearly over the
    progress window (traced; static shapes) — the feature-space
    coarse-to-fine schedule. Outside the window (or without the pyramid)
    this is exactly the plain gather."""
    if scene.feat_maps is None:
        return None
    img_idx = batch["img_idx"]
    wh = scene.wh[img_idx].astype(jnp.float32)  # (B, 2) = (W, H)
    u = batch["py"] / jnp.maximum(wh[:, 1] - 1.0, 1.0)
    v = batch["px"] / jnp.maximum(wh[:, 0] - 1.0, 1.0)
    fine = bilinear_gather(scene.feat_maps, img_idx, u, v)
    if feat_c2f is None or scene.feat_maps_coarse is None or progress is None:
        return fine
    s, e = feat_c2f
    w = jnp.clip((progress - s) / max(e - s, 1e-8), 0.0, 1.0)
    coarse = bilinear_gather(scene.feat_maps_coarse, img_idx, u, v)
    return (1.0 - w) * coarse + w * fine


def forward(
    params: Dict[str, Any],
    pose_params: Dict[str, jnp.ndarray],
    cfg: StepConfig,
    scene: SceneConstants,
    batch: Dict[str, jnp.ndarray],
    key: Optional[jax.Array],
    *,
    phase: int,
    sched_mult: jnp.ndarray,
    progress: jnp.ndarray,
    det: bool = False,
    noise: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray], Optional[jnp.ndarray]]:
    """Render + transient composite (models/nerf_system.py:93-148).

    Returns (results, loss_dict-inputs ready, feats)."""
    rays = build_rays(pose_params, scene, batch, cfg.pose_optimize)
    feats = gather_feats(scene, batch, cfg.feat_c2f, progress)

    render_params = {
        "nerf_coarse": params["nerf_coarse"],
        "nerf_fine": params.get("nerf_fine"),
        "embeddings": params["embeddings"],
    }
    results = render_rays(
        render_params,
        cfg.render,
        cfg.nerf,
        rays,
        batch["img_idx"],
        key=key,
        phase=phase,
        sched_mult=sched_mult,
        progress=progress,
        det=det,
        noise=noise,
    )

    if phase > 0 and cfg.transient is not None and feats is not None:
        t_res = apply_transient(
            params["transient"], cfg.transient, feats, batch["img_idx"],
            precision=cfg.render.precision,
        )
        t_alpha, t_rgb, t_beta = t_res["alpha"], t_res["rgb"], t_res["beta"]
        sg = jax.lax.stop_gradient
        # Coarse composite fully detaches the transient; fine does not
        # (models/nerf_system.py:136-142).
        results["rgb_coarse"] = (
            results["s_rgb_coarse"] * (1.0 - sg(t_alpha))[:, None]
            + sg(t_rgb) * sg(t_alpha)[:, None]
        )
        if "s_rgb_fine" in results:
            results["rgb_fine"] = (
                results["s_rgb_fine"] * (1.0 - t_alpha)[:, None]
                + t_rgb * t_alpha[:, None]
            )
        results["t_beta"] = t_beta
        results["t_alpha"] = t_alpha
        results["t_rgb"] = t_rgb
    elif phase > 0:
        results["rgb_coarse"] = results["s_rgb_coarse"]

    return results, rays, feats


def _loss_and_metrics(
    params: Dict[str, Any],
    pose_params: Dict[str, jnp.ndarray],
    cfg: StepConfig,
    scene: SceneConstants,
    batch: Dict[str, jnp.ndarray],
    noise: Dict[str, jnp.ndarray],
    phase: int,
    sched_mult: jnp.ndarray,
    progress: jnp.ndarray,
):
    """Per-(sub)batch loss + RAW metrics. Every metric is a mean over the
    batch axis, so under shard_map a pmean of this dict equals the
    global-batch value; derived metrics (psnr) are computed AFTER the
    reduction in `_update` (mse=1 in phase 0 makes psnr come out 0, the
    reference's placeholder)."""
    results, _, feats = forward(
        params, pose_params, cfg, scene, batch, None,
        phase=phase, sched_mult=sched_mult, progress=progress, noise=noise,
    )
    pred_depths = depth_prior(pose_params, batch, cfg.near, cfg.far)
    loss_d = compute_loss(
        cfg.loss, results, batch["rgb"], feats, pred_depths, sched_mult, phase
    )
    if cfg.loss.depth_scale_reg > 0:
        # Opt-in global-scale anchor (LossConfig.depth_scale_reg): penalize
        # the spread of the per-image log depth scales. Computed on the
        # replicated table, so under shard_map the term (and its gradient)
        # is identical on every shard and pmean leaves it unchanged.
        log_scale = pose_params["depth_scale"][:, 0]
        loss_d["l_dscale_reg"] = cfg.loss.depth_scale_reg * jnp.var(log_scale)
    loss = sum(loss_d.values())

    metrics = {f"loss/{k}": v for k, v in loss_d.items()}
    metrics["loss"] = loss
    typ = "fine" if cfg.loss.fine else "coarse"
    if phase > 0:
        metrics["mse"] = ((results[f"s_rgb_{typ}"] - batch["rgb"]) ** 2).mean()
    else:
        metrics["mse"] = jnp.ones(())

    # Per-image loss accumulation (warp detection signal, upnerf/train/
    # warp.py; no reference equivalent — Lightning logs batch means only).
    # A pose-basin stall shows up as a contiguous set of images whose loss
    # stays high while the rest converge; the feature term is the most
    # pose-sensitive, appearance-invariant signal (it IS UP-NeRF's coarse
    # alignment objective), so use it while it exists (phases 0/1) and the
    # raw static rgb term in phase 2. SUM + COUNT are returned separately:
    # under shard_map both are pmean'd (divided by n_dev), so their ratio
    # — the per-image mean — is exactly the global-batch value.
    if phase < 2 and cfg.loss.encode_feat:
        per_ray = ((results[f"feat_{typ}"] - feats) ** 2).mean(-1)
    else:
        per_ray = ((results[f"s_rgb_{typ}"] - batch["rgb"]) ** 2).mean(-1)
    n_img = scene.poses.shape[0]
    seg = batch["img_idx"]
    metrics["img_loss_sum"] = jax.ops.segment_sum(
        per_ray, seg, num_segments=n_img
    )
    metrics["img_loss_cnt"] = jax.ops.segment_sum(
        jnp.ones_like(per_ray), seg, num_segments=n_img
    )
    return loss, metrics


def make_train_step(
    cfg: StepConfig,
    optimizer: optax.GradientTransformation,
    pose_optimizer: Optional[optax.GradientTransformation],
    donate: bool = False,
    mesh=None,
):
    """Build the jitted train step.

    Signature: step(state, scene, store, key, phase) -> (state, metrics).
    `phase` is static; the sampler draws the ray batch uniformly from the
    device-resident store (iid with replacement — the reference's epoch
    shuffle over ~1e8 rays is statistically indistinguishable; intentional
    deviation).

    With ``mesh``, the device-resident path shards the gathered ray batch
    across the mesh's data axis (the state/store stay replicated) and the
    loss+grad computation runs under ``jax.shard_map``: each device renders
    only its shard through whatever render path the config selects —
    INCLUDING the fused Pallas kernels, which have no GSPMD partitioning
    rule and would otherwise be replicated or rejected by the partitioner —
    and the gradients/metrics are combined with an explicit ``psum``-mean.
    DDP semantics (train.py:70-72) without host involvement. Per-ray
    randomness is drawn ONCE at global batch shape and sharded, so the
    sharded step is numerically identical to the single-device step (up to
    reduction order). Without ``mesh``, every device would redo identical
    work on the replicated batch."""
    if mesh is not None:
        from upnerf.parallel import DATA_AXIS, batch_sharding

        _bsh = batch_sharding(mesh)
        n_dev = mesh.devices.size
        assert cfg.batch_size % n_dev == 0, (cfg.batch_size, n_dev)

    def _keys(state):
        """Wrap the checkpointed raw key data and derive this step's keys.
        Returns (k_sample, k_render, next_raw)."""
        key = jax.random.wrap_key_data(state.rng, impl=cfg.prng_impl)
        k_carry, k_sample, k_render = jax.random.split(key, 3)
        return k_sample, k_render, jax.random.key_data(k_carry)

    def _draw_noise(key, n_rays: int) -> Dict[str, jnp.ndarray]:
        """Per-ray render uniforms at GLOBAL batch shape (sharded along
        rays under a mesh — see class docstring)."""
        kc, kf = jax.random.split(key)
        noise = {}
        if cfg.render.perturb > 0:
            noise["coarse"] = jax.random.uniform(
                kc, (n_rays, cfg.render.N_samples)
            )
        if cfg.render.N_importance > 0:
            noise["fine"] = jax.random.uniform(
                kf, (n_rays, cfg.render.N_importance)
            )
        return noise

    def step_fn(
        state: TrainState,
        scene: SceneConstants,
        store: RayStore,
        phase: int,
    ):
        k_sample, k_render, next_raw = _keys(state)
        idx = jax.random.randint(
            k_sample, (cfg.batch_size,), 0, store.n_rays, dtype=jnp.int32
        )
        if mesh is not None:
            idx = jax.lax.with_sharding_constraint(
                idx, _bsh
            )  # each device gathers only its shard of the batch
        batch = gather_batch(store, idx)
        noise = _draw_noise(k_render, cfg.batch_size)
        if mesh is not None:
            batch = jax.lax.with_sharding_constraint(
                batch, jax.tree.map(lambda _: _bsh, batch)
            )
            noise = jax.lax.with_sharding_constraint(
                noise, jax.tree.map(lambda _: _bsh, noise)
            )
        return _update(state, scene, batch, noise, next_raw, phase)

    def batch_step_fn(
        state: TrainState,
        scene: SceneConstants,
        batch: Dict[str, jnp.ndarray],
        phase: int,
        noise: Optional[Dict[str, jnp.ndarray]] = None,
    ):
        """`noise=None` draws the render uniforms from the state PRNG;
        passing a dict overrides them (an empty dict selects the
        deterministic sampling paths) — used for lockstep trajectory
        replay against the torch reference
        (scripts/lockstep_parity.py)."""
        _, k_render, next_raw = _keys(state)
        if noise is None:
            noise = _draw_noise(k_render, batch["px"].shape[0])
        return _update(state, scene, batch, noise, next_raw, phase)

    def _grads_and_metrics(params, pose_params, scene, batch, noise,
                           sched, progress, phase):
        grad_fn = jax.value_and_grad(
            lambda p, pp: _loss_and_metrics(
                p, pp, cfg, scene, batch, noise, phase, sched, progress
            ),
            argnums=(0, 1),
            has_aux=True,
        )
        (_, metrics), (grads, pose_grads) = grad_fn(params, pose_params)
        return grads, pose_grads, metrics

    def _update(state, scene, batch, noise, next_raw, phase):
        progress = state.step.astype(jnp.float32) / cfg.max_steps
        sched = schedule_mult(progress, cfg.candidate_schedule)

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            def per_shard(params, pose_params, scene, batch, noise,
                          sched, progress):
                out = _grads_and_metrics(
                    params, pose_params, scene, batch, noise,
                    sched, progress, phase,
                )
                # Every loss/metric is a mean over the (equal-sized) local
                # shards, so pmean == the global-batch value and the pmean'd
                # grads equal the global-loss grads.
                return jax.lax.pmean(out, DATA_AXIS)

            grads, pose_grads, metrics = jax.shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(), P()),
                out_specs=P(),
                check_vma=False,  # pallas_call has no vma rule
            )(state.params, state.pose_params, scene, batch, noise,
              sched, progress)
        else:
            grads, pose_grads, metrics = _grads_and_metrics(
                state.params, state.pose_params, scene, batch, noise,
                sched, progress, phase,
            )
        metrics["psnr"] = -10.0 * jnp.log10(metrics.pop("mse"))

        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)

        if cfg.pose_optimize and pose_optimizer is not None:
            pose_updates, pose_opt_state = pose_optimizer.update(
                pose_grads, state.pose_opt_state, state.pose_params
            )
            pose_params = optax.apply_updates(state.pose_params, pose_updates)
        else:
            pose_params = state.pose_params
            pose_opt_state = state.pose_opt_state

        new_state = TrainState(
            step=state.step + 1,
            params=params,
            pose_params=pose_params,
            opt_state=opt_state,
            pose_opt_state=pose_opt_state,
            rng=next_raw,
        )
        return new_state, metrics

    # Donation reuses the state buffers in place (halves peak HBM for the
    # optimizer state) but deletes the caller's copy — opt-in for the train
    # loop, off for interactive/test use.
    jit_kwargs = dict(static_argnames=("phase",))
    if donate:
        jit_kwargs["donate_argnums"] = (0,)
    return (
        jax.jit(step_fn, **jit_kwargs),
        jax.jit(batch_step_fn, **jit_kwargs),
    )


def make_eval_render(cfg: StepConfig, chunk_size: int = 4096, mesh=None):
    """Full-image renderer: fixed-size chunks via lax.map inside one jit
    (mirrors val chunking, models/nerf_system.py:104-110). The caller pads
    the pixel set to a chunk multiple; masking is the caller's concern.

    Signature: render(params, pose_params, scene, batch, phase) -> results
    where batch holds (px, py, img_idx) padded to a multiple of chunk_size.

    With ``mesh``, the interior of every chunk is split across the mesh's
    data axis under ``jax.shard_map`` (params/scene replicated, each device
    rendering ``chunk_size // n_dev`` rays per chunk — including through
    the fused Pallas kernels, which have no GSPMD partitioning rule; same
    treatment as the train step). The render is deterministic and rays are
    independent, so the sharded result is bit-identical to single-device
    modulo nothing — there is no cross-ray reduction. The caller's padding
    contract (multiple of chunk_size) is unchanged.
    """
    if mesh is not None:
        from upnerf.parallel import DATA_AXIS

        n_dev = mesh.devices.size
        assert chunk_size % n_dev == 0, (chunk_size, n_dev)

    def render_fn(
        params: Dict[str, Any],
        pose_params: Dict[str, jnp.ndarray],
        scene: SceneConstants,
        batch: Dict[str, jnp.ndarray],
        progress: jnp.ndarray,
        phase: int,
    ):
        sched = schedule_mult(progress, cfg.candidate_schedule)
        n = batch["px"].shape[0]
        assert n % chunk_size == 0, "caller must pad to chunk multiple"
        n_chunks = n // chunk_size

        chunked = jax.tree.map(
            lambda x: x.reshape(n_chunks, chunk_size, *x.shape[1:]), batch
        )

        def one_chunk(params, pose_params, scene, sched, progress, b):
            results, _, feats = forward(
                params, pose_params, cfg, scene, b, None,
                phase=phase, sched_mult=sched, progress=progress, det=True,
            )
            if feats is not None:
                results["feats_gt"] = feats
            results["pred_depth"] = depth_prior(pose_params, b, cfg.near, cfg.far)
            return results

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            def per_shard(params, pose_params, scene, sched, progress, ch):
                return jax.lax.map(
                    lambda b: one_chunk(
                        params, pose_params, scene, sched, progress, b
                    ),
                    ch,
                )

            out = jax.shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(), P(None, DATA_AXIS)),
                out_specs=P(None, DATA_AXIS),
                check_vma=False,  # pallas_call has no vma rule
            )(params, pose_params, scene, sched, progress, chunked)
        else:
            out = jax.lax.map(
                lambda b: one_chunk(
                    params, pose_params, scene, sched, progress, b
                ),
                chunked,
            )
        return jax.tree.map(lambda x: x.reshape(n, *x.shape[2:]), out)

    return jax.jit(render_fn, static_argnames=("phase",))
