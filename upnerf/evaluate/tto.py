"""Test-time optimization (TTO) of held-out test images.

Reference protocol (tto.py:119-139, models/nerf_system_optmize.py,
datasets/phototourism_optimize.py):

  For each test image, with the trained NeRF frozen and the candidate
  branch disabled:
  phase A (pose): optimize a fresh fine appearance embedding (Adam 5e-3)
    and the test camera se(3) (Adam 1e-4) on the WHOLE image for 50 epochs;
    the test pose is initialized by sim(3)-aligning its GT pose into the
    learned identity-init frame (models/nerf_system_optmize.py:267-319).
    Track the best-PSNR refined pose.
  phase B (appearance): from the best pose, optimize ONLY the embedding
    (AdamW 1e-1) on the LEFT half for 20 epochs; report best PSNR / SSIM /
    LPIPS measured on the RIGHT half
    (datasets/phototourism_optimize.py:191-235).

TPU-native redesign: instead of relaunching a Trainer twice per image
(tto.py:130-139), test images are optimized in *groups* inside one jitted
step — per-image parameters are rows of (G, 48) / (G, 6) tables, each step
renders a (G * B)-ray batch with per-image pixel sampling, and Adam's
elementwise updates make the grouped optimization exactly equivalent to G
independent runs.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from upnerf.geometry import procrustes, rays as ray_utils, se3
from upnerf.models import NeRFConfig, init_embedding
from upnerf.render import RenderConfig, render_rays
from .metrics import psnr as psnr_fn, ssim as ssim_fn

# Eval-render chunk size (rays per lax.map step in make_tto_eval). The TTO
# CLI's mesh gate checks divisibility against THIS constant — keep them in
# sync by importing it, not by repeating the number.
EVAL_CHUNK = 4096


def align_test_poses(
    se3_table: np.ndarray,  # (N_train, 6) trained refinement
    gt_train_poses: np.ndarray,  # (N_train, 3, 4)
    gt_test_poses: np.ndarray,  # (N_test, 3, 4)
    base_train_poses: np.ndarray = None,  # (N_train, 3, 4) training base
    rot_from: str = "orientations",
) -> np.ndarray:
    """Initialize test poses by mapping GT test cameras into the learned
    frame via the train-set sim(3) (models/nerf_system_optmize.py:267-319).

    The learned train pose is ``base o exp(se3)``; the reference hard-codes
    ``base = identity`` (nerf_system_optmize.py:280), which is only correct
    for its identity-init protocol (pose.noise = -1). We accept the actual
    training base poses so the alignment is also right when training starts
    from noised COLMAP poses (datasets/phototourism.py:203-208 noise
    modes); passing None keeps exact reference behavior.

    rot_from: how the gauge ROTATION is estimated. "orientations"
    (default, documented deviation) takes the chordal mean of the per-
    camera rotation residuals — exact whenever a sim(3) gauge exists, and
    non-degenerate for planar camera rigs where the reference's
    center-only Procrustes (utils/camera.py:364-382) is reflection-
    bistable and can return a ~180-deg garbage rotation (see
    procrustes.gauge_rotation_from_orientations). "centers" keeps the
    reference's exact estimator. Scale and translation always come from
    the camera centers (rotation-independent)."""
    n = len(se3_table)
    if base_train_poses is None:
        base_train_poses = jnp.broadcast_to(jnp.eye(3, 4), (n, 3, 4))
    refine = se3.se3_to_SE3(jnp.asarray(se3_table))
    refine_poses = se3.compose([refine, jnp.asarray(base_train_poses)])

    refine_parsed = procrustes.parse_raw_camera(refine_poses)
    gt_train_parsed = procrustes.parse_raw_camera(jnp.asarray(gt_train_poses))
    _, sim3 = procrustes.prealign_cameras(refine_parsed, gt_train_parsed)
    if rot_from == "orientations":
        Q = procrustes.gauge_rotation_from_orientations(
            refine_parsed, gt_train_parsed
        )
        sim3 = sim3._replace(R=Q)
    elif rot_from != "centers":
        raise ValueError(f"rot_from must be orientations|centers: {rot_from}")

    gt_test_parsed = procrustes.parse_raw_camera(jnp.asarray(gt_test_poses))
    center = jnp.zeros((1, 1, 3))
    center_GT = se3.cam2world(center, gt_test_parsed)[:, 0]  # (N_test, 3)
    # inverse of the prealign mapping: GT frame -> learned frame
    center_aligned = (center_GT - sim3.t0) / sim3.s0 @ sim3.R * sim3.s1 + sim3.t1
    R_aligned = gt_test_parsed[..., :3] @ sim3.R
    t_aligned = (-R_aligned @ center_aligned[..., None])[..., 0]
    aligned = se3.make_pose(R=R_aligned, t=t_aligned)
    return np.asarray(procrustes.parse_raw_camera(aligned))


class TTOGroup(NamedTuple):
    """Device-resident data for a group of G test images (padded to the
    group's max H x W)."""

    Ks: jnp.ndarray  # (G, 3, 3)
    base_poses: jnp.ndarray  # (G, 3, 4) aligned GT init
    rgbs: jnp.ndarray  # (G, Hm, Wm, 3) uint8, zero-padded
    wh: jnp.ndarray  # (G, 2) true (W, H)
    near_far: jnp.ndarray  # (G, 2)


class TTOConfig(NamedTuple):
    nerf: NeRFConfig
    render: RenderConfig
    batch_size: int = 1024
    pose_epochs: int = 50
    appearance_epochs: int = 20
    lr_emb_pose_phase: float = 5e-3
    lr_se3: float = 1e-4
    lr_emb_appearance: float = 1e-1
    # Fraction of phase-A epochs spent ramping the PE-anneal `progress`
    # from pose_anneal_start to 1.0 (BARF-style coarse-to-fine for the
    # TEST pose). 0.0 = reference behavior (full PE throughout,
    # models/nerf_system_optmize.py renders at the trained progress).
    # Low-frequency-only photometry has a much wider pose basin: with the
    # sim3 init several degrees off (imperfectly converged training
    # poses), full-PE phase A can strand individual images in ~12 dB
    # local minima while their neighbors reach val PSNR.
    pose_anneal: float = 0.0
    pose_anneal_start: float = 0.3
    # Image-pyramid coarse-to-fine for phase A: optimize the first
    # pose_blur_frac of the epochs against Gaussian-blurred copies of the
    # target (one equal segment per sigma, coarse->fine), then the sharp
    # image. PE annealing blurs only the RENDER; a sharp target with
    # periodic texture (checkers, facades) still pattern-locks a pose
    # that is one texture period off — blurring the target removes those
    # aliased minima. () = reference behavior.
    pose_blur: Tuple[float, ...] = ()
    pose_blur_frac: float = 0.5


def _eval_stride(eval_every) -> int:
    """Best-metric eval stride from the user-facing eval_every: 0 means
    'last epoch only' (the skip checks always eval the final epoch);
    negatives clamp to every epoch. Guards the modulo skip in run_group
    against ZeroDivisionError."""
    return max(1, int(eval_every)) if eval_every else (1 << 30)


def _blur_group_rgbs(
    rgbs_u8: np.ndarray, wh: np.ndarray, sigma: float
) -> np.ndarray:
    """Gaussian-blur each image's valid (h, w) region (edge-padded so the
    zero padding outside the region never bleeds in). Host-side numpy —
    runs once per pyramid level per group."""
    from upnerf.train.state import gaussian_1d

    out = np.array(rgbs_u8)
    for g in range(len(out)):
        w, h = int(wh[g, 0]), int(wh[g, 1])
        img = out[g, :h, :w].astype(np.float64)
        img = gaussian_1d(gaussian_1d(img, sigma, 0), sigma, 1)
        out[g, :h, :w] = np.clip(np.round(img), 0, 255).astype(np.uint8)
    return out


def _sample_pixels(key, wh, x_frac: Tuple[float, float], B: int):
    """Uniform pixel coords per image within the given width fraction.
    wh: (G, 2). Returns px, py each (G, B) float32."""
    kx, ky = jax.random.split(key)
    G = wh.shape[0]
    w = wh[:, 0].astype(jnp.float32)[:, None]
    h = wh[:, 1].astype(jnp.float32)[:, None]
    ux = jax.random.uniform(kx, (G, B))
    uy = jax.random.uniform(ky, (G, B))
    # floor at both cut points so the left-half train region [0, w//2) and
    # the right-half eval region [w//2, w) never overlap at odd widths
    # (datasets/phototourism_optimize.py:192,225 slice at img_w // 2)
    x_lo = jnp.floor(w * x_frac[0])
    x_hi = jnp.floor(w * x_frac[1]) if x_frac[1] < 1.0 else w
    px = jnp.clip(jnp.floor(x_lo + ux * (x_hi - x_lo)), 0, w - 1)
    py = jnp.clip(jnp.floor(uy * h), 0, h - 1)
    return px, py


def _render_group_rays(
    frozen_params: Dict[str, Any],
    fine_a: jnp.ndarray,  # (G, A)
    se3_delta: jnp.ndarray,  # (G, 6)
    cfg: TTOConfig,
    group: TTOGroup,
    px: jnp.ndarray,  # (G, B)
    py: jnp.ndarray,  # (G, B)
    key,
    det: bool,
    noise=None,  # optional pre-drawn uniforms {coarse/fine: (G*B, N)}
    progress=None,  # PE-anneal progress (None = 1.0: full bands)
):
    """Render (G*B) rays with refined poses; returns (pred_rgb, gt_rgb)."""
    G, B = px.shape
    img_idx = jnp.repeat(jnp.arange(G), B)
    pxf = px.reshape(-1)
    pyf = py.reshape(-1)
    dirs = ray_utils.pixel_directions(pxf, pyf, group.Ks[img_idx])
    refine = se3.se3_to_SE3(se3_delta)  # (G, 3, 4)
    poses = se3.compose([refine, group.base_poses])[img_idx]
    rays_o, rays_d = ray_utils.get_rays(dirs, poses)
    near_far = group.near_far[img_idx]
    rays = jnp.concatenate([rays_o, rays_d, near_far], -1)

    # appearance embeddings: coarse_a unused at phase 2 with candidate off?
    # The rgb head still takes input_a for both models — reuse the frozen
    # coarse_a? The reference keeps the TRAINED coarse table but replaces
    # fine_a with the fresh test table (models/nerf_system_optmize.py:258-262)
    # and indexes it by the test img idx; coarse rgb is unused by the TTO
    # loss. We gather coarse_a row 0 as a harmless placeholder.
    emb = dict(frozen_params["embeddings"])
    emb["fine_a"] = fine_a
    emb["coarse_a"] = jnp.broadcast_to(
        frozen_params["embeddings"]["coarse_a"][:1], (G, fine_a.shape[-1])
    )
    params = {
        "nerf_coarse": frozen_params["nerf_coarse"],
        "nerf_fine": frozen_params["nerf_fine"],
        "embeddings": emb,
    }
    if progress is None:
        progress = jnp.asarray(1.0)
    out = render_rays(
        params, cfg.render, cfg.nerf, rays, img_idx,
        key=key, phase=2, sched_mult=jnp.asarray(1.0),
        progress=progress, encode_candidate=False, det=det,
        noise=noise,
    )
    gt = group.rgbs[img_idx, py.reshape(-1).astype(jnp.int32),
                    px.reshape(-1).astype(jnp.int32)].astype(jnp.float32) / 255.0
    return out["s_rgb_fine"], gt


def _draw_render_noise(key, rcfg: RenderConfig, G: int, B: int):
    """Per-ray render uniforms at GLOBAL (G, B, N) shape — drawn once and
    sharded along B under a mesh, so the sharded TTO step is numerically
    identical to the single-device step (same discipline as the train
    step, upnerf/train/step.py)."""
    kc, kf = jax.random.split(key)
    noise = {}
    if rcfg.perturb > 0:
        noise["coarse"] = jax.random.uniform(kc, (G, B, rcfg.N_samples))
    if rcfg.N_importance > 0:
        noise["fine"] = jax.random.uniform(kf, (G, B, rcfg.N_importance))
    return noise


def make_tto_step(
    frozen_params: Dict[str, Any],
    cfg: TTOConfig,
    optimizer: optax.GradientTransformation,
    *,
    optimize_pose: bool,
    x_frac: Tuple[float, float],
    mesh=None,
):
    """Jitted TTO step over a group. trainables = {"fine_a": (G, A)[,
    "se3": (G, 6)]}. Per-image mean loss (mirrors the per-image MSE of
    models/nerf_system_optmize.py:129).

    With ``mesh``, each image's B-ray batch is split across the mesh's
    data axis under ``jax.shard_map`` (trainables/group replicated; the
    fused Pallas kernels have no GSPMD rule — same treatment as the train
    step) and the loss/grads are combined with a psum-mean. Pixel coords
    and render uniforms are drawn at global shape and sharded, so the
    sharded step matches the single-device step up to reduction order."""
    if mesh is not None:
        from upnerf.parallel import DATA_AXIS

        n_dev = mesh.devices.size
        assert cfg.batch_size % n_dev == 0, (cfg.batch_size, n_dev)

    def loss_fn(trainables, group, px, py, noise, progress):
        se3_delta = (
            trainables["se3"]
            if optimize_pose
            else jnp.zeros((group.Ks.shape[0], 6))
        )
        flat = {k: v.reshape(-1, v.shape[-1]) for k, v in noise.items()}
        pred, gt = _render_group_rays(
            frozen_params, trainables["fine_a"], se3_delta, cfg, group,
            px, py, None, det=False, noise=flat or None, progress=progress,
        )
        return ((pred - gt) ** 2).mean()

    def _loss_and_grads(trainables, group, px, py, noise, progress):
        return jax.value_and_grad(loss_fn)(
            trainables, group, px, py, noise, progress
        )

    @jax.jit
    def step(trainables, opt_state, group, key, progress=1.0):
        progress = jnp.asarray(progress, jnp.float32)
        k_pix, k_render = jax.random.split(key)
        px, py = _sample_pixels(k_pix, group.wh, x_frac, cfg.batch_size)
        noise = _draw_render_noise(k_render, cfg.render, *px.shape)
        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            def per_shard(trainables, group, px, py, noise, progress):
                # equal-sized shards -> pmean of the local means/grads
                # equals the global-batch loss/grads
                return jax.lax.pmean(
                    _loss_and_grads(trainables, group, px, py, noise,
                                    progress),
                    DATA_AXIS,
                )

            loss, grads = jax.shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(
                    P(), P(), P(None, DATA_AXIS), P(None, DATA_AXIS),
                    P(None, DATA_AXIS), P(),
                ),
                out_specs=P(),
                check_vma=False,  # pallas_call has no vma rule
            )(trainables, group, px, py, noise, progress)
        else:
            loss, grads = _loss_and_grads(
                trainables, group, px, py, noise, progress
            )
        updates, opt_state = optimizer.update(grads, opt_state, trainables)
        trainables = optax.apply_updates(trainables, updates)
        return trainables, opt_state, loss

    return step


def make_tto_eval(
    frozen_params: Dict[str, Any],
    cfg: TTOConfig,
    *,
    x_frac: Tuple[float, float],
    chunk: int = EVAL_CHUNK,
    mesh=None,
):
    """Full-region render for each image of a group (padded grid, masked).

    Returns arrays (G, Hm, Wm, 3) prediction and a validity mask.

    With ``mesh``, the interior of every chunk splits across the mesh's
    data axis under ``jax.shard_map`` (deterministic per-ray render, no
    cross-ray reduction — bit-identical to single-device; same treatment
    as upnerf.train.step.make_eval_render)."""
    if mesh is not None:
        from upnerf.parallel import DATA_AXIS

        n_dev = mesh.devices.size
        assert chunk % n_dev == 0, (chunk, n_dev)

    @functools.partial(jax.jit, static_argnames=("Hm", "Wm"))
    def render_full(trainables, group, Hm: int, Wm: int):
        G = group.Ks.shape[0]
        jj, ii = jnp.meshgrid(jnp.arange(Hm), jnp.arange(Wm), indexing="ij")
        px1 = jnp.broadcast_to(ii.reshape(-1), (G, Hm * Wm)).astype(jnp.float32)
        py1 = jnp.broadcast_to(jj.reshape(-1), (G, Hm * Wm)).astype(jnp.float32)
        # clamp to each image's valid region (padded pixels render but are
        # masked out of the metrics)
        w = group.wh[:, 0:1].astype(jnp.float32)
        h = group.wh[:, 1:2].astype(jnp.float32)
        x_lo = jnp.floor(w * x_frac[0])
        px1 = jnp.clip(px1 + x_lo, 0, w - 1)
        py1 = jnp.clip(py1, 0, h - 1)

        se3_delta = trainables.get("se3")
        if se3_delta is None:
            se3_delta = jnp.zeros((G, 6))

        n = Hm * Wm
        pad = (-n) % chunk
        n_chunks = (n + pad) // chunk
        # (n_chunks, G, chunk): lax.map over chunks; under a mesh the
        # trailing (intra-chunk) axis is the sharded one.
        pxc = jnp.pad(px1, ((0, 0), (0, pad))).reshape(
            G, n_chunks, chunk
        ).transpose(1, 0, 2)
        pyc = jnp.pad(py1, ((0, 0), (0, pad))).reshape(
            G, n_chunks, chunk
        ).transpose(1, 0, 2)

        def chunk_loop(trainables, group, se3_delta, pxc, pyc):
            def one_chunk(args):
                px_c, py_c = args
                C = px_c.shape[1]
                pred, gt = _render_group_rays(
                    frozen_params, trainables["fine_a"], se3_delta, cfg,
                    group, px_c, py_c, None, det=True,
                )
                return pred.reshape(G, C, 3), gt.reshape(G, C, 3)

            return jax.lax.map(one_chunk, (pxc, pyc))

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            preds, gts = jax.shard_map(
                chunk_loop,
                mesh=mesh,
                in_specs=(
                    P(), P(), P(),
                    P(None, None, DATA_AXIS), P(None, None, DATA_AXIS),
                ),
                out_specs=P(None, None, DATA_AXIS),
                check_vma=False,  # pallas_call has no vma rule
            )(trainables, group, se3_delta, pxc, pyc)
        else:
            preds, gts = chunk_loop(trainables, group, se3_delta, pxc, pyc)
        preds = jnp.moveaxis(preds, 0, 1).reshape(G, -1, 3)[:, :n]
        gts = jnp.moveaxis(gts, 0, 1).reshape(G, -1, 3)[:, :n]
        return preds.reshape(G, Hm, Wm, 3), gts.reshape(G, Hm, Wm, 3)

    return render_full


def tto_region_size(
    wh: np.ndarray, x_frac: Tuple[float, float], bucket: int = 64
) -> Tuple[int, int]:
    """Max (H, W_region) over a group for the padded eval grid, rounded up
    to `bucket` multiples — Phototourism images all differ in size, and
    bucketing caps the number of distinct compiled shapes across groups."""
    w = wh[:, 0]
    h = wh[:, 1]
    x_hi = np.floor(w * x_frac[1]) if x_frac[1] < 1.0 else w
    region_w = x_hi - np.floor(w * x_frac[0])

    def up(v):
        return int(-(-int(v) // bucket) * bucket)

    return up(h.max()), up(region_w.max())


class TTORunner:
    """Scene-level TTO driver: builds every jitted program ONCE.

    Round 1 rebuilt the jitted step/eval closures inside each group call,
    so every group recompiled even at identical shapes, and the eval grid
    was sized per group (one compile per (G, Hm, Wm) bucket). Here the
    caller pads groups to a fixed G and supplies scene-global eval regions,
    so both phases compile exactly one step + one eval program per scene
    (the reference relaunches a full Lightning Trainer twice per IMAGE,
    tto.py:119-139)."""

    def __init__(
        self,
        frozen_params: Dict[str, Any],
        cfg: TTOConfig,
        appearance_dim: int,
        region_A: Tuple[int, int],
        region_B: Tuple[int, int],
        mesh=None,
    ):
        self.frozen = frozen_params
        self.cfg = cfg
        self.appearance_dim = appearance_dim
        self.region_A = region_A
        self.region_B = region_B
        self.opt_A = optax.multi_transform(
            {
                "emb": optax.adam(cfg.lr_emb_pose_phase, eps=1e-8),
                "se3": optax.adam(cfg.lr_se3, eps=1e-8),
            },
            {"fine_a": "emb", "se3": "se3"},
        )
        self.opt_B = optax.adamw(cfg.lr_emb_appearance)
        self.step_A = make_tto_step(
            frozen_params, cfg, self.opt_A, optimize_pose=True,
            x_frac=(0.0, 1.0), mesh=mesh,
        )
        self.step_B = make_tto_step(
            frozen_params, cfg, self.opt_B, optimize_pose=False,
            x_frac=(0.0, 0.5), mesh=mesh,
        )
        self.eval_A = make_tto_eval(
            frozen_params, cfg, x_frac=(0.0, 1.0), mesh=mesh
        )
        self.eval_B = make_tto_eval(
            frozen_params, cfg, x_frac=(0.5, 1.0), mesh=mesh
        )

    def run_group(
        self, group: TTOGroup, key: jax.Array, lpips=None, log=print,
        eval_every: int = 1,
    ) -> Dict[str, np.ndarray]:
        """Run both TTO phases for one group; returns per-image best
        metrics and refined poses.

        eval_every: run the per-epoch best-metric eval render only every
        k-th epoch (and always on the last). The reference evals each
        epoch, where an epoch is ~160 optimizer steps on a real image; on
        small synthetic images an epoch is a handful of steps and the eval
        render dominates wall-clock, so protocols raise this with
        pose_epochs scaled up to reach comparable step counts."""
        eval_every = _eval_stride(eval_every)
        cfg = self.cfg
        G = int(group.Ks.shape[0])
        wh = np.asarray(group.wh)
        epoch_steps_A = max(
            1, int(np.ceil((wh[:, 0] * wh[:, 1]).max() / cfg.batch_size))
        )
        epoch_steps_B = max(1, epoch_steps_A // 2)

        # ---- phase A: pose + embedding on the whole image -------------
        k_init, key = jax.random.split(key)
        trainables = {
            "fine_a": init_embedding(k_init, G, self.appearance_dim),
            "se3": jnp.zeros((G, 6)),
        }
        opt_state = self.opt_A.init(trainables)
        Hm, Wm = self.region_A

        best_psnr = np.full(G, -np.inf)
        best_pose = np.array(
            se3.compose([se3.se3_to_SE3(trainables["se3"]), group.base_poses])
        )  # np.array: writable copy
        blur_groups = []
        if cfg.pose_blur:
            rgbs_np = np.asarray(group.rgbs)
            blur_groups = [
                group._replace(
                    rgbs=jnp.asarray(_blur_group_rgbs(rgbs_np, wh, s))
                )
                for s in cfg.pose_blur
            ]
        blur_epochs = cfg.pose_blur_frac * cfg.pose_epochs
        ramp_epochs = cfg.pose_anneal * cfg.pose_epochs
        for epoch in range(cfg.pose_epochs):
            progress = 1.0 if epoch >= ramp_epochs else (
                cfg.pose_anneal_start
                + (1.0 - cfg.pose_anneal_start) * epoch / ramp_epochs
            )
            group_e = group
            if blur_groups and epoch < blur_epochs:
                # same padded shapes -> same compiled program per level
                group_e = blur_groups[
                    int(epoch / blur_epochs * len(blur_groups))
                ]
            for _ in range(epoch_steps_A):
                key, k = jax.random.split(key)
                trainables, opt_state, loss = self.step_A(
                    trainables, opt_state, group_e, k, progress
                )
            if (epoch + 1) % eval_every and epoch + 1 < cfg.pose_epochs:
                continue
            preds, gts = self.eval_A(trainables, group, Hm, Wm)
            cur = _masked_psnr(preds, gts, wh, (0.0, 1.0))
            improved = cur > best_psnr
            if improved.any():
                refined = np.asarray(
                    se3.compose(
                        [se3.se3_to_SE3(trainables["se3"]), group.base_poses]
                    )
                )
                best_pose[improved] = refined[improved]
                best_psnr = np.maximum(best_psnr, cur)
            log(f"[tto A] epoch {epoch+1}/{cfg.pose_epochs} "
                f"loss={float(loss):.4f} psnr={cur.mean():.2f}")

        # ---- phase B: appearance only, left half, eval right half -----
        group_B = group._replace(base_poses=jnp.asarray(best_pose))
        k_init, key = jax.random.split(key)
        trainables = {"fine_a": init_embedding(k_init, G, self.appearance_dim)}
        opt_state = self.opt_B.init(trainables)
        Hm, Wm = self.region_B

        best = {
            "psnr": np.full(G, -np.inf),
            "ssim": np.zeros(G),
            "lpips": np.full(G, np.nan),
        }
        best_emb = np.zeros((G, self.appearance_dim), np.float32)
        for epoch in range(cfg.appearance_epochs):
            for _ in range(epoch_steps_B):
                key, k = jax.random.split(key)
                trainables, opt_state, loss = self.step_B(
                    trainables, opt_state, group_B, k
                )
            if (epoch + 1) % eval_every and epoch + 1 < cfg.appearance_epochs:
                continue
            preds, gts = self.eval_B(trainables, group_B, Hm, Wm)
            cur = _masked_psnr(preds, gts, wh, (0.5, 1.0))
            emb_now = np.asarray(trainables["fine_a"])
            for g in range(G):
                if cur[g] > best["psnr"][g]:
                    best["psnr"][g] = cur[g]
                    best_emb[g] = emb_now[g]
                    pg, gg, (hh, ww) = _crop(preds, gts, wh, g, (0.5, 1.0))
                    best["ssim"][g] = float(ssim_fn(pg, gg))
                    if lpips is not None:
                        best["lpips"][g] = lpips(pg, gg)
            log(f"[tto B] epoch {epoch+1}/{cfg.appearance_epochs} "
                f"loss={float(loss):.4f} psnr={cur.mean():.2f}")

        return {
            "psnr": best["psnr"],
            "ssim": best["ssim"],
            "lpips": best["lpips"],
            "pose": best_pose,
            "pose_psnr": best_psnr,
            # best appearance embedding per image (the reference persists
            # this, misleadingly named best_pose_XX.npy in phase B,
            # models/nerf_system_optmize.py:206-210)
            "emb": best_emb,
        }


def run_tto_group(
    frozen_params: Dict[str, Any],
    cfg: TTOConfig,
    group: TTOGroup,
    appearance_dim: int,
    key: jax.Array,
    lpips=None,
    log=print,
) -> Dict[str, np.ndarray]:
    """One-shot convenience wrapper: regions sized from this group alone.
    For multi-group runs build a TTORunner once (single compile per
    phase)."""
    wh = np.asarray(group.wh)
    runner = TTORunner(
        frozen_params, cfg, appearance_dim,
        region_A=tto_region_size(wh, (0.0, 1.0)),
        region_B=tto_region_size(wh, (0.5, 1.0)),
    )
    return runner.run_group(group, key, lpips=lpips, log=log)


def _region_bounds(wh, g, x_frac):
    w, h = int(wh[g, 0]), int(wh[g, 1])
    x_lo = int(np.floor(w * x_frac[0]))
    x_hi = int(np.floor(w * x_frac[1])) if x_frac[1] < 1.0 else w
    return x_lo, x_hi, h


def _crop(preds, gts, wh, g, x_frac):
    x_lo, x_hi, h = _region_bounds(wh, g, x_frac)
    ww = x_hi - x_lo
    return preds[g, :h, :ww], gts[g, :h, :ww], (h, ww)


def _masked_psnr(preds, gts, wh, x_frac) -> np.ndarray:
    preds = np.asarray(preds)
    gts = np.asarray(gts)
    G = preds.shape[0]
    out = np.zeros(G)
    for g in range(G):
        p, t, _ = _crop(preds, gts, wh, g, x_frac)
        out[g] = float(psnr_fn(jnp.asarray(p), jnp.asarray(t)))
    return out
