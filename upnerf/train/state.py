"""Train state and device-resident scene/ray-store structures.

The reference's mutable LightningModule state (two optimizers, embeddings,
se3/depth tables, the `progress` parameter; models/nerf_system.py:340-409)
becomes one immutable pytree checkpointed atomically by orbax. The schedule
`progress` is derived from `step`, so resume reproduces both the PE
annealing and the candidate schedule exactly (the reference round-trips
`progress` through the ckpt as an nn.Parameter, models/nerf.py:36).

TPU-first data placement (no reference equivalent — the reference keeps
tens-of-GB pickle ray buffers in host RAM, datasets/phototourism.py:36-37):

- `SceneConstants`: small per-image tables (intrinsics, base poses,
  near/far) plus the DINO feature stack, resident in device HBM.
- `RayStore`: the compact per-ray record — pixel coords (u16), image index
  (i32), RGB (u8), inverse depth (f16) ≈ 13 bytes/ray vs the reference's
  ~50 (float32 directions + rgb + infos). Ray directions, normalized
  feature gathers and u8->f32 conversion all happen on device inside jit.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from upnerf.models import (
    NeRFConfig,
    TransientConfig,
    init_embedding,
    init_nerf,
    init_transient,
)


class SceneConstants(NamedTuple):
    """Per-image tables, device-resident, replicated across the mesh."""

    Ks: jnp.ndarray  # (N_img, 3, 3) rescaled intrinsics
    poses: jnp.ndarray  # (N_img, 3, 4) base c2w (identity when noise == -1)
    near_far: jnp.ndarray  # (N_img, 2)
    wh: jnp.ndarray  # (N_img, 2) image sizes (for pixel normalization)
    feat_maps: Optional[jnp.ndarray]  # (N_img, h, w, C) L2-normalized, bf16
    # Optional low-pass pyramid level of feat_maps (same shape) for the
    # feature coarse-to-fine schedule (`feat.c2f`, no reference
    # equivalent): early training supervises against spatially-smoothed
    # features, widening the pose basin the same way BARF's PE anneal
    # widens the photometric one. None = off (the default).
    feat_maps_coarse: Optional[jnp.ndarray] = None


class RayStore(NamedTuple):
    """Compact per-ray training record (flattened over all images)."""

    px: jnp.ndarray  # (N,) uint16 pixel column
    py: jnp.ndarray  # (N,) uint16 pixel row
    img_idx: jnp.ndarray  # (N,) int32
    rgb: jnp.ndarray  # (N, 3) uint8
    inv_depth: jnp.ndarray  # (N,) float16 normalized DPT inverse depth

    @property
    def n_rays(self) -> int:
        return self.px.shape[0]


class TrainState(NamedTuple):
    step: jnp.ndarray  # () int32, counts iterations
    params: Dict[str, Any]  # NeRF coarse/fine + transient + embeddings
    pose_params: Dict[str, jnp.ndarray]  # {"se3": (N,6), "depth_scale": (N,2)}
    opt_state: Any
    pose_opt_state: Any
    rng: Any = None  # RAW PRNG key data (uint32, jax.random.key_data) —
    # wrapped inside the jitted step and split there; stored raw so orbax
    # checkpoints it and resume reproduces the exact sample stream


def init_params(
    key: jax.Array,
    nerf_cfg: NeRFConfig,
    t_cfg: Optional[TransientConfig],
    n_images: int,
    fine: bool = True,
) -> Dict[str, Any]:
    """Group-1 (NeRF-optimizer) parameters (models/nerf_system.py:340-403)."""
    ks = iter(jax.random.split(key, 16))
    emb: Dict[str, jnp.ndarray] = {}
    if nerf_cfg.encode_appearance:
        emb["coarse_a"] = init_embedding(next(ks), n_images, nerf_cfg.appearance_dim)
        if fine:
            emb["fine_a"] = init_embedding(next(ks), n_images, nerf_cfg.appearance_dim)
    if nerf_cfg.encode_candidate:
        emb["coarse_c"] = init_embedding(next(ks), n_images, nerf_cfg.candidate_dim)
        if fine:
            emb["fine_c"] = init_embedding(next(ks), n_images, nerf_cfg.candidate_dim)
    params: Dict[str, Any] = {
        "nerf_coarse": init_nerf(next(ks), nerf_cfg),
        "embeddings": emb,
    }
    if fine:
        params["nerf_fine"] = init_nerf(next(ks), nerf_cfg)
    if t_cfg is not None:
        params["transient"] = init_transient(next(ks), t_cfg, n_images)
    return params


def init_pose_params(n_images: int) -> Dict[str, jnp.ndarray]:
    """Zero-initialized se3 refinement + depth scale/shift tables
    (models/nerf_system.py:406-409)."""
    return {
        "se3": jnp.zeros((n_images, 6), jnp.float32),
        "depth_scale": jnp.zeros((n_images, 2), jnp.float32),
    }


def build_train_state(hparams: Dict[str, Any], n_images: int) -> TrainState:
    """Construct a freshly-initialized TrainState (the restore template for
    checkpoint loading in tto/eval, which must match training exactly)."""
    import jax.numpy as jnp

    from upnerf.models import NeRFConfig, TransientConfig
    from .optim import make_optimizer

    nerf_cfg = NeRFConfig.from_hparams(hparams)
    t_cfg = TransientConfig.from_hparams(hparams)
    fine = hparams["nerf.N_importance"] > 0
    params = init_params(
        jax.random.PRNGKey(hparams.get("seed", 42)), nerf_cfg, t_cfg, n_images, fine
    )
    pose_params = init_pose_params(n_images)
    opt = make_optimizer(
        hparams["optimizer.type"], hparams["optimizer.lr"],
        hparams["optimizer.scheduler.lr_end"], hparams["max_steps"],
        hparams["optimizer.scheduler.type"],
    )
    pose_opt = make_optimizer(
        hparams["optimizer_pose.type"], hparams["optimizer_pose.lr"],
        hparams["optimizer_pose.scheduler.lr_end"], hparams["max_steps"],
        hparams["optimizer_pose.scheduler.type"],
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        pose_params=pose_params,
        opt_state=opt.init(params),
        pose_opt_state=pose_opt.init(pose_params),
        rng=jax.random.key_data(
            jax.random.key(
                hparams.get("seed", 42) + 1,
                impl=hparams.get("tpu.prng_impl", "rbg"),
            )
        ),
    )


def make_scene_constants(
    Ks: np.ndarray,
    poses: np.ndarray,
    near_far: np.ndarray,
    wh: np.ndarray,
    feat_maps: Optional[np.ndarray],
    feat_dtype=jnp.bfloat16,
    feat_pyramid_sigma: float = 0.0,
) -> SceneConstants:
    """feat_pyramid_sigma > 0 additionally stores a Gaussian-smoothed
    (and re-L2-normalized) pyramid level of the feature stack for the
    `feat.c2f` coarse-to-fine schedule."""
    coarse = None
    if feat_maps is not None and feat_pyramid_sigma > 0:
        coarse = blur_feat_stack(np.asarray(feat_maps), feat_pyramid_sigma)
    return SceneConstants(
        Ks=jnp.asarray(Ks, jnp.float32),
        poses=jnp.asarray(poses, jnp.float32),
        near_far=jnp.asarray(near_far, jnp.float32),
        wh=jnp.asarray(wh, jnp.int32),
        feat_maps=None if feat_maps is None else jnp.asarray(feat_maps, feat_dtype),
        feat_maps_coarse=(
            None if coarse is None else jnp.asarray(coarse, feat_dtype)
        ),
    )


def blur_feat_stack(feat_maps: np.ndarray, sigma: float) -> np.ndarray:
    """Separable Gaussian low-pass over the (h, w) axes of an
    (N, h, w, C) feature stack, re-L2-normalized per cell (the fine maps
    are unit-norm; smoothing shrinks norms and would otherwise rescale
    the feature loss). Host-side numpy, runs once at scene build."""
    out = feat_maps.astype(np.float32)
    for axis in (1, 2):
        out = gaussian_1d(out, sigma, axis)
    norm = np.linalg.norm(out, axis=-1, keepdims=True)
    out = out / np.maximum(norm, 1e-8)
    return out.astype(np.float32)


def gaussian_1d(arr: np.ndarray, sigma: float, axis: int) -> np.ndarray:
    """Edge-padded Gaussian convolution along one axis, expressed as a
    dense band-matrix contraction so BLAS does the work (one sgemm per
    axis; the earlier np.apply_along_axis/np.convolve form made one
    interpreter-level call per 1-D slice — minutes of startup on
    real-scale feature stacks, where this runs in ~a second)."""
    r = max(1, int(round(3 * sigma)))
    x = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    n = arr.shape[axis]
    band = np.zeros((n, n + 2 * r), np.float32)
    for i in range(n):
        band[i, i : i + 2 * r + 1] = k
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (r, r)
    padded = np.pad(arr, pad, mode="edge")
    out = np.tensordot(band, padded, axes=([1], [axis]))
    return np.moveaxis(out, 0, axis).astype(arr.dtype, copy=False)
