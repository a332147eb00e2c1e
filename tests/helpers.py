"""Shared tiny-scene builders for train-step / e2e tests."""

import jax
import jax.numpy as jnp
import numpy as np

from upnerf.models import NeRFConfig, TransientConfig
from upnerf.render import RenderConfig
from upnerf.train import (
    LossConfig,
    RayStore,
    SceneConstants,
    StepConfig,
    TrainState,
    init_params,
    init_pose_params,
    make_optimizer,
)

TINY_NERF = NeRFConfig(
    D=2, W=32, skips=(1,), feat_dim=8, xyz_L=4, dir_L=2,
    appearance_dim=8, candidate_dim=4, c2f=(0.1, 0.5),
)
TINY_T = TransientConfig(beta_min=0.1, transient_dim=8, feat_dim=8)


def tiny_step_config(batch_size=64, max_steps=100, pose_optimize=True):
    return StepConfig(
        prng_impl="rbg",
        nerf=TINY_NERF,
        transient=TINY_T,
        render=RenderConfig(
            N_samples=8, N_importance=4, perturb=1.0, encode_feat=True,
            precision="float32",
        ),
        loss=LossConfig(depth_mult=1e-3, alpha_reg=1.0, encode_feat=True, fine=True),
        candidate_schedule=(0.1, 0.5),
        max_steps=max_steps,
        pose_optimize=pose_optimize,
        near=0.1,
        far=5.0,
        batch_size=batch_size,
    )


def tiny_scene(n_img=3, H=8, W=8, fh=4, fw=4, feat_dim=8, seed=0):
    """Synthetic scene + full ray store (every pixel of every image)."""
    rng = np.random.RandomState(seed)
    Ks = np.zeros((n_img, 3, 3), np.float32)
    Ks[:, 0, 0] = Ks[:, 1, 1] = 10.0
    Ks[:, 0, 2] = W / 2
    Ks[:, 1, 2] = H / 2
    Ks[:, 2, 2] = 1.0
    poses = np.broadcast_to(np.eye(3, 4, dtype=np.float32), (n_img, 3, 4)).copy()
    near_far = np.tile(np.array([[0.1, 5.0]], np.float32), (n_img, 1))
    wh = np.tile(np.array([[W, H]], np.int64), (n_img, 1))
    feat_maps = rng.randn(n_img, fh, fw, feat_dim).astype(np.float32)
    feat_maps /= np.linalg.norm(feat_maps, axis=-1, keepdims=True)
    scene = SceneConstants(
        Ks=jnp.asarray(Ks),
        poses=jnp.asarray(poses),
        near_far=jnp.asarray(near_far),
        wh=jnp.asarray(wh, jnp.int32),
        feat_maps=jnp.asarray(feat_maps),
    )

    jj, ii = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    px = np.tile(ii.ravel(), n_img).astype(np.uint16)
    py = np.tile(jj.ravel(), n_img).astype(np.uint16)
    img_idx = np.repeat(np.arange(n_img), H * W).astype(np.int32)
    rgb = rng.randint(0, 256, (n_img * H * W, 3)).astype(np.uint8)
    inv_depth = (rng.rand(n_img * H * W) * 5 + 0.2).astype(np.float16)
    store = RayStore(
        px=jnp.asarray(px),
        py=jnp.asarray(py),
        img_idx=jnp.asarray(img_idx),
        rgb=jnp.asarray(rgb),
        inv_depth=jnp.asarray(inv_depth),
    )
    return scene, store


def tiny_state(cfg: StepConfig, n_img=3, seed=0, lr=5e-3, pose_lr=2e-3):
    params = init_params(jax.random.PRNGKey(seed), cfg.nerf, cfg.transient, n_img)
    pose_params = init_pose_params(n_img)
    opt = make_optimizer("adam", lr, lr / 10, cfg.max_steps)
    pose_opt = make_optimizer("adam", pose_lr, pose_lr / 10, cfg.max_steps)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        pose_params=pose_params,
        opt_state=opt.init(params),
        pose_opt_state=pose_opt.init(pose_params),
        rng=jax.random.key_data(jax.random.key(seed + 1, impl="rbg")),
    )
    return state, opt, pose_opt
