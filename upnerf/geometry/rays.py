"""Camera-frame ray directions and world-frame rays.

Matches reference utils/ray.py:5-67 semantics, including the deliberate
ABSENCE of +0.5 pixel centering (utils/ray.py:20-21; calibration is
inaccurate for internet photos) and the "right-up-back" camera convention
(x right, y up, camera looks down -z).

TPU-first addition: `pixel_directions` computes directions from raw integer
pixel coordinates + intrinsics *on device inside jit*, so the training ray
store only needs (x, y, img_idx) per ray instead of a precomputed float3
direction buffer (reference builds giant host-side direction buffers,
datasets/phototourism.py:258-261).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def get_ray_directions(H: int, W: int, K) -> jnp.ndarray:
    """Per-pixel camera-frame directions, (H, W, 3) (utils/ray.py:5-27).

    K: (3, 3) intrinsics. No +0.5 centering, matching utils/ray.py:20.
    """
    K = np.asarray(K)
    j, i = np.meshgrid(
        np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32), indexing="ij"
    )
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    directions = np.stack(
        [(i - cx) / fx, -(j - cy) / fy, -np.ones_like(i)], axis=-1
    )  # (H, W, 3)
    return jnp.asarray(directions)


def pixel_directions(
    px: jnp.ndarray, py: jnp.ndarray, K: jnp.ndarray
) -> jnp.ndarray:
    """Camera-frame directions from per-ray pixel coords and per-ray intrinsics.

    px, py: (N,) pixel column/row (float or int). K: (N, 3, 3) or (3, 3).
    Returns (N, 3). Same formula as get_ray_directions (utils/ray.py:22-25).
    """
    px = px.astype(jnp.float32)
    py = py.astype(jnp.float32)
    if K.ndim == 2:
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    else:
        fx, fy, cx, cy = K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]
    return jnp.stack(
        [(px - cx) / fx, -(py - cy) / fy, -jnp.ones_like(px)], axis=-1
    )


def get_ndc_rays(H, W, focal, near, rays_o, rays_d):
    """World rays -> NDC cube rays (utils/ray.py:70-111). Unused by the
    main UP-NeRF path (scene bounds are metric) but part of the API."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]
    o0 = -1.0 / (W / (2.0 * focal)) * ox_oz
    o1 = -1.0 / (H / (2.0 * focal)) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (W / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (H / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2
    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def get_rays(
    directions: jnp.ndarray, c2w: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World-frame ray origins + normalized directions (utils/ray.py:30-67).

    directions: (..., 3) camera-frame dirs.
    c2w: (3, 4) single pose, or (N, 3, 4) per-ray poses when directions is
         (N, 3) (the batched path of utils/ray.py:44-55 used in training,
         models/nerf_system.py:161).
    Returns rays_o, rays_d, both (N, 3) with N = prod of leading dims.
    """
    if c2w.ndim == 3 and directions.ndim == 2 and c2w.shape[0] == directions.shape[0]:
        # Per-ray pose: d_world = R @ d_cam, batched (utils/ray.py:49-52).
        rays_d = jnp.einsum("nij,nj->ni", c2w[:, :, :3], directions)
        rays_o = c2w[..., 3]
    else:
        rays_d = directions @ c2w[:, :3].T  # (..., 3)
        rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)
