"""Free-pose rendering (novel-view paths, test images).

The reference's video/test rendering path is an unfinished TODO
(datasets/phototourism.py:402-407,472-528); here it is a first-class
function: render any (K, W, H, c2w) with a chosen appearance embedding at
the rgb phase, chunked inside one jit.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from upnerf.geometry import rays as ray_utils
from upnerf.models import NeRFConfig
from upnerf.render import RenderConfig, render_rays


def make_pose_renderer(
    nerf_cfg: NeRFConfig, rcfg: RenderConfig, chunk: int = 4096, fast=None
):
    """render(params, K, pose, px, py, near_far, a_idx) -> rgb/depth maps.

    px/py are flat pixel coords padded to a chunk multiple; a_idx selects
    the appearance embedding row (reference uses a train image's embedding
    for novel views, datasets/phototourism.py:490-492).

    fast: optional upnerf.render.FastRenderConfig — serving-only interval
    tightening: a sigma-only probe of the coarse network shrinks each
    ray's [near, far] to where the weight mass lives, and a reduced
    sample budget renders inside it (upnerf/render/fast.py)."""
    if fast is not None:
        from upnerf.render.fast import fast_render_config, tighten_rays

        render_cfg = fast_render_config(rcfg, fast)
    else:
        render_cfg = rcfg

    @functools.partial(jax.jit, static_argnames=())
    def render(params: Dict[str, Any], K, pose, px, py, near_far, a_idx):
        n = px.shape[0]
        n_chunks = n // chunk
        pxc = px.reshape(n_chunks, chunk)
        pyc = py.reshape(n_chunks, chunk)
        progress = jnp.asarray(1.0)

        def one(args):
            pxi, pyi = args
            dirs = ray_utils.pixel_directions(pxi, pyi, K)
            rays_o, rays_d = ray_utils.get_rays(dirs, pose)
            rays = jnp.concatenate(
                [rays_o, rays_d, jnp.broadcast_to(near_far, (chunk, 2))], -1
            )
            if fast is not None:
                rays = tighten_rays(
                    params["nerf_coarse"], nerf_cfg, rcfg, fast, rays,
                    progress,
                )
            idx = jnp.full((chunk,), a_idx, jnp.int32)
            out = render_rays(
                params, render_cfg, nerf_cfg, rays, idx,
                key=None, phase=2, sched_mult=jnp.asarray(1.0),
                progress=progress, encode_candidate=False, det=True,
            )
            return out["s_rgb_fine"], out["s_depth_fine"]

        rgb, depth = jax.lax.map(one, (pxc, pyc))
        return rgb.reshape(n, 3), depth.reshape(n)

    return render


def render_image(
    renderer, params, K, pose, wh, near_far, a_idx: int, chunk: int = 4096
):
    """Host wrapper: full (H, W) image from a padded chunked render."""
    w, h = int(wh[0]), int(wh[1])
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    n = h * w
    pad = (-n) % chunk
    px = jnp.asarray(np.pad(ii.ravel().astype(np.float32), (0, pad)))
    py = jnp.asarray(np.pad(jj.ravel().astype(np.float32), (0, pad)))
    rgb, depth = renderer(
        params, jnp.asarray(K), jnp.asarray(pose), px, py,
        jnp.asarray(near_far, jnp.float32), a_idx,
    )
    return (
        np.asarray(rgb[:n]).reshape(h, w, 3),
        np.asarray(depth[:n]).reshape(h, w),
    )
