"""Novel-view orbit rendering from a trained checkpoint.

    python -m upnerf.cli.render_video --result_dir outputs/<scene>/<exp> \
        [--anchor 0] [--frames 60] [--out <dir>]

Renders a circular camera path around a training view
(utils/camera.py:385-395) with that view's appearance embedding, writing
PNG frames (+ depth maps). Completes the reference's unfinished video path
(datasets/phototourism.py:472-494).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(args) -> None:
    import jax.numpy as jnp
    from PIL import Image

    from upnerf.evaluate.render import make_pose_renderer, render_image
    from upnerf.geometry import se3
    from upnerf.models import NeRFConfig
    from upnerf.render import RenderConfig
    from upnerf.utils.viz import visualize_depth

    from .tto import load_trained

    hparams, state, meta = load_trained(args.result_dir, args.ckpt)
    out_dir = args.out or os.path.join(args.result_dir, "video")
    os.makedirs(out_dir, exist_ok=True)

    nerf_cfg = NeRFConfig.from_hparams(hparams)
    rcfg = RenderConfig.from_hparams(hparams)._replace(perturb=0.0)
    fast = None
    if getattr(args, "fast", False):
        from upnerf.render import FastRenderConfig

        # Serving-only interval tightening (upnerf/render/fast.py): probe
        # the coarse density, render a reduced budget inside the tightened
        # per-ray interval. Measured quality/speed trade: docs/DESIGN.md
        # "Fast serving renders".
        fast = FastRenderConfig(
            n_probe=getattr(args, "fast_probe", 64),
            N_samples=getattr(args, "fast_samples", 64),
            N_importance=getattr(args, "fast_importance", 64),
        )
    renderer = make_pose_renderer(
        nerf_cfg, rcfg, chunk=hparams["val.chunk_size"], fast=fast
    )

    anchor_id = meta.img_ids_train[args.anchor]
    # anchor at the REFINED training pose: exp(se3) o base
    base = jnp.asarray(np.asarray(meta.poses_dict[anchor_id], np.float32))
    refine = se3.se3_to_SE3(state.pose_params["se3"][args.anchor])
    anchor_pose = se3.compose([refine, base])
    poses = se3.get_novel_view_poses(anchor_pose, N=args.frames, scale=args.scale)

    K = meta.Ks[anchor_id]
    w = int(round(K[0, 2] * 2))
    h = int(round(K[1, 2] * 2))
    near_far = np.array([hparams["nerf.near"], hparams["nerf.far"]], np.float32)
    params = {
        "nerf_coarse": state.params["nerf_coarse"],
        "nerf_fine": state.params["nerf_fine"],
        "embeddings": state.params["embeddings"],
    }
    for i in range(args.frames):
        rgb, depth = render_image(
            renderer, params, K, np.asarray(poses[i]), (w, h), near_far,
            a_idx=args.anchor, chunk=hparams["val.chunk_size"],
        )
        Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"frame_{i:03d}.png")
        )
        Image.fromarray(visualize_depth(depth)).save(
            os.path.join(out_dir, f"depth_{i:03d}.png")
        )
        print(f"[video] frame {i + 1}/{args.frames}")
    print(f"[video] frames -> {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_dir", required=True)
    parser.add_argument("--ckpt", default="last")
    parser.add_argument("--anchor", default=0, type=int)
    parser.add_argument("--frames", default=60, type=int)
    parser.add_argument("--scale", default=1.0, type=float)
    parser.add_argument("--out", default=None)
    parser.add_argument(
        "--fast", action="store_true",
        help="interval-tightened serving render (reduced sample budget "
        "inside a sigma-probed per-ray [near, far])",
    )
    parser.add_argument("--fast_probe", default=64, type=int)
    parser.add_argument("--fast_samples", default=64, type=int)
    parser.add_argument("--fast_importance", default=64, type=int)
    main(parser.parse_args())
