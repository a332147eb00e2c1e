"""Test-time optimization CLI (reference tto.py:94-139).

    python -m upnerf.cli.tto --result_dir outputs/<scene>/<exp> \
        [--ckpt last|best] [--batch_size 1024] [--optimize_num -1] \
        [--group_size 4]

Reloads the saved training config (tto.py:112-113), restores the trained
state, sim(3)-aligns GT test poses into the learned frame, and runs both
TTO phases for all test images (or one, with --optimize_num), batched in
groups. Writes per-image refined poses and metrics to
<result_dir>/a_optimize/ (JSON instead of the reference's pickles:
eval-compatible via upnerf.cli.eval).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _image_wh(path: str, downscale: int):
    """(W, H) after load_rgb_u8's integer downscale, without decoding."""
    from PIL import Image

    with Image.open(path) as im:
        w, h = im.size
    if downscale > 1:
        w, h = w // downscale, h // downscale
    return [w, h]


def load_trained(result_dir: str, ckpt: str):
    """(hparams, state, n_train) from a training run directory."""
    from upnerf.config import get_from_path
    from upnerf.utils import enable_compile_cache

    enable_compile_cache()
    from upnerf.data import load_scene_meta
    from upnerf.train.state import build_train_state
    from upnerf.utils.ckpt import CheckpointManager

    hparams = get_from_path(os.path.join(result_dir, "config.yaml"))
    meta = load_scene_meta(hparams)
    state_like = build_train_state(hparams, meta.N_images_train)
    mngr = CheckpointManager(os.path.join(result_dir, "ckpts"))
    step = mngr.best_step() if ckpt == "best" else mngr.latest_step()
    state = mngr.restore(state_like, step)
    mngr.close()
    return hparams, state, meta


def _parse_blur(spec) -> tuple:
    """pose_blur sigmas from either the CLI string form ('4,2') or the
    programmatic sequence form ((4.0, 2.0)) TTOConfig.pose_blur wants."""
    if spec is None:
        return ()
    if isinstance(spec, str):
        return tuple(float(s) for s in spec.split(",") if s.strip())
    return tuple(float(s) for s in spec)


def _parse_shard(spec: str):
    """'i/n' -> (i, n), validated."""
    try:
        i, n = (int(x) for x in str(spec).split("/"))
    except ValueError:
        raise SystemExit(f"--shard must be 'i/n' (got {spec!r})")
    if not (n >= 1 and 0 <= i < n):
        raise SystemExit(f"--shard needs 0 <= i < n (got {spec!r})")
    return i, n


def main(args) -> None:
    import jax
    import jax.numpy as jnp

    from upnerf.data.images import load_rgb_u8
    from upnerf.evaluate.lpips import load_lpips
    from upnerf.evaluate.tto import (
        TTOConfig,
        TTOGroup,
        TTORunner,
        align_test_poses,
        tto_region_size,
    )
    from upnerf.models import NeRFConfig
    from upnerf.render import RenderConfig

    hparams, state, meta = load_trained(args.result_dir, args.ckpt)
    save_root = os.path.join(args.result_dir, "a_optimize")
    os.makedirs(os.path.join(save_root, "optimized_pose"), exist_ok=True)

    assert meta.GT_poses_dict is not None, "TTO needs GT test poses"
    gt_train = np.stack(
        [np.asarray(meta.GT_poses_dict[i], np.float32) for i in meta.img_ids_train]
    )
    gt_test = np.stack(
        [np.asarray(meta.GT_poses_dict[i], np.float32) for i in meta.img_ids_test]
    )
    base_train = np.stack(
        [np.asarray(meta.poses_dict[i], np.float32) for i in meta.img_ids_train]
    )
    aligned_test = align_test_poses(
        np.asarray(state.pose_params["se3"]), gt_train, gt_test,
        base_train_poses=base_train,
    )

    test_ids = meta.img_ids_test
    nums = (
        list(range(len(test_ids)))
        if args.optimize_num == -1
        else [args.optimize_num]
    )
    # --shard i/n: strided split of the test images for multi-HOST TTO
    # scale-out — each image's optimization is independent (the reference
    # relaunches a Trainer per image, tto.py:119-139), so hosts need no
    # communication; run the same command with a different i per host.
    # Each shard owns its metrics file; eval merges metrics*.json.
    shard_i, shard_n = _parse_shard(getattr(args, "shard", "0/1"))
    nums = nums[shard_i::shard_n]
    if shard_n > 1:
        print(f"[tto] shard {shard_i}/{shard_n}: {len(nums)} of "
              f"{len(test_ids)} test images")
    if not nums:
        print("[tto] shard owns no test images; nothing to do")
        return

    nerf_cfg = NeRFConfig.from_hparams(hparams)
    cfg = TTOConfig(
        nerf=nerf_cfg,
        # param_grads=False: the model is frozen in TTO (only the test pose
        # + appearance embedding optimize, nerf_system_optmize.py:60-76),
        # so the fused backward skips all dW work.
        render=RenderConfig.from_hparams(hparams)._replace(
            perturb=1.0, param_grads=False
        ),
        batch_size=args.batch_size,
        pose_epochs=args.pose_epochs,
        appearance_epochs=args.appearance_epochs,
        pose_anneal=getattr(args, "pose_anneal", 0.0),
        pose_blur=_parse_blur(getattr(args, "pose_blur", "")),
        pose_blur_frac=getattr(args, "pose_blur_frac", 0.5),
    )
    frozen = {
        "nerf_coarse": state.params["nerf_coarse"],
        "nerf_fine": state.params["nerf_fine"],
        "embeddings": state.params["embeddings"],
    }
    lpips = load_lpips()
    if lpips is None:
        print("[tto] LPIPS weights not found (UPNERF_LPIPS_WEIGHTS unset) — "
              "reporting PSNR/SSIM only")

    results_path = os.path.join(
        save_root,
        "metrics.json"
        if shard_n == 1
        else f"metrics.shard{shard_i}of{shard_n}.json",
    )
    all_metrics = {}
    if os.path.isfile(results_path):
        with open(results_path) as f:
            all_metrics = json.load(f)

    # Scene-global shapes: every group is padded to the SAME G and the eval
    # grids are sized over all selected test images, so each phase's step +
    # eval programs compile exactly once for the whole scene.
    all_wh = np.asarray(
        [
            _image_wh(os.path.join(meta.image_dir, meta.image_paths[test_ids[n]]),
                      meta.scale)
            for n in nums
        ],
        np.int64,
    )
    # TTO shards across the mesh too (rays within each image's batch /
    # chunk interiors) whenever the sizes divide evenly. Device selection
    # honors the run's tpu.n_devices (same precedence as Trainer: legacy
    # tpu.data_axis accepted, 0 = all local devices).
    from upnerf.evaluate.tto import EVAL_CHUNK

    n_dev = hparams.get("tpu.n_devices", hparams.get("tpu.data_axis", 0)) or 0
    n_dev = min(n_dev, jax.device_count()) if n_dev > 0 else jax.device_count()
    mesh = None
    if n_dev > 1 and cfg.batch_size % n_dev == 0 and EVAL_CHUNK % n_dev == 0:
        from upnerf.parallel import make_mesh

        mesh = make_mesh(n_dev)
    runner = TTORunner(
        frozen, cfg, hparams["nerf.appearance_dim"],
        region_A=tto_region_size(all_wh, (0.0, 1.0)),
        region_B=tto_region_size(all_wh, (0.5, 1.0)),
        mesh=mesh,
    )
    Hm_img = -(-int(all_wh[:, 1].max()) // 64) * 64
    Wm_img = -(-int(all_wh[:, 0].max()) // 64) * 64

    key = jax.random.PRNGKey(hparams.get("seed", 42))
    for g0 in range(0, len(nums), args.group_size):
        group_nums = nums[g0 : g0 + args.group_size]
        n_valid = len(group_nums)
        # pad the last group to the fixed group size by repeating its final
        # image (results for padded rows are discarded)
        padded_nums = group_nums + [group_nums[-1]] * (
            args.group_size - n_valid
        )
        imgs, Ks, whs = [], [], []
        for n in padded_nums:
            id_ = test_ids[n]
            img = load_rgb_u8(
                os.path.join(meta.image_dir, meta.image_paths[id_]), meta.scale
            )
            imgs.append(img)
            Ks.append(meta.Ks[id_])
            whs.append([img.shape[1], img.shape[0]])
        rgbs = np.zeros((len(imgs), Hm_img, Wm_img, 3), np.uint8)
        for i, img in enumerate(imgs):
            rgbs[i, : img.shape[0], : img.shape[1]] = img

        group = TTOGroup(
            Ks=jnp.asarray(np.stack(Ks), jnp.float32),
            base_poses=jnp.asarray(aligned_test[np.asarray(padded_nums)], jnp.float32),
            rgbs=jnp.asarray(rgbs),
            wh=jnp.asarray(np.asarray(whs), jnp.int32),
            near_far=jnp.tile(
                jnp.array([[hparams["nerf.near"], hparams["nerf.far"]]]),
                (len(imgs), 1),
            ),
        )
        key, k = jax.random.split(key)
        out = runner.run_group(
            group, k, lpips=lpips,
            eval_every=getattr(args, "eval_every", 1),
        )
        group_nums = group_nums[:n_valid]
        emb_dir = os.path.join(save_root, "optimized_emb_a")
        os.makedirs(emb_dir, exist_ok=True)
        for i, n in enumerate(group_nums):
            np.save(
                os.path.join(
                    save_root, "optimized_pose", f"best_pose_{n:02d}.npy"
                ),
                out["pose"][i],
            )
            np.save(
                os.path.join(emb_dir, f"best_emb_{n:02d}.npy"), out["emb"][i]
            )
            all_metrics[str(n)] = {
                "psnr": float(out["psnr"][i]),
                "ssim": float(out["ssim"][i]),
                "lpips": (
                    None if np.isnan(out["lpips"][i]) else float(out["lpips"][i])
                ),
            }
        with open(results_path, "w") as f:
            json.dump(all_metrics, f, indent=1)
        # count only THIS run's selection: a resumed metrics file may hold
        # images outside the current --optimize_num/--shard scope
        done = sum(1 for n in nums if str(n) in all_metrics)
        print(f"[tto] {done}/{len(nums)} images done -> {results_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_dir", required=True)
    parser.add_argument("--ckpt", default="last", choices=["last", "best"])
    parser.add_argument("--batch_size", default=1024, type=int)
    parser.add_argument("--optimize_num", default=-1, type=int)
    parser.add_argument("--group_size", default=4, type=int)
    parser.add_argument("--pose_epochs", default=50, type=int)
    parser.add_argument("--appearance_epochs", default=20, type=int)
    parser.add_argument("--pose_anneal", default=0.0, type=float,
                        help="fraction of pose epochs ramping the PE "
                        "anneal progress 0.3->1.0 (coarse-to-fine test-"
                        "pose basin widening; 0 = reference behavior)")
    parser.add_argument("--pose_blur", default="",
                        help="comma list of Gaussian sigmas for pyramid "
                        "coarse-to-fine on the phase-A target image, "
                        "coarse->fine (e.g. '4,2'); empty = reference "
                        "behavior (sharp target throughout)")
    parser.add_argument("--pose_blur_frac", default=0.5, type=float,
                        help="fraction of pose epochs spent on the "
                        "blurred pyramid levels")
    parser.add_argument("--eval_every", default=1, type=int,
                        help="best-metric eval render every k-th epoch "
                        "(small synthetic images: epochs are a few steps "
                        "and per-epoch evals dominate wall-clock)")
    parser.add_argument("--shard", default="0/1",
                        help="'i/n': optimize every n-th test image starting "
                        "at i — run one shard per host for multi-host TTO "
                        "(images are independent; eval merges the shards)")
    main(parser.parse_args())
