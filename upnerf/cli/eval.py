"""Evaluation CLI (reference eval.py:13-82).

    python -m upnerf.cli.eval --result_dir outputs/<scene>/<exp> [--ckpt last]

Prints mean train-pose rotation/translation errors (refined identity-init
poses Procrustes-aligned to GT, eval.py:28-40) and mean PSNR/SSIM/LPIPS
from the TTO results (eval.py:44-67; ours are a_optimize/metrics.json).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(args) -> None:
    import jax.numpy as jnp

    from upnerf.geometry import procrustes, se3

    from .tto import load_trained

    hparams, state, meta = load_trained(args.result_dir, args.ckpt)

    if meta.GT_poses_dict is not None:
        base = np.stack(
            [np.asarray(meta.poses_dict[i], np.float32) for i in meta.img_ids_train]
        )
        gt = np.stack(
            [np.asarray(meta.GT_poses_dict[i], np.float32) for i in meta.img_ids_train]
        )
        refine = se3.se3_to_SE3(state.pose_params["se3"])
        refined = se3.compose([refine, jnp.asarray(base)])
        err, _, _ = procrustes.pose_metric(refined, jnp.asarray(gt))
        if err is not None:
            print("train/pose_R", float(np.mean(np.asarray(err["R"]))) * 180 / np.pi)
            print("train/pose_t", float(np.mean(np.asarray(err["t"]))))
        else:
            print("pose alignment is not converged")
        rel = procrustes.relative_pose_error(refined, jnp.asarray(gt))
        print("train/pose_R_rel", float(np.mean(rel["R"])) * 180 / np.pi)
        print("train/pose_t_rel", float(np.mean(rel["t"])))
    else:
        print("Dataset does not have GT poses. Skip pose evaluation.")

    # Single-host TTO writes metrics.json; multi-host shards
    # (tto --shard i/n) each write metrics.shard{i}of{n}.json. Merge
    # shards FIRST so a full single-host metrics.json (e.g. a later
    # complete re-run) overrides stale shard leftovers per image; list
    # the merged files so a partial shard set is visible.
    import glob

    save_root = os.path.join(args.result_dir, "a_optimize")
    shard_paths = sorted(
        glob.glob(os.path.join(save_root, "metrics.shard*.json"))
    )
    full_path = os.path.join(save_root, "metrics.json")
    paths = shard_paths + ([full_path] if os.path.isfile(full_path) else [])
    if not paths:
        print(f"There is no {full_path}.")
        print("You should run upnerf.cli.tto for getting NVS results.")
        return
    m = {}
    for p in paths:
        with open(p) as f:
            m.update(json.load(f))
    if shard_paths:
        print(
            f"merged {len(paths)} metrics file(s) "
            f"({', '.join(os.path.basename(p) for p in paths)}): "
            f"{len(m)} images"
        )
    psnr = [v["psnr"] for v in m.values()]
    ssim = [v["ssim"] for v in m.values()]
    lpips = [v["lpips"] for v in m.values() if v.get("lpips") is not None]
    print("PSNR: \t", float(np.mean(psnr)))
    print("SSIM: \t", float(np.mean(ssim)))
    if lpips:
        print("LPIPS: \t", float(np.mean(lpips)))
    else:
        print("LPIPS: \t n/a (no LPIPS weights; set UPNERF_LPIPS_WEIGHTS)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_dir", required=True)
    parser.add_argument("--ckpt", default="last")
    main(parser.parse_args())
