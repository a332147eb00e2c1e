"""Per-camera pose-error breakdown for a finished run.

The logged train/pose_R_rel is a MEAN over all camera pairs; identity-init
recovery often ends bimodal (most cameras snap to the right ring, a few
settle in a mirrored/stuck basin) and the mean hides it. This prints the
per-camera mean relative rotation error (mean over the pairs touching each
camera) plus distribution quantiles.

Usage: python scripts/analyze_pose_recovery.py <result_dir>
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main(result_dir: str) -> None:
    import os

    from upnerf.config import default, merge_from_file
    from upnerf.geometry import procrustes, se3
    from upnerf.train.loop import Trainer

    hp = default()
    merge_from_file(hp, os.path.join(result_dir, "config.yaml"))
    hp["debug"] = True
    trainer = Trainer(hp)
    trainer.state = trainer.ckpt.restore(trainer.state)
    print(f"checkpoint step {int(trainer.state.step)}")

    meta = trainer.meta
    base = np.stack([np.asarray(meta.poses_dict[i]) for i in meta.img_ids_train])
    gt = np.stack([np.asarray(meta.GT_poses_dict[i]) for i in meta.img_ids_train])
    refine = se3.se3_to_SE3(trainer.state.pose_params["se3"])
    refined = np.asarray(se3.compose([refine, np.asarray(base)]))

    rel = procrustes.relative_pose_error(refined, gt)
    n = len(refined)
    iu, ju = np.triu_indices(n, k=1)
    R_deg = np.asarray(rel["R"]) * 180 / math.pi

    per_cam = np.zeros(n)
    for c in range(n):
        mask = (iu == c) | (ju == c)
        per_cam[c] = R_deg[mask].mean()

    print(f"pairwise rel-R: mean {R_deg.mean():.2f} median {np.median(R_deg):.2f} "
          f"p90 {np.percentile(R_deg, 90):.2f} max {R_deg.max():.2f} deg")
    print(f"rel-t mean {np.mean(rel['t']):.3f}")
    print("per-camera mean rel-R (deg):")
    for c in range(n):
        bar = "#" * int(per_cam[c] / 2)
        print(f"  cam {c:2d}: {per_cam[c]:7.2f} {bar}")
    good = per_cam < 10
    if good.sum() >= 2:
        sel = np.isin(iu, np.where(good)[0]) & np.isin(ju, np.where(good)[0])
        print(f"{good.sum()}/{n} cameras under 10 deg; "
              f"mean over those pairs only: {R_deg[sel].mean():.2f} deg")
    else:
        # <2 good cameras -> no good-good pairs; an empty-selection mean
        # would print nan with a RuntimeWarning for exactly the failed runs
        # this summary is meant to diagnose.
        print(f"{good.sum()}/{n} cameras under 10 deg; "
              f"mean over those pairs only: n/a (<2 good cameras)")


if __name__ == "__main__":
    main(sys.argv[1])
