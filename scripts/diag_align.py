"""Diagnose align_test_poses on the real trained run (no TPU needed).

Maps GT TRAIN poses through the identical sim3 mapping used for test
poses and compares to the actual learned train poses — if the mapping is
right these coincide up to the training residual (a few deg / small t).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from upnerf.cli.tto import load_trained
from upnerf.evaluate.tto import align_test_poses
from upnerf.geometry import procrustes, se3

run = sys.argv[1] if len(sys.argv) > 1 else \
    "outputs_validation/out_tto/synth/tto_seed777"
hparams, state, meta = load_trained(run, "last")

se3_table = np.asarray(state.pose_params["se3"])
gt_train = np.stack([np.asarray(meta.GT_poses_dict[i], np.float32)
                     for i in meta.img_ids_train])
gt_test = np.stack([np.asarray(meta.GT_poses_dict[i], np.float32)
                    for i in meta.img_ids_test])
base_train = np.stack([np.asarray(meta.poses_dict[i], np.float32)
                       for i in meta.img_ids_train])

learned_train = np.asarray(
    se3.compose([se3.se3_to_SE3(jnp.asarray(se3_table)),
                 jnp.asarray(base_train)]))


def ang_deg(Ra, Rb):
    return np.degrees(np.asarray(
        procrustes.rotation_distance(jnp.asarray(Ra), jnp.asarray(Rb))))


# Map GT TRAIN poses through align_test_poses itself (pass train as "test")
aligned_train = align_test_poses(se3_table, gt_train, gt_train,
                                 base_train_poses=base_train)
aligned_test = align_test_poses(se3_table, gt_train, gt_test,
                                base_train_poses=base_train)

print("== learned_train vs gt_train (raw c2w) ==")
print(" R deg:", np.round(ang_deg(learned_train[:, :, :3], gt_train[:, :, :3]), 2))
print(" |dc|:", np.round(np.linalg.norm(
    learned_train[:, :, 3] - gt_train[:, :, 3], axis=-1), 3))

print("== aligned(GT train) vs learned_train (raw c2w) ==")
print(" R deg:", np.round(ang_deg(aligned_train[:, :, :3],
                                  learned_train[:, :, :3]), 2))
print(" |dc|:", np.round(np.linalg.norm(
    aligned_train[:, :, 3] - learned_train[:, :, 3], axis=-1), 3))

print("== aligned(GT test) vs gt_test (raw c2w) ==")
print(" R deg:", np.round(ang_deg(aligned_test[:, :, :3], gt_test[:, :, :3]), 2))
print(" |dc| :", np.round(np.linalg.norm(
    aligned_test[:, :, 3] - gt_test[:, :, 3], axis=-1), 3))

# sim3 internals
refine = se3.se3_to_SE3(jnp.asarray(se3_table))
refine_poses = se3.compose([refine, jnp.asarray(base_train)])
rp = procrustes.parse_raw_camera(refine_poses)
gp = procrustes.parse_raw_camera(jnp.asarray(gt_train))
_, sim3 = procrustes.prealign_cameras(rp, gp)
print("== sim3 ==")
print(" s0", float(sim3.s0), "s1", float(sim3.s1))
print(" R angle from I (deg):", float(ang_deg(np.asarray(sim3.R), np.eye(3))))
print(" t0", np.asarray(sim3.t0), "t1", np.asarray(sim3.t1))
