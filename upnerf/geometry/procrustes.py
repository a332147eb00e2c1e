"""Procrustes sim(3) alignment and pose-error metrics.

Matches reference utils/camera.py:354-382 and utils/metric.py:34-77. Used to
align identity-initialized refined poses to GT for rotation/translation error
reporting (models/nerf_system.py:411-450, eval.py:28-40) and to initialize
test poses for TTO (models/nerf_system_optmize.py:267-319).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from .se3 import cam2world, compose, invert, make_pose


class Sim3(NamedTuple):
    """Similarity transform aligning point set X1 to X0 (utils/camera.py:380-382)."""

    t0: jnp.ndarray  # (3,)
    t1: jnp.ndarray  # (3,)
    s0: jnp.ndarray  # scalar
    s1: jnp.ndarray  # scalar
    R: jnp.ndarray  # (3, 3)


def procrustes_analysis(X0: jnp.ndarray, X1: jnp.ndarray) -> Sim3:
    """Similarity alignment of [N, 3] point sets (utils/camera.py:364-382).

    Solves for sim3 s.t. X1to0 = (X1 - t1)/s1 @ R.T * s0 + t0. SVD runs in
    float64 on host-side numpy for precision (reference casts to double,
    utils/camera.py:376).
    """
    t0 = X0.mean(axis=0)
    t1 = X1.mean(axis=0)
    X0c = X0 - t0
    X1c = X1 - t1
    s0 = jnp.sqrt((X0c**2).sum(axis=-1).mean())
    s1 = jnp.sqrt((X1c**2).sum(axis=-1).mean())
    X0cs = X0c / s0
    X1cs = X1c / s1
    M = np.asarray(X0cs.T @ X1cs, dtype=np.float64)
    U, _, Vt = np.linalg.svd(M, full_matrices=False)
    R = np.asarray(U @ Vt, dtype=np.float32)
    if np.linalg.det(R) < 0:
        R[2] *= -1
    return Sim3(t0=t0, t1=t1, s0=s0, s1=s1, R=jnp.asarray(R))


def rotation_distance(R1: jnp.ndarray, R2: jnp.ndarray, eps: float = 1e-7):
    """Geodesic angle between rotations (utils/camera.py:354-361)."""
    R_diff = R1 @ jnp.swapaxes(R2, -2, -1)
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))


def parse_raw_camera(pose_raw: jnp.ndarray) -> jnp.ndarray:
    """Reparameterize a raw c2w pose for alignment (utils/metric.py:34-39).

    flip -> compose -> invert -> flip, with flip = diag(1, -1, -1).
    Broadcasts over leading batch dims (the reference loops per pose).
    """
    flip = make_pose(R=jnp.diag(jnp.array([1.0, -1.0, -1.0])))
    if pose_raw.ndim > 2:
        flip = jnp.broadcast_to(flip, pose_raw.shape[:-2] + (3, 4))
    pose = compose([flip, pose_raw[..., :3, :]])
    pose = invert(pose)
    pose = compose([flip, pose])
    return pose


def gauge_rotation_from_orientations(
    pose: jnp.ndarray, pose_GT: jnp.ndarray
) -> jnp.ndarray:
    """Gauge rotation Q with pose_R_i ~= pose_GT_R_i @ Q, both [N, 3, 4]
    parsed poses — the chordal-L2 mean of {gt_R_i^T pred_R_i}.

    The reference estimates the gauge rotation from camera CENTERS alone
    (utils/camera.py:364-382): for planar camera rigs (rings, arcs — every
    synthetic pose testbed here, and any real scene shot at one height)
    the center covariance is rank-2, the orthogonal Procrustes optimum can
    be a reflection, and BARF's det fix (`R[2] *= -1`) then lands on a
    ~180-deg rotation that fits nothing (observed: 179.3 deg on the
    tto_quality run, post-TTO PSNR 12 dB). Camera ORIENTATIONS constrain
    all three rotational DoF regardless of the center geometry, so this
    estimator has no such degeneracy. Documented deviation: used for TTO
    test-pose initialization; error METRICS keep the reference's
    center-only estimate for parity (and are gauge-free via
    relative_pose_error anyway)."""
    M = np.zeros((3, 3), np.float64)
    R_gt = np.asarray(pose_GT[..., :3], np.float64)
    R_pr = np.asarray(pose[..., :3], np.float64)
    M = np.einsum("nij,nik->jk", R_gt, R_pr)
    U, _, Vt = np.linalg.svd(M, full_matrices=False)
    d = np.sign(np.linalg.det(U @ Vt))
    Q = (U * np.array([1.0, 1.0, d])) @ Vt
    return jnp.asarray(Q.astype(np.float32))


def prealign_cameras(
    pose: jnp.ndarray, pose_GT: jnp.ndarray
) -> Tuple[jnp.ndarray, Sim3]:
    """Procrustes-align camera centers of `pose` to `pose_GT`
    (utils/metric.py:42-52). Both [N, 3, 4]."""
    center = jnp.zeros((1, 1, 3))
    center_pred = cam2world(center, pose)[:, 0]  # (N, 3)
    center_GT = cam2world(center, pose_GT)[:, 0]  # (N, 3)
    sim3 = procrustes_analysis(center_GT, center_pred)
    center_aligned = (center_pred - sim3.t1) / sim3.s1 @ sim3.R.T * sim3.s0 + sim3.t0
    R_aligned = pose[..., :3] @ sim3.R.T
    t_aligned = (-R_aligned @ center_aligned[..., None])[..., 0]
    return make_pose(R=R_aligned, t=t_aligned), sim3


def evaluate_camera_alignment(
    pose_aligned: jnp.ndarray, pose_GT: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Rotation (rad) and translation errors (utils/metric.py:55-62)."""
    R_aligned, t_aligned = pose_aligned[..., :3], pose_aligned[..., 3:]
    R_GT, t_GT = pose_GT[..., :3], pose_GT[..., 3:]
    R_error = rotation_distance(R_aligned, R_GT)
    t_error = jnp.linalg.norm((t_aligned - t_GT)[..., 0], axis=-1)
    return {"R": R_error, "t": t_error}


def relative_pose_error(
    poses: jnp.ndarray, gt_poses: jnp.ndarray
) -> Dict[str, np.ndarray]:
    """Gauge-free pose error over all camera pairs. Both [N, 3, 4] c2w.

    The Procrustes metric (pose_metric / reference utils/metric.py:42-62)
    aligns a global sim(3) from camera CENTERS; with few or near-coplanar
    cameras (e.g. a validation ring) the SVD branch is reflection-bistable
    and the reported error can flip by ~180 deg between numerically
    equivalent runs (observed on TPU vs host recomputation of the same
    checkpoint). Relative errors compare R_i^T R_j and scale-normalized
    baselines, so no alignment is needed and the metric is stable.

    Returns {"R": pairwise geodesic angle (rad), "t": pairwise relative-
    translation error normalized by the mean GT relative translation},
    each a flat [N*(N-1)/2] array.
    """
    n = poses.shape[0]
    iu, ju = np.triu_indices(n, k=1)

    def rel_pairs(p):
        # P_i^{-1} o P_j — invariant to any global (left) SE(3) gauge.
        return compose([p[ju], invert(p[iu])])

    rel = rel_pairs(jnp.asarray(poses))
    rel_g = rel_pairs(jnp.asarray(gt_poses))
    R_err = np.asarray(rotation_distance(rel[..., :3], rel_g[..., :3]))
    t = np.asarray(rel[..., 3])
    t_g = np.asarray(rel_g[..., 3])
    # A single global scale on camera centers scales every relative
    # translation uniformly; normalize it out before comparing.
    mean_g = max(float(np.linalg.norm(t_g, axis=-1).mean()), 1e-9)
    scale = float(np.linalg.norm(t, axis=-1).mean()) / mean_g
    t_err = np.linalg.norm(t / max(scale, 1e-9) - t_g, axis=-1) / mean_g
    return {"R": R_err, "t": t_err}


def pose_metric(refine_poses: jnp.ndarray, gt_poses: jnp.ndarray):
    """End-to-end pose error (utils/metric.py:65-77).

    Returns (error dict | None, aligned_poses, gt_poses_parsed)."""
    refine_poses = parse_raw_camera(refine_poses.astype(jnp.float32))
    gt_poses = parse_raw_camera(gt_poses.astype(jnp.float32))
    try:
        aligned_pose, _sim3 = prealign_cameras(refine_poses, gt_poses)
        error = evaluate_camera_alignment(aligned_pose, gt_poses)
        if not np.isfinite(np.asarray(error["R"])).all():
            raise FloatingPointError("non-finite rotation error")
    except Exception:  # alignment did not converge (utils/metric.py:73-76)
        return None, refine_poses, gt_poses
    return error, aligned_pose, gt_poses
