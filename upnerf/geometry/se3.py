"""SE(3)/SO(3) Lie algebra and [R|t] pose algebra as pure jnp functions.

Numerics match the reference (utils/camera.py:6-152): exp/log maps use
10-term Taylor expansions of sin(x)/x, (1-cos(x))/x^2, (x-sin(x))/x^3, which
are gradient-safe at theta = 0 (crucial for the identity-initialized se3
refinement table, models/nerf_system.py:406-407). All functions broadcast
over arbitrary leading batch dims and are vmap/jit friendly.

A camera pose is a [..., 3, 4] array [R | t] mapping world -> camera
(or camera -> world, depending on usage site), as in utils/camera.py:6-10.
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe_norm(w: jnp.ndarray) -> jnp.ndarray:
    """||w|| with zero (not NaN) gradient at w == 0, matching torch's norm
    subgradient. Essential: the se3 table is zero-initialized
    (models/nerf_system.py:406-407) and the very first backward pass goes
    through theta = ||w|| at exactly 0."""
    sq = (w**2).sum(axis=-1)
    safe = jnp.where(sq == 0, 1.0, sq)
    return jnp.where(sq == 0, 0.0, jnp.sqrt(safe))


def skew_symmetric(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] cross-product matrix (utils/camera.py:113-124)."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    O = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([O, -w2, w1], axis=-1),
            jnp.stack([w2, O, -w0], axis=-1),
            jnp.stack([-w1, w0, O], axis=-1),
        ],
        axis=-2,
    )


def taylor_A(x: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """Taylor expansion of sin(x)/x (utils/camera.py:126-134)."""
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        if i > 0:
            denom *= (2 * i) * (2 * i + 1)
        ans = ans + (-1) ** i * x ** (2 * i) / denom
    return ans


def taylor_B(x: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """Taylor expansion of (1-cos(x))/x**2 (utils/camera.py:136-143)."""
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 1) * (2 * i + 2)
        ans = ans + (-1) ** i * x ** (2 * i) / denom
    return ans


def taylor_C(x: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """Taylor expansion of (x-sin(x))/x**3 (utils/camera.py:145-152)."""
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 2) * (2 * i + 3)
        ans = ans + (-1) ** i * x ** (2 * i) / denom
    return ans


def so3_to_SO3(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3) (utils/camera.py:66-73)."""
    wx = skew_symmetric(w)
    theta = _safe_norm(w)[..., None, None]
    I = jnp.eye(3, dtype=w.dtype)
    A = taylor_A(theta)
    B = taylor_B(theta)
    return I + A * wx + B * (wx @ wx)


def SO3_to_so3(R: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Log map SO(3) -> so(3) (utils/camera.py:75-85)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = (
        jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))[..., None, None]
        % jnp.pi
    )  # ln(R) explodes at theta == pi
    lnR = 1 / (2 * taylor_A(theta) + 1e-8) * (R - jnp.swapaxes(R, -2, -1))
    w0, w1, w2 = lnR[..., 2, 1], lnR[..., 0, 2], lnR[..., 1, 0]
    return jnp.stack([w0, w1, w2], axis=-1)


def se3_to_SE3(wu: jnp.ndarray) -> jnp.ndarray:
    """Exponential map se(3) -> SE(3): [..., 6] -> [..., 3, 4]
    (utils/camera.py:87-98). Gradient-safe at wu == 0."""
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew_symmetric(w)
    theta = _safe_norm(w)[..., None, None]
    I = jnp.eye(3, dtype=wu.dtype)
    A = taylor_A(theta)
    B = taylor_B(theta)
    C = taylor_C(theta)
    wxwx = wx @ wx
    R = I + A * wx + B * wxwx
    V = I + B * wx + C * wxwx
    return jnp.concatenate([R, V @ u[..., None]], axis=-1)


def SE3_to_se3(Rt: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Log map SE(3) -> se(3): [..., 3, 4] -> [..., 6] (utils/camera.py:100-111)."""
    R, t = Rt[..., :3], Rt[..., 3:]
    w = SO3_to_so3(R)
    wx = skew_symmetric(w)
    theta = _safe_norm(w)[..., None, None]
    I = jnp.eye(3, dtype=Rt.dtype)
    A = taylor_A(theta)
    B = taylor_B(theta)
    invV = I - 0.5 * wx + (1 - A / (2 * B)) / (theta**2 + eps) * (wx @ wx)
    u = (invV @ t)[..., 0]
    return jnp.concatenate([w, u], axis=-1)


# --- [R|t] pose algebra (utils/camera.py:6-58) ------------------------------


def make_pose(R: jnp.ndarray = None, t: jnp.ndarray = None) -> jnp.ndarray:
    """Build a [..., 3, 4] pose from R and/or t (utils/camera.py:12-33)."""
    assert R is not None or t is not None
    if R is None:
        t = jnp.asarray(t, dtype=jnp.float32)
        R = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), (*t.shape[:-1], 3, 3))
    elif t is None:
        R = jnp.asarray(R, dtype=jnp.float32)
        t = jnp.zeros(R.shape[:-1], dtype=R.dtype)
    else:
        R = jnp.asarray(R, dtype=jnp.float32)
        t = jnp.asarray(t, dtype=jnp.float32)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def invert(pose: jnp.ndarray) -> jnp.ndarray:
    """Invert a [..., 3, 4] pose (utils/camera.py:35-41)."""
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = jnp.swapaxes(R, -2, -1)
    t_inv = (-R_inv @ t)[..., 0]
    return make_pose(R=R_inv, t=t_inv)


def compose_pair(pose_a: jnp.ndarray, pose_b: jnp.ndarray) -> jnp.ndarray:
    """pose_new(x) = pose_b o pose_a(x) (utils/camera.py:51-58)."""
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    R_new = R_b @ R_a
    t_new = (R_b @ t_a + t_b)[..., 0]
    return make_pose(R=R_new, t=t_new)


def compose(pose_list) -> jnp.ndarray:
    """Compose a sequence: poseN o ... o pose1 (utils/camera.py:43-49)."""
    pose_new = pose_list[0]
    for pose in pose_list[1:]:
        pose_new = compose_pair(pose_new, pose)
    return pose_new


# --- world/camera transforms (utils/camera.py:262-285) ----------------------


def to_hom(X: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def world2cam(X: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """[..., N, 3] x [..., 3, 4] -> [..., N, 3] (utils/camera.py:269-271)."""
    return to_hom(X) @ jnp.swapaxes(pose, -1, -2)


def cam2world(X: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """[..., N, 3] x [..., 3, 4] -> [..., N, 3] (utils/camera.py:282-285)."""
    pose_inv = invert(pose)
    return to_hom(X) @ jnp.swapaxes(pose_inv, -1, -2)


def angle_to_rotation_matrix(a: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Euler rotation about X/Y/Z (utils/camera.py:288-302)."""
    roll = dict(X=1, Y=2, Z=0)[axis]
    O = jnp.zeros_like(a)
    I = jnp.ones_like(a)
    M = jnp.stack(
        [
            jnp.stack([jnp.cos(a), -jnp.sin(a), O], -1),
            jnp.stack([jnp.sin(a), jnp.cos(a), O], -1),
            jnp.stack([O, O, I], -1),
        ],
        -2,
    )
    return jnp.roll(M, (roll, roll), axis=(-2, -1))


def get_novel_view_poses(
    pose_anchor: jnp.ndarray, N: int = 60, scale: float = 1.0
) -> jnp.ndarray:
    """Circular novel-view path around an anchor camera
    (utils/camera.py:385-395)."""
    theta = jnp.arange(N) / N * 2 * jnp.pi
    R_x = angle_to_rotation_matrix(jnp.arcsin(jnp.sin(theta) * 0.05), "X")
    R_y = angle_to_rotation_matrix(jnp.arcsin(jnp.cos(theta) * 0.05), "Y")
    pose_rot = make_pose(R=R_y @ R_x)
    pose_shift = make_pose(t=jnp.array([0.0, 0.0, -4.0 * scale]))
    pose_shift2 = make_pose(t=jnp.array([0.0, 0.0, 3.8 * scale]))
    shift_b = jnp.broadcast_to(pose_shift, (N, 3, 4))
    shift2_b = jnp.broadcast_to(pose_shift2, (N, 3, 4))
    pose_oscil = compose([shift_b, pose_rot, shift2_b])
    anchor = jnp.broadcast_to(pose_anchor, (N, 3, 4))
    return compose([pose_oscil, anchor])
