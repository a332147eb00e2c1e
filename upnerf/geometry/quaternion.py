"""Quaternion operations (reference utils/camera.py:155-254).

Quaternions are (..., 4) arrays ordered (w, x, y, z)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def q_to_R(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation matrix (utils/camera.py:156-188)."""
    qa, qb, qc, qd = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [
                    1 - 2 * (qc**2 + qd**2),
                    2 * (qb * qc - qa * qd),
                    2 * (qa * qc + qb * qd),
                ],
                -1,
            ),
            jnp.stack(
                [
                    2 * (qb * qc + qa * qd),
                    1 - 2 * (qb**2 + qd**2),
                    2 * (qc * qd - qa * qb),
                ],
                -1,
            ),
            jnp.stack(
                [
                    2 * (qb * qd - qa * qc),
                    2 * (qa * qb + qc * qd),
                    1 - 2 * (qb**2 + qc**2),
                ],
                -1,
            ),
        ],
        -2,
    )


def R_to_q(R: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rotation matrix -> quaternion via the eigenvector method — the
    branch-free formulation the reference falls back to on NaN
    (utils/camera.py:190-234); numerically robust for all rotations."""
    R = np.asarray(R)
    batch = R.shape[:-2]
    Rf = R.reshape(-1, 3, 3)
    out = np.empty((len(Rf), 4), np.float32)
    for i, M in enumerate(Rf):
        R00, R01, R02 = M[0]
        R10, R11, R12 = M[1]
        R20, R21, R22 = M[2]
        # NOTE: difference-term signs fixed relative to the reference's
        # R_to_q (utils/camera.py:190-234, marked FIXME there): the
        # reference's eigenvector fallback yields the INVERSE rotation wrt
        # its own q_to_R; this K is self-consistent with q_to_R above.
        K = (
            np.array(
                [
                    [R00 - R11 - R22, R10 + R01, R20 + R02, R21 - R12],
                    [R10 + R01, R11 - R00 - R22, R21 + R12, R02 - R20],
                    [R20 + R02, R21 + R12, R22 - R00 - R11, R10 - R01],
                    [R21 - R12, R02 - R20, R10 - R01, R00 + R11 + R22],
                ]
            )
            / 3.0
        )
        eigval, eigvec = np.linalg.eigh(K)
        V = eigvec[:, eigval.argmax()]
        q = np.array([V[3], V[0], V[1], V[2]], np.float32)
        if q[0] < 0:
            q = -q
        out[i] = q
    return jnp.asarray(out.reshape(*batch, 4))


def invert(q: jnp.ndarray) -> jnp.ndarray:
    """(utils/camera.py:236-240)."""
    conj = q * jnp.array([1.0, -1.0, -1.0, -1.0])
    return conj / (q**2).sum(-1, keepdims=True)


def product(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product (utils/camera.py:242-254)."""
    a1, b1, c1, d1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    a2, b2, c2, d2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
            a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
            a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
            a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
        ],
        -1,
    )
