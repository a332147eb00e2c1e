"""Depth sampling along rays: stratified coarse + inverse-CDF importance.

Static-shape, PRNG-threaded redesign of the reference samplers
(models/rendering.py:7-50, 232-249). The schedule-dependent *dynamic* split
of importance samples between the candidate and static weight distributions
(s_N_importance = round(sched_mult * N_importance),
models/rendering.py:276-290) is replaced by sampling a fixed N_importance
from the *mixture* CDF (1 - m) * c_weights + m * w_static — identical at the
phase endpoints m = 0 / m = 1 and shape-static in between (intentional
deviation, SURVEY.md §7.1 item 2).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def stratified_z_vals(
    key: Optional[jax.Array],
    near: jnp.ndarray,  # (N_rays, 1)
    far: jnp.ndarray,  # (N_rays, 1)
    N_samples: int,
    use_disp: bool = False,
    perturb: float = 0.0,
    u: Optional[jnp.ndarray] = None,  # (N_rays, N_samples) pre-drawn U(0,1)
) -> jnp.ndarray:
    """Coarse depth samples, (N_rays, N_samples) (models/rendering.py:232-249).

    Linear in depth (or disparity), optionally jittered uniformly within
    mid-point intervals. `key=None` or `perturb=0` gives the deterministic
    grid (golden-test path). Pre-drawn uniforms `u` take precedence over
    `key` — the shard_map train path draws noise once at global batch shape
    so a sharded step is numerically identical to the single-device step.
    """
    z_steps = jnp.linspace(0.0, 1.0, N_samples)  # (S,)
    if not use_disp:
        z_vals = near * (1 - z_steps) + far * z_steps
    else:
        z_vals = 1.0 / (1.0 / near * (1 - z_steps) + 1.0 / far * z_steps)
    N_rays = near.shape[0]
    z_vals = jnp.broadcast_to(z_vals, (N_rays, N_samples))

    if perturb > 0 and (key is not None or u is not None):
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        upper = jnp.concatenate([z_mid, z_vals[:, -1:]], -1)
        lower = jnp.concatenate([z_vals[:, :1], z_mid], -1)
        if u is None:
            u = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * (perturb * u)
    return z_vals


def sample_pdf(
    key: Optional[jax.Array],
    bins: jnp.ndarray,  # (N_rays, M+1) bin edges
    weights: jnp.ndarray,  # (N_rays, M)
    N_importance: int,
    det: bool = False,
    eps: float = 1e-5,
    u: Optional[jnp.ndarray] = None,  # (N_rays, N_importance) pre-drawn
) -> jnp.ndarray:
    """Inverse-CDF sampling (models/rendering.py:7-50).

    Weights are detached by the caller; the +eps floor and the denom == 0
    guard match models/rendering.py:20,42-45. det=True uses a linspace grid
    (eval path); otherwise uniform draws from `key` (or the pre-drawn `u`,
    which the shard_map train path shards from a global-batch draw).
    """
    N_rays, M = weights.shape
    weights = weights + eps
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], -1)  # (N_rays, M+1)

    if det or (key is None and u is None):
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, N_importance), (N_rays, N_importance)
        )
    elif u is None:
        u = jax.random.uniform(key, (N_rays, N_importance))

    # Branchless CDF inversion. searchsorted + take_along_axis lower to
    # slow per-element custom-gather fusions on TPU (measured ~32 ms/step,
    # 18% of the train step); with M ~ 128 the O(N*M) masked reduction is a
    # single VPU-friendly fusion instead. side='right' semantics:
    # inds = #{j : cdf_j <= u}, below = inds - 1 (>= 0 since cdf_0 = 0).
    cmp = cdf[:, None, :] <= u[:, :, None]  # (N_rays, N_importance, M+1)
    inds = jnp.sum(cmp, -1, dtype=jnp.int32)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, M)

    grid = jnp.arange(M + 1, dtype=jnp.int32)
    oh_below = below[:, :, None] == grid  # fuses into the reductions
    oh_above = above[:, :, None] == grid
    cdf_b = cdf[:, None, :]
    bins_b = bins[:, None, :]  # bins is (N_rays, M+1), same length as cdf
    cdf_g0 = jnp.sum(jnp.where(oh_below, cdf_b, 0.0), -1)
    cdf_g1 = jnp.sum(jnp.where(oh_above, cdf_b, 0.0), -1)
    bins_g0 = jnp.sum(jnp.where(oh_below, bins_b, 0.0), -1)
    bins_g1 = jnp.sum(jnp.where(oh_above, bins_b, 0.0), -1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_g0 + (u - cdf_g0) / denom * (bins_g1 - bins_g0)
