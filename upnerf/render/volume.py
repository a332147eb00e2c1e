"""Alpha compositing along the sample axis.

The reference composites with exclusive cumulative products of (1 - alpha)
four times per inference call (models/rendering.py:125-218). Here the
transmittance/weight computation is factored into one helper; XLA fuses the
exp/cumprod/multiply chain into a single pass over the (N_rays, N_samples)
block, so a hand-written Pallas kernel is only warranted if profiling shows
otherwise (SURVEY.md §7.1 item 5).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# The reference treats the last interval as quasi-infinite
# (models/rendering.py:126-128).
LAST_DELTA = 1e2


def deltas_from_z(z_vals: jnp.ndarray) -> jnp.ndarray:
    """(N_rays, S) depths -> (N_rays, S) interval lengths, last = 1e2."""
    d = z_vals[:, 1:] - z_vals[:, :-1]
    return jnp.concatenate([d, jnp.full_like(d[:, :1], LAST_DELTA)], -1)


def composite_weights(
    alphas: jnp.ndarray,  # (N_rays, S) per-sample opacity
) -> jnp.ndarray:
    """weights_i = alpha_i * prod_{j<i} (1 - alpha_j)
    (models/rendering.py:135-141)."""
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas[:, :-1]], -1
    )
    transmittance = jnp.cumprod(shifted, -1)
    return alphas * transmittance


def transmittance_of(alphas: jnp.ndarray) -> jnp.ndarray:
    """prod_{j<i} (1 - alpha_j), exclusive (models/rendering.py:156-161)."""
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas[:, :-1]], -1
    )
    return jnp.cumprod(shifted, -1)


def alpha_from_sigma(sigma: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """1 - exp(-delta * sigma) (models/rendering.py:130)."""
    return 1.0 - jnp.exp(-deltas * sigma)


def weighted_sum(weights: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """(N_rays, S) weights x (N_rays, S, C) values -> (N_rays, C)."""
    return (weights[..., None] * values).sum(axis=-2)


def depth_map(weights: jnp.ndarray, z_vals: jnp.ndarray) -> jnp.ndarray:
    """(N_rays, S) -> (N_rays,) expected depth (models/rendering.py:216-218)."""
    return (weights * z_vals).sum(axis=-1)


def merge_sorted_z(*z_sets: jnp.ndarray) -> jnp.ndarray:
    """Concatenate depth sample sets along the sample axis and sort
    (models/rendering.py:275,290,298)."""
    return jnp.sort(jnp.concatenate(z_sets, -1), -1)


def split_alphas(
    s_sigma: jnp.ndarray, c_sigma: jnp.ndarray, deltas: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(s_alpha, c_alpha, joint_alpha) for the candidate branch
    (models/rendering.py:130,152-155)."""
    s_alpha = alpha_from_sigma(s_sigma, deltas)
    c_alpha = alpha_from_sigma(c_sigma, deltas)
    joint_alpha = alpha_from_sigma(s_sigma + c_sigma, deltas)
    return s_alpha, c_alpha, joint_alpha
