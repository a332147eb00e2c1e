"""Training-progress schedules.

progress = step / max_steps in [0, 1] — the reference stores this in an
nn.Parameter updated as global_step / (max_steps * 2) where global_step
counts two optimizer steps per iteration (models/nerf_system.py:222-228,
train.py:59-62); here `step` counts iterations directly, which is the same
quantity.

The candidate schedule (models/nerf_system.py:452-461) maps progress through
a cosine ramp over [start, end]; its value selects the phase:
  phase 0: sched_mult == 0 (feature/candidate training)
  phase 1: 0 < sched_mult < 1 (blend)
  phase 2: sched_mult == 1 (rgb; candidate head off)
Phase is *static* per compiled step (models/nerf_system.py:93-100); it
changes twice per run, costing two recompiles.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp


def pe_progress(step, max_steps: int):
    """progress in [0, 1]; works on python ints and traced arrays."""
    return step / max_steps


def schedule_mult(progress, candidate_schedule: Tuple[float, float]):
    """Cosine ramp of the candidate schedule (models/nerf_system.py:452-461).

    Traced-friendly: computes the clipped cosine everywhere (equals 0 below
    start, 1 above end).
    """
    s, e = candidate_schedule
    x = jnp.clip((progress - s) / (e - s), 0.0, 1.0)
    return (1.0 - jnp.cos(jnp.pi * x)) / 2.0


def schedule_phase(progress: float, candidate_schedule: Tuple[float, float]) -> int:
    """Static phase id for a *host-side* float progress."""
    s, e = candidate_schedule
    if progress < s:
        return 0
    if progress > e:
        return 2
    m = (1.0 - math.cos(math.pi * (progress - s) / (e - s))) / 2.0
    if m <= 0.0:
        return 0
    if m >= 1.0:
        return 2
    return 1
