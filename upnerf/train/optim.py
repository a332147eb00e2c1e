"""Optimizer/scheduler factories on optax, matching utils/optim.py.

The reference steps two torch optimizers per iteration — NeRF+embeddings
(Adam 5e-4, eps 1e-8) and pose tables (Adam 2e-3) — each with an
ExponentialLR of gamma = (lr_end / lr)^(1/max_steps) stepped once per
iteration (models/nerf_system.py:41-73, utils/optim.py:20-44). Here each
group is one optax chain; both updates happen inside the single jitted
train step.
"""

from __future__ import annotations

from typing import Optional

import optax


def lr_schedule(lr: float, lr_end: Optional[float], max_steps: int, kind: str):
    if kind == "ExponentialLR":
        assert lr_end is not None
        gamma = (lr_end / lr) ** (1.0 / max_steps)
        return optax.exponential_decay(
            init_value=lr, transition_steps=1, decay_rate=gamma
        )
    if kind in ("cosine", "CosineAnnealingLR"):
        # reference "cosine" -> CosineAnnealingLR(T_max=max_step,
        # eta_min=1e-8) (utils/optim.py:34-37); accept the torch class name
        # too so reference-style yamls load unchanged.
        return optax.cosine_decay_schedule(
            init_value=lr, decay_steps=max_steps, alpha=1e-8 / lr
        )
    if kind in (None, "constant", "none", "None"):
        return lr
    raise ValueError(f"unknown scheduler {kind!r}")


def make_optimizer(
    opt_type: str,
    lr: float,
    lr_end: Optional[float] = None,
    max_steps: int = 1,
    scheduler: str = "ExponentialLR",
) -> optax.GradientTransformation:
    """adam (eps 1e-8) / adamw / sgd as in utils/optim.py:20-31."""
    sched = lr_schedule(lr, lr_end, max_steps, scheduler) if scheduler else lr
    if opt_type == "adam":
        return optax.adam(sched, eps=1e-8)
    if opt_type == "adamw":
        return optax.adamw(sched)
    if opt_type == "sgd":
        return optax.sgd(sched)
    raise ValueError("optimizer not recognized!")


def learning_rate_at(
    step: int, lr: float, lr_end: Optional[float], max_steps: int,
    scheduler: str = "ExponentialLR",
) -> float:
    """Host-side lr readout for logging (utils/optim.py:47-49)."""
    s = lr_schedule(lr, lr_end, max_steps, scheduler)
    return float(s(step)) if callable(s) else float(s)
