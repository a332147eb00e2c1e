from .losses import LossConfig, compute_loss
from .schedules import pe_progress, schedule_mult, schedule_phase

__all__ = [
    "LossConfig",
    "compute_loss",
    "pe_progress",
    "schedule_mult",
    "schedule_phase",
]
