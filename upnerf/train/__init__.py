from .losses import LossConfig, compute_loss
from .optim import learning_rate_at, make_optimizer
from .schedules import pe_progress, schedule_mult, schedule_phase
from .state import (
    RayStore,
    SceneConstants,
    TrainState,
    init_params,
    init_pose_params,
    make_scene_constants,
)
from .step import StepConfig, forward, make_eval_render, make_train_step

__all__ = [
    "LossConfig",
    "RayStore",
    "SceneConstants",
    "StepConfig",
    "TrainState",
    "compute_loss",
    "forward",
    "init_params",
    "init_pose_params",
    "learning_rate_at",
    "make_eval_render",
    "make_optimizer",
    "make_scene_constants",
    "make_train_step",
    "pe_progress",
    "schedule_mult",
    "schedule_phase",
]
