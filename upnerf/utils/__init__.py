from .ckpt import CheckpointManager, extract_submodel
from .logging import MetricLogger
from .viz import get_pca_img, visualize_depth

__all__ = [
    "CheckpointManager",
    "MetricLogger",
    "extract_submodel",
    "get_pca_img",
    "visualize_depth",
]
