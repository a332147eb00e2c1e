from .embeddings import init_embedding
from .nerf import NeRFConfig, apply_nerf, init_nerf, positional_encoding
from .transient import TransientConfig, apply_transient, init_transient

__all__ = [
    "NeRFConfig",
    "TransientConfig",
    "apply_nerf",
    "apply_transient",
    "init_embedding",
    "init_nerf",
    "init_transient",
    "positional_encoding",
]
