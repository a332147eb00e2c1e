import os


def enable_compile_cache():
    """Persistent XLA compile cache — remote-TPU compiles cost minutes per
    program; share them across processes/runs."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("UPNERF_COMPILE_CACHE", "/tmp/upnerf_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


from .ckpt import CheckpointManager, extract_submodel
from .logging import MetricLogger
from .viz import get_pca_img, visualize_depth

__all__ = [
    "CheckpointManager",
    "enable_compile_cache",
    "MetricLogger",
    "extract_submodel",
    "get_pca_img",
    "visualize_depth",
]
