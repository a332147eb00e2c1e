from .interp import bilinear_gather
from .linear import dense, init_linear

__all__ = ["bilinear_gather", "dense", "init_linear"]
