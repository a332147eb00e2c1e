from . import render, tto
from .lpips import LPIPS, load_lpips
from .metrics import mse, psnr, ssim

__all__ = ["LPIPS", "load_lpips", "mse", "psnr", "render", "ssim", "tto"]
