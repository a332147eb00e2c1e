from .metrics import mse, psnr, ssim
from .lpips import LPIPS, load_lpips

__all__ = ["LPIPS", "load_lpips", "mse", "psnr", "ssim"]
