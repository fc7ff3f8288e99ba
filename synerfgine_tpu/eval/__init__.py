from .metrics import mse, psnr, ssim, compose_on_background
