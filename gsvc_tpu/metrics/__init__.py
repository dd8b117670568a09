from gsvc_tpu.metrics.image import psnr, ssim, ms_ssim
from gsvc_tpu.metrics.losses import l1_loss, l2_loss, ssim_loss

__all__ = ["psnr", "ssim", "ms_ssim", "l1_loss", "l2_loss", "ssim_loss"]
