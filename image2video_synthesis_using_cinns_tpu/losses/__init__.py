from .common import KL, fmap_loss, hinge_loss, psnr, ssim
from .flow_loss import flow_loss

__all__ = ["KL", "fmap_loss", "hinge_loss", "psnr", "ssim", "flow_loss"]
