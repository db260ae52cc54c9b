from .resize import (
    upsample_nearest,
    resize_bilinear,
    resize_bilinear_align_corners,
)
from .norms import instance_norm, group_norm_groups
from .spectral import spectral_normalize, SpectralState

__all__ = [
    "upsample_nearest",
    "resize_bilinear",
    "resize_bilinear_align_corners",
    "instance_norm",
    "group_norm_groups",
    "spectral_normalize",
    "SpectralState",
]
