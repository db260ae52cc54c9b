from .vgg16 import VGG16Features
from .lpips import LPIPS

__all__ = ["VGG16Features", "LPIPS"]
