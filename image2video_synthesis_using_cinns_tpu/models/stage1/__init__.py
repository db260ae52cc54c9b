from .decoder import Generator, GeneratorBlock
from .normalization import Spade, ADAIN, Norm3D
from .resnet3d import Encoder, Discriminator
from .patch_disc import NLayerDiscriminator

__all__ = [
    "Generator",
    "GeneratorBlock",
    "Spade",
    "ADAIN",
    "Norm3D",
    "Encoder",
    "Discriminator",
    "NLayerDiscriminator",
]
