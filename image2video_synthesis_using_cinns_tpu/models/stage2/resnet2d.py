"""2-D ResNet conditioning encoder (torchvision-style) with pluggable norm.

Parity with reference ``stage2_cINN/AE/modules/AE.py:91-166`` (``ResnetEncoder``):
a torchvision resnet18/34/50/101 trunk whose norm layer is InstanceNorm2d
('in'), BatchNorm2d ('bn') or ActNorm ('an') per config, with the final fc
replaced by a ``DenseEncoderLayer`` conv producing 2*z_dim posterior
parameters; ``encode`` wraps them in a DiagonalGaussianDistribution.

Inputs are (B, H, W, 3) in [-1, 1] — the reference builds (but never applies)
an ImageNet normalisation transform; its forward feeds [-1,1] images straight
into the trunk (``AE.py:126-141``), and we reproduce that.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.norms import instance_norm
from ..layers import ActNormImage, BatchNorm, SNConv, max_pool
from .distributions import DiagonalGaussianDistribution

TV_LAYERS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
}


class _Norm2D(nn.Module):
    kind: str  # 'in' | 'bn' | 'an'

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "in":
            return instance_norm(x)  # torch InstanceNorm2d default: affine=False
        if self.kind == "bn":
            return BatchNorm(name="bn")(x, use_running_average=not train)
        if self.kind == "an":
            return ActNormImage(name="an")(x, train=train)
        raise ValueError(self.kind)


class _BasicBlock2D(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "in"
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = SNConv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=(1, 1),
                     use_bias=False, name="conv1")(x)
        out = nn.relu(_Norm2D(self.norm, name="bn1")(out, train))
        out = SNConv(self.planes, (3, 3), padding=(1, 1), use_bias=False, name="conv2")(out)
        out = _Norm2D(self.norm, name="bn2")(out, train)
        if self.has_downsample:
            x = SNConv(self.planes, (1, 1), strides=(self.stride,) * 2,
                       use_bias=False, name="downsample_conv")(x)
            x = _Norm2D(self.norm, name="downsample_norm")(x, train)
        return nn.relu(out + x)


class _Bottleneck2D(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "in"
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = SNConv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(_Norm2D(self.norm, name="bn1")(out, train))
        out = SNConv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=(1, 1),
                     use_bias=False, name="conv2")(out)
        out = nn.relu(_Norm2D(self.norm, name="bn2")(out, train))
        out = SNConv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = _Norm2D(self.norm, name="bn3")(out, train)
        if self.has_downsample:
            x = SNConv(self.planes * 4, (1, 1), strides=(self.stride,) * 2,
                       use_bias=False, name="downsample_conv")(x)
            x = _Norm2D(self.norm, name="downsample_norm")(x, train)
        return nn.relu(out + x)


class ResNet2D(nn.Module):
    """torchvision-equivalent trunk, channels-last, returning pooled features."""

    encoder_type: str = "resnet50"
    norm: str = "in"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kind, layers = TV_LAYERS[self.encoder_type]
        Block = _BasicBlock2D if kind == "basic" else _Bottleneck2D
        expansion = 1 if kind == "basic" else 4

        x = SNConv(64, (7, 7), strides=(2, 2), padding=(3, 3), use_bias=False,
                   name="conv1")(x)
        x = nn.relu(_Norm2D(self.norm, name="bn1")(x, train))
        x = max_pool(x, (3, 3), (2, 2), (1, 1))

        inplanes = 64
        for stage, planes in enumerate((64, 128, 256, 512)):
            stride = 1 if stage == 0 else 2
            needs_ds = stride != 1 or inplanes != planes * expansion
            x = Block(planes, stride, self.norm, needs_ds,
                      name=f"layer{stage + 1}_block0")(x, train)
            inplanes = planes * expansion
            for b in range(1, layers[stage]):
                x = Block(planes, 1, self.norm, False,
                          name=f"layer{stage + 1}_block{b}")(x, train)

        # adaptive avg pool to (1,1)
        return jnp.mean(x, axis=(1, 2), keepdims=True)


class ResnetEncoder(nn.Module):
    """Conditioning encoder: image → 2*z_dim posterior params (B, 2z)."""

    z_dim: int
    encoder_type: str = "resnet50"
    norm: str = "in"
    deterministic: bool = False

    @classmethod
    def from_config(cls, cfg) -> "ResnetEncoder":
        return cls(
            z_dim=cfg["z_dim"],
            encoder_type=cfg["encoder_type"],
            norm=cfg["norm"],
            deterministic=bool(cfg["deterministic"]),
        )

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feats = ResNet2D(self.encoder_type, self.norm, name="model")(x, train)
        # DenseEncoderLayer (reference AE.py:54-81): conv with kernel = spatial
        # size of the pooled features (1x1 after adaptive pooling).
        enc = SNConv(2 * self.z_dim, (1, 1), name="fc")(feats)
        return enc.reshape(enc.shape[0], -1)

    def encode(self, x: jax.Array, train: bool = False) -> DiagonalGaussianDistribution:
        h = self(x, train=train)
        return DiagonalGaussianDistribution.from_params(h, deterministic=self.deterministic)
