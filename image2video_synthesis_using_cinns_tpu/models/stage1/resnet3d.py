"""3D-ResNet dynamics encoder and temporal discriminator.

Behavioural parity with reference ``stage1_VAE/modules/resnet3D.py``:
  * ``Encoder`` (lines 138-219): conv3d stem (3,7,7)/s(2,2,2) → 4 BasicBlock /
    Bottleneck stages with per-stage channels / stride_s / stride_t from config
    → two 2D conv heads (kernel 4, valid) producing mu/logvar → reparameterize.
  * ``Discriminator`` (lines 222-301): same backbone with stem stride (1,2,2),
    spectral-norm downsample paths, avg-pool + linear head, and the per-stage
    feature maps returned for the feature-matching loss.

Video layout is (B, T, H, W, C) channels-last. The torch entry points accept
either (B,C,T,H,W) or (B,T,C,H,W) and transpose heuristically (line 209-210);
our facade handles layout at the boundary instead, so these modules take
channels-last only.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import (
    GroupNorm,
    SNConv,
    SNDense,
    avg_pool,
    kaiming_normal_fan_out_exact,
    max_pool,
    orthogonal_conv_init,
)

RESNET_LAYERS = {
    "resnet10": ("basic", (1, 1, 1, 1)),
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
}

EXPANSION = {"basic": 1, "bottleneck": 4}


class BasicBlock3D(nn.Module):
    planes: int
    stride: int = 1
    stride_t: int = 1
    has_downsample: bool = False
    spectral: bool = False
    downsample_spectral: bool = False
    conv_init: str = "torch"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        init = _conv_init(self.conv_init)
        s = (self.stride_t, self.stride, self.stride)
        out = SNConv(
            self.planes, (3, 3, 3), strides=s, padding=(1, 1, 1), use_bias=False,
            use_spectral=self.spectral, kernel_init=init, name="conv1",
        )(x)
        out = GroupNorm(16, name="bn1")(out)
        out = nn.relu(out)
        out = SNConv(
            self.planes, (3, 3, 3), padding=(1, 1, 1), use_bias=False,
            use_spectral=self.spectral, kernel_init=init, name="conv2",
        )(out)
        out = GroupNorm(16, name="bn2")(out)

        if self.has_downsample:
            residual = SNConv(
                self.planes, (3, 3, 3), strides=s, padding=(1, 1, 1), use_bias=False,
                use_spectral=self.downsample_spectral, kernel_init=init,
                name="downsample_conv",
            )(x)
            residual = GroupNorm(16, name="downsample_norm")(residual)
        else:
            residual = x
        return nn.relu(out + residual)


class Bottleneck3D(nn.Module):
    planes: int
    stride: int = 1
    stride_t: int = 1
    has_downsample: bool = False
    spectral: bool = True
    downsample_spectral: bool = False
    conv_init: str = "torch"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        init = _conv_init(self.conv_init)
        s = (self.stride_t, self.stride, self.stride)
        out = SNConv(
            self.planes, (1, 1, 1), use_bias=False, use_spectral=self.spectral,
            kernel_init=init, name="conv1",
        )(x)
        out = nn.relu(GroupNorm(16, name="bn1")(out))
        out = SNConv(
            self.planes, (3, 3, 3), strides=s, padding=(1, 1, 1), use_bias=False,
            use_spectral=self.spectral, kernel_init=init, name="conv2",
        )(out)
        out = nn.relu(GroupNorm(16, name="bn2")(out))
        out = SNConv(
            self.planes * 4, (1, 1, 1), use_bias=False, use_spectral=self.spectral,
            kernel_init=init, name="conv3",
        )(out)
        out = GroupNorm(16, name="bn3")(out)

        if self.has_downsample:
            residual = SNConv(
                self.planes * 4, (3, 3, 3), strides=s, padding=(1, 1, 1),
                use_bias=False, use_spectral=self.downsample_spectral,
                kernel_init=init, name="downsample_conv",
            )(x)
            residual = GroupNorm(16, name="downsample_norm")(residual)
        else:
            residual = x
        return nn.relu(out + residual)


def _conv_init(kind: str):
    if kind == "kaiming_fan_out":
        return kaiming_normal_fan_out_exact
    if kind == "orthogonal":
        return orthogonal_conv_init
    return None  # torch default


class _ResNet3DBackbone(nn.Module):
    """Shared stem + staged blocks. Emits per-stage features."""

    res_type: str
    channels: Sequence[int]
    stride_s: Sequence[int]
    stride_t: Sequence[int]
    use_max_pool: bool
    stem_stride_t: int
    use_spectral_norm: bool
    downsample_always_spectral: bool
    downsample_on_stride_t: bool
    conv_init: str

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        block_kind, layers = RESNET_LAYERS[self.res_type]
        expansion = EXPANSION[block_kind]
        Block = BasicBlock3D if block_kind == "basic" else Bottleneck3D
        assert len(self.channels) - 1 == len(self.stride_t)
        assert len(self.channels) - 1 == len(self.stride_s)

        init = _conv_init(self.conv_init)
        x = SNConv(
            self.channels[0], (3, 7, 7), strides=(self.stem_stride_t, 2, 2),
            padding=(1, 3, 3), use_bias=False, kernel_init=init, name="conv1",
        )(x)
        x = nn.relu(GroupNorm(16, name="norm1")(x))
        if self.use_max_pool:
            x = max_pool(x, (3, 3, 3), (1, 2, 2), (1, 1, 1))

        features = []
        inplanes = self.channels[0]
        for stage, planes in enumerate(self.channels[1:]):
            stride, stride_t = self.stride_s[stage], self.stride_t[stage]
            needs_ds = stride != 1 or inplanes != planes * expansion or (
                self.downsample_on_stride_t and stride_t != 1
            )
            x = Block(
                planes, stride, stride_t,
                has_downsample=needs_ds,
                spectral=self.use_spectral_norm,
                downsample_spectral=self.downsample_always_spectral,
                conv_init=self.conv_init,
                name=f"layer{stage}_block0",
            )(x)
            inplanes = planes * expansion
            # reference quirk (resnet3D.py:197-198, 278-279): blocks after the
            # first are built WITHOUT the spectral flag, so they fall back to
            # the block-class default — False for BasicBlock, True for
            # Bottleneck.
            rest_spectral = block_kind == "bottleneck"
            for b in range(1, layers[stage]):
                x = Block(
                    planes, spectral=rest_spectral,
                    conv_init=self.conv_init, name=f"layer{stage}_block{b}",
                )(x)
            features.append(x)
        return features


class Encoder(nn.Module):
    """Dynamics encoder: video (B,T,H,W,3) → (sample, mu, logvar), each (B, z).

    Matches reference ``Encoder`` (resnet3D.py:138-219): stem stride_t=2, no
    spectral norm, kaiming fan_out conv init, 4x4 valid conv heads on the
    time-squeezed final feature map.
    """

    res_type_encoder: str
    z_dim: int
    channels: Sequence[int]
    stride_s: Sequence[int]
    stride_t: Sequence[int]
    use_max_pool: bool = False

    @classmethod
    def from_config(cls, dic) -> "Encoder":
        return cls(
            res_type_encoder=dic["res_type_encoder"],
            z_dim=dic["z_dim"],
            channels=tuple(dic["channels"]),
            stride_s=tuple(dic["stride_s"]),
            stride_t=tuple(dic["stride_t"]),
            use_max_pool=bool(dic["use_max_pool"]),
        )

    @nn.compact
    def __call__(self, x: jax.Array, rng: jax.Array | None = None):
        feats = _ResNet3DBackbone(
            self.res_type_encoder, self.channels, self.stride_s, self.stride_t,
            self.use_max_pool, stem_stride_t=2, use_spectral_norm=False,
            downsample_always_spectral=False, downsample_on_stride_t=False,
            conv_init="kaiming_fan_out", name="backbone",
        )(x)
        emb = feats[-1]
        # reference squeezes the (now size-1) time axis then applies 2D convs
        emb = jnp.squeeze(emb, axis=1)  # (B, 4, 4, C)
        mu = SNConv(self.z_dim, (4, 4), name="conv_mu")(emb).reshape(emb.shape[0], -1)
        logvar = SNConv(self.z_dim, (4, 4), name="conv_var")(emb).reshape(emb.shape[0], -1)

        if rng is None:
            rng = self.make_rng("sample")
        # draw eps in fp32 then cast: jax.random.normal consumes a DIFFERENT
        # bit-stream per dtype, so drawing at logvar.dtype would make
        # Training.compute_dtype=bfloat16 change the posterior SAMPLE rather
        # than just its rounding (the reference's randn_like is fp32-only,
        # stage1_VAE/modules/resnet3D.py:202-206)
        eps = jax.random.normal(rng, logvar.shape).astype(logvar.dtype)
        sample = eps * jnp.exp(0.5 * logvar) + mu
        return sample, mu, logvar


class Discriminator(nn.Module):
    """Temporal discriminator: video → (logit (B,1), per-stage feature list).

    Matches reference ``Discriminator`` (resnet3D.py:222-301): stem stride_t=1,
    orthogonal conv init, spectral-norm downsample paths, avg-pool (1,4,4) and
    bias-free linear head.
    """

    res_type_encoder: str
    channels: Sequence[int]
    stride_s: Sequence[int]
    stride_t: Sequence[int]
    use_max_pool: bool = True
    spectral_norm: bool = True

    @classmethod
    def from_config(cls, dic) -> "Discriminator":
        return cls(
            res_type_encoder=dic["res_type_encoder"],
            channels=tuple(dic["channels"]),
            stride_s=tuple(dic["stride_s"]),
            stride_t=tuple(dic["stride_t"]),
            use_max_pool=bool(dic["use_max_pool"]),
            spectral_norm=bool(dic["spectral_norm"]),
        )

    @nn.compact
    def __call__(self, x: jax.Array):
        feats = _ResNet3DBackbone(
            self.res_type_encoder, self.channels, self.stride_s, self.stride_t,
            self.use_max_pool, stem_stride_t=1,
            use_spectral_norm=self.spectral_norm,
            downsample_always_spectral=True, downsample_on_stride_t=True,
            conv_init="orthogonal", name="backbone",
        )(x)
        h = avg_pool(feats[-1], (1, 4, 4), (1, 1, 1))
        logit = SNDense(1, use_bias=False, name="fc")(h.reshape(h.shape[0], -1))
        return logit, feats
