"""Conditional normalisation layers for the video decoder.

Behavioural parity with reference ``stage1_VAE/modules/normalization_layer.py``:

  * ``Spade``   — GroupNorm(affine=False, groups adapted to divide channels) on
    the video features, modulated by gamma/beta predicted from the *start
    frame* resized (bilinear, align_corners=True) to the current spatial size,
    broadcast over time (reference lines 5-24).
  * ``ADAIN``   — InstanceNorm3d(affine=False) modulated per-channel from the
    motion latent through a Linear (lines 38-51).
  * ``Norm3D``  — plain affine GroupNorm(16) (lines 27-35).

Layouts: video features are (B, T, H, W, C); the conditioning image is
(B, H, W, 3); the motion latent is (B, z).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.norms import group_norm_groups
from ...ops.resize import resize_bilinear_align_corners
from ..layers import GroupNorm, SNConv, SNDense, leaky_relu


class Spade(nn.Module):
    num_features: int
    num_groups: int = 16
    hidden: int = 128

    @nn.compact
    def __call__(self, x: jax.Array, img: jax.Array) -> jax.Array:
        groups = group_norm_groups(self.num_features, self.num_groups)
        normalized = GroupNorm(num_groups=groups, use_affine=False, name="norm")(x)

        y = resize_bilinear_align_corners(img, (x.shape[2], x.shape[3]))
        y = leaky_relu(SNConv(self.hidden, (3, 3), padding=(1, 1), name="conv")(y), 0.2)
        gamma = SNConv(self.num_features, (3, 3), padding=(1, 1), name="conv_gamma")(y)
        beta = SNConv(self.num_features, (3, 3), padding=(1, 1), name="conv_beta")(y)
        # broadcast the per-frame modulation over the time axis
        gamma = gamma[:, None]
        beta = beta[:, None]
        return normalized * (1.0 + gamma) + beta


class ADAIN(nn.Module):
    num_features: int

    @nn.compact
    def __call__(self, x: jax.Array, z: jax.Array) -> jax.Array:
        from ...ops.norms import instance_norm

        out = instance_norm(x)
        gb = SNDense(self.num_features * 2, name="linear")(z)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        return gamma[:, None, None, None, :] * out + beta[:, None, None, None, :]


class Norm3D(nn.Module):
    num_features: int
    num_groups: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return GroupNorm(num_groups=self.num_groups, use_affine=True, name="bn")(x)
