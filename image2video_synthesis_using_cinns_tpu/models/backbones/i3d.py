"""Inflated-3D Inception (I3D) feature extractor for FVD / DTFVD / diversity.

One flax implementation covers both reference metric backbones:
  * kinetics-400 I3D (hassony2 port, reference ``metrics/PyTorch_FVD/I3D.py``)
    — 400-d *logits* activations for training-time FVD,
  * DTDB-trained I3D (piergiaj variant, reference ``metrics/DTFVD/ID3.py`` /
    ``ID3_32.py``) — 18 classes, with the 1024-d pre-logits representation
    used for DTFVD; the 32-frame variant only changes the final temporal
    average-pool from 2 to 4 (``ID3_32.py:308``).

Same trunk, TF-SAME padding. Because jit shapes are static, TF-SAME padding is
computed at trace time (the reference needs runtime pad selection because
torch lacks SAME). BatchNorm uses stored (converted) running stats — the nets
are always frozen. BN eps differs between the two reference ports: the
kinetics net uses the TF-style 1e-3 (``PyTorch_FVD/I3D.py:114``) while the DT
nets use torch's default 1e-5 (``DTFVD/ID3.py:81`` plain ``nn.BatchNorm3d``) —
``bn_eps`` selects it. Videos are channels-last
(B, T, 224, 224, 3) scaled to the reference's expected range ([0,1] for the
kinetics net — ``FVD_logging.py:190-203`` denorms [-1,1] inputs).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import SNConv


def _tf_same_pads(in_size: int, kernel: int, stride: int) -> tuple[int, int]:
    if in_size % stride == 0:
        pad = max(kernel - stride, 0)
    else:
        pad = max(kernel - in_size % stride, 0)
    return pad // 2, pad - pad // 2


def tf_same_pad(x: jax.Array, kernel: Sequence[int], stride: Sequence[int]) -> jax.Array:
    """Pad (B, T, H, W, C) with TF-SAME amounts for the given 3D window."""
    pads = [(0, 0)]
    for ax, (k, s) in enumerate(zip(kernel, stride)):
        pads.append(_tf_same_pads(x.shape[1 + ax], k, s))
    pads.append((0, 0))
    return jnp.pad(x, pads)


class Unit3D(nn.Module):
    """conv3d (SAME) → frozen BN → relu."""

    features: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_bn: bool = True
    use_bias: bool = False
    activation: bool = True
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = tf_same_pad(x, self.kernel, self.stride)
        x = SNConv(
            self.features, tuple(self.kernel), strides=tuple(self.stride),
            use_bias=self.use_bias, name="conv3d",
        )(x)
        if self.use_bn:
            mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
            var = self.param("bn_var", nn.initializers.ones, (self.features,))
            scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
            bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
            x = (x - mean) * jax.lax.rsqrt(var + self.bn_eps) * scale + bias
        if self.activation:
            x = nn.relu(x)
        return x


def max_pool_same(x: jax.Array, kernel: Sequence[int], stride: Sequence[int]) -> jax.Array:
    x = tf_same_pad(x, kernel, stride)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, *kernel, 1), (1, *stride, 1), "VALID",
    )


class Mixed(nn.Module):
    out_channels: Sequence[int]  # [b0, b1a, b1b, b2a, b2b, b3]
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.out_channels
        e = self.bn_eps
        b0 = Unit3D(c[0], bn_eps=e, name="branch_0")(x)
        b1 = Unit3D(c[1], bn_eps=e, name="branch_1a")(x)
        b1 = Unit3D(c[2], kernel=(3, 3, 3), bn_eps=e, name="branch_1b")(b1)
        b2 = Unit3D(c[3], bn_eps=e, name="branch_2a")(x)
        b2 = Unit3D(c[4], kernel=(3, 3, 3), bn_eps=e, name="branch_2b")(b2)
        b3 = max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(c[5], bn_eps=e, name="branch_3")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


MIXED_CFG = {
    "mixed_3b": [64, 96, 128, 16, 32, 32],
    "mixed_3c": [128, 128, 192, 32, 96, 64],
    "mixed_4b": [192, 96, 208, 16, 48, 64],
    "mixed_4c": [160, 112, 224, 24, 64, 64],
    "mixed_4d": [128, 128, 256, 24, 64, 64],
    "mixed_4e": [112, 144, 288, 32, 64, 64],
    "mixed_4f": [256, 160, 320, 32, 128, 128],
    "mixed_5b": [256, 160, 320, 32, 128, 128],
    "mixed_5c": [384, 192, 384, 48, 128, 128],
}


class I3D(nn.Module):
    """Returns (softmax, logits) like the reference net, or the 1024-d
    pre-logits representation when ``head='representation'``.

    ``avg_pool_t``: temporal extent of the final average pool — 2 for the
    kinetics and 16-frame DT variants, 4 for the 32-frame DT variant.
    """

    num_classes: int = 400
    head: str = "logits"  # 'logits' | 'representation'
    avg_pool_t: int = 2
    bn_eps: float = 1e-3  # 1e-3 kinetics port, 1e-5 DT ports

    @nn.compact
    def __call__(self, x: jax.Array):
        e = self.bn_eps
        x = Unit3D(64, kernel=(7, 7, 7), stride=(2, 2, 2), bn_eps=e,
                   name="conv3d_1a_7x7")(x)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, bn_eps=e, name="conv3d_2b_1x1")(x)
        x = Unit3D(192, kernel=(3, 3, 3), bn_eps=e, name="conv3d_2c_3x3")(x)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = Mixed(MIXED_CFG["mixed_3b"], bn_eps=e, name="mixed_3b")(x)
        x = Mixed(MIXED_CFG["mixed_3c"], bn_eps=e, name="mixed_3c")(x)
        x = max_pool_same(x, (3, 3, 3), (2, 2, 2))
        for name in ("mixed_4b", "mixed_4c", "mixed_4d", "mixed_4e", "mixed_4f"):
            x = Mixed(MIXED_CFG[name], bn_eps=e, name=name)(x)
        x = max_pool_same(x, (2, 2, 2), (2, 2, 2))
        x = Mixed(MIXED_CFG["mixed_5b"], bn_eps=e, name="mixed_5b")(x)
        x = Mixed(MIXED_CFG["mixed_5c"], bn_eps=e, name="mixed_5c")(x)

        # AvgPool3d((avg_pool_t, 7, 7), stride 1), VALID
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            (1, self.avg_pool_t, 7, 7, 1), (1, 1, 1, 1, 1), "VALID",
        ) / (self.avg_pool_t * 49)

        if self.head == "representation":
            # (B, T', 1, 1, 1024) → (B, T'*1024) pre-logits features
            return x.reshape(x.shape[0], -1)

        x = Unit3D(
            self.num_classes, use_bn=False, use_bias=True, activation=False,
            name="conv3d_0c_1x1",
        )(x)
        x = x.reshape(x.shape[0], x.shape[1], -1)  # squeeze spatial
        logits = jnp.mean(x, axis=1)  # mean over time
        return jax.nn.softmax(logits, axis=-1), logits
