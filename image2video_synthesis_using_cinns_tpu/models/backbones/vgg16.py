"""VGG16 feature slices (relu1_2 … relu5_3) for LPIPS and diversity metrics.

Parity with reference ``stage2_cINN/AE/modules/vgg16.py:6-43``: the torchvision
VGG16 ``features`` trunk split into 5 slices ending at each stage's last relu.
Channels-last; weights load from a converted torchvision checkpoint (see
``utils/convert.py``) — the network is always frozen.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import SNConv, max_pool

# (convs per stage, channels) — torchvision vgg16 cfg 'D'
_STAGES = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        """x: (B,H,W,3) → [relu1_2, relu2_2, relu3_3, relu4_3, relu5_3]."""
        outs = []
        layer_idx = 0
        for stage, (n_convs, ch) in enumerate(_STAGES):
            if stage > 0:
                x = max_pool(x, (2, 2), (2, 2), (0, 0))
            for _ in range(n_convs):
                x = SNConv(ch, (3, 3), padding=(1, 1), name=f"conv{layer_idx}")(x)
                x = nn.relu(x)
                layer_idx += 1
            outs.append(x)
        return outs


def normalize_tensor(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


def spatial_average(x: jax.Array, keepdims: bool = True) -> jax.Array:
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)
