"""LPIPS perceptual metric (VGG flavour), frozen.

Parity with reference ``stage2_cINN/AE/modules/LPIPS.py:10-73``: scaling layer
(shift/scale buffers), 5 VGG16 feature slices, per-channel unit-normalised
squared differences, 1x1 learned ``NetLinLayer`` weights (dropout is identity
at eval, which is the only mode LPIPS runs in), spatial average, summed over
slices. Returns one scalar per image pair.

Weights come from the converted ``vgg.pth`` LPIPS checkpoint + torchvision
VGG16 (``utils/convert.py``); without them the module still runs (random
weights) so shape/pipeline tests and throughput benchmarks work offline.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import SNConv
from .vgg16 import VGG16Features, normalize_tensor, spatial_average

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)
_CHNS = (64, 128, 256, 512, 512)


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, input: jax.Array, target: jax.Array) -> jax.Array:
        """input/target: (B,H,W,3) in [-1,1] → (B,) LPIPS distances."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        net = VGG16Features(name="net")

        in0 = (input - shift) / scale
        in1 = (target - shift) / scale
        outs0, outs1 = net(in0), net(in1)

        val = 0.0
        for kk in range(len(_CHNS)):
            f0 = normalize_tensor(outs0[kk])
            f1 = normalize_tensor(outs1[kk])
            diff = jnp.square(f0 - f1)
            lin = SNConv(1, (1, 1), use_bias=False, name=f"lin{kk}")(diff)
            val = val + spatial_average(lin, keepdims=False)
        return val[:, 0]
