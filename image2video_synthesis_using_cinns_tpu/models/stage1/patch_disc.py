"""PatchGAN image discriminator (pix2pix style) with ActNorm option.

Behavioural parity with reference ``stage1_VAE/modules/patch_disc.py:101-165``:
conv(k4,s2) + LeakyReLU(0.2) stem, ``n_layers`` strided conv+norm+lrelu stages
with channel doubling capped at 8x, one stride-1 stage, then a 1-channel
prediction map. Norm layer is ActNorm (data-dependent init) or BatchNorm per
config; convs optionally spectral-normalised; conv weights ~ N(0, 0.02).
"""

from __future__ import annotations

import flax.linen as nn
import jax

from ..layers import ActNormImage, BatchNorm, SNConv, leaky_relu, normal_init


class NLayerDiscriminator(nn.Module):
    in_channels: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = True
    spectral_norm: bool = True

    @classmethod
    def from_config(cls, dic) -> "NLayerDiscriminator":
        return cls(
            in_channels=dic["in_channels"],
            ndf=dic["ndf"],
            n_layers=dic["n_layers"],
            use_actnorm=bool(dic["use_actnorm"]),
            spectral_norm=bool(dic["spectral_norm"]),
        )

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (B,H,W,C) → patch logits (B,H',W',1)."""
        use_bias = self.use_actnorm  # BatchNorm has affine params, so no bias
        init = normal_init(0.02)

        def norm(h, name):
            if self.use_actnorm:
                return ActNormImage(name=name)(h, train=train)
            return BatchNorm(name=name)(h, use_running_average=not train)

        h = SNConv(
            self.ndf, (4, 4), strides=(2, 2), padding=(1, 1),
            use_spectral=self.spectral_norm, kernel_init=init, name="conv0",
        )(x)
        h = leaky_relu(h, 0.2)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = SNConv(
                self.ndf * nf_mult, (4, 4), strides=(2, 2), padding=(1, 1),
                use_bias=use_bias, use_spectral=self.spectral_norm,
                kernel_init=init, name=f"conv{n}",
            )(h)
            h = norm(h, f"norm{n}")
            h = leaky_relu(h, 0.2)

        nf_mult = min(2 ** self.n_layers, 8)
        h = SNConv(
            self.ndf * nf_mult, (4, 4), strides=(1, 1), padding=(1, 1),
            use_bias=use_bias, use_spectral=self.spectral_norm,
            kernel_init=init, name=f"conv{self.n_layers}",
        )(h)
        h = norm(h, f"norm{self.n_layers}")
        h = leaky_relu(h, 0.2)

        return SNConv(
            1, (4, 4), strides=(1, 1), padding=(1, 1),
            use_spectral=self.spectral_norm, kernel_init=init, name="conv_out",
        )(h)
