"""SPADE/ADAIN-conditioned 3D-conv video decoder ("Generator").

Behavioural parity with reference ``stage1_VAE/modules/decoder.py``:
6 residual ``GeneratorBlock``s (Spade → conv3d → ADAIN → conv3d + learned
shortcut), nearest ×2 upsampling between the first four, then per-axis
``(upsample_t[i], upsample_s[i], upsample_s[i])`` factors for the last two,
leaky-relu(0.2) activations, spectral norm per config, tanh output.

TPU-first design notes:
  * layouts are channels-last (video (B,T,H,W,C), image (B,H,W,3), z (B,z));
    the public ``__call__`` returns (B,T,H,W,3) — the torch-layout facade in
    ``models/facade.py`` transposes at the API boundary only.
  * nearest upsampling is a repeat that XLA fuses into the convs; conv3ds land
    on the MXU as implicit GEMMs with C in the lane dimension.
  * the default config (channel_factor 64) produces a 16-frame 64x64 clip from
    a (B,4,4,1024) seed, mirroring reference ``Generator.forward`` (lines
    97-120).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resize import upsample_nearest
from ...parallel.spatial import constrain_spatial
from ..layers import SNConv, SNDense, leaky_relu
from .normalization import ADAIN, Norm3D, Spade


class GeneratorBlock(nn.Module):
    """Residual block: Spade(img) → conv3d → ADAIN(z) → conv3d (+ shortcut)."""

    n_in: int
    n_out: int
    use_spectral: bool

    @nn.compact
    def __call__(self, x: jax.Array, motion: jax.Array, img: jax.Array) -> jax.Array:
        n_middle = min(self.n_in, self.n_out)
        learned_shortcut = self.n_in != self.n_out

        if learned_shortcut:
            x_s = Norm3D(self.n_in, name="norm_s")(x)
            x_s = SNConv(
                self.n_out, (1, 1, 1), use_bias=False,
                use_spectral=self.use_spectral, name="conv_s",
            )(x_s)
        else:
            x_s = x

        dx = Spade(self.n_in, name="norm_0")(x, img)
        dx = SNConv(
            n_middle, (3, 3, 3), padding=(1, 1, 1),
            use_spectral=self.use_spectral, name="conv_0",
        )(leaky_relu(dx, 0.2))
        dx = ADAIN(n_middle, name="norm_1")(dx, motion)
        dx = SNConv(
            self.n_out, (3, 3, 3), padding=(1, 1, 1),
            use_spectral=self.use_spectral, name="conv_1",
        )(leaky_relu(dx, 0.2))

        return x_s + dx


class Generator(nn.Module):
    """Video decoder: (start image, motion z) → video.

    ``dic`` keys follow the reference config section ``Decoder``:
    channel_factor, z_dim, upsample_s, upsample_t, spectral_norm.
    """

    channel_factor: int
    z_dim: int
    upsample_s: Sequence[int]
    upsample_t: Sequence[int]
    spectral_norm: bool = True

    @classmethod
    def from_config(cls, dic) -> "Generator":
        return cls(
            channel_factor=dic["channel_factor"],
            z_dim=dic["z_dim"],
            upsample_s=tuple(dic["upsample_s"]),
            upsample_t=tuple(dic["upsample_t"]),
            spectral_norm=bool(dic["spectral_norm"]),
        )

    @nn.compact
    def __call__(self, img: jax.Array, motion: jax.Array) -> jax.Array:
        """img: (B,H,W,3) in [-1,1]; motion: (B,z_dim) → video (B,T,H,W,3)."""
        nf = self.channel_factor
        sn = self.spectral_norm

        x = SNDense(4 * 4 * 16 * nf, name="fc")(motion)
        # torch reshapes its flat fc output to (B, C=16nf, 1, 4, 4); keep the
        # same element ordering so checkpoints convert loss-free, then move C
        # last for the TPU layout.
        x = x.reshape(img.shape[0], 16 * nf, 1, 4, 4)
        x = jnp.transpose(x, (0, 2, 3, 4, 1))  # (B,1,4,4,16nf)

        x = GeneratorBlock(16 * nf, 16 * nf, sn, name="head_0")(x, motion, img)

        # constrain_spatial: width-shard under parallel.spatial.spatial_sharding
        # (identity otherwise / at non-divisible widths) — one anchor per
        # resolution stage; GSPMD propagates through the block's convs/norms.
        x = upsample_nearest(x, (2, 2, 2), (1, 2, 3))
        x = GeneratorBlock(16 * nf, 16 * nf, sn, name="g_0")(constrain_spatial(x), motion, img)

        x = upsample_nearest(x, (2, 2, 2), (1, 2, 3))
        x = GeneratorBlock(16 * nf, 8 * nf, sn, name="g_1")(constrain_spatial(x), motion, img)

        x = upsample_nearest(x, (2, 2, 2), (1, 2, 3))
        x = GeneratorBlock(8 * nf, 4 * nf, sn, name="g_2")(constrain_spatial(x), motion, img)

        x = upsample_nearest(
            x, (self.upsample_t[0], self.upsample_s[0], self.upsample_s[0]), (1, 2, 3)
        )
        x = GeneratorBlock(4 * nf, 2 * nf, sn, name="g_3")(constrain_spatial(x), motion, img)

        x = upsample_nearest(
            x, (self.upsample_t[1], self.upsample_s[1], self.upsample_s[1]), (1, 2, 3)
        )
        x = GeneratorBlock(2 * nf, 1 * nf, sn, name="g_4")(constrain_spatial(x), motion, img)

        x = SNConv(3, (3, 3, 3), padding=(1, 1, 1), name="conv_img")(
            leaky_relu(constrain_spatial(x), 0.2)
        )
        return jnp.tanh(x)
