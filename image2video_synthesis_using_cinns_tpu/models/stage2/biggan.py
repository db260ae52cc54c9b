"""BigGAN-style conditional image decoder for the stage-2 conditioning AE.

Capability parity with reference ``stage2_cINN/AE/modules/generator.py`` /
``AE.py``:
  * custom spectral norm (power iteration, eps=1e-4, ``weight_bar/_u/_v``
    parametrisation — our SN layers with ``sn_eps=1e-4``; the converter maps
    ``weight_bar`` to the kernel and ``_u`` to the power-iteration state),
  * ``GBlock`` residual upsampling blocks conditioned through
    ConditionalBatchNorm (BN affine=False, eps=1e-4, + SN-linear gamma/beta)
    or ConditionalActNorm per config (``generator.py:165-245``),
  * ``SelfAttention`` (``generator.py:75-112``) — present in the parameter
    set; note it only executes when ``sa_id < len(GBlocks)`` i.e. for the
    128px generator, exactly like the reference (``sa_id=4`` with 4 blocks at
    64px never fires, 5 blocks at 128px fires before the last block),
  * ``VariableDimGenerator{64,128}``: z split into (z-40, 10×4) / (z-100,
    20×5) chunks, each block conditioned on concat(chunk, class_emb(128));
    block conditioning dim is 138/148 via the *default* ``code_dim=120``
    (``generator.py:317-339,413-436`` — VariableDim's super().__init__ drops
    its code_dim arg, so blocks are always built at the default size),
  * ``ClassUp`` z → softmax class embedding and the BigAE wrapper
    (``AE.py:11-52, 169-194``).

The decoder exposes ``features``/``colorize`` separately so the AE loss can
take cheap gradients w.r.t. the last layer only (adaptive disc weight,
reference ``AE/modules/loss.py:8-19``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import ActNormImage, BatchNorm, SNConv, SNDense
from .distributions import DiagonalGaussianDistribution
from .resnet2d import ResnetEncoder

SN_EPS = 1e-4


class ClassUp(nn.Module):
    dim: int
    depth: int = 2
    hidden_dim: int = 2000
    out_dim: int = 1000

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = SNDense(self.hidden_dim, name="l0")(x)
        h = jnp.where(h >= 0, h, 0.01 * h)
        for i in range(self.depth):
            h = SNDense(self.hidden_dim, name=f"l{i + 1}")(h)
            h = jnp.where(h >= 0, h, 0.01 * h)
        h = SNDense(self.out_dim, name=f"l{self.depth + 1}")(h)
        return jax.nn.softmax(h, axis=1)


class ConditionalNorm2d(nn.Module):
    num_features: int
    use_actnorm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array, train: bool = False) -> jax.Array:
        if self.use_actnorm:
            out = ActNormImage(name="bn")(x, train=train)
        else:
            out = BatchNorm(use_affine=False, eps=1e-4, name="bn")(
                x, use_running_average=not train
            )
        gamma = SNDense(
            self.num_features, use_bias=False, use_spectral=True, sn_eps=SN_EPS, sn_mode="biggan",
            name="gamma_embed",
        )(cond) + 1.0
        beta = SNDense(
            self.num_features, use_bias=False, use_spectral=True, sn_eps=SN_EPS, sn_mode="biggan",
            name="beta_embed",
        )(cond)
        return gamma[:, None, None, :] * out + beta[:, None, None, :]


class SelfAttention(nn.Module):
    in_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        n = h * w
        sn = dict(use_bias=False, use_spectral=True, sn_eps=SN_EPS, sn_mode="biggan")
        theta = SNConv(c // 8, (1, 1), name="theta", **sn)(x)
        phi = SNConv(c // 8, (1, 1), name="phi", **sn)(x)
        g = SNConv(c // 2, (1, 1), name="g", **sn)(x)

        def pool2(t):
            return jax.lax.reduce_window(
                t, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )

        phi = pool2(phi).reshape(b, n // 4, c // 8)
        g = pool2(g).reshape(b, n // 4, c // 2)
        theta = theta.reshape(b, n, c // 8)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", theta, phi), axis=-1
        )  # (b, n, n/4)
        attn_g = jnp.einsum("bnm,bmc->bnc", attn, g).reshape(b, h, w, c // 2)
        out = SNConv(c, (1, 1), name="o_conv", **sn)(attn_g)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + x


class GBlock(nn.Module):
    in_channel: int
    out_channel: int
    cond_dim: int
    upsample: bool = True
    use_actnorm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, condition: jax.Array, train: bool = False) -> jax.Array:
        out = ConditionalNorm2d(self.in_channel, self.use_actnorm, name="HyperBN")(
            x, condition, train
        )
        out = nn.relu(out)
        if self.upsample:
            out = jnp.repeat(jnp.repeat(out, 2, axis=1), 2, axis=2)
        out = SNConv(
            self.out_channel, (3, 3), padding=(1, 1), use_spectral=True,
            sn_eps=SN_EPS, sn_mode="biggan", name="conv0",
        )(out)
        out = ConditionalNorm2d(self.out_channel, self.use_actnorm, name="HyperBN_1")(
            out, condition, train
        )
        out = nn.relu(out)
        out = SNConv(
            self.out_channel, (3, 3), padding=(1, 1), use_spectral=True,
            sn_eps=SN_EPS, sn_mode="biggan", name="conv1",
        )(out)

        skip = x
        if self.upsample:
            skip = jnp.repeat(jnp.repeat(skip, 2, axis=1), 2, axis=2)
        skip = SNConv(
            self.out_channel, (1, 1), use_spectral=True, sn_eps=SN_EPS, sn_mode="biggan", name="conv_sc"
        )(skip)
        return out + skip


class VariableDimGenerator(nn.Module):
    """BigGAN generator with variable-dim latent split (64 or 128 px)."""

    size: int  # 64 | 128
    z_dim: int
    chn: int = 96
    n_class: int = 1000
    use_actnorm: bool = False

    @property
    def _block_channels(self) -> Sequence[tuple[int, int]]:
        c = self.chn
        if self.size == 64:
            return [(16 * c, 16 * c), (16 * c, 8 * c), (8 * c, 4 * c), (4 * c, 1 * c)]
        return [
            (16 * c, 16 * c), (16 * c, 8 * c), (8 * c, 4 * c),
            (4 * c, 2 * c), (2 * c, 1 * c),
        ]

    @property
    def _split(self) -> tuple[int, list[int]]:
        n_blocks = len(self._block_channels)
        per = 10 if self.size == 64 else 20
        first = self.z_dim - n_blocks * per
        return first, [per] * n_blocks

    @property
    def _cond_dim(self) -> int:
        # reference quirk: blocks are built with the DEFAULT code_dim=120
        # (generator.py:317-321), so cond dim = 120 + 18 = 138 (64px) or
        # 120 + 28 = 148 (128px) = per-block chunk + class embedding (128).
        return (10 if self.size == 64 else 20) + 128

    def setup(self):
        # setup-style (not compact) so ``features`` / ``colorize`` are
        # callable as separate apply methods — the AE loss needs the
        # pre-colorize features for the adaptive-d_weight gradients.
        self.linear = SNDense(128, use_bias=False, name="linear")
        self.G_linear = SNDense(
            4 * 4 * 16 * self.chn, use_spectral=True, sn_eps=SN_EPS,
            sn_mode="biggan", name="G_linear",
        )
        blocks = []
        for i, (cin, cout) in enumerate(self._block_channels):
            blocks.append(
                GBlock(cin, cout, self._cond_dim, use_actnorm=self.use_actnorm,
                       name=f"GBlock_{i}")
            )
        self.gblocks = blocks
        self.sa_id = 4
        if self.sa_id < len(blocks):
            self.attention = SelfAttention(
                self._block_channels[self.sa_id][0], name="attention"
            )
        if self.use_actnorm:
            self.final_norm = ActNormImage(name="ScaledCrossReplicaBN")
        else:
            self.final_norm = BatchNorm(eps=1e-4, name="ScaledCrossReplicaBN")
        self.colorize_conv = SNConv(
            3, (3, 3), padding=(1, 1), use_spectral=True, sn_eps=SN_EPS,
            sn_mode="biggan", name="colorize",
        )

    def features(self, z: jax.Array, class_emb_input: jax.Array, train: bool = False) -> jax.Array:
        first, per = self._split
        assert first > 0, f"z_dim {self.z_dim} too small for size {self.size}"
        sizes = [first] + per
        codes = []
        off = 0
        for s in sizes:
            codes.append(z[:, off : off + s])
            off += s

        class_emb = self.linear(class_emb_input)
        # torch views (B, 4, 4, 16chn) then permutes to NCHW; channels-last
        # keeps the same element order directly.
        out = self.G_linear(codes[0]).reshape(-1, 4, 4, 16 * self.chn)

        for i, gblock in enumerate(self.gblocks):
            if i == self.sa_id:
                out = self.attention(out)
            condition = jnp.concatenate([codes[i + 1], class_emb], axis=1)
            out = gblock(out, condition, train)

        if self.use_actnorm:
            out = self.final_norm(out, train=train)
        else:
            out = self.final_norm(out, use_running_average=not train)
        return nn.relu(out)

    def colorize(self, h: jax.Array) -> jax.Array:
        return jnp.tanh(self.colorize_conv(h))

    def __call__(self, z: jax.Array, class_emb_input: jax.Array, train: bool = False) -> jax.Array:
        return self.colorize(self.features(z, class_emb_input, train))


class BigGANDecoderWrapper(nn.Module):
    """ClassUp(z) → softmax class embedding → BigGAN generator
    (reference ``AE.py:31-52``)."""

    z_dim: int
    image_size: int = 64
    use_actnorm: bool = False
    chn: int = 96  # reference default; 8 = the reference's debug width

    def setup(self):
        self.map_to_class_embedding = ClassUp(self.z_dim, depth=2, hidden_dim=2000)
        self.decoder = VariableDimGenerator(
            self.image_size, self.z_dim, chn=self.chn, use_actnorm=self.use_actnorm
        )

    def __call__(self, z: jax.Array, train: bool = False) -> jax.Array:
        emb = self.map_to_class_embedding(z)
        return self.decoder(z, emb, train)

    def features(self, z: jax.Array, train: bool = False) -> jax.Array:
        emb = self.map_to_class_embedding(z)
        return self.decoder.features(z, emb, train)

    def colorize(self, h: jax.Array) -> jax.Array:
        return self.decoder.colorize(h)


class BigAE(nn.Module):
    """ResNet encoder + BigGAN decoder VAE (reference ``AE.py:169-194``)."""

    config: dict

    def setup(self):
        cfg = self.config
        self.encoder = ResnetEncoder(
            z_dim=cfg["z_dim"],
            encoder_type=cfg["encoder_type"],
            norm=cfg["norm"],
            deterministic=bool(cfg["deterministic"]),
        )
        self.decoder_wrap = BigGANDecoderWrapper(
            z_dim=cfg["z_dim"],
            image_size=cfg["in_size"],
            use_actnorm=bool(cfg.get("use_actnorm_in_dec", False)),
            chn=int(cfg.get("chn", 96)),
        )

    def encode(self, x: jax.Array, train: bool = False) -> DiagonalGaussianDistribution:
        h = self.encoder(x, train=train)
        return DiagonalGaussianDistribution.from_params(
            h, deterministic=bool(self.config["deterministic"])
        )

    def decode(self, z: jax.Array, train: bool = False) -> jax.Array:
        return self.decoder_wrap(z, train)

    def decode_features(self, z: jax.Array, train: bool = False) -> jax.Array:
        return self.decoder_wrap.features(z, train)

    def colorize(self, h: jax.Array) -> jax.Array:
        return self.decoder_wrap.colorize(h)

    def __call__(self, x: jax.Array, train: bool = False):
        p = self.encode(x, train)
        mode = p.mode()
        img = self.decode(mode, train)
        return img, mode, p
