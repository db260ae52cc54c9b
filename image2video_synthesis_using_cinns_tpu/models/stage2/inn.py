"""Conditional-INN wrapper: frozen start-frame embedder + flow (+ control).

Parity with reference ``stage2_cINN/modules/INN.py`` (``SupervisedTransformer``):
  * owns the frozen conditioning embedder (a ``ResnetEncoder`` loaded from the
    stage-2 AE checkpoint, lines 36-41); the embedding is taken under
    stop-gradient (torch ``no_grad`` + ``.detach()``, line 61-62),
  * optional endpoint control: the 3-dof normalised end-effector position is
    quantised into 3x10 one-hot bins and concatenated to the embedding
    (``embed_pos``, lines 49-57, ``cond_size=10`` line 24),
  * ``__call__(x, cond, reverse)`` → (gauss, logdet) forward / sample reverse.

The embedder lives inside this module's param tree (sub-tree ``embedder``) and
is simply excluded from the optimiser — the JAX-native equivalent of loading a
frozen torch module.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .flow import ConditionalFlow
from .resnet2d import ResnetEncoder


class SupervisedTransformer(nn.Module):
    flow_in_channels: int
    flow_embedding_channels: int
    flow_mid_channels: int
    flow_hidden_depth: int
    n_flows: int
    control: bool = False
    embedder_config: Optional[dict] = None
    use_pallas: bool = False

    @property
    def cond_size(self) -> int:
        return 10 if self.control else 0

    def setup(self):
        self.flow = ConditionalFlow(
            in_channels=self.flow_in_channels,
            embedding_dim=self.flow_embedding_channels + self.cond_size * 3,
            hidden_dim=self.flow_mid_channels,
            hidden_depth=self.flow_hidden_depth,
            n_flows=self.n_flows,
            control=self.control,
            use_pallas=self.use_pallas,
        )
        cfg = self.embedder_config or {
            "z_dim": self.flow_embedding_channels,
            "encoder_type": "resnet50",
            "norm": "in",
            "deterministic": False,
        }
        self.embedder = ResnetEncoder(
            z_dim=cfg["z_dim"],
            encoder_type=cfg.get("encoder_type", "resnet50"),
            norm=cfg.get("norm", "in"),
            deterministic=bool(cfg.get("deterministic", False)),
        )

    def embed_pos(self, pos: jax.Array) -> jax.Array:
        """(B,3) normalised positions → (B,30) one-hot bin embedding."""
        n = self.cond_size
        idx = (pos * n - 1e-4).astype(jnp.int32)  # torch .long(): truncation
        idx = jnp.clip(idx, 0, n - 1)
        onehots = [jax.nn.one_hot(idx[:, d], n, dtype=jnp.float32) for d in range(3)]
        return jnp.concatenate(onehots, axis=1)

    def embed(self, cond: Sequence[jax.Array]) -> jax.Array:
        x0 = cond[0]
        embed = self.embedder.encode(x0).mode().reshape(x0.shape[0], -1)
        embed = jax.lax.stop_gradient(embed)
        if self.control:
            embed = jnp.concatenate([embed, self.embed_pos(cond[1])], axis=1)
        return embed

    def __call__(self, x: jax.Array, cond: Sequence[jax.Array], reverse: bool = False):
        embed = self.embed(cond)
        if reverse:
            return self.flow(x, embed, reverse=True)
        return self.flow(x, embed)

    def reverse(self, out: jax.Array, cond: Sequence[jax.Array]) -> jax.Array:
        return self(out, cond, reverse=True)

    def sample(self, rng: jax.Array, batch: int, cond: Sequence[jax.Array]) -> jax.Array:
        z_tilde = jax.random.normal(rng, (batch, self.flow_in_channels))
        return self.reverse(z_tilde, cond)

    def init_actnorm(self, x: jax.Array, cond: Sequence[jax.Array]):
        """Data-dependent flow ActNorm init; returns new stacked block params
        to splice into ``params['flow']['blocks']``."""
        embed = self.embed(cond)
        return self.flow.init_actnorm(x, embed)

    @classmethod
    def from_configs(cls, stage2_cfg, stage1_decoder_cfg, ae_cfg=None, use_pallas: bool = False):
        """Build from chained configs exactly like the reference call sites
        (``get_model.py:34-42``, ``stage2_cINN/main.py:91-100``)."""
        z_dim = stage1_decoder_cfg["z_dim"]
        flow_cfg = stage2_cfg["Flow"]
        embedder_cfg = None
        if ae_cfg is not None:
            embedder_cfg = dict(ae_cfg)
        return cls(
            flow_in_channels=z_dim,
            flow_embedding_channels=stage2_cfg["Conditioning_Model"]["z_dim"],
            flow_mid_channels=z_dim * flow_cfg["flow_mid_channels_factor"],
            flow_hidden_depth=flow_cfg["flow_hidden_depth"],
            n_flows=flow_cfg["n_flows"],
            control=bool(stage2_cfg["Training"].get("control", False)),
            embedder_config=embedder_cfg,
            use_pallas=use_pallas,
        )
