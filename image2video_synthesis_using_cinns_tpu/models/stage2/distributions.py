"""Diagonal Gaussian posterior utilities.

Parity with reference ``stage2_cINN/AE/modules/distributions.py:6-42``:
parameters are chunked into (mean, logvar), logvar clamped to [-30, 10].
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class DiagonalGaussianDistribution:
    mean: jax.Array
    logvar: jax.Array
    deterministic: bool = field(default=False, metadata=dict(static=True))

    @classmethod
    def from_params(cls, parameters: jax.Array, deterministic: bool = False):
        mean, logvar = jnp.split(parameters, 2, axis=1)
        logvar = jnp.clip(logvar, -30.0, 10.0)
        return cls(mean=mean, logvar=logvar, deterministic=deterministic)

    @property
    def std(self):
        if self.deterministic:
            return jnp.zeros_like(self.mean)
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self):
        if self.deterministic:
            return jnp.zeros_like(self.mean)
        return jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jax.Array:
        # fp32 draw then cast: the per-dtype bit-streams of jax.random.normal
        # differ, and a compute-dtype flag must change rounding only, never
        # the sample itself (cf. stage1/resnet3d.py reparameterize)
        eps = jax.random.normal(rng, self.mean.shape).astype(self.mean.dtype)
        return self.mean + self.std * eps

    def kl(self, other: "DiagonalGaussianDistribution | None" = None) -> jax.Array:
        if self.deterministic:
            return jnp.zeros(())
        reduce_axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return jnp.mean(
                0.5 * jnp.sum(
                    jnp.square(self.mean) + self.var - 1.0 - self.logvar,
                    axis=reduce_axes,
                )
            )
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other.mean) / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=reduce_axes,
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        if self.deterministic:
            return jnp.zeros(())
        reduce_axes = tuple(range(1, self.mean.ndim))
        logtwopi = math.log(2.0 * math.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=reduce_axes,
        )

    def mode(self) -> jax.Array:
        return self.mean
