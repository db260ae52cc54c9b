"""Normalisation helpers matching the reference's torch semantics.

All layouts are channels-last. torch defaults replicated: eps=1e-5, GroupNorm
group-count adaptation as in SPADE (reference
``stage1_VAE/modules/normalization_layer.py:8-10``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm_groups(num_features: int, num_groups: int = 16) -> int:
    """SPADE-style adaptation: decrement groups until they divide channels."""
    while num_features % num_groups != 0:
        num_groups -= 1
    return num_groups


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm over all spatial axes, per sample per channel, no affine.

    ``x``: (B, *spatial, C) — e.g. (B,T,H,W,C) for torch InstanceNorm3d or
    (B,H,W,C) for InstanceNorm2d, both with affine=False /
    track_running_stats=False (biased variance, matching torch eval+train
    behaviour without running stats).
    """
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)
