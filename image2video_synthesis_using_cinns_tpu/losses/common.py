"""Loss primitives shared across stages.

Parity with reference ``stage1_VAE/modules/loss.py:10-43`` (KL, fmap, hinge,
gradient penalty) plus the PSNR/SSIM metrics the reference takes from
pytorch-lightning (``loss.py:6,74-77``) reimplemented natively.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def KL(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    return -0.5 * jnp.mean(
        jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar), axis=1)
    )


def fmap_loss(fmap1: Sequence[jax.Array], fmap2: Sequence[jax.Array], metric: str = "L1") -> jax.Array:
    loss = 0.0
    for f1, f2 in zip(fmap1, fmap2):
        if metric == "L1":
            loss = loss + jnp.mean(jnp.abs(f1 - f2))
        elif metric == "L2":
            loss = loss + jnp.mean(jnp.square(f1 - f2))
    return loss / len(fmap1)


def hinge_loss(fake_data: jax.Array, orig_data: jax.Array | None, update: str) -> jax.Array:
    if update == "disc":
        l1 = jnp.mean(jax.nn.relu(1.0 - orig_data))
        l2 = jnp.mean(jax.nn.relu(1.0 + fake_data))
        return (l1 + l2) / 2.0
    if update == "gen":
        return -jnp.mean(fake_data)
    raise ValueError(update)


def psnr(pred: jax.Array, target: jax.Array) -> jax.Array:
    """pytorch-lightning functional psnr semantics: data_range = target
    max-min over the whole batch, MSE over all elements."""
    data_range = jnp.max(target) - jnp.min(target)
    mse = jnp.mean(jnp.square(pred - target))
    return 10.0 * jnp.log10(data_range**2 / mse)


def _gaussian_kernel(size: int, sigma: float) -> jax.Array:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-jnp.square(coords) / (2 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(
    pred: jax.Array,
    target: jax.Array,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """SSIM over (B,H,W,C) images, gaussian 11x11 window (pl defaults),
    data_range from the target like pl's implementation."""
    data_range = jnp.max(target) - jnp.min(target)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    kernel = _gaussian_kernel(kernel_size, sigma)
    c = pred.shape[-1]
    kernel4 = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))  # depthwise

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu_p, mu_t = filt(pred), filt(target)
    mu_p2, mu_t2, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sigma_p = filt(pred * pred) - mu_p2
    sigma_t = filt(target * target) - mu_t2
    sigma_pt = filt(pred * target) - mu_pt

    num = (2 * mu_pt + c1) * (2 * sigma_pt + c2)
    den = (mu_p2 + mu_t2 + c1) * (sigma_p + sigma_t + c2)
    return jnp.mean(num / den)
