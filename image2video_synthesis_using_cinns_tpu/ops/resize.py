"""Resampling primitives (channels-last) matching the reference semantics.

The reference uses three distinct resampling flavours that we must reproduce:

  * ``F.interpolate(x, scale_factor=...)`` with default mode='nearest' for the
    video decoder's progressive upsampling (reference
    ``stage1_VAE/modules/decoder.py:102-115``) — integer-factor nearest is an
    exact repeat along each axis.
  * ``F.interpolate(..., mode='bilinear', align_corners=True)`` for SPADE's
    per-scale conditioning resize (``normalization_layer.py:20``) and the FVD
    224x224 preprocess (``metrics/PyTorch_FVD/FVD_logging.py:192-195``).
    ``jax.image.resize`` implements only half-pixel (align_corners=False)
    sampling, so we provide an explicit align-corners gather-based bilinear.
  * kornia ``Resize`` (bilinear, align_corners=False) in the data pipeline —
    that one maps to ``jax.image.resize(..., method='bilinear')``.

All functions are jit-friendly (static shapes) and layout-native: images are
(..., H, W, C) and videos (..., T, H, W, C), so the channel axis stays in the
TPU lane dimension.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def upsample_nearest(x: jax.Array, factors: Sequence[int], axes: Sequence[int]) -> jax.Array:
    """Integer nearest-neighbour upsampling: repeat along the given axes.

    Exactly equivalent to ``F.interpolate(mode='nearest')`` with integer scale
    factors. XLA lowers `repeat` to a broadcast+reshape, which fuses with the
    surrounding convolution producers/consumers.
    """
    for f, ax in zip(factors, axes):
        if f == 1:
            continue
        x = jnp.repeat(x, f, axis=ax)
    return x


def _align_corners_coords(out_size: int, in_size: int, dtype=jnp.float32) -> jax.Array:
    if out_size == 1:
        return jnp.zeros((1,), dtype)
    scale = (in_size - 1) / (out_size - 1)
    return jnp.arange(out_size, dtype=dtype) * scale


def _interp_weights(coords: jax.Array, in_size: int):
    lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, max(in_size - 1, 0))
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w_hi = coords - lo.astype(coords.dtype)
    return lo, hi, w_hi


def resize_bilinear_align_corners(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Bilinear resize with PyTorch ``align_corners=True`` sampling.

    ``x``: (..., H, W, C). Separable: implemented as two 1-D gathers + lerps,
    which XLA fuses into cheap vectorised code.
    """
    h_out, w_out = size
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return x
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    x = x.astype(dtype)

    rows = _align_corners_coords(h_out, h_in, dtype)
    r_lo, r_hi, r_w = _interp_weights(rows, h_in)
    top = jnp.take(x, r_lo, axis=-3)
    bot = jnp.take(x, r_hi, axis=-3)
    x = top + (bot - top) * r_w[:, None, None]

    cols = _align_corners_coords(w_out, w_in, dtype)
    c_lo, c_hi, c_w = _interp_weights(cols, w_in)
    left = jnp.take(x, c_lo, axis=-2)
    right = jnp.take(x, c_hi, axis=-2)
    return left + (right - left) * c_w[:, None]


def resize_bilinear(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Half-pixel (align_corners=False) bilinear resize, kornia/``cv2`` style."""
    out_shape = x.shape[:-3] + (size[0], size[1], x.shape[-1])
    if x.shape[-3:-1] == size:
        return x
    return jax.image.resize(x, out_shape, method="bilinear")
