"""Spectral normalisation as explicit functional state.

The reference uses two spectral-norm implementations:
  * torch builtin ``nn.utils.spectral_norm`` (stage-1 decoder / discriminators,
    patch disc) — power iteration on W reshaped to (out, -1), eps=1e-12.
  * a custom BigGAN variant (``stage2_cINN/AE/modules/generator.py:22-72``)
    with ``weight_bar/_u/_v`` parameters and eps=1e-4.

In JAX the power-iteration vector is explicit state threaded through train
steps. Modules store ``u`` in a linen variable collection named ``"spectral"``;
at call time the kernel is divided by the current sigma estimate, and (when the
collection is mutable, i.e. during training) one power iteration updates ``u``.
Inference with converted checkpoints therefore reproduces torch eval behaviour:
sigma computed from the stored ``u`` without updates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SpectralState(NamedTuple):
    u: jax.Array  # (out_features,)


def _l2normalize(v: jax.Array, eps: float) -> jax.Array:
    return v / (jnp.linalg.norm(v) + eps)


def spectral_normalize(
    w_matrix: jax.Array,
    u: jax.Array,
    n_iters: int = 1,
    update: bool = True,
    eps: float = 1e-12,
) -> tuple[jax.Array, jax.Array]:
    """Normalise ``w_matrix`` (out, in_flat) by its leading singular value.

    Returns (sigma, new_u). One power iteration per call, as torch does.
    When ``update`` is False, sigma is still estimated with a fresh v from the
    stored u (matching torch eval-mode forward), but u is returned unchanged.
    """
    u_cur = u
    for _ in range(n_iters):
        v = _l2normalize(w_matrix.T @ u_cur, eps)
        u_cur = _l2normalize(w_matrix @ v, eps)
    u_cur = jax.lax.stop_gradient(u_cur)
    v = jax.lax.stop_gradient(v)
    sigma = jnp.einsum("i,ij,j->", u_cur, w_matrix, v)
    return sigma, (u_cur if update else u)


def kernel_to_matrix(kernel: jax.Array) -> jax.Array:
    """Flatten a channels-last conv kernel (*k, in, out) to torch's (out, -1).

    torch reshapes (out, in, *k) row-major to (out, in*prod(k)); the singular
    value is invariant to column permutation, so any consistent flattening
    gives the same sigma — we use (out, prod(k)*in).
    """
    out = kernel.shape[-1]
    return jnp.moveaxis(kernel, -1, 0).reshape(out, -1)
