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
    v: jax.Array  # (in_flat,)


def _l2normalize(v: jax.Array, eps: float) -> jax.Array:
    return v / (jnp.linalg.norm(v) + eps)


def spectral_normalize(
    w_matrix: jax.Array,
    u: jax.Array,
    v: jax.Array,
    n_iters: int = 1,
    update: bool = True,
    eps: float = 1e-12,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Normalise ``w_matrix`` (out, in_flat) by its leading singular value.

    Returns (sigma, new_u, new_v). torch semantics: in training one power
    iteration refines (u, v) and sigma uses the refreshed vectors; in eval
    (``update=False``) sigma is computed from the *stored* (u, v) with no
    iteration — matching ``torch.nn.utils.spectral_norm`` exactly.
    """
    if update:
        u_cur, v_cur = u, v
        for _ in range(n_iters):
            v_cur = _l2normalize(w_matrix.T @ u_cur, eps)
            u_cur = _l2normalize(w_matrix @ v_cur, eps)
        u_cur = jax.lax.stop_gradient(u_cur)
        v_cur = jax.lax.stop_gradient(v_cur)
    else:
        u_cur, v_cur = u, v
    sigma = jnp.einsum("i,ij,j->", u_cur, w_matrix, v_cur)
    return sigma, u_cur, v_cur


def kernel_to_matrix(kernel: jax.Array) -> jax.Array:
    """Flatten a channels-last conv kernel (*k, in, out) to torch's (out, -1)
    with torch's exact column ordering (out, in, *k row-major) — so converted
    ``weight_v`` vectors line up without permutation."""
    nd = kernel.ndim
    mat = jnp.transpose(kernel, (nd - 1, nd - 2) + tuple(range(nd - 2)))
    return mat.reshape(mat.shape[0], -1)
