"""Fréchet distance between Gaussian activation statistics.

Metric parity with the reference's scipy implementation
(``metrics/PyTorch_FVD/FVD_logging.py:43-94``):
``d² = |mu1-mu2|² + Tr(C1 + C2 - 2·sqrtm(C1·C2))``.

TPU-native formulation: ``sqrtm(C1·C2)`` is non-symmetric, which scipy handles
with a Schur decomposition on the host. We instead use the similarity
transform ``Tr sqrtm(C1 C2) = Tr sqrtm(S C2 S)`` with ``S = sqrtm(C1)``
(symmetric PSD), reducing everything to two Hermitian eigendecompositions —
`jnp.linalg.eigh` is supported on device and differentiable, and the result
matches scipy to float tolerance (see tests/test_metrics.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _psd_sqrt(mat: jax.Array) -> jax.Array:
    vals, vecs = jnp.linalg.eigh(mat)
    vals = jnp.clip(vals, 0.0, None)
    return (vecs * jnp.sqrt(vals)) @ vecs.T


def trace_sqrt_product(sigma1: jax.Array, sigma2: jax.Array) -> jax.Array:
    """Tr sqrtm(sigma1 @ sigma2) for symmetric PSD inputs."""
    s = _psd_sqrt(sigma1)
    m = s @ sigma2 @ s
    vals = jnp.linalg.eigvalsh(m)
    return jnp.sum(jnp.sqrt(jnp.clip(vals, 0.0, None)))


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> jax.Array:
    mu1, mu2 = jnp.asarray(mu1, jnp.float64), jnp.asarray(mu2, jnp.float64)
    sigma1 = jnp.asarray(sigma1, jnp.float64)
    sigma2 = jnp.asarray(sigma2, jnp.float64)
    diff = mu1 - mu2
    offset = jnp.eye(sigma1.shape[0], dtype=sigma1.dtype) * eps
    tr_covmean = trace_sqrt_product(sigma1 + offset, sigma2 + offset)
    return (
        diff @ diff + jnp.trace(sigma1) + jnp.trace(sigma2) - 2.0 * tr_covmean
    )


def activation_statistics(acts: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(N, D) activations → (mu (D,), unbiased covariance (D, D))."""
    acts = jnp.asarray(acts, jnp.float64)
    mu = jnp.mean(acts, axis=0)
    centered = acts - mu
    n = acts.shape[0]
    sigma = centered.T @ centered / (n - 1)
    return mu, sigma


def frechet_from_activations(act1, act2, eps: float = 1e-6) -> float:
    """Convenience wrapper mirroring ``calculate_frechet_distance`` usage."""
    import numpy as np

    with jax.experimental.enable_x64():
        mu1, s1 = activation_statistics(np.asarray(act1))
        mu2, s2 = activation_statistics(np.asarray(act2))
        return float(frechet_distance(mu1, s1, mu2, s2, eps))
