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
    """Convenience wrapper mirroring ``calculate_frechet_distance`` usage.

    Runs in float64 on the host (numpy eigendecompositions) — the activations
    are tiny relative to the feature extraction, and float32 eigh loses ~1e-3
    of precision the metric contract doesn't allow. The jittable fp32 device
    path above remains available for in-training-loop logging.
    """
    import numpy as np

    a1 = np.asarray(act1, np.float64)
    a2 = np.asarray(act2, np.float64)
    mu1, mu2 = a1.mean(0), a2.mean(0)
    s1 = np.cov(a1, rowvar=False)
    s2 = np.cov(a2, rowvar=False)
    offset = np.eye(s1.shape[0]) * eps

    def psd_sqrt(m):
        vals, vecs = np.linalg.eigh(m)
        return (vecs * np.sqrt(np.clip(vals, 0, None))) @ vecs.T

    s = psd_sqrt(s1 + offset)
    vals = np.linalg.eigvalsh(s @ (s2 + offset) @ s)
    tr_covmean = np.sum(np.sqrt(np.clip(vals, 0, None)))
    diff = mu1 - mu2
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2.0 * tr_covmean)
