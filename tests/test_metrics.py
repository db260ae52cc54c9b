"""Metric machinery: Fréchet distance vs scipy, backbone output shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu.metrics.frechet import (
    frechet_from_activations,
)


def _scipy_frechet(act1, act2, eps=1e-6):
    from scipy import linalg

    mu1, s1 = np.mean(act1, 0), np.cov(act1, rowvar=False)
    mu2, s2 = np.mean(act2, 0), np.cov(act2, rowvar=False)
    offset = np.eye(s1.shape[0]) * eps
    covmean, _ = linalg.sqrtm((s1 + offset).dot(s2 + offset), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    diff = mu1 - mu2
    return diff.dot(diff) + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean)


def test_frechet_matches_scipy(rng):
    d = 32
    act1 = rng.standard_normal((200, d)) @ rng.standard_normal((d, d)) * 0.5
    act2 = act1 + rng.standard_normal((200, d)) * 0.3 + 0.7
    ours = frechet_from_activations(act1, act2)
    ref = _scipy_frechet(act1, act2)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_frechet_identical_distributions_near_zero(rng):
    act = rng.standard_normal((500, 16))
    val = frechet_from_activations(act[:250], act[250:])
    assert 0 <= val < 1.0  # sampling noise only


def test_i3d_shapes():
    from image2video_synthesis_using_cinns_tpu.models.backbones.i3d import I3D

    x = jnp.zeros((1, 16, 224, 224, 3))
    m = I3D(num_classes=400, head="logits")
    variables = jax.jit(m.init)({"params": jax.random.PRNGKey(0)}, x)
    softmax, logits = jax.jit(m.apply)(variables, x)
    assert logits.shape == (1, 400)
    np.testing.assert_allclose(np.asarray(jnp.sum(softmax, -1)), 1.0, rtol=1e-5)

    m16 = I3D(num_classes=18, head="representation", avg_pool_t=2)
    v16 = jax.jit(m16.init)({"params": jax.random.PRNGKey(0)}, x)
    rep = jax.jit(m16.apply)(v16, x)
    assert rep.shape == (1, 1024)

    x32 = jnp.zeros((1, 32, 224, 224, 3))
    m32 = I3D(num_classes=18, head="representation", avg_pool_t=4)
    v32 = jax.jit(m32.init)({"params": jax.random.PRNGKey(0)}, x32)
    rep32 = jax.jit(m32.apply)(v32, x32)
    assert rep32.shape == (1, 1024)


def test_inception_fid_shape():
    from image2video_synthesis_using_cinns_tpu.metrics.inception import InceptionV3FID

    m = InceptionV3FID()
    x = jnp.zeros((2, 64, 64, 3))
    variables = jax.jit(m.init)({"params": jax.random.PRNGKey(0)}, x)
    out = jax.jit(m.apply)(variables, x)
    assert out.shape == (2, 2048)


def test_lpips_basic_properties():
    from image2video_synthesis_using_cinns_tpu.models.backbones.lpips import LPIPS

    m = LPIPS()
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3), minval=-1, maxval=1)
    variables = jax.jit(m.init)({"params": jax.random.PRNGKey(1)}, x, x)
    same = jax.jit(m.apply)(variables, x, x)
    np.testing.assert_allclose(np.asarray(same), 0.0, atol=1e-5)
    diff = jax.jit(m.apply)(variables, x, -x)
    assert float(jnp.max(jnp.abs(diff))) > 0
