"""Loss primitive unit tests (hand-computed + torch-functional oracles)."""

import jax.numpy as jnp
import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu.losses.common import (
    KL,
    fmap_loss,
    hinge_loss,
    psnr,
    ssim,
)
from image2video_synthesis_using_cinns_tpu.losses.flow_loss import flow_loss


def test_kl_hand_computed():
    mu = jnp.asarray([[0.0, 1.0]])
    logvar = jnp.asarray([[0.0, 0.0]])
    # -0.5 * sum(1 + 0 - mu^2 - 1) = -0.5 * (0 + (-1)) = 0.5
    np.testing.assert_allclose(float(KL(mu, logvar)), 0.5, rtol=1e-6)


def test_hinge_losses():
    fake = jnp.asarray([[-2.0], [0.5]])
    real = jnp.asarray([[2.0], [0.5]])
    # disc: mean(relu(1-real))=0.25, mean(relu(1+fake))=0.75 → 0.5
    np.testing.assert_allclose(float(hinge_loss(fake, real, "disc")), 0.5)
    np.testing.assert_allclose(float(hinge_loss(fake, None, "gen")), 0.75)


def test_fmap_loss():
    f1 = [jnp.ones((2, 3)), jnp.zeros((2, 3))]
    f2 = [jnp.zeros((2, 3)), jnp.zeros((2, 3))]
    np.testing.assert_allclose(float(fmap_loss(f1, f2, "L1")), 0.5)
    np.testing.assert_allclose(float(fmap_loss(f1, f2, "L2")), 0.5)


def test_psnr_hand_computed(rng):
    target = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
    pred = target  # identical → inf; perturb
    pred = target + 0.1
    dr = float(jnp.max(target) - jnp.min(target))
    expected = 10 * np.log10(dr**2 / 0.01)
    np.testing.assert_allclose(float(psnr(pred, target)), expected, rtol=1e-4)


def test_ssim_bounds(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    same = float(ssim(x, x))
    np.testing.assert_allclose(same, 1.0, rtol=1e-5)
    noisy = float(ssim(x + 0.5 * rng.standard_normal(x.shape).astype(np.float32), x))
    assert noisy < same


def test_ssim_matches_torch(rng):
    torch = pytest.importorskip("torch")
    try:
        from torchmetrics.functional import structural_similarity_index_measure
    except ImportError:
        pytest.skip("torchmetrics not installed")
    x = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    y = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    ref = float(structural_similarity_index_measure(
        torch.from_numpy(x), torch.from_numpy(y), data_range=float(y.max() - y.min())
    ))
    ours = float(ssim(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(y, (0, 2, 3, 1))),
    ))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_flow_loss_formula(rng):
    gauss = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    logdet = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))
    loss, aux = flow_loss(gauss, logdet)
    expected = float(np.mean(0.5 * np.sum(np.asarray(gauss) ** 2, axis=1)) - np.mean(logdet))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
