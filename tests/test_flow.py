"""Flow correctness: invertibility, log-det vs autodiff Jacobian, actnorm init,
control masking, and linen wrapper plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu.models.stage2.flow import (
    ConditionalFlow,
    actnorm_init,
    control_mask,
    flow_forward,
    flow_reverse,
    init_flow_blocks,
    init_shuffle_buffers,
)

C, E, H, DEPTH, NFLOWS, B = 16, 12, 32, 2, 6, 4


def make_flow(key=0, control=False):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    blocks = init_flow_blocks(k1, C, E, H, DEPTH, NFLOWS)
    buffers = init_shuffle_buffers(k2, C, NFLOWS)
    # randomise actnorm so the test isn't trivially identity there
    blocks["actnorm"] = {
        "loc": 0.1 * jax.random.normal(k3, (NFLOWS, C)),
        "scale": 1.0 + 0.1 * jax.random.uniform(k3, (NFLOWS, C)),
    }
    mask = control_mask(NFLOWS, control)
    return blocks, buffers, mask


@pytest.mark.parametrize("control", [False, True])
def test_invertibility(control):
    blocks, buffers, mask = make_flow(control=control)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, C))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, E))

    y, logdet = flow_forward(blocks, buffers, x, emb, mask)
    x_rec = flow_reverse(blocks, buffers, y, emb, mask)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4, atol=1e-4)
    assert logdet.shape == (B,)
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_logdet_matches_autodiff_jacobian():
    blocks, buffers, mask = make_flow()
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, E))

    def f(x_single):
        y, _ = flow_forward(blocks, buffers, x_single[None], emb, mask)
        return y[0]

    x = jax.random.normal(jax.random.PRNGKey(3), (C,))
    jac = jax.jacfwd(f)(x)
    sign, ref_logdet = np.linalg.slogdet(np.asarray(jac))
    _, logdet = flow_forward(blocks, buffers, x[None], emb, mask)
    # NB: the reference ignores the InvLeakyRelu log-det (flow_blocks.py:177-182
    # returns 0), so the analytic Jacobian differs by exactly that term.
    lrelu_ld = _lrelu_logdet(blocks, buffers, x[None], emb, mask)
    np.testing.assert_allclose(float(logdet[0]) + lrelu_ld, ref_logdet, rtol=1e-3, atol=1e-3)


def _lrelu_logdet(blocks, buffers, x, emb, mask):
    """Accumulate the (reference-ignored) InvLeakyRelu log-det by replay."""
    from image2video_synthesis_using_cinns_tpu.models.stage2 import flow as F

    total = 0.0
    h = x
    for i in range(NFLOWS):
        p = jax.tree.map(lambda a: a[i], blocks)
        buf = jax.tree.map(lambda a: a[i], buffers)
        h = (h + p["actnorm"]["loc"]) * p["actnorm"]["scale"]
        total += float(jnp.sum(jnp.where(h < 0, jnp.log(F.INV_LRELU_ALPHA), 0.0)))
        h = F._inv_lrelu_fwd(h)
        h, _ = F._coupling_fwd(p["coupling"], h, emb, mask[i])
        h = jnp.take(h, buf["fwd"], axis=-1)
    return total


def test_actnorm_init_normalises_each_block_input():
    blocks, buffers, mask = make_flow()
    x = 3.0 + 2.0 * jax.random.normal(jax.random.PRNGKey(5), (256, C))
    emb = jax.random.normal(jax.random.PRNGKey(6), (256, E))
    new_blocks = actnorm_init(blocks, buffers, x, emb, mask)

    # first block's actnorm output must be ~N(0,1) marginals
    p0 = jax.tree.map(lambda a: a[0], new_blocks)
    h = (x + p0["actnorm"]["loc"]) * p0["actnorm"]["scale"]
    np.testing.assert_allclose(np.asarray(jnp.mean(h, 0)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.std(h, 0, ddof=1)), 1.0, atol=1e-3)

    # and the flow must still be invertible with the new params (float32
    # roundtrip through 6 freshly-rescaled blocks → looser tolerance)
    y, _ = flow_forward(new_blocks, buffers, x[:8], emb[:8], mask)
    x_rec = flow_reverse(new_blocks, buffers, y, emb[:8], mask)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x[:8]), rtol=5e-3, atol=5e-3)


def test_control_blocks_ignore_x_half():
    """On control ('cond'-mode) blocks the coupling must not depend on the
    applied half — verified by differentiating through a single masked block."""
    blocks, buffers, mask = make_flow(control=True)
    assert float(mask[1]) == 0.0  # fl=1: 1 % 4 != 0 → cond mode
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, E))

    from image2video_synthesis_using_cinns_tpu.models.stage2.flow import _coupling_fwd

    p1 = jax.tree.map(lambda a: a[1], blocks)

    def scale_sum(x_apply):
        x = jnp.concatenate([x_apply, jnp.ones((1, C // 2))], axis=-1)
        y, ld = _coupling_fwd(p1["coupling"], x, emb, mask[1])
        return jnp.sum(ld)

    g = jax.grad(scale_sum)(jnp.ones((1, C // 2)))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_linen_wrapper_roundtrip():
    model = ConditionalFlow(
        in_channels=C, embedding_dim=E, hidden_dim=H, hidden_depth=DEPTH, n_flows=NFLOWS
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C))
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, E))
    variables = model.init(jax.random.PRNGKey(42), x, emb)
    y, logdet = model.apply(variables, x, emb)
    x_rec = model.apply(variables, y, emb, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4, atol=1e-4)

    # jit end-to-end
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))
    y2, _ = fwd(variables, x, emb)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), rtol=1e-5, atol=1e-5)
