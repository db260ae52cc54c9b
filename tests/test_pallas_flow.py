"""Fused Pallas flow kernel vs the XLA lax.scan reference implementation.

On CPU the kernel runs in interpret mode (numerics identical to compiled);
the bf16 weight streaming makes the comparison tolerance bf16-scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu.models.stage2.flow import (
    control_mask,
    flow_forward,
    flow_reverse,
    init_flow_blocks,
    init_shuffle_buffers,
)
from image2video_synthesis_using_cinns_tpu.ops.pallas.flow_kernel import (
    flow_forward_fused,
    flow_reverse_fused,
)

C, E, H, NF, B = 16, 12, 32, 5, 8


def setup(control=False):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    blocks = init_flow_blocks(k1, C, E, H, 2, NF)
    buffers = init_shuffle_buffers(k2, C, NF)
    blocks["actnorm"] = {
        "loc": 0.2 * jax.random.normal(k3, (NF, C)),
        "scale": 1.0 + 0.2 * jax.random.uniform(k3, (NF, C)),
    }
    mask = control_mask(NF, control)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, C))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, E))
    return blocks, buffers, mask, x, emb


@pytest.mark.parametrize("control", [False, True])
def test_fused_forward_matches_scan(control):
    blocks, buffers, mask, x, emb = setup(control)
    ref_y, ref_ld = flow_forward(blocks, buffers, x, emb, mask)
    y, ld = flow_forward_fused(blocks, buffers, x, emb, mask)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ref_ld), rtol=2e-2, atol=2e-1)


def test_fused_reverse_matches_scan():
    blocks, buffers, mask, x, emb = setup()
    ref = flow_reverse(blocks, buffers, x, emb, mask)
    out = flow_reverse_fused(blocks, buffers, x, emb, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_fused_roundtrip():
    blocks, buffers, mask, x, emb = setup()
    y, _ = flow_forward_fused(blocks, buffers, x, emb, mask)
    x_rec = flow_reverse_fused(blocks, buffers, y, emb, mask)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=5e-2, atol=5e-2)
