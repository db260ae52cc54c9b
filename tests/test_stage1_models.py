"""Stage-1 model shape/behaviour tests on the tiny preset.

All init/apply calls are jitted: eager flax execution compiles every conv op
separately on CPU (~10s each) while jit compiles one DCE'd program.
"""

import jax
import jax.numpy as jnp
import numpy as np

from image2video_synthesis_using_cinns_tpu.models.stage1 import (
    Discriminator,
    Encoder,
    Generator,
    NLayerDiscriminator,
)
from image2video_synthesis_using_cinns_tpu.testing import PRESETS, stage1_config

P = PRESETS["tiny"]
CFG = stage1_config(P)


def test_decoder_shapes_range_and_conditioning():
    dec = Generator.from_config(CFG.Decoder)
    img = jax.random.normal(jax.random.PRNGKey(2), (2, P["img_size"], P["img_size"], 3))
    z = jax.random.normal(jax.random.PRNGKey(0), (2, P["z_dim"]))
    variables = jax.jit(dec.init)({"params": jax.random.PRNGKey(1)}, img, z)
    apply = jax.jit(dec.apply)
    out = apply(variables, img, z)
    # T = 4 * prod(upsample_t) ; H = W = 32 * prod(upsample_s) for tiny: 8, 32
    assert out.shape == (2, 8, P["img_size"], P["img_size"], 3)
    assert float(jnp.max(jnp.abs(out))) <= 1.0

    out_img = apply(variables, img + 0.5, z)
    out_z = apply(variables, img, z + 0.5)
    assert not np.allclose(np.asarray(out), np.asarray(out_img))
    assert not np.allclose(np.asarray(out), np.asarray(out_z))


def test_encoder_reparameterize():
    enc = Encoder.from_config(CFG.Encoder)
    x = jax.random.normal(
        jax.random.PRNGKey(0), (2, P["seq_length"] - 1, P["img_size"], P["img_size"], 3)
    )
    variables = jax.jit(enc.init)(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)}, x
    )
    apply = jax.jit(lambda v, x, k: enc.apply(v, x, rngs={"sample": k}))
    s1, mu, logvar = apply(variables, x, jax.random.PRNGKey(3))
    s2, mu2, _ = apply(variables, x, jax.random.PRNGKey(4))
    assert s1.shape == mu.shape == logvar.shape == (2, P["z_dim"])
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu2), rtol=1e-6)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))  # different noise


def test_temporal_discriminator_features():
    disc = Discriminator.from_config(CFG.Discriminator_Temporal)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, P["img_size"], P["img_size"], 3))
    variables = jax.jit(disc.init)({"params": jax.random.PRNGKey(1)}, x)
    logits, feats = jax.jit(disc.apply)(variables, x)
    assert logits.shape == (2, 1)
    assert len(feats) == 4  # one per stage for the feature-matching loss


def test_patch_discriminator_logits_and_actnorm_init():
    disc = NLayerDiscriminator.from_config(CFG.Discriminator_Patch)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, P["img_size"], P["img_size"], 3))
    variables = jax.jit(disc.init)({"params": jax.random.PRNGKey(1)}, x)
    out = jax.jit(disc.apply)(variables, x)
    assert out.ndim == 4 and out.shape[-1] == 1

    # data-dependent actnorm init: run with the stats collection mutable and
    # fold the recorded values into params
    from image2video_synthesis_using_cinns_tpu.models.layers import merge_actnorm_init

    out2, updates = jax.jit(
        lambda v, x: disc.apply(v, x, train=True, mutable=["actnorm_stats"])
    )(variables, 1.0 + 2.0 * x)
    new_params = merge_actnorm_init(variables["params"], updates["actnorm_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(variables["params"]), jax.tree.leaves(new_params))
    )
