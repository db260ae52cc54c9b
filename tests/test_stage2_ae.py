"""Stage-2 AE: BigGAN decoder shapes, BigAE roundtrip, AE training smoke."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu.models.stage2.biggan import (
    BigAE,
    VariableDimGenerator,
)

AE_CFG = {
    "deterministic": False,
    "in_size": 64,
    "norm": "in",
    "encoder_type": "resnet18",
    "use_actnorm_in_dec": False,
    "z_dim": 64,
    "chn": 8,  # reference debug width
}


def test_biggan_generator_shapes():
    gen = VariableDimGenerator(size=64, z_dim=64, chn=8)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 64))
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 1000))
    variables = jax.jit(gen.init)({"params": jax.random.PRNGKey(2)}, z, emb)
    out = jax.jit(gen.apply)(variables, z, emb)
    assert out.shape == (2, 64, 64, 3)
    assert float(jnp.max(jnp.abs(out))) <= 1.0
    # z split: [24, 10, 10, 10, 10]
    assert variables["params"]["G_linear"]["kernel"].shape[0] == 24


def test_bigae_roundtrip():
    ae = BigAE(config=AE_CFG)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = jax.jit(ae.init)({"params": jax.random.PRNGKey(1)}, x)
    recon, mode, p = jax.jit(ae.apply)(variables, x)
    assert recon.shape == x.shape
    assert mode.shape == (2, 64)
    kl = p.kl()
    assert np.isfinite(float(kl))


def test_ae_training_smoke(tmp_path, monkeypatch):
    from image2video_synthesis_using_cinns_tpu.testing import (
        PRESETS,
        make_bair_data_dir,
        stage2_ae_config,
    )
    from image2video_synthesis_using_cinns_tpu.train.stage2_ae import main
    from image2video_synthesis_using_cinns_tpu.utils.logging import WandbSink

    # stub sink: the recon-grid push (reference AE/main.py:40-43) stays wired
    images = []
    monkeypatch.setattr(
        WandbSink, "log_image",
        lambda self, key, image, caption=None: images.append((key, image.shape)),
    )

    P = dict(PRESETS["tiny"])
    data_dir = make_bair_data_dir(str(tmp_path / "data") + "/", img=64)
    opt = stage2_ae_config(P)
    opt.AE["in_size"] = 64
    opt.AE["z_dim"] = 64
    opt.AE["chn"] = 8
    opt.AE["encoder_type"] = "resnet18"
    opt.Data["img_size"] = 64
    opt.Data["data_path"] = data_dir
    opt.Training["bs"] = 2
    opt.Training["workers"] = 2
    opt.Training["n_epochs"] = 1
    opt.Training["save_path"] = str(tmp_path / "out")
    out = main(opt, max_steps=2)

    assert os.path.exists(os.path.join(out["save_path"], "config_stage2_AE.yaml"))
    assert os.path.exists(os.path.join(out["save_path"], "Encoder_stage2.msgpack"))
    assert np.isfinite(out["train_loss"]).all()
    assert images and images[0][0] == "images_train"


def test_biggan_actnorm_variant():
    """use_actnorm_in_dec=True path: ConditionalActNorm + final ActNorm."""
    gen = VariableDimGenerator(size=64, z_dim=64, chn=8, use_actnorm=True)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 64))
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 1000))
    variables = jax.jit(gen.init)({"params": jax.random.PRNGKey(2)}, z, emb)
    out = jax.jit(gen.apply)(variables, z, emb)
    assert out.shape == (2, 64, 64, 3)
    assert "actnorm_stats" in variables
