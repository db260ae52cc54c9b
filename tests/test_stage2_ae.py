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


@pytest.mark.slow
def test_ae_scan_steps_match_single(tmp_path):
    """Training.steps_per_dispatch=K on the AE trainer: the scanned chunk
    must reproduce K sequential single-step dispatches exactly (per-step
    augment keys, BN/spectral refresh, d_loss>0 gating, pad-row semantics
    under the 8-device CPU mesh)."""
    from image2video_synthesis_using_cinns_tpu.testing import (
        PRESETS,
        make_bair_data_dir,
        stage2_ae_config,
    )
    from image2video_synthesis_using_cinns_tpu.train.stage2_ae import main
    from image2video_synthesis_using_cinns_tpu.utils import checkpoint as ckpt_io

    P = dict(PRESETS["tiny"])
    # norm='bn' (the landscape-family AE) is the riskiest norm under the
    # scan: BatchNorm running stats must thread through the carry exactly as
    # the per-step path's mutable refresh does ('in' stays covered by the AE
    # training smoke)
    P["ae_norm"] = "bn"
    data_dir = make_bair_data_dir(
        str(tmp_path / "data") + "/", n_videos=10, img=64, modes=("train", "eval")
    )

    def run(spd, out_name):
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
        opt.Training["steps_per_dispatch"] = spd
        opt.Training["save_path"] = str(tmp_path / out_name)
        out = main(opt, max_steps=5)
        payload = ckpt_io.load(
            os.path.join(out["save_path"], "Encoder_stage2.msgpack")
        )
        return payload["state_dict"], out["train_loss"]

    # 5 steps: 1 single (ActNorm init batch) + two scanned chunks of 2
    enc_a, loss_a = run(1, "single")
    enc_b, loss_b = run(2, "scanned")

    # Tolerances follow test_parallel.py's DP-test convention: the scan body
    # fuses differently from the standalone jit (~1e-7 reassociation noise)
    # and adam_torch's g/sqrt(v) normalisation amplifies that on tiny-grad
    # leaves (KL at random init) across the 5 steps. A wiring bug — wrong
    # per-step key, pad rows, step order — shifts every metric at O(1).
    np.testing.assert_allclose(
        np.asarray(loss_a), np.asarray(loss_b), rtol=1e-2, atol=1e-4
    )
    n_bad = n_tot = 0
    for a, b in zip(jax.tree.leaves(enc_a), jax.tree.leaves(enc_b)):
        a, b = np.asarray(a), np.asarray(b)
        n_bad += int((np.abs(a - b) > (1e-3 + 1e-2 * np.abs(b))).sum())
        n_tot += a.size
    assert n_bad / n_tot < 0.05, f"{n_bad}/{n_tot} encoder params diverged"


def test_biggan_actnorm_variant():
    """use_actnorm_in_dec=True path: ConditionalActNorm + final ActNorm."""
    gen = VariableDimGenerator(size=64, z_dim=64, chn=8, use_actnorm=True)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 64))
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 1000))
    variables = jax.jit(gen.init)({"params": jax.random.PRNGKey(2)}, z, emb)
    out = jax.jit(gen.apply)(variables, z, emb)
    assert out.shape == (2, 64, 64, 3)
    assert "actnorm_stats" in variables
