"""Fixtures: fabricate chained config + checkpoint directories.

Creates the exact on-disk layout the inference facade and trainers consume
(config_stage1.yaml / config_stage2_AE.yaml / config_stage2.yaml next to
checkpoints, mirroring the reference's config-chaining contract, SURVEY §5.4)
with freshly-initialised weights. Used by unit tests ('tiny' preset), the
benchmark and the driver compile-check ('bair' preset = the reference BAIR
architecture at full size).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from . import config as cfg
from .models.stage1.decoder import Generator
from .models.stage1.resnet3d import Encoder
from .models.stage2.inn import SupervisedTransformer
from .models.stage2.resnet2d import ResnetEncoder
from .utils import checkpoint as ckpt_io

PRESETS = {
    "tiny": dict(
        img_size=32,
        seq_length=9,
        z_dim=16,
        nf=16,
        enc_channels=[16, 32, 32, 32, 32],
        enc_stride_t=[1, 2, 2, 2],
        enc_stride_s=[1, 2, 2, 1],
        upsample_s=[1, 1],
        upsample_t=[1, 1],
        n_flows=4,
        flow_factor=4,
        cond_z=16,
        ae_type="resnet18",
        disc_channels=[16, 16, 32, 32, 32],
        # keep the temporal disc's final spatial size at 4 for 32px inputs
        disc_stride_s=[1, 1, 2, 1],
    ),
    # full-size reference landscape/DTDB-style 128px architecture
    # (stage1_VAE/configs/landscape_config.yaml: nf 32, upsample_s [2,2],
    # 128px, resnet50-bn AE with z=128)
    "landscape": dict(
        img_size=128,
        seq_length=17,
        z_dim=64,
        nf=32,
        enc_channels=[64, 128, 128, 256, 512],
        enc_stride_t=[1, 2, 2, 2],
        enc_stride_s=[2, 2, 2, 2],
        upsample_s=[2, 2],
        upsample_t=[2, 1],
        n_flows=20,
        flow_factor=8,
        cond_z=128,
        ae_type="resnet50",
        ae_norm="bn",
        disc_channels=[64, 64, 128, 256, 512],
        disc_stride_s=[1, 2, 2, 2],
    ),
    # full-size reference BAIR architecture (stage1_VAE/configs/bair_config.yaml,
    # stage2_cINN/configs/bair_config.yaml, stage2_cINN/AE/configs/bair_config.yaml)
    "bair": dict(
        img_size=64,
        seq_length=17,
        z_dim=64,
        nf=64,
        enc_channels=[64, 128, 256, 512, 512],
        enc_stride_t=[1, 2, 2, 2],
        enc_stride_s=[1, 2, 2, 2],
        upsample_s=[2, 1],
        upsample_t=[2, 1],
        n_flows=20,
        flow_factor=8,
        cond_z=64,
        ae_type="resnet50",
        disc_channels=[64, 64, 128, 256, 512],
        disc_stride_s=[1, 1, 2, 2],
    ),
}


def stage1_config(p: dict, control: bool = False) -> cfg.Config:
    return cfg.Config(
        {
            "Decoder": {
                "channel_factor": p["nf"],
                "z_dim": p["z_dim"],
                "upsample_s": p["upsample_s"],
                "upsample_t": p["upsample_t"],
                "spectral_norm": True,
            },
            "Encoder": {
                "res_type_encoder": "resnet18",
                "deterministic": False,
                "use_max_pool": False,
                "z_dim": p["z_dim"],
                "channels": p["enc_channels"],
                "stride_t": p["enc_stride_t"],
                "stride_s": p["enc_stride_s"],
            },
            "Discriminator_Temporal": {
                "eval_seq_length": 16,
                "res_type_encoder": "resnet18",
                "deterministic": False,
                "use_max_pool": True,
                "channels": p["disc_channels"],
                "stride_t": [2, 2, 2, 2],
                "stride_s": p["disc_stride_s"],
                "spectral_norm": True,
            },
            "Discriminator_Patch": {
                "in_channels": 3,
                "ndf": 64 if p["nf"] >= 64 else 16,
                "n_layers": 3,
                "use_actnorm": True,
                "spectral_norm": True,
            },
            "Training": {
                "patch_GAN": "basic", "GAN_Loss": "hinge",
                "w_coup_s": 1, "w_coup_t": 1, "w_fmap_t": 10, "w_percep": 30,
                "w_recon": 10, "w_GP": 10, "w_kl": 1e-5,
                "subsample_length": 12 if p["seq_length"] > 12 else p["seq_length"] - 1,
                "pretrain": 1, "n_epochs": 55, "lr": 2e-4, "workers": 4,
                "bs": 10, "bs_eval": 10, "verbose_idx": 30,
                "weight_decay": 1e-5, "lr_gamma": 0.98, "FVD": "FVD",
                "savename": "fixture", "save_path": "", "reload_path": "",
            },
            "Data": {
                "sequence_length": p["seq_length"],
                "img_size": p["img_size"],
                "dataset": "BAIR",
                "reverse": False,
                "aug": True,
                "data_path": "",
                "Augmentation": {
                    "brightness": 0.1, "contrast": 0.1, "saturation": 0.1,
                    "hue": 0, "prob_hflip": 0.5,
                },
            },
            "Logging": {"entity": None, "project": None, "mode": "disabled"},
        }
    )


def stage2_ae_config(p: dict) -> cfg.Config:
    return cfg.Config(
        {
            "AE": {
                "deterministic": False,
                "in_size": p["img_size"],
                "norm": p.get("ae_norm", "in"),
                "encoder_type": p["ae_type"],
                "use_actnorm_in_dec": False,
                "z_dim": p["cond_z"],
                "pre_process": False,
                "pretrained": False,
            },
            "Discriminator_Patch": {
                "in_channels": 3, "ndf": 64 if p["nf"] >= 64 else 16,
                "n_layers": 3, "use_actnorm": True, "spectral_norm": True,
            },
            "Training": {
                "w_kl": 1e-5, "n_epochs": 60, "lr": 2e-4, "bs": 30,
                "weight_decay": 0, "workers": 4, "pretrain": 20,
                "savename": "fixture", "save_path": "",
            },
            "Data": {
                "sequence_length": 1, "img_size": p["img_size"],
                "dataset": "BAIR", "aug": True, "data_path": "",
                "Augmentation": {
                    "brightness": 0.2, "contrast": 0.2, "saturation": 0.2,
                    "hue": 0.1, "prob_hflip": 0.5,
                },
            },
            "Logging": {"entity": None, "project": None, "mode": "disabled"},
        }
    )


def stage2_config(p: dict, stage1_path: str, ae_path: str, control: bool = False) -> cfg.Config:
    return cfg.Config(
        {
            "Flow": {
                "n_flows": p["n_flows"],
                "flow_hidden_depth": 2,
                "flow_mid_channels_factor": p["flow_factor"],
            },
            "Conditioning_Model": {
                "z_dim": p["cond_z"],
                "checkpoint_name": "Encoder_stage2",
                "model_name": os.path.basename(ae_path.rstrip("/")),
                "model_path": os.path.dirname(ae_path.rstrip("/")) + "/",
            },
            "First_stage_model": {
                "checkpoint_encoder": "best_PFVD_ENC",
                "checkpoint_decoder": "best_PFVD_GEN",
                "model_name": os.path.basename(stage1_path.rstrip("/")),
                "model_path": os.path.dirname(stage1_path.rstrip("/")) + "/",
            },
            "Training": {
                "n_epochs": 31, "lr": 1e-5, "workers": 4, "bs": 50,
                "bs_eval": 10, "control": control, "control_dim": 3,
                "verbose_idx": 30, "weight_decay": 0, "gamma": 0.5,
                "step_size": 7, "beta1": 0.9, "beta2": 0.99, "amsgrad": True,
                "savename": "fixture", "save_path": "",
            },
            "Data": {
                "sequence_length": p["seq_length"], "img_size": p["img_size"],
                "dataset": "BAIR", "aug": True, "data_path": "",
                "Augmentation": {
                    "brightness": 0.1, "contrast": 0.1, "saturation": 0.1,
                    "hue": 0, "prob_hflip": 0.5,
                },
            },
            "Logging": {"entity": None, "project": None, "mode": "disabled"},
        }
    )


def make_model_dir(root: str, preset: str = "tiny", seed: int = 0, control: bool = False) -> str:
    """Create stage1/AE/stage2 dirs with configs + random-init checkpoints.

    Returns the stage2 directory path (what ``Model`` consumes).
    """
    p = PRESETS[preset]
    stage1_dir = os.path.join(root, "stage1")
    ae_dir = os.path.join(root, "AE")
    stage2_dir = os.path.join(root, "stage2")
    for d in (stage1_dir, ae_dir, stage2_dir):
        os.makedirs(d, exist_ok=True)

    key = jax.random.PRNGKey(seed)
    k_dec, k_enc, k_ae, k_flow = jax.random.split(key, 4)
    img, z, T = p["img_size"], p["z_dim"], p["seq_length"] - 1

    s1_cfg = stage1_config(p, control)
    cfg.save(s1_cfg, os.path.join(stage1_dir, "config_stage1.yaml"))

    decoder = Generator.from_config(s1_cfg.Decoder)
    dec_vars = jax.jit(decoder.init)(
        {"params": k_dec}, jnp.zeros((1, img, img, 3)), jnp.zeros((1, z))
    )
    ckpt_io.save(
        os.path.join(stage1_dir, "best_PFVD_GEN.msgpack"),
        {"epoch": 0, "state_dict": dec_vars},
    )

    encoder = Encoder.from_config(s1_cfg.Encoder)
    enc_vars = jax.jit(encoder.init)(
        {"params": k_enc, "sample": k_enc}, jnp.zeros((1, T, img, img, 3))
    )
    ckpt_io.save(
        os.path.join(stage1_dir, "best_PFVD_ENC.msgpack"),
        {"epoch": 0, "state_dict": enc_vars},
    )

    ae_cfg = stage2_ae_config(p)
    cfg.save(ae_cfg, os.path.join(ae_dir, "config_stage2_AE.yaml"))
    embedder = ResnetEncoder.from_config(ae_cfg.AE)
    emb_vars = jax.jit(embedder.init)({"params": k_ae}, jnp.zeros((1, img, img, 3)))
    ckpt_io.save(
        os.path.join(ae_dir, "Encoder_stage2.msgpack"),
        {"state_dict": emb_vars},
    )

    s2_cfg = stage2_config(p, stage1_dir, ae_dir, control)
    cfg.save(s2_cfg, os.path.join(stage2_dir, "config_stage2.yaml"))
    flow = SupervisedTransformer.from_configs(s2_cfg, s1_cfg.Decoder, ae_cfg.AE)
    cond = [jnp.zeros((1, img, img, 3))] + ([jnp.zeros((1, 3))] if control else [])
    flow_vars = jax.jit(flow.init)({"params": k_flow}, jnp.zeros((1, z)), cond)
    ckpt_io.save(
        os.path.join(stage2_dir, "cINN.msgpack"),
        {"state_dict": flow_vars},
    )
    return stage2_dir


def make_bair_data_dir(root: str, n_videos: int = 2, img: int = 32,
                       modes: tuple = ("train", "eval", "test")) -> str:
    """Write a synthetic BAIR-layout dataset (30 frames/clip, moving square)
    for training smoke tests: ``<root>/<mode>/traj_0/<k>/<frame>.png`` plus an
    endpoint CSV per clip."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    for mode in modes:
        for k in range(n_videos):
            d = os.path.join(root, mode, "traj_0", str(k))
            os.makedirs(d, exist_ok=True)
            x0, y0 = rng.integers(0, img - 8, 2)
            dx, dy = rng.integers(-1, 2, 2)
            positions = []
            for f in range(30):
                frame = rng.integers(0, 40, (img, img, 3)).astype(np.uint8)
                xx = int(np.clip(x0 + f * dx, 0, img - 8))
                yy = int(np.clip(y0 + f * dy, 0, img - 8))
                frame[yy : yy + 8, xx : xx + 8] = [250, 120, 30]
                Image.fromarray(frame).save(os.path.join(d, f"{f}.png"))
                positions.append(
                    [0.4264 + 0.0002 * xx / img, -0.3 + 0.8 * yy / img, 0.19 + 0.1 * f / 30]
                )
            np.savetxt(
                os.path.join(d, "endeffector_positions.csv"),
                np.asarray(positions), delimiter=",",
            )
    return root
