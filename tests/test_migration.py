"""User migration path: a reference-style checkpoint directory (torch .pth
files + OmegaConf-style yamls) is converted with the convert_* functions and
then consumed by the facade exactly like a native run.

Component-level numerical parity is covered by the golden tests; this test
pins the end-to-end mechanics: file discovery, config chaining, state_dict
key layouts of real torch saves, merge into templates, and sampling."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.append(REF)
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import yaml  # noqa: E402

from image2video_synthesis_using_cinns_tpu.models.facade import Model  # noqa: E402
from image2video_synthesis_using_cinns_tpu.models.stage1.decoder import Generator  # noqa: E402
from image2video_synthesis_using_cinns_tpu.models.stage2.inn import SupervisedTransformer  # noqa: E402
from image2video_synthesis_using_cinns_tpu.models.stage2.resnet2d import ResnetEncoder  # noqa: E402
from image2video_synthesis_using_cinns_tpu.utils import checkpoint as ckpt_io  # noqa: E402
from image2video_synthesis_using_cinns_tpu.utils import convert as C  # noqa: E402

DEC_CFG = {"channel_factor": 16, "z_dim": 16, "upsample_s": [1, 1],
           "upsample_t": [1, 1], "spectral_norm": True}
ENC_CFG = {"res_type_encoder": "resnet18", "deterministic": False,
           "use_max_pool": False, "z_dim": 16,
           "channels": [64, 32, 32, 32, 32],
           "stride_t": [1, 2, 2, 2], "stride_s": [1, 2, 2, 1]}


def _write_reference_style_dir(root):
    """Create stage1/AE/stage2 dirs the way the reference trainers would."""
    torch.manual_seed(5)
    from stage1_VAE.modules import decoder as ref_dec
    from stage2_cINN.modules.flow_blocks import ConditionalFlow as RefFlow

    s1 = os.path.join(root, "stage1")
    ae = os.path.join(root, "AE")
    s2 = os.path.join(root, "stage2")
    for d in (s1, ae, s2):
        os.makedirs(d, exist_ok=True)

    # --- stage1: decoder ckpt + config_stage1.yaml (plain yaml ≡ OmegaConf)
    tdec = ref_dec.Generator(DEC_CFG)
    torch.save({"epoch": 1, "state_dict": tdec.state_dict()},
               os.path.join(s1, "best_PFVD_GEN.pth"))
    with open(os.path.join(s1, "config_stage1.yaml"), "w") as f:
        yaml.safe_dump({
            "Decoder": DEC_CFG, "Encoder": ENC_CFG,
            "Data": {"img_size": 32, "sequence_length": 9, "dataset": "BAIR"},
            "Training": {"FVD": "FVD"},
        }, f)

    # --- AE: embedder config (our JAX embedder weights — the converter path
    # for AE encoders is covered by the oracle parity test; here we exercise
    # the native-splice branch alongside converted torch files)
    ae_cfg = {"deterministic": False, "in_size": 32, "norm": "in",
              "encoder_type": "resnet18", "z_dim": 16}
    with open(os.path.join(ae, "config_stage2_AE.yaml"), "w") as f:
        yaml.safe_dump({"AE": ae_cfg}, f)
    emb = ResnetEncoder.from_config(ae_cfg)
    emb_vars = jax.jit(emb.init)({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)))
    ckpt_io.save(os.path.join(ae, "Encoder_stage2.msgpack"), {"state_dict": emb_vars})

    # --- stage2: cINN.pth (ConditionalFlow state_dict, like get_model.py:43)
    tflow = RefFlow(in_channels=16, embedding_dim=16, hidden_dim=32,
                    hidden_depth=2, n_flows=4, conditioning_option="none")
    with torch.no_grad():  # initialise lazy actnorms so the ckpt is "trained"
        tflow(torch.randn(8, 16), torch.randn(8, 16))
    torch.save({"state_dict": tflow.state_dict()}, os.path.join(s2, "cINN.pth"))
    with open(os.path.join(s2, "config_stage2.yaml"), "w") as f:
        yaml.safe_dump({
            "Flow": {"n_flows": 4, "flow_hidden_depth": 2,
                     "flow_mid_channels_factor": 2},
            "Conditioning_Model": {"z_dim": 16, "checkpoint_name": "Encoder_stage2",
                                   "model_name": "AE", "model_path": root + "/"},
            "First_stage_model": {"checkpoint_decoder": "best_PFVD_GEN",
                                  "checkpoint_encoder": "best_PFVD_ENC",
                                  "model_name": "stage1", "model_path": root + "/"},
            "Training": {"control": False},
            "Data": {"img_size": 32, "sequence_length": 9, "dataset": "BAIR"},
        }, f)
    return s1, ae, s2, tdec, tflow


def test_reference_checkpoint_dir_migration(tmp_path):
    root = str(tmp_path)
    s1, ae, s2, tdec, tflow = _write_reference_style_dir(root)

    # convert the torch checkpoints next to the originals (what
    # scripts/convert_weights.py does)
    dec_sd = C.load_torch_state_dict(os.path.join(s1, "best_PFVD_GEN.pth"))
    ckpt_io.save(os.path.join(s1, "best_PFVD_GEN.msgpack"),
                 {"state_dict": C.convert_stage1_generator(dec_sd)})

    flow_sd = C.load_torch_state_dict(os.path.join(s2, "cINN.pth"))
    flow_conv = C.convert_conditional_flow(flow_sd, n_flows=4, hidden_depth=2,
                                           in_channels=16, embedding_dim=16)
    ckpt_io.save(os.path.join(s2, "cINN.msgpack"), {"state_dict": {
        "params": {"flow": flow_conv["params"]},
        "buffers": {"flow": flow_conv["buffers"]},
    }})

    # the converted decoder kernel must merge loss-free into our template
    jdec = Generator.from_config(DEC_CFG)
    template = jax.jit(jdec.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 16))
    )
    merged, missing = C.merge_into_template(template, C.convert_stage1_generator(dec_sd))
    # only spectral v/u defaults may remain unfilled for non-spectral convs
    assert all(p[-1] in ("u", "v") or p[0] != "params" for p in missing), missing[:5]

    # facade consumes the converted directory end-to-end
    model = Model(s2 + "/", vid_length=8, seed=0, use_pallas=False)
    x0 = np.random.default_rng(0).uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    vid = np.asarray(model(x0))
    assert vid.shape == (2, 8, 3, 32, 32)
    assert np.isfinite(vid).all()

    # and the decoder output matches torch for an injected latent, proving the
    # loaded weights are the converted ones (not random init)
    z = np.random.default_rng(1).standard_normal((2, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tdec.eval()(torch.from_numpy(x0), torch.from_numpy(z)).numpy()
    ours = np.asarray(model._decode_fn()(
        model.decoder_vars, jnp.asarray(np.transpose(x0, (0, 2, 3, 1))), jnp.asarray(z)
    ))
    np.testing.assert_allclose(
        np.transpose(ours, (0, 1, 4, 2, 3)), ref, rtol=5e-4, atol=5e-4
    )


def test_bigae_full_checkpoint_conversion():
    """Full BigAE .pth (encoder needs torchvision — skipped without it) or,
    lacking torchvision, the decoder+ClassUp sub-conversion: every ClassUp
    linear (main.0/2/4/6) must land in the template."""
    torch.manual_seed(3)
    import torch.nn as tnn

    from image2video_synthesis_using_cinns_tpu.models.stage2.biggan import (
        ClassUp as JClassUp,
    )

    # hand-built oracle with the reference ClassUp structure (AE.py:11-28) —
    # the reference module itself imports torchvision, unavailable here
    tcls = tnn.Sequential()
    mods = [tnn.Linear(16, 2000), tnn.LeakyReLU(),
            tnn.Linear(2000, 2000), tnn.LeakyReLU(),
            tnn.Linear(2000, 2000), tnn.LeakyReLU(),
            tnn.Linear(2000, 1000)]
    main = tnn.Sequential(*mods)

    class _ClassUp(tnn.Module):
        def __init__(self):
            super().__init__()
            self.main = main

        def forward(self, x):
            return torch.softmax(self.main(x), dim=1)

    tcls = _ClassUp().eval()
    sd = {f"decoder.map_to_class_embedding.{k}": v for k, v in
          {k: v.detach().numpy() for k, v in tcls.state_dict().items()}.items()}
    out = C.convert_bigae(sd, {"encoder_type": "resnet18", "norm": "in", "in_size": 64})
    cls_params = out["params"]["decoder_wrap"]["map_to_class_embedding"]
    assert set(cls_params) == {"l0", "l1", "l2", "l3"}

    # numerical parity of the converted ClassUp
    jcls = JClassUp(dim=16, depth=2, hidden_dim=2000, out_dim=1000)
    x = np.random.default_rng(0).standard_normal((2, 16)).astype(np.float32)
    template = jax.jit(jcls.init)({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    variables, _ = C.merge_into_template(template, {"params": cls_params})
    ours = jax.jit(jcls.apply)(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = tcls(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)
