"""Parity for the 2-D backbones whose reference modules need torchvision
(absent here): the oracles are hand-built torch replicas of the torchvision
architectures the reference wraps (resnet18 trunk with InstanceNorm, VGG16
features), weight-converted and compared exactly like test_torch_parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image2video_synthesis_using_cinns_tpu.utils import convert as C  # noqa: E402

TOL = dict(rtol=5e-4, atol=5e-4)


def sd_np(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


class TorchBasicBlock(tnn.Module):
    """torchvision BasicBlock with InstanceNorm2d (affine=False) norm."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.InstanceNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.InstanceNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.InstanceNorm2d(cout)
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idn)


class TorchResNet18IN(tnn.Module):
    """torchvision resnet18 trunk (through avgpool) with InstanceNorm and the
    reference's DenseEncoderLayer head (1x1 conv to 2*z)."""

    def __init__(self, z=32):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.InstanceNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        layers = []
        cin = 64
        for planes, stride in ((64, 1), (128, 2), (256, 2), (512, 2)):
            layers.append(TorchBasicBlock(cin, planes, stride))
            layers.append(TorchBasicBlock(planes, planes, 1))
            cin = planes
        self.layers = tnn.Sequential(*layers)
        self.head = tnn.Conv2d(512, 2 * z, 1)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        x = self.layers(x)
        x = torch.mean(x, dim=(2, 3), keepdim=True)
        return self.head(x).flatten(1)


def _resnet_sd_to_tv_names(sd):
    """Rename our oracle's keys to the torchvision layout the converter maps."""
    out = {}
    for k, v in sd.items():
        if k.startswith("layers."):
            idx = int(k.split(".")[1])
            stage, block = idx // 2 + 1, idx % 2
            rest = k.split(".", 2)[2]
            out[f"model.layer{stage}.{block}.{rest}"] = v
        elif k.startswith("head."):
            out[k.replace("head.", "model.fc.sub_layers.0.")] = v
        else:
            out[f"model.{k}"] = v
    return out


def test_resnet2d_encoder_parity_oracle():
    torch.manual_seed(11)
    from image2video_synthesis_using_cinns_tpu.models.stage2.resnet2d import (
        ResnetEncoder,
    )

    tmodel = TorchResNet18IN(z=32).eval()
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    jmodel = ResnetEncoder(z_dim=32, encoder_type="resnet18", norm="in")
    x_cl = np.transpose(x, (0, 2, 3, 1))
    template = jax.jit(jmodel.init)({"params": jax.random.PRNGKey(0)}, jnp.asarray(x_cl))
    converted = C.convert_resnet_encoder(
        _resnet_sd_to_tv_names(sd_np(tmodel)), "resnet18", "in"
    )
    variables, _ = C.merge_into_template(template, converted)
    out = jax.jit(jmodel.apply)(variables, jnp.asarray(x_cl))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]


def test_vgg16_features_parity_oracle():
    torch.manual_seed(12)
    from image2video_synthesis_using_cinns_tpu.models.backbones.vgg16 import (
        VGG16Features,
    )

    # torchvision vgg16 'features' trunk (indices match cfg 'D')
    mods, cin = [], 3
    for v in VGG_CFG:
        if v == "M":
            mods.append(tnn.MaxPool2d(2, 2))
        else:
            mods += [tnn.Conv2d(cin, v, 3, padding=1), tnn.ReLU()]
            cin = v
    features = tnn.Sequential(*mods).eval()

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
    # collect activations after each stage's final relu
    relu_after = {3: 0, 8: 1, 15: 2, 22: 3, 29: 4}
    ref_outs = [None] * 5
    h = torch.from_numpy(x)
    with torch.no_grad():
        for i, m in enumerate(features):
            h = m(h)
            if i in relu_after:
                ref_outs[relu_after[i]] = h.numpy()

    sd = {f"features.{k}": v for k, v in sd_np(features).items()}
    jmodel = VGG16Features()
    x_cl = np.transpose(x, (0, 2, 3, 1))
    template = jax.jit(jmodel.init)({"params": jax.random.PRNGKey(0)}, jnp.asarray(x_cl))
    converted = C.convert_vgg16(sd)
    variables, _ = C.merge_into_template(template, converted)
    outs = jax.jit(jmodel.apply)(variables, jnp.asarray(x_cl))
    for ours, theirs in zip(outs, ref_outs):
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), theirs, **TOL
        )


def test_biggan128_generator_parity():
    """128px variable-dim generator — exercises the SelfAttention block (which
    only fires at 128px) and the (z-100, 20x5) split, against the reference
    torch module at full width."""
    import sys
    REF = "/root/reference"
    if REF not in sys.path:
        sys.path.append(REF)
    torch.manual_seed(77)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from stage2_cINN.AE.modules.generator import load_variable_latsize_generator

    from image2video_synthesis_using_cinns_tpu.models.stage2.biggan import (
        VariableDimGenerator,
    )

    tmodel = load_variable_latsize_generator(
        128, 128, pretrained=False, use_actnorm=False, n_class=1000
    ).eval()

    rng = np.random.default_rng(7)
    z = rng.standard_normal((1, 128)).astype(np.float32)
    emb = rng.standard_normal((1, 1000)).astype(np.float32)
    with torch.no_grad():
        tmodel(torch.from_numpy(z), torch.from_numpy(emb))  # u,v warmup
        ref = tmodel(torch.from_numpy(z), torch.from_numpy(emb)).numpy()

    jmodel = VariableDimGenerator(size=128, z_dim=128, chn=96)
    template = jax.jit(jmodel.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(z), jnp.asarray(emb)
    )
    converted = C.convert_biggan_generator(sd_np(tmodel), size=128)
    variables, _ = C.merge_into_template(template, converted)
    out = jax.jit(jmodel.apply)(variables, jnp.asarray(z), jnp.asarray(emb))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, rtol=2e-3, atol=2e-3
    )
