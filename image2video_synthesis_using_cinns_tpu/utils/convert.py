"""torch checkpoint → JAX variables conversion.

Maps every checkpoint format the reference framework produces or consumes
into this framework's flax variable trees:

  * stage-1: ``Generator`` / ``Encoder`` / ``Discriminator`` (3D ResNet) /
    ``NLayerDiscriminator`` (latest/best ``.pth`` dicts),
  * stage-2: ``ConditionalFlow`` (``cINN.pth``), AE ``ResnetEncoder``
    (``encoder_stage2.pth``), ``BigAE``/BigGAN (incl. the custom
    ``weight_bar/_u/_v`` spectral-norm parametrisation),
  * frozen metric backbones: LPIPS ``vgg.pth`` + torchvision VGG16, kinetics
    I3D ``model_rgb.pth``, DT-I3D ``I3D_{16,32}.pth.tar``, FID
    ``pt_inception-2015-12-05``.

Conventions: torch conv weights (out, in, *k) → channels-last kernels
(*k, in, out); Linear (out, in) → (in, out); builtin spectral norm
``weight_orig``/``weight_u`` → kernel + ``spectral/u``; BigGAN
``weight_bar``/``weight_u`` likewise; ActNorm ``loc``/``scale`` (1,C,1,1) →
(C,) and the ``initialized`` buffer → ``actnorm_stats``; BatchNorm running
stats → ``batch_stats`` (or folded ``bn_*`` params for frozen metric nets).

torch is only needed to *read* ``.pth`` files; everything else is numpy.
"""

from __future__ import annotations

import numpy as np


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def t_conv(w: np.ndarray) -> np.ndarray:
    """torch conv weight (out, in, *k) → (*k, in, out)."""
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def t_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def t_vec(w: np.ndarray) -> np.ndarray:
    return np.reshape(w, (-1,))


def load_torch_state_dict(path: str) -> dict:
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload) if isinstance(payload, dict) else payload
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def load_torch_checkpoint(path: str) -> dict:
    """Best-effort load of a torch checkpoint as a plain payload dict (used by
    checkpoint.load fallback). Model-specific conversion goes through the
    ``convert_*`` functions below."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(payload, dict):
        payload = {"state_dict": payload}
    return payload


class _Filler:
    """Accumulates flax-variable leaves and tracks consumed torch keys."""

    def __init__(self, sd: dict):
        self.sd = dict(sd)
        self.used: set[str] = set()
        self.out: dict = {}

    def take(self, key: str) -> np.ndarray:
        self.used.add(key)
        return np.asarray(self.sd[key])

    def put(self, path: str, value: np.ndarray) -> None:
        parts = path.split("/")
        node = self.out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)

    def _spectral_uv(self, flax_path: str, torch_key: str, skip_v: bool = False) -> None:
        self.put(f"spectral/{flax_path}/u", t_vec(self.take(f"{torch_key}.weight_u")))
        if f"{torch_key}.weight_v" in self.sd:
            if skip_v:
                # BigGAN's custom SpectralNorm initialises weight_v at the
                # wrong size and never uses/updates it (generator.py:31-68);
                # consume the key but keep the template's v.
                self.used.add(f"{torch_key}.weight_v")
            else:
                self.put(f"spectral/{flax_path}/v", t_vec(self.take(f"{torch_key}.weight_v")))

    def conv(self, flax_path: str, torch_key: str, spectral: bool = False,
             bar: bool = False, bias: bool = True) -> None:
        if spectral:
            suffix = "weight_bar" if bar else "weight_orig"
            self.put(f"params/{flax_path}/kernel", t_conv(self.take(f"{torch_key}.{suffix}")))
            self._spectral_uv(flax_path, torch_key, skip_v=bar)
        else:
            self.put(f"params/{flax_path}/kernel", t_conv(self.take(f"{torch_key}.weight")))
        if bias and f"{torch_key}.bias" in self.sd:
            self.put(f"params/{flax_path}/bias", self.take(f"{torch_key}.bias"))

    def linear(self, flax_path: str, torch_key: str, spectral: bool = False,
               bar: bool = False, bias: bool = True) -> None:
        if spectral:
            suffix = "weight_bar" if bar else "weight_orig"
            self.put(f"params/{flax_path}/kernel", t_linear(self.take(f"{torch_key}.{suffix}")))
            self._spectral_uv(flax_path, torch_key, skip_v=bar)
        else:
            self.put(f"params/{flax_path}/kernel", t_linear(self.take(f"{torch_key}.weight")))
        if bias and f"{torch_key}.bias" in self.sd:
            self.put(f"params/{flax_path}/bias", self.take(f"{torch_key}.bias"))

    def groupnorm(self, flax_path: str, torch_key: str) -> None:
        self.put(f"params/{flax_path}/scale", self.take(f"{torch_key}.weight"))
        self.put(f"params/{flax_path}/bias", self.take(f"{torch_key}.bias"))

    def batchnorm(self, flax_path: str, torch_key: str, affine: bool = True) -> None:
        if affine:
            self.put(f"params/{flax_path}/scale", self.take(f"{torch_key}.weight"))
            self.put(f"params/{flax_path}/bias", self.take(f"{torch_key}.bias"))
        self.put(f"batch_stats/{flax_path}/mean", self.take(f"{torch_key}.running_mean"))
        self.put(f"batch_stats/{flax_path}/var", self.take(f"{torch_key}.running_var"))
        self.used.add(f"{torch_key}.num_batches_tracked")

    def actnorm(self, flax_path: str, torch_key: str) -> None:
        self.put(f"params/{flax_path}/loc", t_vec(self.take(f"{torch_key}.loc")))
        self.put(f"params/{flax_path}/scale", t_vec(self.take(f"{torch_key}.scale")))
        self.put(
            f"actnorm_stats/{flax_path}/initialized",
            np.asarray(self.take(f"{torch_key}.initialized"), np.uint8).reshape(()),
        )
        # loc_init/scale_init mirrors (unused after init, keep shapes valid)
        self.put(f"actnorm_stats/{flax_path}/loc_init", t_vec(np.asarray(self.sd[f"{torch_key}.loc"])))
        self.put(f"actnorm_stats/{flax_path}/scale_init", t_vec(np.asarray(self.sd[f"{torch_key}.scale"])))

    def frozen_bn(self, flax_path: str, torch_key: str) -> None:
        """BatchNorm folded into bn_* params (frozen metric backbones)."""
        self.put(f"params/{flax_path}/bn_scale", self.take(f"{torch_key}.weight"))
        self.put(f"params/{flax_path}/bn_bias", self.take(f"{torch_key}.bias"))
        self.put(f"params/{flax_path}/bn_mean", self.take(f"{torch_key}.running_mean"))
        self.put(f"params/{flax_path}/bn_var", self.take(f"{torch_key}.running_var"))
        self.used.add(f"{torch_key}.num_batches_tracked")

    def finish(self, strict: bool = False) -> dict:
        leftover = [
            k for k in self.sd
            if k not in self.used and not k.endswith("num_batches_tracked")
        ]
        if leftover and strict:
            raise KeyError(f"unconsumed torch keys: {leftover[:10]} (+{len(leftover)-10 if len(leftover)>10 else 0})")
        self.leftover = leftover
        return self.out


# --------------------------------------------------------------------------
# stage-1 models
# --------------------------------------------------------------------------

def convert_stage1_generator(sd: dict) -> dict:
    f = _Filler(sd)
    f.linear("fc", "fc")
    for name in ("head_0", "g_0", "g_1", "g_2", "g_3", "g_4"):
        # Spade
        f.conv(f"{name}/norm_0/conv", f"{name}.norm_0.conv")
        f.conv(f"{name}/norm_0/conv_gamma", f"{name}.norm_0.conv_gamma")
        f.conv(f"{name}/norm_0/conv_beta", f"{name}.norm_0.conv_beta")
        # ADAIN
        f.linear(f"{name}/norm_1/linear", f"{name}.norm_1.linear")
        # convs (spectral auto-detected per key)
        f.conv(f"{name}/conv_0", f"{name}.conv_0",
               spectral=f"{name}.conv_0.weight_orig" in sd)
        f.conv(f"{name}/conv_1", f"{name}.conv_1",
               spectral=f"{name}.conv_1.weight_orig" in sd)
        if f"{name}.conv_s.weight_orig" in sd or f"{name}.conv_s.weight" in sd:
            f.conv(f"{name}/conv_s", f"{name}.conv_s",
                   spectral=f"{name}.conv_s.weight_orig" in sd, bias=False)
            f.groupnorm(f"{name}/norm_s/bn", f"{name}.norm_s.bn")
    f.conv("conv_img", "conv_img")
    return f.finish()


def _convert_resnet3d_backbone(f: _Filler, prefix: str, layers=(2, 2, 2, 2),
                               bottleneck: bool = False):
    """Spectral-norm presence is auto-detected per conv (weight vs
    weight_orig), which captures the reference's first-block-only spectral
    quirk without re-encoding it here."""
    f.conv(f"{prefix}/conv1", "conv1")
    f.groupnorm(f"{prefix}/norm1", "norm1")
    n_convs = 3 if bottleneck else 2
    for stage in range(4):
        for b in range(layers[stage]):
            tkey = f"layer.{stage}.{b}"
            fkey = f"{prefix}/layer{stage}_block{b}"
            for c in range(1, n_convs + 1):
                spectral = f"{tkey}.conv{c}.weight_orig" in f.sd
                f.conv(f"{fkey}/conv{c}", f"{tkey}.conv{c}", spectral=spectral, bias=False)
                f.groupnorm(f"{fkey}/bn{c}", f"{tkey}.bn{c}")
            ds = f"{tkey}.downsample.0"
            if f"{ds}.weight" in f.sd or f"{ds}.weight_orig" in f.sd:
                f.conv(f"{fkey}/downsample_conv", ds,
                       spectral=f"{ds}.weight_orig" in f.sd, bias=False)
                f.groupnorm(f"{fkey}/downsample_norm", f"{tkey}.downsample.1")


def convert_stage1_encoder(sd: dict, res_type: str = "resnet18") -> dict:
    f = _Filler(sd)
    kind, layers = {"resnet18": ("basic", (2, 2, 2, 2)),
                    "resnet34": ("basic", (3, 4, 6, 3)),
                    "resnet50": ("bottleneck", (3, 4, 6, 3)),
                    "resnet101": ("bottleneck", (3, 4, 23, 3))}[res_type]
    _convert_resnet3d_backbone(f, "backbone", layers, kind == "bottleneck")
    f.conv("conv_mu", "conv_mu")
    f.conv("conv_var", "conv_var")
    return f.finish()


def convert_stage1_discriminator(sd: dict, res_type: str = "resnet18") -> dict:
    f = _Filler(sd)
    kind, layers = {"resnet18": ("basic", (2, 2, 2, 2)),
                    "resnet34": ("basic", (3, 4, 6, 3)),
                    "resnet50": ("bottleneck", (3, 4, 6, 3)),
                    "resnet101": ("bottleneck", (3, 4, 23, 3))}[res_type]
    _convert_resnet3d_backbone(f, "backbone", layers, kind == "bottleneck")
    f.linear("fc", "fc", bias=False)
    return f.finish()


def convert_patch_discriminator(sd: dict, n_layers: int = 3,
                                use_actnorm: bool = True,
                                spectral: bool = True) -> dict:
    f = _Filler(sd)
    idx = 0
    f.conv("conv0", f"main.{idx}", spectral=spectral)
    idx += 2  # conv, lrelu
    for n in range(1, n_layers + 1):
        f.conv(f"conv{n}", f"main.{idx}", spectral=spectral)
        idx += 1
        if use_actnorm:
            f.actnorm(f"norm{n}", f"main.{idx}")
        else:
            f.batchnorm(f"norm{n}/bn", f"main.{idx}")
        idx += 2  # norm, lrelu
    f.conv("conv_out", f"main.{idx}", spectral=spectral)
    return f.finish()


# --------------------------------------------------------------------------
# stage-2 flow
# --------------------------------------------------------------------------

def convert_conditional_flow(sd: dict, n_flows: int, hidden_depth: int = 2,
                             in_channels: int = 64, embedding_dim: int = 64,
                             control: bool = False) -> dict:
    """ConditionalFlow state dict (``cINN.pth``) → stacked blocks + buffers.

    For control-variant 'cond' blocks (fl % 4 != 0) the torch coupling MLPs'
    first layer takes only the embedding; our homogeneous stacked layer takes
    (x_half, embedding) with the x_half masked to zero, so the torch weights
    fill the embedding rows and the x rows are zero.
    """
    half = in_channels // 2
    n_linears = hidden_depth + 2

    stacks: dict = {
        "actnorm": {"loc": [], "scale": []},
        "coupling": {
            name: {f"l{i}": {"w": [], "b": []} for i in range(n_linears)}
            for name in ("s0", "t0", "s1", "t1")
        },
    }
    shuffle_fwd, shuffle_inv = [], []
    init_flags = []

    for fl in range(n_flows):
        base = f"sub_layers.{fl}"
        stacks["actnorm"]["loc"].append(t_vec(np.asarray(sd[f"{base}.norm_layer.loc"])))
        stacks["actnorm"]["scale"].append(t_vec(np.asarray(sd[f"{base}.norm_layer.scale"])))
        init_flags.append(np.asarray(sd.get(f"{base}.norm_layer.initialized", 1)))
        is_cond = control and (fl % 4 != 0)
        for our, (tname, tidx) in {
            "s0": ("s", 0), "s1": ("s", 1), "t0": ("t", 0), "t1": ("t", 1),
        }.items():
            for li in range(n_linears):
                tlin = f"{base}.coupling.{tname}.{tidx}.main.{2 * li}"
                w = t_linear(np.asarray(sd[f"{tlin}.weight"]))
                b = np.asarray(sd[f"{tlin}.bias"])
                if li == 0 and is_cond:
                    # torch first layer: (E, H); ours: (half+E, H)
                    full = np.zeros((half + embedding_dim, w.shape[1]), w.dtype)
                    full[half:] = w
                    w = full
                stacks["coupling"][our][f"l{li}"]["w"].append(w)
                stacks["coupling"][our][f"l{li}"]["b"].append(b)
        shuffle_fwd.append(np.asarray(sd[f"{base}.shuffle.forward_shuffle_idx"]))
        shuffle_inv.append(np.asarray(sd[f"{base}.shuffle.backward_shuffle_idx"]))

    import jax

    blocks = jax.tree.map(lambda *xs: np.stack(xs), *[
        {
            "actnorm": {
                "loc": stacks["actnorm"]["loc"][i],
                "scale": stacks["actnorm"]["scale"][i],
            },
            "coupling": {
                name: {
                    f"l{li}": {
                        "w": stacks["coupling"][name][f"l{li}"]["w"][i],
                        "b": stacks["coupling"][name][f"l{li}"]["b"][i],
                    }
                    for li in range(n_linears)
                }
                for name in ("s0", "t0", "s1", "t1")
            },
        }
        for i in range(n_flows)
    ])
    buffers = {
        "shuffle": {
            "fwd": np.stack(shuffle_fwd).astype(np.int32),
            "inv": np.stack(shuffle_inv).astype(np.int32),
        }
    }
    return {"params": {"blocks": blocks}, "buffers": buffers}


# --------------------------------------------------------------------------
# stage-2 AE ResnetEncoder (torchvision trunk)
# --------------------------------------------------------------------------

TV_BLOCKS = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
             "resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}
TV_BOTTLENECK = {"resnet18": False, "resnet34": False,
                 "resnet50": True, "resnet101": True}


def convert_resnet_encoder(sd: dict, encoder_type: str = "resnet50",
                           norm: str = "in") -> dict:
    f = _Filler(sd)
    layers = TV_BLOCKS[encoder_type]
    bottleneck = TV_BOTTLENECK[encoder_type]

    def norm_map(fkey: str, tkey: str):
        if norm == "bn":
            f.batchnorm(f"{fkey}/bn", tkey)
        elif norm == "an":
            f.actnorm(f"{fkey}/an", tkey)
        # 'in': InstanceNorm2d has no parameters

    f.conv("model/conv1", "model.conv1", bias=False)
    norm_map("model/bn1", "model.bn1")
    for stage in range(4):
        for b in range(layers[stage]):
            tkey = f"model.layer{stage + 1}.{b}"
            fkey = f"model/layer{stage + 1}_block{b}"
            n_convs = 3 if bottleneck else 2
            for c in range(1, n_convs + 1):
                f.conv(f"{fkey}/conv{c}", f"{tkey}.conv{c}", bias=False)
                norm_map(f"{fkey}/bn{c}", f"{tkey}.bn{c}")
            if f"{tkey}.downsample.0.weight" in sd:
                f.conv(f"{fkey}/downsample_conv", f"{tkey}.downsample.0", bias=False)
                norm_map(f"{fkey}/downsample_norm", f"{tkey}.downsample.1")
    f.conv("fc", "model.fc.sub_layers.0")
    return f.finish()


# --------------------------------------------------------------------------
# metric backbones
# --------------------------------------------------------------------------

VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert_vgg16(sd: dict, prefix: str = "") -> dict:
    """torchvision vgg16 ``features`` → VGG16Features params."""
    f = _Filler(sd)
    for our_i, t_i in enumerate(VGG16_CONV_IDX):
        key = f"{prefix}features.{t_i}" if f"{prefix}features.{t_i}.weight" in sd else f"{prefix}{t_i}"
        f.conv(f"conv{our_i}", key)
    return f.finish()


def convert_lpips(lpips_sd: dict, vgg_sd: dict) -> dict:
    """LPIPS = torchvision VGG16 slices + lin layer weights (vgg.pth)."""
    f = _Filler(lpips_sd)
    out: dict = {"params": {}}
    # vgg slices — reference keys: net.slice{1..5}.{idx}.weight
    vgg_params = {}
    slice_ranges = [(1, range(0, 4)), (2, range(4, 9)), (3, range(9, 16)),
                    (4, range(16, 23)), (5, range(23, 30))]
    conv_i = 0
    for s, idxs in slice_ranges:
        for i in idxs:
            wkey = f"net.slice{s}.{i}.weight"
            src = lpips_sd if wkey in lpips_sd else vgg_sd
            if wkey in src:
                vgg_params[f"conv{conv_i}"] = {
                    "kernel": t_conv(np.asarray(src[wkey])),
                    "bias": np.asarray(src[wkey.replace("weight", "bias")]),
                }
                conv_i += 1
            elif i in VGG16_CONV_IDX:
                # fall back to raw torchvision layout
                tv = f"features.{i}"
                vgg_params[f"conv{conv_i}"] = {
                    "kernel": t_conv(np.asarray(vgg_sd[f"{tv}.weight"])),
                    "bias": np.asarray(vgg_sd[f"{tv}.bias"]),
                }
                conv_i += 1
    out["params"]["net"] = vgg_params
    for k in range(5):
        lin_key = f"lin{k}.model.1.weight"
        if lin_key in lpips_sd:
            out["params"][f"lin{k}"] = {"kernel": t_conv(np.asarray(lpips_sd[lin_key]))}
    return out


I3D_BRANCHES = {
    "branch_0": "branch_0", "branch_1a": "branch_1.0", "branch_1b": "branch_1.1",
    "branch_2a": "branch_2.0", "branch_2b": "branch_2.1", "branch_3": "branch_3.1",
}
DT_BRANCHES = {
    "branch_0": "b0", "branch_1a": "b1a", "branch_1b": "b1b",
    "branch_2a": "b2a", "branch_2b": "b2b", "branch_3": "b3b",
}
MIXED_NAMES = ["mixed_3b", "mixed_3c", "mixed_4b", "mixed_4c", "mixed_4d",
               "mixed_4e", "mixed_4f", "mixed_5b", "mixed_5c"]


def convert_i3d_kinetics(sd: dict) -> dict:
    f = _Filler(sd)

    def unit(fkey, tkey, bn=True, bias=False):
        f.conv(f"{fkey}/conv3d", f"{tkey}.conv3d", bias=bias)
        if bn:
            f.frozen_bn(fkey, f"{tkey}.batch3d")

    unit("conv3d_1a_7x7", "conv3d_1a_7x7")
    unit("conv3d_2b_1x1", "conv3d_2b_1x1")
    unit("conv3d_2c_3x3", "conv3d_2c_3x3")
    for m in MIXED_NAMES:
        for ours, theirs in I3D_BRANCHES.items():
            unit(f"{m}/{ours}", f"{m}.{theirs}")
    unit("conv3d_0c_1x1", "conv3d_0c_1x1", bn=False, bias=True)
    return f.finish()


def convert_i3d_dt(sd: dict) -> dict:
    f = _Filler(sd)

    def unit(fkey, tkey, bn=True, bias=False):
        f.conv(f"{fkey}/conv3d", f"{tkey}.conv3d", bias=bias)
        if bn:
            f.frozen_bn(fkey, f"{tkey}.bn")

    unit("conv3d_1a_7x7", "Conv3d_1a_7x7")
    unit("conv3d_2b_1x1", "Conv3d_2b_1x1")
    unit("conv3d_2c_3x3", "Conv3d_2c_3x3")
    for m in MIXED_NAMES:
        t = m.replace("mixed", "Mixed")
        for ours, theirs in DT_BRANCHES.items():
            unit(f"{m}/{ours}", f"{t}.{theirs}")
    unit("conv3d_0c_1x1", "logits", bn=False, bias=True)
    return f.finish()


# TF-hub I3D (the reference's *official* FVD backbone) variable-name map:
# ours → the graph's scope path under "RGB/inception_i3d/"
# (reference metrics/FVD/FVD.py:73 loads hub module i3d-kinetics-400/1;
# scope names come from the published DeepMind kinetics-i3d graph).
TF_I3D_UNITS = {
    "conv3d_1a_7x7": "Conv3d_1a_7x7",
    "conv3d_2b_1x1": "Conv3d_2b_1x1",
    "conv3d_2c_3x3": "Conv3d_2c_3x3",
}
TF_I3D_BRANCHES = {
    "branch_0": "Branch_0/Conv3d_0a_1x1",
    "branch_1a": "Branch_1/Conv3d_0a_1x1",
    "branch_1b": "Branch_1/Conv3d_0b_3x3",
    "branch_2a": "Branch_2/Conv3d_0a_1x1",
    "branch_2b": "Branch_2/Conv3d_0b_3x3",
    "branch_3": "Branch_3/Conv3d_0b_1x1",
}
_TF_I3D_PREFIX = "RGB/inception_i3d/"


def convert_i3d_tf_hub(var_dict: dict) -> dict:
    """Convert the TF-hub ``i3d-kinetics-400/1`` variables to our JAX I3D.

    ``var_dict`` maps TF variable names (with or without the
    ``RGB/inception_i3d/`` prefix, ``:0`` suffixes tolerated) to arrays —
    e.g. ``{v.name: sess.run(v)}`` dumped to an ``.npz`` on any machine
    that can load the hub module. TF conv3d kernels are (D,H,W,In,Out),
    identical to the flax layout, so kernels pass through untransposed; the
    sonnet BatchNorm has no gamma (``scale=False``), so ``bn_scale`` stays
    at ones. Closes the executable half of the official-FVD gap: the
    reference's TF1 protocol is already replicated in ``metrics/fvd.py``,
    and with this converter the exact TF-hub WEIGHTS drop in the moment
    they are available (no egress in this environment), making the
    remaining numerical delta vs the official metric zero by construction.
    """
    sd = {}
    for k, v in var_dict.items():
        k = k.split(":", 1)[0]
        if k.startswith(_TF_I3D_PREFIX):
            k = k[len(_TF_I3D_PREFIX):]
        sd[k] = np.asarray(v)
    f = _Filler(sd)

    def unit(fkey: str, tkey: str, bn: bool = True, bias: bool = False) -> None:
        f.put(f"params/{fkey}/conv3d/kernel", f.take(f"{tkey}/conv_3d/w"))
        if bias:
            f.put(f"params/{fkey}/conv3d/bias", f.take(f"{tkey}/conv_3d/b"))
        if bn:
            c = sd[f"{tkey}/batch_norm/beta"].reshape(-1).shape[0]
            f.put(f"params/{fkey}/bn_bias",
                  f.take(f"{tkey}/batch_norm/beta").reshape(-1))
            f.put(f"params/{fkey}/bn_scale", np.ones((c,), np.float32))
            f.put(f"params/{fkey}/bn_mean",
                  f.take(f"{tkey}/batch_norm/moving_mean").reshape(-1))
            f.put(f"params/{fkey}/bn_var",
                  f.take(f"{tkey}/batch_norm/moving_variance").reshape(-1))

    for ours, theirs in TF_I3D_UNITS.items():
        unit(ours, theirs)
    for m in MIXED_NAMES:
        t = m.replace("mixed", "Mixed")
        for ours, theirs in TF_I3D_BRANCHES.items():
            unit(f"{m}/{ours}", f"{t}/{theirs}")
    unit("conv3d_0c_1x1", "Logits/Conv3d_0c_1x1", bn=False, bias=True)
    return f.finish()


def convert_inception_fid(sd: dict) -> dict:
    f = _Filler(sd)

    def basic(fkey, tkey):
        f.conv(f"{fkey}/conv", f"{tkey}.conv", bias=False)
        f.frozen_bn(fkey, f"{tkey}.bn")

    for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        basic(name, name)

    a_branches = ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                  "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"]
    b_branches = ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"]
    c_branches = ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                  "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                  "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"]
    d_branches = ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
                  "branch7x7x3_3", "branch7x7x3_4"]
    e_branches = ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                  "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                  "branch3x3dbl_3b", "branch_pool"]

    plan = [("Mixed_5b", a_branches), ("Mixed_5c", a_branches), ("Mixed_5d", a_branches),
            ("Mixed_6a", b_branches),
            ("Mixed_6b", c_branches), ("Mixed_6c", c_branches),
            ("Mixed_6d", c_branches), ("Mixed_6e", c_branches),
            ("Mixed_7a", d_branches), ("Mixed_7b", e_branches), ("Mixed_7c", e_branches)]
    for mixed, branches in plan:
        for b in branches:
            basic(f"{mixed}/{b}", f"{mixed}.{b}")
    return f.finish()


# --------------------------------------------------------------------------
# BigGAN / BigAE
# --------------------------------------------------------------------------

def convert_biggan_generator(sd: dict, size: int = 64,
                             skip_g_linear: bool = False) -> dict:
    """``skip_g_linear=True`` reproduces the reference's ImageNet-pretrained
    init recipe (``generator.py:439-455``): ``load_state_dict`` of the plain
    Generator64/128 checkpoint followed by ``update_G_linear`` which swaps in
    a FRESH first linear sized for the variable z split — so the checkpoint's
    G_linear is consumed but not mapped, leaving the template's fresh init."""
    f = _Filler(sd)
    n_blocks = 4 if size == 64 else 5
    f.linear("linear", "linear", bias=False)
    if skip_g_linear:
        for suffix in ("weight_bar", "weight_u", "weight_v", "bias"):
            k = f"G_linear.module.{suffix}"
            if k in f.sd:
                f.used.add(k)
    else:
        f.linear("G_linear", "G_linear.module", spectral=True, bar=True)
    for i in range(n_blocks):
        t = f"GBlock.{i}"
        o = f"GBlock_{i}"
        for cn, tn in (("HyperBN", "HyperBN"), ("HyperBN_1", "HyperBN_1")):
            f.linear(f"{o}/{cn}/gamma_embed", f"{t}.{tn}.gamma_embed.module",
                     spectral=True, bar=True, bias=False)
            f.linear(f"{o}/{cn}/beta_embed", f"{t}.{tn}.beta_embed.module",
                     spectral=True, bar=True, bias=False)
            if f"{t}.{tn}.bn.running_mean" in sd:
                f.batchnorm(f"{o}/{cn}/bn", f"{t}.{tn}.bn", affine=False)
        f.conv(f"{o}/conv0", f"{t}.conv0.module", spectral=True, bar=True)
        f.conv(f"{o}/conv1", f"{t}.conv1.module", spectral=True, bar=True)
        f.conv(f"{o}/conv_sc", f"{t}.conv_sc.module", spectral=True, bar=True)
    # attention only executes for the 128px generator (sa_id=4 with 5 blocks,
    # reference generator.py:286-288); at 64px torch still creates the params
    # but they are dead — consume without mapping so leftover accounting stays
    # clean and the merge template (which has no dead params) matches.
    if size == 128:
        for ours, theirs in (("theta", "theta"), ("phi", "phi"), ("g", "g"),
                             ("o_conv", "o_conv")):
            f.conv(f"attention/{ours}", f"attention.{theirs}.module",
                   spectral=True, bar=True, bias=False)
        if "attention.gamma" in sd:
            f.put("params/attention/gamma", np.reshape(f.take("attention.gamma"), (1,)))
    else:
        for k in list(f.sd):
            if k.startswith("attention."):
                f.used.add(k)
    if "ScaledCrossReplicaBN.running_mean" in sd:
        f.batchnorm("ScaledCrossReplicaBN", "ScaledCrossReplicaBN")
    f.conv("colorize", "colorize.module", spectral=True, bar=True)
    return f.finish()


def convert_bigae(sd: dict, config: dict) -> dict:
    """Full BigAE checkpoint → variables (encoder + decoder wrapper)."""
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    dec_sd = {k[len("decoder.decoder."):]: v for k, v in sd.items()
              if k.startswith("decoder.decoder.")}
    cls_sd = {k[len("decoder.map_to_class_embedding."):]: v for k, v in sd.items()
              if k.startswith("decoder.map_to_class_embedding.")}

    # tolerate partial checkpoints (e.g. encoder-only saves)
    enc = (convert_resnet_encoder(enc_sd, config["encoder_type"], config["norm"])
           if enc_sd else {})
    dec = convert_biggan_generator(dec_sd, config["in_size"]) if dec_sd else {}

    cls_params = {}
    li = 0
    # ClassUp(depth=2): Linear at main indices 0, 2, 4 and the head at 6
    for i in (0, 2, 4, 6):
        if f"main.{i}.weight" in cls_sd:
            cls_params[f"l{li}"] = {
                "kernel": t_linear(np.asarray(cls_sd[f"main.{i}.weight"])),
                "bias": np.asarray(cls_sd[f"main.{i}.bias"]),
            }
            li += 1

    out: dict = {}
    for col in set(enc) | set(dec) | {"params"}:
        out.setdefault(col, {})
        if col in enc:
            out[col]["encoder"] = enc[col]
        dw: dict = {}
        if col in dec:
            dw["decoder"] = dec[col]
        if col == "params" and cls_params:
            dw["map_to_class_embedding"] = cls_params
        if dw:
            out[col]["decoder_wrap"] = dw
    return out


def pretrained_init_biggan(gen_vars: dict, ae_cfg: dict,
                           weights_root: str = "models",
                           sd: dict | None = None) -> dict:
    """``AE.pretrained: true``: initialise the BigGAN decoder from the
    ImageNet checkpoint, exactly like the reference recipe
    (``/root/reference/stage2_cINN/AE/modules/generator.py:444-455``):
    ``load_state_dict(torch.load(biggan_{size}.pth))`` then ``update_G_linear``
    — every decoder weight comes from the checkpoint EXCEPT ``G_linear``,
    which stays at the template's fresh init (sized for the variable z
    split). Encoder + ClassUp also stay fresh (the checkpoint has neither).

    ``sd`` lets callers/tests inject an already-loaded state dict; otherwise
    the file is read from ``{weights_root}/biggan/biggan_{size}.pth`` (the
    fetch_weights registry location — note the reference's own download for
    this file is broken upstream, see docs/WEIGHTS.md).
    """
    import os

    size = int(ae_cfg["in_size"])
    if sd is None:
        path = os.path.join(weights_root, "biggan", f"biggan_{size}.pth")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"AE.pretrained=true but no ImageNet BigGAN checkpoint at "
                f"{path}; see docs/WEIGHTS.md (entry biggan_{size}) for how "
                f"to supply it, or set AE.pretrained: false")
        sd = load_torch_state_dict(path)
    dec = convert_biggan_generator(sd, size, skip_g_linear=True)
    nested = {col: {"decoder_wrap": {"decoder": tree}} for col, tree in dec.items()}
    merged, _missing = merge_into_template(gen_vars, nested)
    return merged


# --------------------------------------------------------------------------
# template merge
# --------------------------------------------------------------------------

def merge_into_template(template: dict, converted: dict, strict: bool = True) -> dict:
    """Overlay converted leaves onto a freshly-initialised variables template.

    Shapes are checked leaf-by-leaf; leaves absent from ``converted`` (e.g.
    spectral ``v`` for very old torch checkpoints) keep their template values.
    """
    import flax

    flat_t = flax.traverse_util.flatten_dict(template)
    flat_c = flax.traverse_util.flatten_dict(converted)
    for path, value in flat_c.items():
        if path not in flat_t:
            if strict:
                raise KeyError(f"converted leaf {'/'.join(path)} not in template")
            continue
        tval = flat_t[path]
        if tuple(np.shape(value)) != tuple(np.shape(tval)):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"converted {np.shape(value)} vs template {np.shape(tval)}"
            )
        flat_t[path] = np.asarray(value, dtype=np.asarray(tval).dtype)
    missing = [p for p in flat_t if p not in flat_c]
    return flax.traverse_util.unflatten_dict(flat_t), missing
