"""Executable parity gate: convert a reference checkpoint directory, run the
sampling path on both stacks, and emit a side-by-side JSON report.

Usage:
  python scripts/parity_report.py --ckpt_dir <stage2 dir> [--bs 6]
      [--seq_length 16] [--seed 249] [--out parity_report.json]
      [--skip_torch] [--data_path <eval frames dir>]

Given a directory in the reference layout — ``config_stage2.yaml`` chaining to
``config_stage1.yaml`` / ``config_stage2_AE.yaml`` exactly like the reference
loader (``/root/reference/get_model.py:11-49``) — this script:

 1. converts any reference torch ``.pth`` checkpoints found through the
    config chain (stage-1 decoder/encoder, ``cINN.pth``, AE embedder) into
    native ``.msgpack`` files next to the originals (skipped when already
    converted),
 2. runs our facade sampling at the given seed and records throughput and
    output statistics,
 3. when torch is importable, instantiates the *reference* modules that need
    no torchvision — ``stage1_VAE/modules/decoder.py`` and
    ``stage2_cINN/modules/flow_blocks.py`` — from the same ``.pth`` files and
    compares, at the SAME injected ν and embedding: the flow inverse output
    and the decoded frames (the embedder itself is covered by the torch
    oracle tests in tests/test_torch_parity2.py),
 4. optionally scores FVD of the generated clips against frames from
    ``--data_path`` when the I3D weights are converted (``models/PI3D``),
 5. writes a JSON report with per-component max/mean abs diff and pass flags
    — turning BASELINE.md's measurement plan into a command.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = os.environ.get("I2V_REFERENCE_PATH", "/root/reference")

FLOW_TOL = 5e-4   # fp32 flow inverse: 20 sequential blocks
FRAME_TOL = 5e-3  # decoded frames after tanh; conv stacks accumulate fp error


def _join(*parts):
    return os.path.join(*[p for p in parts if p])


# --------------------------------------------------------------------------
# 1. conversion
# --------------------------------------------------------------------------
def convert_checkpoint_dir(stage2_dir: str) -> dict:
    """Convert every torch checkpoint reachable from config_stage2.yaml into
    a native msgpack next to it. Returns {written: [...], found: {...}}."""
    from image2video_synthesis_using_cinns_tpu import config as cfg
    from image2video_synthesis_using_cinns_tpu.utils import checkpoint as ckpt_io
    from image2video_synthesis_using_cinns_tpu.utils import convert as C

    opt = cfg.load(_join(stage2_dir, "config_stage2.yaml"))
    s1_dir = _join(opt.First_stage_model["model_path"],
                   opt.First_stage_model["model_name"])
    cfg1 = cfg.load(_join(s1_dir, "config_stage1.yaml"))
    ae_dir = _join(opt.Conditioning_Model["model_path"],
                   opt.Conditioning_Model["model_name"])

    written, found = [], {}

    def _torch_file(base):
        for ext in (".pth", ".pth.tar"):
            if os.path.exists(base + ext):
                return base + ext
        return None

    def _convert(base, fn, payload_key="state_dict"):
        src = _torch_file(base)
        if src is None:
            return None
        found[os.path.basename(base)] = src
        dst = base + ".msgpack"
        if os.path.exists(dst):
            return dst
        sd = C.load_torch_state_dict(src)
        ckpt_io.save(dst, {payload_key: fn(sd)})
        written.append(dst)
        return dst

    # stage-1 decoder (+ encoder when present, used by the transfer path)
    _convert(_join(s1_dir, opt.First_stage_model["checkpoint_decoder"]),
             C.convert_stage1_generator)
    enc_name = opt.First_stage_model.get("checkpoint_encoder")
    if enc_name:
        _convert(
            _join(s1_dir, enc_name),
            lambda sd: C.convert_stage1_encoder(
                sd, cfg1.Encoder.get("res_type_encoder", "resnet18")
            ),
        )

    # cINN: ConditionalFlow state dict (reference get_model.py:43)
    control = bool(opt.Training.get("control", False))
    emb_dim = opt.Conditioning_Model["z_dim"] + (30 if control else 0)

    def _cinn(sd):
        flow = C.convert_conditional_flow(
            sd,
            n_flows=opt.Flow["n_flows"],
            hidden_depth=opt.Flow["flow_hidden_depth"],
            in_channels=cfg1.Decoder["z_dim"],
            embedding_dim=emb_dim,
            control=control,
        )
        return {"params": {"flow": flow["params"]},
                "buffers": {"flow": flow["buffers"]}}

    _convert(_join(stage2_dir, "cINN"), _cinn)

    # AE embedder (saved as network.encoder.state_dict(), AE/main.py:152-155)
    ae_cfg_path = _join(ae_dir, "config_stage2_AE.yaml")
    if os.path.exists(ae_cfg_path):
        ae = cfg.load(ae_cfg_path).AE
        _convert(
            _join(ae_dir, opt.Conditioning_Model.get("checkpoint_name",
                                                     "Encoder_stage2")),
            lambda sd: C.convert_resnet_encoder(
                sd, ae.get("encoder_type", "resnet50"), ae.get("norm", "in")
            ),
        )

    return {"written": written, "found": found}


# --------------------------------------------------------------------------
# 2/3. run both stacks
# --------------------------------------------------------------------------
def run_report(stage2_dir: str, bs: int, seq_length: int, seed: int,
               skip_torch: bool = False, data_path: str | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from image2video_synthesis_using_cinns_tpu.models.facade import Model
    from image2video_synthesis_using_cinns_tpu.utils.seed import set_seed

    report: dict = {"ckpt_dir": stage2_dir, "seed": seed, "bs": bs,
                    "seq_length": seq_length}
    report["conversion"] = convert_checkpoint_dir(stage2_dir)

    set_seed(seed)
    # use_pallas=False: the parity gate compares the exact fp32 scan flow;
    # the Pallas kernel streams weights in bf16 (serving fast path) and is
    # numerics-tested separately (tests/test_pallas_flow.py)
    model = Model(stage2_dir if stage2_dir.endswith("/") else stage2_dir + "/",
                  vid_length=seq_length, seed=seed, use_pallas=False)
    img = 64
    if "Data" in model.config_stage1:
        img = model.config_stage1.Data.get("img_size", 64)

    rng = np.random.default_rng(seed)
    x0 = rng.uniform(-1, 1, (bs, 3, img, img)).astype(np.float32)
    nu = rng.standard_normal((bs, model.z_dim)).astype(np.float32)

    # ---- our stack: end-to-end sample + throughput ----------------------
    vid = np.asarray(model.forward(x0, residual=nu))  # compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(model.forward(x0, residual=nu))  # host fetch barrier
    dt = time.perf_counter() - t0
    frames = reps * bs * seq_length
    report["ours"] = {
        "output_shape": list(vid.shape),
        "finite": bool(np.isfinite(vid).all()),
        "range": [float(vid.min()), float(vid.max())],
        "frames_per_sec": frames / dt,
        "deterministic": bool(
            np.array_equal(vid, np.asarray(model.forward(x0, residual=nu)))
        ),
    }

    # shared intermediates for the component parity
    x0_cl = jnp.asarray(np.transpose(x0, (0, 2, 3, 1)))
    emb = np.asarray(
        model.flow.apply(model.flow_vars, [x0_cl],
                         method=lambda m, cond: m.embed(cond))
    )
    z_ours = np.asarray(
        model.flow.apply(
            model.flow_vars, jnp.asarray(nu), jnp.asarray(emb),
            method=lambda m, x, e: m.flow(x, e, reverse=True),
        )
    ).reshape(bs, -1)
    frames_ours = np.asarray(
        model._decode_fn()(model.decoder_vars, x0_cl, jnp.asarray(z_ours))
    )

    # ---- torch reference components -------------------------------------
    if skip_torch:
        report["torch_ref"] = {"available": False, "reason": "skipped by flag"}
        return report
    try:
        torch_side = _run_torch_components(
            stage2_dir, x0, nu, emb, z_ours, seq_length
        )
    except Exception as e:  # torch or reference sources unavailable
        report["torch_ref"] = {"available": False, "reason": repr(e)}
        torch_side = None
    if torch_side is not None:
        report["torch_ref"] = {"available": True}
        z_ref, frames_ref = torch_side
        fd = np.abs(z_ours - z_ref)
        report["parity_flow_inverse"] = {
            "max_abs_diff": float(fd.max()),
            "mean_abs_diff": float(fd.mean()),
            "tol": FLOW_TOL,
            "pass": bool(fd.max() < FLOW_TOL),
        }
        ours_t = np.transpose(frames_ours, (0, 1, 4, 2, 3))
        dd = np.abs(ours_t - frames_ref)
        report["parity_decoder"] = {
            "max_abs_diff": float(dd.max()),
            "mean_abs_diff": float(dd.mean()),
            "psnr": float(-10 * np.log10(np.mean(dd**2) + 1e-12)),
            "tol": FRAME_TOL,
            "pass": bool(dd.max() < FRAME_TOL),
        }
        report["pass"] = bool(
            report["parity_flow_inverse"]["pass"] and report["parity_decoder"]["pass"]
        )

    # ---- optional FVD against real frames --------------------------------
    if data_path:
        report["fvd"] = _maybe_fvd(model, x0, data_path, seq_length)
    return report


def _run_torch_components(stage2_dir, x0, nu, emb, z_ours, seq_length):
    """Reference decoder + ConditionalFlow from the same .pth files (neither
    needs torchvision). Returns (z_ref, frames_ref) in torch layouts."""
    import torch

    if REF not in sys.path:
        sys.path.append(REF)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    from stage1_VAE.modules import decoder as ref_dec
    from stage2_cINN.modules.flow_blocks import ConditionalFlow as RefFlow

    from image2video_synthesis_using_cinns_tpu import config as cfg

    # plain-yaml configs (our loader reads the same files OmegaConf would)
    opt = cfg.load(_join(stage2_dir, "config_stage2.yaml"))
    s1_dir = _join(opt.First_stage_model["model_path"],
                   opt.First_stage_model["model_name"])
    cfg1 = cfg.load(_join(s1_dir, "config_stage1.yaml"))

    tdec = ref_dec.Generator(cfg1.Decoder)
    dec_pth = _join(s1_dir, opt.First_stage_model["checkpoint_decoder"] + ".pth")
    tdec.load_state_dict(torch.load(dec_pth, map_location="cpu")["state_dict"])
    tdec.eval()

    z_dim = cfg1.Decoder["z_dim"]
    control = bool(opt.Training.get("control", False))
    emb_dim = opt.Conditioning_Model["z_dim"] + (30 if control else 0)
    tflow = RefFlow(
        in_channels=z_dim,
        embedding_dim=emb_dim,
        hidden_dim=z_dim * opt.Flow["flow_mid_channels_factor"],
        hidden_depth=opt.Flow["flow_hidden_depth"],
        n_flows=opt.Flow["n_flows"],
        conditioning_option="none",
    )
    tflow.load_state_dict(
        torch.load(_join(stage2_dir, "cINN.pth"), map_location="cpu")["state_dict"]
    )
    tflow.eval()

    with torch.no_grad():
        z_ref = tflow(torch.from_numpy(nu), torch.from_numpy(emb), reverse=True)
        z_ref = z_ref.reshape(nu.shape[0], -1).numpy()
        frames_ref = tdec(
            torch.from_numpy(x0), torch.from_numpy(z_ours)
        ).numpy()
    return z_ref, frames_ref


def _maybe_fvd(model, x0, data_path, seq_length):
    try:
        from image2video_synthesis_using_cinns_tpu.metrics import fvd as fvd_mod

        i3d = fvd_mod.load_model("kinetics")
    except FileNotFoundError:
        return {"skipped": "no converted I3D weights under models/PI3D"}
    import glob as _glob

    import jax

    from image2video_synthesis_using_cinns_tpu.data.loader import _imread_rgb
    from image2video_synthesis_using_cinns_tpu.ops.resize import resize_bilinear

    files = sorted(
        sum((_glob.glob(os.path.join(data_path, "**", f"*.{e}"), recursive=True)
             for e in ("png", "jpg", "jpeg")), [])
    )
    if len(files) < seq_length * 2:
        return {"skipped": f"not enough frames under {data_path}"}
    import jax.numpy as jnp

    n_clips = min(16, len(files) // seq_length)
    frames = np.stack([_imread_rgb(f) for f in
                       files[: n_clips * seq_length]], 0)
    img = x0.shape[-1]
    real = np.asarray(jax.jit(lambda f: resize_bilinear(
        f.astype(jnp.float32) / 127.5 - 1.0, (img, img)))(jnp.asarray(frames)))
    real = real.reshape(n_clips, seq_length, img, img, 3)
    gen = np.asarray(model.forward(
        np.transpose(real[:, 0], (0, 3, 1, 2))))  # (B,T,C,H,W)
    gen = np.transpose(gen, (0, 1, 3, 4, 2))
    score = fvd_mod.calculate_FVD(i3d, gen, real[:, 1:1 + gen.shape[1]],
                                  batch_size=min(8, n_clips))
    return {"FVD": float(score), "n_clips": n_clips}


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt_dir", required=True,
                   help="stage-2 checkpoint dir (contains config_stage2.yaml)")
    p.add_argument("--bs", type=int, default=6)
    p.add_argument("--seq_length", type=int, default=16)
    p.add_argument("--seed", type=int, default=249)
    p.add_argument("--out", default="parity_report.json")
    p.add_argument("--skip_torch", action="store_true")
    p.add_argument("--data_path", default=None,
                   help="frames dir for an optional FVD score")
    args = p.parse_args(argv)

    report = run_report(args.ckpt_dir, args.bs, args.seq_length, args.seed,
                        skip_torch=args.skip_torch, data_path=args.data_path)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
