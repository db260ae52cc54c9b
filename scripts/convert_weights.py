"""Convert reference torch checkpoints into native msgpack checkpoints.

Usage examples (paths mirror the reference's manual-download layout):

  # whole pretrained model directory: follows the config_stage2.yaml chain
  # and converts the stage-1 decoder/encoder, cINN and AE embedder in place
  python scripts/convert_weights.py model_dir --src ./torch_models/bair/stage2

  # metric backbones
  python scripts/convert_weights.py i3d      --src ./models/PI3D/model_rgb.pth
  python scripts/convert_weights.py dti3d16  --src ./models/DTI3D/length16/I3D_16.pth.tar
  python scripts/convert_weights.py dti3d32  --src ./models/DTI3D/length32/I3D_32.pth.tar
  python scripts/convert_weights.py fid      --src ./pt_inception-2015-12-05-6726825d.pth
  python scripts/convert_weights.py lpips    --src ./vgg.pth --vgg ./vgg16-397923af.pth

  # the OFFICIAL TF-hub FVD backbone (i3d-kinetics-400/1): dump its
  # variables to an .npz anywhere TF can load the hub module
  #   np.savez("tf_i3d.npz", **{v.name: sess.run(v) for v in tf.global_variables()})
  # then convert here (replaces models/PI3D/model_rgb.msgpack, making the
  # FVD backbone weight-identical to the reference's official metric):
  python scripts/convert_weights.py i3d_tf   --src ./tf_i3d.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from image2video_synthesis_using_cinns_tpu.utils import checkpoint as ckpt_io  # noqa: E402
from image2video_synthesis_using_cinns_tpu.utils import convert as C  # noqa: E402


_REGISTRY_NAME = {  # kind → fetch_weights registry entry (for integrity checks)
    "i3d": "pi3d", "dti3d16": "dti3d16", "dti3d32": "dti3d32",
    "fid": "fid", "lpips": "lpips", "i3d_tf": "i3d_tf_hub",
}


def _verify_source(kind: str, src: str) -> None:
    """md5/sha256-check known torch sources even when supplied manually
    (reference auto-download does this for LPIPS, ckpt_util.py:36-46)."""
    name = _REGISTRY_NAME.get(kind)
    if name is None:
        return
    import fetch_weights

    fetch_weights.verify(name, src)


def _verify_source_vgg16(src: str) -> None:
    import fetch_weights

    fetch_weights.verify("vgg16", src)


def _save(dst: str, variables: dict) -> None:
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    ckpt_io.save(dst, {"state_dict": variables})
    print("wrote", dst)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["model_dir",
                                    "i3d", "i3d_tf", "dti3d16", "dti3d32", "fid", "lpips",
                                    "generator", "encoder", "disc_t", "disc_s",
                                    "cinn", "ae_encoder", "bigae"])
    p.add_argument("--src", required=True)
    p.add_argument("--dst", default=None)
    p.add_argument("--vgg", default=None, help="torchvision vgg16 .pth (for lpips)")
    p.add_argument("--config", default=None, help="model config yaml when needed")
    p.add_argument("--n_flows", type=int, default=20)
    p.add_argument("--z_dim", type=int, default=64)
    p.add_argument("--embedding_dim", type=int, default=64)
    p.add_argument("--control", action="store_true")
    args = p.parse_args()

    if args.kind == "model_dir":
        # whole checkpoint dir: follow the config_stage2.yaml chain and
        # convert everything reachable, in place (parity_report.py:
        # convert_checkpoint_dir)
        from parity_report import convert_checkpoint_dir

        out = convert_checkpoint_dir(args.src)
        for w in out["written"]:
            print("wrote", w)
        if not out["written"]:
            print("nothing to convert (already converted or no .pth found)")
        return

    _verify_source(args.kind, args.src)
    if args.kind == "lpips" and args.vgg:
        _verify_source_vgg16(args.vgg)

    if args.kind == "i3d_tf":
        import numpy as np

        with np.load(args.src) as z:
            var_dict = {k: z[k] for k in z.files}
        dst = args.dst or "models/PI3D/model_rgb.msgpack"
        _save(dst, C.convert_i3d_tf_hub(var_dict))
        return

    sd = C.load_torch_state_dict(args.src)
    defaults = {
        "i3d": "models/PI3D/model_rgb.msgpack",
        "dti3d16": "models/DTI3D/length16/I3D_16.msgpack",
        "dti3d32": "models/DTI3D/length32/I3D_32.msgpack",
        "fid": "models/FID/pt_inception.msgpack",
        "lpips": "models/lpips/vgg_lpips.msgpack",
    }
    dst = args.dst or defaults.get(args.kind) or (os.path.splitext(args.src)[0] + ".msgpack")

    if args.kind == "i3d":
        out = C.convert_i3d_kinetics(sd)
    elif args.kind in ("dti3d16", "dti3d32"):
        out = C.convert_i3d_dt(sd)
    elif args.kind == "fid":
        out = C.convert_inception_fid(sd)
    elif args.kind == "lpips":
        vgg_sd = C.load_torch_state_dict(args.vgg) if args.vgg else {}
        out = C.convert_lpips(sd, vgg_sd)
    elif args.kind == "generator":
        out = C.convert_stage1_generator(sd)
    elif args.kind == "encoder":
        out = C.convert_stage1_encoder(sd)
    elif args.kind == "disc_t":
        out = C.convert_stage1_discriminator(sd)
    elif args.kind == "disc_s":
        out = C.convert_patch_discriminator(sd)
    elif args.kind == "cinn":
        flow = C.convert_conditional_flow(
            sd, n_flows=args.n_flows, in_channels=args.z_dim,
            embedding_dim=args.embedding_dim, control=args.control,
        )
        # nest under the SupervisedTransformer layout the facade loads; the
        # frozen embedder is spliced separately from the AE checkpoint.
        out = {
            "params": {"flow": flow["params"]},
            "buffers": {"flow": flow["buffers"]},
        }
    elif args.kind == "ae_encoder":
        from image2video_synthesis_using_cinns_tpu import config as cfg

        ae = cfg.load(args.config).AE if args.config else {"encoder_type": "resnet50", "norm": "in"}
        out = C.convert_resnet_encoder(sd, ae["encoder_type"], ae["norm"])
    elif args.kind == "bigae":
        from image2video_synthesis_using_cinns_tpu import config as cfg

        ae = cfg.load(args.config).AE
        out = C.convert_bigae(sd, dict(ae))
    _save(dst, out)


if __name__ == "__main__":
    main()
