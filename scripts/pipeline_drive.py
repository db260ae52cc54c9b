"""End-to-end pipeline drive: the reference README workflow from empty disk.

Reproduces the reference's core user journey on synthetic data with NO
fabricated checkpoint directories anywhere in the chain:

  1. train the stage-1 video VAE          (reference stage1_VAE/main.py)
  2. train the stage-2 conditioning AE    (stage2_cINN/AE/main.py)
  3. train the stage-2 cINN pointing its config at the REAL stage-1 + AE
     output dirs                          (stage2_cINN/main.py:77-88)
  4. load the facade from the REAL cINN output dir
                                          (get_model.py:15-45)
  5. generate a GIF through the generate_samples CLI
                                          (generate_samples.py:32-63)
  6. run the eval-CLI generation protocol on the trained artifacts
                                          (eval_synthesis_quality.py:27-58)

Every inter-stage contract — file names, config chaining, checkpoint keys —
is exercised exactly as WRITTEN BY the trainers and READ BY the consumers
(best_PFVD_{GEN,ENC}.msgpack + config_stage1.yaml → stage-2 trainers;
Encoder_stage2.msgpack + config_stage2_AE.yaml → cINN embedder;
cINN.msgpack + config_stage2.yaml → Model). The slow-marked test
``tests/test_pipeline.py`` drives this on CPU; run the script standalone for
a bigger preset or on the TPU:

    python scripts/pipeline_drive.py --root /tmp/pipe --steps 3
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def run_pipeline(
    root: str,
    preset: str = "tiny",
    steps: int = 3,
    n_videos: int = 6,
    bs: int = 3,
    vid_length: int | None = None,
) -> dict:
    """Run the full chain under ``root``; returns the artifact paths.

    Raises (loudly) if any trainer-written artifact is missing where the next
    consumer looks for it — that is the contract this drive gates.
    """
    import numpy as np

    from image2video_synthesis_using_cinns_tpu import config as cfg
    from image2video_synthesis_using_cinns_tpu.testing import (
        PRESETS,
        make_bair_data_dir,
        stage1_config,
        stage2_ae_config,
        stage2_config,
    )
    from image2video_synthesis_using_cinns_tpu.train import stage1, stage2, stage2_ae

    P = PRESETS[preset]
    data_dir = make_bair_data_dir(
        os.path.join(root, "data") + "/", n_videos=n_videos,
        img=P["img_size"], modes=("train", "eval", "test"),
    )
    out: dict = {"data": data_dir}

    def _common(opt):
        opt.Data["data_path"] = data_dir
        opt.Training["bs"] = bs
        opt.Training["bs_eval"] = bs
        opt.Training["workers"] = 2
        opt.Training["n_epochs"] = 1
        return opt

    # ---- 1. stage-1 video VAE ------------------------------------------
    opt1 = _common(stage1_config(P))
    opt1.Training["save_path"] = os.path.join(root, "stage1_runs")
    s1 = stage1.main(opt1, max_steps=steps, eval_fvd=False)["save_path"]
    for f in ("config_stage1.yaml", "best_PFVD_GEN.msgpack", "best_PFVD_ENC.msgpack"):
        assert os.path.exists(os.path.join(s1, f)), f"stage-1 did not write {f}"
    out["stage1"] = s1

    # ---- 2. stage-2 conditioning AE ------------------------------------
    opt_ae = _common(stage2_ae_config(P))
    if P["img_size"] < 64:
        # the BigGAN decoder exists at 64/128 px only (reference
        # generator.py:248,342) and needs z_dim > 10*n_blocks for its
        # variable-dim split — train the AE at the smallest real size; the
        # embedder the cINN consumes is size-agnostic (adaptive pooling)
        opt_ae.AE.update(in_size=64, z_dim=64, chn=8, encoder_type="resnet18")
        opt_ae.Data["img_size"] = 64
    opt_ae.Training["save_path"] = os.path.join(root, "ae_runs")
    ae = stage2_ae.main(opt_ae, max_steps=steps)["save_path"]
    for f in ("config_stage2_AE.yaml", "Encoder_stage2.msgpack"):
        assert os.path.exists(os.path.join(ae, f)), f"AE trainer did not write {f}"
    out["ae"] = ae

    # ---- 3. stage-2 cINN from the REAL dirs ----------------------------
    opt2 = _common(stage2_config(P, s1, ae))
    # the conditioning dim must agree with the trained AE (the embedder arch
    # itself is chained from the AE run's config_stage2_AE.yaml)
    opt2.Conditioning_Model["z_dim"] = opt_ae.AE["z_dim"]
    opt2.Training["save_path"] = os.path.join(root, "stage2_runs")
    s2 = stage2.main(opt2, max_steps=steps, eval_fvd=False)["save_path"]
    for f in ("config_stage2.yaml", "cINN.msgpack", "cINN_latest.msgpack"):
        assert os.path.exists(os.path.join(s2, f)), f"cINN trainer did not write {f}"
    out["stage2"] = s2

    # ---- 4.+5. generate_samples CLI from the trained dir ---------------
    # the CLI reads ./assets/GT_samples/<ds>/ and writes ./assets/results/
    # relative to cwd (reference generate_samples.py:25-31,56-61)
    T = vid_length or P["seq_length"] - 1
    gt_dir = os.path.join(root, "assets", "GT_samples", "bair")
    os.makedirs(gt_dir, exist_ok=True)
    for k, src in enumerate(
        sorted(glob.glob(os.path.join(data_dir, "test", "traj_0", "*", "0.png")))[:4]
    ):
        import shutil

        shutil.copy(src, os.path.join(gt_dir, f"start_{k}.png"))

    import generate_samples as gen_cli

    cwd = os.getcwd()
    argv = sys.argv
    try:
        os.chdir(root)
        sys.argv = [
            "generate_samples.py", "-dataset", "bair",
            "-ckpt_path", s2 + "/", "-seq_length", str(T), "-bs", str(bs),
        ]
        gen_cli.main()
    finally:
        os.chdir(cwd)
        sys.argv = argv
    gif = os.path.join(root, "assets", "results", "bair", "results.gif")
    assert os.path.exists(gif), "generate_samples CLI wrote no GIF"
    out["gif"] = gif

    # ---- 6. eval-CLI generation protocol --------------------------------
    import eval_synthesis_quality as eval_cli

    try:
        sys.argv = [
            "eval_synthesis_quality.py", "-gpu", "0", "-dataset", "bair",
            "-ckpt_path", s2 + "/", "-data_path", data_dir,
            "-seq_length", str(T), "-bs", str(bs),
        ]
        eval_cli.main()
    finally:
        sys.argv = argv

    # facade sanity straight from the trained dir (shape + range)
    from image2video_synthesis_using_cinns_tpu.models.facade import Model

    model = Model(s2 + "/", vid_length=T, seed=0)
    x0 = np.random.default_rng(0).uniform(
        -1, 1, (2, 3, P["img_size"], P["img_size"])
    ).astype(np.float32)
    video = np.asarray(model(x0))
    assert video.shape == (2, T, 3, P["img_size"], P["img_size"])
    assert np.isfinite(video).all() and np.abs(video).max() <= 1.0 + 1e-5
    out["video_shape"] = video.shape
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True, help="working directory")
    ap.add_argument("--preset", default="tiny", help="testing.PRESETS key")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--n-videos", type=int, default=6)
    ap.add_argument("--bs", type=int, default=3)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.root, exist_ok=True)
    out = run_pipeline(
        args.root, preset=args.preset, steps=args.steps,
        n_videos=args.n_videos, bs=args.bs,
    )
    print({k: str(v) for k, v in out.items()})
    print("PIPELINE OK")


if __name__ == "__main__":
    main()
