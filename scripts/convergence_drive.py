"""Long-horizon convergence drives at the FULL reference sizes (round-4 #3).

Drives the real scanned trainer steps for O(10^3) optimisation steps on
synthetic moving-square clips (deterministic dynamics → learnable), printing
loss trajectories. The recorded curves live in BASELINE.md ("Long-horizon
convergence evidence"); the CPU-sized regression gates are in
tests/test_convergence.py. Reference quality enforcement being replicated:
FVD-in-the-loop training, `/root/reference/stage1_VAE/main.py:202-244`.

Run on the TPU (steps are ms there; the same drive is hours on a 1-core CPU):

    python scripts/convergence_drive.py stage1 --steps 1000
    python scripts/convergence_drive.py stage2 --steps 1000

Data is staged as a small pool of device-resident uint8 chunks and cycled —
the relay's 10-45 MB/s H2D stream would otherwise bound the drive
(BASELINE.md round-3 epoch-scale note); augmentation keys still differ every
step, so batches vary.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image2video_synthesis_using_cinns_tpu.data.augment import build_augment
from image2video_synthesis_using_cinns_tpu.testing import (
    PRESETS,
    stage1_config,
    stage2_ae_config,
    stage2_config,
)
from image2video_synthesis_using_cinns_tpu.train.optim import adam_torch


def moving_squares(n, T, img, seed=0):
    rng = np.random.default_rng(seed)
    clips = np.zeros((n, T, img, img, 3), np.uint8)
    for i in range(n):
        x0, y0 = rng.integers(0, img - 8, 2)
        dx, dy = rng.integers(-2, 3, 2)
        base = rng.integers(0, 40, (img, img, 3)).astype(np.uint8)
        for f in range(T):
            fr = base.copy()
            xx = int(np.clip(x0 + f * dx, 0, img - 8))
            yy = int(np.clip(y0 + f * dy, 0, img - 8))
            fr[yy : yy + 8, xx : xx + 8] = [250, 120, 30]
            clips[i, f] = fr
    return clips


def drive_stage1(preset, steps, bs, k, pool):
    from image2video_synthesis_using_cinns_tpu.models.layers import (
        merge_actnorm_init,
    )
    from image2video_synthesis_using_cinns_tpu.train.stage1 import build_stage1
    from image2video_synthesis_using_cinns_tpu.train.stage1_step import (
        Stage1State,
        make_stage1_scan_step,
    )

    p = PRESETS[preset]
    opt = stage1_config(p)
    tr = dict(opt.Training, fused_step=True, compute_dtype="bfloat16")
    img, T = p["img_size"], p["seq_length"]
    bs = bs or int(tr.get("bs", 10))

    bundle, dec_vars, enc_vars, dt_vars, ds_vars = build_stage1(
        opt, jax.random.PRNGKey(0)
    )
    opts = (adam_torch(float(tr["lr"]), betas=(0.5, 0.9)),) * 3
    state = Stage1State(
        dec_vars, enc_vars, dt_vars, ds_vars,
        opts[0].init((dec_vars["params"], enc_vars["params"])),
        opts[1].init(dt_vars["params"]),
        opts[2].init(ds_vars["params"]),
    )
    aug = build_augment(img, {}, False, True)
    multi = make_stage1_scan_step(bundle, tr, opts, aug, true_b=bs,
                                  img_size=img)
    epoch = jnp.int32(int(tr["pretrain"]))  # gates open: all 3 updates fire

    clips = moving_squares(64, T, img)
    rng = np.random.default_rng(0)
    chunks = [
        jax.device_put(clips[rng.integers(0, clips.shape[0], (k, bs))])
        for _ in range(pool)
    ]
    jax.block_until_ready(chunks)

    # patch-disc ActNorm data-dependent init on the first batch (mirrors
    # train/stage1.py::run_single)
    root = jax.random.PRNGKey(42)
    key0 = jax.random.fold_in(root, 0)
    seq0 = aug(chunks[0][0], key0)
    _, upd = jax.jit(
        lambda v, s: bundle.disc_s.apply(
            v, s.reshape((-1,) + s.shape[2:])[:20], train=True,
            mutable=["actnorm_stats"],
        )
    )(state.disc_s_vars, seq0)
    if "actnorm_stats" in upd:
        new_ds = merge_actnorm_init(
            state.disc_s_vars["params"], upd["actnorm_stats"]
        )
        ds_vars = dict(state.disc_s_vars)
        ds_vars["params"] = new_ds
        state = state._replace(disc_s_vars=ds_vars, opt_ds=opts[2].init(new_ds))

    hist: dict[str, list] = {}
    t0 = time.time()
    gstep = 0
    while gstep < steps:
        keys = jnp.stack(
            [jax.random.fold_in(root, gstep + j) for j in range(k)]
        )
        state, metrics, _, _ = multi(
            state, chunks[(gstep // k) % pool], epoch, keys
        )
        m = jax.device_get(metrics)  # value fetch = the barrier on this rig
        for key_, v in m.items():
            hist.setdefault(key_, []).extend(np.asarray(v, np.float64).tolist())
        gstep += k
        if gstep % 100 == 0:
            print(
                f"step {gstep:5d}: L1 {np.mean(hist['Loss_L1'][-k:]):.4f} "
                f"PSNR {np.mean(hist['PSNR'][-k:]):.2f} "
                f"D_t {np.mean(hist['Loss_Disc_T'][-k:]):+.3f} "
                f"D_s {np.mean(hist['Loss_Disc_S'][-k:]):+.3f} "
                f"VAE {np.mean(hist['Loss_VAE'][-k:]):.3f} "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )

    for name in ("Loss_Disc_T", "Loss_Disc_S"):
        v = np.asarray(hist[name])
        print(f"{name}: max|.|={np.abs(v).max():.3f} last100 mean={v[-100:].mean():+.4f}")
    l1, ps = np.asarray(hist["Loss_L1"]), np.asarray(hist["PSNR"])
    print(
        f"L1 first100={l1[:100].mean():.4f} last100={l1[-100:].mean():.4f} "
        f"({1 - l1[-100:].mean()/l1[:100].mean():.1%} better) | "
        f"PSNR first100={ps[:100].mean():.2f} last100={ps[-100:].mean():.2f} "
        f"(+{ps[-100:].mean()-ps[:100].mean():.2f} dB)"
    )
    finite = all(np.isfinite(np.asarray(v)).all() for v in hist.values())
    print(f"all finite: {finite} | total {time.time()-t0:.0f}s")


def drive_stage2(preset, steps, bs, k, pool, lr):
    from image2video_synthesis_using_cinns_tpu.models.stage1.resnet3d import (
        Encoder,
    )
    from image2video_synthesis_using_cinns_tpu.models.stage2.inn import (
        SupervisedTransformer,
    )
    from image2video_synthesis_using_cinns_tpu.train.stage2 import make_scan_step

    p = PRESETS[preset]
    img, T, z = p["img_size"], p["seq_length"], p["z_dim"]
    s1, ae = stage1_config(p), stage2_ae_config(p)
    s2 = stage2_config(p, "/tmp/s1", "/tmp/ae")
    bs = bs or int(s2.Training.get("bs", 50))

    encoder = Encoder.from_config(s1.Encoder)
    enc_vars = jax.jit(encoder.init)(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)},
        jnp.zeros((1, T - 1, img, img, 3)),
    )
    network = SupervisedTransformer.from_configs(s2, s1.Decoder, ae.AE)
    net_vars = jax.jit(network.init)(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, z)),
        [jnp.zeros((1, img, img, 3))],
    )
    optimizer = adam_torch(lr, betas=(0.9, 0.99), amsgrad=True)
    fp, frozen = net_vars["params"]["flow"], net_vars["params"]["embedder"]
    buffers = net_vars["buffers"]

    aug = build_augment(
        img,
        {"brightness": 0.1, "contrast": 0.1, "saturation": 0.1, "hue": 0},
        False, True,
    )
    multi = make_scan_step(network, encoder, enc_vars, optimizer,
                           control=False, augment=aug, true_b=bs)

    clips = moving_squares(64, T, img)
    rng = np.random.default_rng(0)
    chunks = [
        jax.device_put(clips[rng.integers(0, clips.shape[0], (k, bs))])
        for _ in range(pool)
    ]
    conds = jax.device_put(np.zeros((k, bs, 3), np.float32))
    jax.block_until_ready((chunks, conds))

    # flow ActNorm init on the first batch (real trainer semantics)
    root = jax.random.PRNGKey(42)
    key0 = jax.random.fold_in(root, 0)
    seq0 = aug(chunks[0][0], key0)
    post, _, _ = jax.jit(
        lambda v, s, key: encoder.apply(v, s[:, 1:], rngs={"sample": key})
    )(enc_vars, seq0, jax.random.fold_in(key0, 1))
    new_blocks = jax.jit(
        lambda fp_, fr, bu, p_, c: network.apply(
            {"params": {"flow": fp_, "embedder": fr}, "buffers": bu},
            p_.reshape(p_.shape[0], -1), [c[:, 0]], method="init_actnorm",
        )
    )(fp, frozen, buffers, post, seq0)
    fp = dict(fp)
    fp["blocks"] = new_blocks
    os_ = optimizer.init(fp)

    losses, refs = [], []
    t0 = time.time()
    gstep = 0
    while gstep < steps:
        keys = jnp.stack(
            [jax.random.fold_in(root, gstep + j) for j in range(k)]
        )
        fp, os_, auxs = multi(fp, os_, frozen, buffers,
                              chunks[(gstep // k) % pool], conds, keys)
        a = jax.device_get(auxs)
        losses.extend(np.asarray(a["Loss"], np.float64).tolist())
        refs.extend(np.asarray(a["reference_nll_loss"], np.float64).tolist())
        gstep += k
        if gstep % 100 == 0:
            print(
                f"step {gstep:5d}: loss {np.mean(losses[-k:]):.3f} "
                f"ref {np.mean(refs[-k:]):.3f} ({time.time()-t0:.0f}s)",
                flush=True,
            )

    losses_a, refs_a = np.asarray(losses), np.asarray(refs)
    l0 = losses_a[:10].mean()
    lf = losses_a[-30:].mean()
    lref = refs_a.mean()
    print(
        f"L0={l0:.3f} Lref={lref:.3f} Lf={lf:.3f} "
        f"gap closed={(l0-lf)/max(l0-lref,1e-9):.2%} "
        f"finite={np.isfinite(losses_a).all()} | total {time.time()-t0:.0f}s"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["stage1", "stage2"])
    ap.add_argument("--preset", default="bair")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--bs", type=int, default=None)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--pool", type=int, default=4,
                    help="device-resident uint8 chunk pool size (cycled)")
    ap.add_argument("--lr", type=float, default=1e-4)
    a = ap.parse_args()
    if a.which == "stage1":
        drive_stage1(a.preset, a.steps, a.bs, a.k, a.pool)
    else:
        drive_stage2(a.preset, a.steps, a.bs, a.k, a.pool, a.lr)


if __name__ == "__main__":
    main()
