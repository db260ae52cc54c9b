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
    python scripts/convergence_drive.py ae     --steps 1000

``ae`` drives the stage-2 conditioning AE at full reference size (BigGAN
chn96 decoder + resnet50 encoder, bs=30) with the discriminator LIVE
(epoch past ``pretrain``) — the trainer with the trickiest gradient
plumbing: adaptive ``d_weight`` from a last-layer-only grad ratio, learned
logvar, hinge disc (reference ``stage2_cINN/AE/modules/loss.py:8-19,83``).

``--json PATH`` writes a machine-comparable artifact per run (round-4 #8):
summary metrics + thresholds-crossed, so the next refresh can diff against
the recorded evidence instead of a human re-reading BASELINE.md prose:

    python scripts/convergence_drive.py ae --steps 1000 --json ae_conv.json

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


def steps_to(series, thresh, window=20, below=True):
    """First step index whose trailing-``window`` mean crosses ``thresh``
    (None if never) — the 'steps-to-threshold' field of the JSON artifact."""
    s = np.asarray(series, np.float64)
    for i in range(window, len(s)):
        m = s[i - window : i].mean()
        if (m < thresh) if below else (m > thresh):
            return i
    return None


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
    return {
        "finite": bool(finite),
        "l1_first100": float(l1[:100].mean()),
        "l1_last100": float(l1[-100:].mean()),
        "psnr_first100": float(ps[:100].mean()),
        "psnr_last100": float(ps[-100:].mean()),
        "max_abs_disc_t": float(np.abs(np.asarray(hist["Loss_Disc_T"])).max()),
        "max_abs_disc_s": float(np.abs(np.asarray(hist["Loss_Disc_S"])).max()),
        "steps_to_l1_70pct": steps_to(l1, 0.7 * float(l1[:100].mean())),
        "wall_s": float(time.time() - t0),
    }


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
    # NOTE on the floor: reference_nll = mean(0.5·‖ε‖²) ≈ z/2 is the value a
    # PERFECT standard-normal output would score with logdet 0 — but exact
    # likelihood is bounded by the DATA's entropy, not by that floor: on the
    # low-entropy synthetic posteriors of full-size runs (z=64) the flow
    # legitimately trains far BELOW it (negative Loss via large logdet), so
    # "fraction of the init→floor gap closed" is only meaningful while
    # l0 > lref (the tiny-preset CPU gate's regime). The robust convergence
    # evidence at full size: the floor is CROSSED (standard-normal-quality
    # density reached) and NLL keeps descending, all finite.
    cross = steps_to(losses_a, float(lref))
    print(
        f"L0={l0:.3f} Lref={lref:.3f} Lf={lf:.3f} "
        f"drop={l0 - lf:.3f} floor crossed at step {cross} "
        f"finite={np.isfinite(losses_a).all()} | total {time.time()-t0:.0f}s"
    )
    return {
        "finite": bool(np.isfinite(losses_a).all()),
        "nll_init": float(l0),
        "nll_final": float(lf),
        "nll_reference": float(lref),
        "nll_drop": float(l0 - lf),
        "steps_to_reference_floor": cross,
        "wall_s": float(time.time() - t0),
    }


def drive_ae(preset, steps, bs, k, pool):
    """The stage-2 conditioning AE at full reference size with the disc LIVE
    (epoch = pretrain, so ``adopt_weight`` gates are open from step 0): the
    adaptive ``d_weight = |∇nll|/(|∇g|+1e-4)`` must stay finite and bounded,
    the hinge disc loss must not blow up, and the reconstruction must improve
    — instabilities in this plumbing surface at O(100) steps, exactly past
    where the 2-step smokes look (round-4 verdict, Missing #3)."""
    from image2video_synthesis_using_cinns_tpu.models.layers import (
        merge_actnorm_init,
    )
    from image2video_synthesis_using_cinns_tpu.models.stage2.biggan import BigAE
    from image2video_synthesis_using_cinns_tpu.models.backbones.lpips import LPIPS
    from image2video_synthesis_using_cinns_tpu.models.stage1.patch_disc import (
        NLayerDiscriminator,
    )
    from image2video_synthesis_using_cinns_tpu.train.stage2_ae import (
        make_ae_scan_step,
    )

    p = PRESETS[preset]
    ae_cfg = stage2_ae_config(p)
    img = p["img_size"]
    if img < 64:
        # the BigGAN decoder exists at 64/128 px only and needs
        # z_dim > 10*n_blocks (reference generator.py:248,342) — smoke the
        # harness at the smallest real size (same override as
        # scripts/pipeline_drive.py)
        ae_cfg.AE.update(in_size=64, z_dim=64, chn=8, encoder_type="resnet18")
        img = 64
    tr = ae_cfg.Training
    bs = bs or int(tr["bs"])

    network = BigAE(config=dict(ae_cfg.AE))
    gen_vars = jax.jit(network.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, img, img, 3))
    )
    disc = NLayerDiscriminator.from_config(ae_cfg.Discriminator_Patch)
    disc_vars = jax.jit(disc.init)(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, img, img, 3))
    )
    lpips = LPIPS()
    lpips_vars = jax.jit(lpips.init)(
        {"params": jax.random.PRNGKey(2)},
        jnp.zeros((1, img, img, 3)), jnp.zeros((1, img, img, 3)),
    )
    logvar = jnp.zeros(())
    opt_gen = adam_torch(float(tr["lr"]), weight_decay=tr["weight_decay"])
    opt_disc = adam_torch(float(tr["lr"]), weight_decay=tr["weight_decay"])
    opt_g = opt_gen.init((gen_vars["params"], logvar))
    opt_d = opt_disc.init(disc_vars["params"])

    a = ae_cfg.Data["Augmentation"]
    aug = build_augment(
        img,
        {kk: a[kk] for kk in ("brightness", "contrast", "saturation", "hue")},
        False, True,
    )
    multi = make_ae_scan_step(
        network, disc, lpips, lpips_vars, opt_gen, opt_disc,
        float(tr["w_kl"]), int(tr["pretrain"]),
        augment=aug, true_b=bs, img_size=img,
    )
    epoch = jnp.int32(int(tr["pretrain"]))  # disc + GAN terms live

    # single frames (Data.sequence_length == 1 for the AE)
    clips = moving_squares(64, 1, img)
    rng = np.random.default_rng(0)
    chunks = [
        jax.device_put(clips[rng.integers(0, clips.shape[0], (k, bs))])
        for _ in range(pool)
    ]
    jax.block_until_ready(chunks)

    # patch-disc ActNorm data-dependent init on the first batch (mirrors
    # train/stage2_ae.py::run_single)
    root = jax.random.PRNGKey(42)
    key0 = jax.random.fold_in(root, 0)
    img0 = aug(chunks[0][0], key0)[:, 0]
    _, upd = jax.jit(
        lambda v, s: disc.apply(v, s, train=True, mutable=["actnorm_stats"])
    )(disc_vars, img0)
    if "actnorm_stats" in upd:
        new_dp = merge_actnorm_init(disc_vars["params"], upd["actnorm_stats"])
        disc_vars = dict(disc_vars)
        disc_vars["params"] = new_dp
        opt_d = opt_disc.init(new_dp)

    hist: dict[str, list] = {}
    t0 = time.time()
    gstep = 0
    while gstep < steps:
        keys = jnp.stack(
            [jax.random.fold_in(root, gstep + j) for j in range(k)]
        )
        gen_vars, logvar, disc_vars, opt_g, opt_d, _, _, metrics = multi(
            gen_vars, logvar, disc_vars, opt_g, opt_d,
            chunks[(gstep // k) % pool], keys, epoch,
        )
        m = jax.device_get(metrics)  # value fetch = the barrier on this rig
        for key_, v in m.items():
            hist.setdefault(key_, []).extend(np.asarray(v, np.float64).tolist())
        gstep += k
        if gstep % 100 == 0:
            print(
                f"step {gstep:5d}: recon {np.mean(hist['Loss_recon'][-k:]):.4f} "
                f"d_weight {np.mean(hist['Disc_weight'][-k:]):.3f} "
                f"L_disc {np.mean(hist['L_disc'][-k:]):+.4f} "
                f"logvar {np.mean(hist['Logvar'][-k:]):+.3f} "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )

    finite = all(np.isfinite(np.asarray(v)).all() for v in hist.values())
    rec = np.asarray(hist["Loss_recon"])
    dw = np.asarray(hist["Disc_weight"])
    ld = np.asarray(hist["L_disc"])
    print(
        f"recon first100={rec[:100].mean():.4f} last100={rec[-100:].mean():.4f} "
        f"({1 - rec[-100:].mean()/rec[:100].mean():.1%} better) | "
        f"d_weight max={dw.max():.3f} last100 mean={dw[-100:].mean():.3f} | "
        f"max|L_disc|={np.abs(ld).max():.3f} | finite={finite} | "
        f"total {time.time()-t0:.0f}s"
    )
    return {
        "finite": bool(finite),
        "recon_first100": float(rec[:100].mean()),
        "recon_last100": float(rec[-100:].mean()),
        "d_weight_max": float(dw.max()),
        "d_weight_last100": float(dw[-100:].mean()),
        "max_abs_l_disc": float(np.abs(ld).max()),
        "logvar_final": float(np.asarray(hist["Logvar"])[-1]),
        "steps_to_recon_70pct": steps_to(rec, 0.7 * float(rec[:100].mean())),
        "wall_s": float(time.time() - t0),
    }


def compare(which: str, new: dict, old: dict) -> list[str]:
    """Direction-aware regression diff of a fresh summary against a recorded
    ``--json`` artifact. Returns human-readable regression strings (empty =
    PASS). Tolerances are deliberately loose — these drives run on varying
    hosts/relays; the diff flags order-of-magnitude convergence regressions,
    not run-to-run noise."""
    regs = []
    if old.get("finite", True) and not new["finite"]:
        regs.append("metrics went non-finite (was finite in the recorded run)")

    def worse(key, factor, higher_is_better=False):
        o, n = old.get(key), new.get(key)
        if o is None or n is None:
            return
        bad = (n < o / factor) if higher_is_better else (n > o * factor)
        if bad:
            regs.append(f"{key}: {o:.4g} -> {n:.4g} (beyond {factor}x slack)")

    if which == "stage1":
        worse("l1_last100", 1.25)
        worse("max_abs_disc_t", 3.0)
        worse("max_abs_disc_s", 3.0)
        if new.get("psnr_last100", 99) < old.get("psnr_last100", 0) - 1.5:
            regs.append(
                f"psnr_last100: {old['psnr_last100']:.2f} -> "
                f"{new['psnr_last100']:.2f} (> 1.5 dB drop)"
            )
    elif which == "stage2":
        # final NLL materially higher than recorded (nats are comparable at
        # fixed z; 10 is far beyond run-to-run noise, far below a broken run)
        if new.get("nll_final", -1e9) > old.get("nll_final", 1e9) + 10.0:
            regs.append(
                f"nll_final: {old['nll_final']:.2f} -> {new['nll_final']:.2f} "
                "(> 10 nats worse)"
            )
        o_c, n_c = old.get("steps_to_reference_floor"), new.get(
            "steps_to_reference_floor"
        )
        if o_c is not None and (n_c is None or n_c > 2 * o_c + 50):
            regs.append(f"steps_to_reference_floor: {o_c} -> {n_c}")
    else:  # ae
        worse("recon_last100", 1.25)
        # d_weight is NOT diffed: sitting at the reference's 1e4 clamp with a
        # fresh disc is faithful behaviour (loss.py:8-19), so a run-to-run
        # max comparison would false-positive; non-finiteness is covered by
        # the finite check above and instability by recon/hinge.
        worse("max_abs_l_disc", 3.0)
    return regs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["stage1", "stage2", "ae"])
    ap.add_argument("--preset", default="bair")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--bs", type=int, default=None)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--pool", type=int, default=4,
                    help="device-resident uint8 chunk pool size (cycled)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--json", default=None,
                    help="write the machine-comparable summary artifact here "
                         "(diff against the recorded BASELINE.md evidence)")
    ap.add_argument("--compare", default=None,
                    help="recorded --json artifact to regression-diff the "
                         "fresh run against; exits 1 and prints REGRESSION "
                         "lines if convergence materially degraded")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the host CPU (harness smoke at --preset tiny)")
    a = ap.parse_args()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    if a.which == "stage1":
        summary = drive_stage1(a.preset, a.steps, a.bs, a.k, a.pool)
    elif a.which == "ae":
        summary = drive_ae(a.preset, a.steps, a.bs, a.k, a.pool)
    else:
        summary = drive_stage2(a.preset, a.steps, a.bs, a.k, a.pool, a.lr)
    if a.json or a.compare:
        import json

    if a.json:
        payload = {
            "which": a.which, "preset": a.preset, "steps": a.steps,
            "bs": a.bs, "k": a.k, "metrics": summary,
        }
        with open(a.json, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {a.json}")
    if a.compare:
        with open(a.compare) as f:
            old = json.load(f)
        if old.get("which") != a.which:
            raise SystemExit(
                f"--compare artifact is for {old.get('which')!r}, this run "
                f"is {a.which!r}"
            )
        regs = compare(a.which, summary, old["metrics"])
        if regs:
            for r in regs:
                print(f"REGRESSION vs {a.compare}: {r}")
            raise SystemExit(1)
        print(f"PASS: no convergence regression vs {a.compare}")


if __name__ == "__main__":
    main()
