"""Stage-1 video-VAE trainer (epoch loop).

Parity with reference ``stage1_VAE/main.py``: builds the 4 networks + LPIPS
(+ I3D logging model when available), 3 Adam(0.5, 0.9) optimisers with
per-epoch ExponentialLR, crash-resume from ``latest_checkpoint_*``, epoch loop
= train → validate → posterior-FVD → latest + best-PFVD checkpoints, CSV /
wandb logging with the reference key schema (lines 89-244).

Data-parallel over the device mesh: batch sharded, state replicated (see
``parallel/mesh.py``); the whole adversarial step is one jitted program
(``stage1_step.py``).
"""

from __future__ import annotations

import os
import time
import warnings
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..data import get_loader
from ..data.augment import build_augment
from ..data.framestore import open_or_build
from ..data.loader import Loader
from ..data.registry import augment_params
from ..models.backbones.lpips import LPIPS
from ..models.stage1.decoder import Generator
from ..models.stage1.patch_disc import NLayerDiscriminator
from ..models.stage1.resnet3d import Discriminator, Encoder
from ..models.layers import merge_actnorm_init
from ..parallel.distributed import (
    barrier,
    fetch_local_rows,
    fetch_local_rows_tree,
    make_global_batch,
    maybe_initialize,
    put_global_batch,
    require_mesh_divisible,
)
from ..parallel.mesh import make_mesh, replicate
from ..utils import checkpoint as ckpt_io
from ..utils import compile_cache
from ..utils.logging import CSVlogger, Logging, WandbSink
from ..utils.preemption import PreemptionGuard, maybe_enable_debug_nans
from ..utils.seed import set_seed
from ..utils.video import plot_vid
from .chunks import (
    DeferredFetch,
    chunk_keys,
    drive_epoch,
    iter_step_metrics,
    make_chunk_stager,
)
from .optim import LRController, adam_torch, set_lr
from .stage1_step import (
    Stage1Bundle,
    Stage1State,
    make_stage1_eval_step,
    make_stage1_scan_step,
    make_stage1_train_step,
)

TRAIN_KEYS = [
    "Loss_VAE", "Loss_L1", "LPIPS", "Loss_KL", "Loss_GEN_S", "Loss_GEN_T",
    "Loss_Disc_T", "Loss_Fmap_T", "L_GP", "Logits_Real_T", "Logits_Fake_T",
    "Loss_Disc_S", "Logits_Real_S", "Logits_Fake_S", "PSNR", "SSIM",
]
TEST_KEYS = ["Loss_L1", "LPIPS", "L_KL", "PSNR", "SSIM", "PFVD"]


def build_stage1(opt, rng_key):
    img = opt.Data["img_size"]
    T = opt.Data["sequence_length"] - 1
    z = opt.Decoder["z_dim"]
    k = jax.random.split(rng_key, 5)

    decoder = Generator.from_config(opt.Decoder)
    dec_vars = jax.jit(decoder.init)(
        {"params": k[0]}, jnp.zeros((1, img, img, 3)), jnp.zeros((1, z))
    )
    encoder = Encoder.from_config(opt.Encoder)
    enc_vars = jax.jit(encoder.init)(
        {"params": k[1], "sample": k[1]}, jnp.zeros((1, T, img, img, 3))
    )
    disc_t = Discriminator.from_config(opt.Discriminator_Temporal)
    sub_len = min(int(opt.Training["subsample_length"]), T)
    dt_vars = jax.jit(disc_t.init)(
        {"params": k[2]}, jnp.zeros((1, sub_len, img, img, 3))
    )
    disc_s = NLayerDiscriminator.from_config(opt.Discriminator_Patch)
    ds_vars = jax.jit(disc_s.init)({"params": k[3]}, jnp.zeros((1, img, img, 3)))

    lpips = LPIPS()
    lpips_vars = jax.jit(lpips.init)(
        {"params": k[4]}, jnp.zeros((1, img, img, 3)), jnp.zeros((1, img, img, 3))
    )
    lpips_path = os.environ.get("I2V_LPIPS_WEIGHTS", "models/lpips/vgg_lpips.msgpack")
    if os.path.exists(lpips_path):
        lpips_vars = ckpt_io.load(lpips_path).get("state_dict", ckpt_io.load(lpips_path))

    bundle = Stage1Bundle(decoder, encoder, disc_t, disc_s, lpips, lpips_vars)
    return bundle, dec_vars, enc_vars, dt_vars, ds_vars


def main(opt, max_steps: int | None = None, eval_fvd: bool = True):
    compile_cache.enable_persistent_cache()
    guard = PreemptionGuard()
    try:
        return _main(opt, guard, max_steps=max_steps, eval_fvd=eval_fvd)
    finally:
        # Flush queued async checkpoint writes on EVERY exit path (the writer
        # is a daemon thread — an exception mid-epoch would silently discard
        # queued latest_checkpoint_* files), and only then drop the SIGTERM
        # guard so a second preemption signal cannot kill the flush.
        ckpt_io.wait()
        guard.restore()


def _main(opt, guard, max_steps: int | None = None, eval_fvd: bool = True):
    maybe_enable_debug_nans()
    # opt-in multi-host: jax.distributed.initialize + per-host input pipeline
    # (parallel/distributed.py); (0, 1) in the default single-process case
    proc_i, proc_n = maybe_initialize(opt.Training.get("distributed"))
    root_key = set_seed(42)
    bundle, dec_vars, enc_vars, dt_vars, ds_vars = build_stage1(opt, root_key)

    tr = opt.Training
    mk_opt = lambda: adam_torch(  # noqa: E731
        tr["lr"], betas=(0.5, 0.9), weight_decay=tr["weight_decay"]
    )
    opt_ae, opt_dt, opt_ds = mk_opt(), mk_opt(), mk_opt()

    # ---- data ---------------------------------------------------------
    DatasetCls = get_loader(opt.Data["dataset"])
    train_ds = DatasetCls(opt, mode="train")
    eval_ds = DatasetCls(opt, mode="eval")
    fs_spec = opt.Data.get("framestore", "off")
    train_loader = Loader(
        train_ds, tr["bs"], workers=tr["workers"], seed=42,
        framestore=open_or_build(train_ds, fs_spec, "train"),
        process_index=proc_i, process_count=proc_n,
    )
    eval_loader = Loader(
        eval_ds, tr["bs_eval"], workers=tr["workers"], seed=43,
        framestore=open_or_build(eval_ds, fs_spec, "eval"),
        process_index=proc_i, process_count=proc_n,
    )
    # Data.aug gates train-time augmentation like the reference
    # (dataloader_bair.py:24) — hardcoded True until round 4
    aug_p, rcrop, aug_on = augment_params(opt, "train")
    aug_train = build_augment(opt.Data["img_size"], aug_p, rcrop, aug_on)
    aug_eval = build_augment(opt.Data["img_size"], aug_p, rcrop, False)

    # ---- logging dirs -------------------------------------------------
    dt_now = datetime.now()
    run_name = "Stage1_{}_Date-{}-{}-{}-{}-{}-{}_{}".format(
        opt.Data["dataset"], dt_now.year, dt_now.month, dt_now.day,
        dt_now.hour, dt_now.minute, dt_now.second, tr["savename"],
    )
    save_path = os.path.join(tr["save_path"] or ".", run_name)
    opt.Training["save_path"] = save_path
    # multi-host: only process 0 touches the filesystem / wandb — state is
    # replicated, so its checkpoints/logs describe every host's run, and
    # concurrent writes to one path would race (parallel/distributed.py)
    primary = proc_i == 0
    if primary:
        os.makedirs(os.path.join(save_path, "videos"), exist_ok=True)
        cfg.save(opt, os.path.join(save_path, "config_stage1.yaml"))

    wandb_sink = WandbSink()
    if primary:
        wandb_sink.init(opt.get("Logging"), opt, save_path, tr["savename"])
    log_train = Logging(TRAIN_KEYS)
    log_test = Logging(TEST_KEYS[:-1])
    full_log_train = CSVlogger(
        os.path.join(save_path, "log_per_epoch_train.csv"),
        ["Epoch", "Time", "LR"] + TRAIN_KEYS, enabled=primary,
    )
    full_log_test = CSVlogger(
        os.path.join(save_path, "log_per_epoch_eval.csv"),
        ["Epoch", "Time", "LR"] + TEST_KEYS, enabled=primary,
    )

    # ---- resume -------------------------------------------------------
    start_epoch = 0
    sched_state = None
    if tr.get("reload_path"):
        payloads = {}
        for name in ("GEN", "ENC", "DISC_t", "DISC_s"):
            p = ckpt_io.find(os.path.join(tr["reload_path"], f"latest_checkpoint_{name}"))
            if p:
                payloads[name] = ckpt_io.load(p)
        if "GEN" in payloads:
            dec_vars = payloads["GEN"]["state_dict"]
            enc_vars = payloads["ENC"]["state_dict"]
            dt_vars = payloads["DISC_t"]["state_dict"]
            ds_vars = payloads["DISC_s"]["state_dict"]
            start_epoch = int(payloads["GEN"]["epoch"])
            sched_state = payloads["GEN"].get("scheduler_state_dict")

    # ---- mesh + state -------------------------------------------------
    mesh = make_mesh()
    n_dev = mesh.devices.size
    if proc_n > 1:
        # loud early guard: per-process padding cannot express the single
        # -host pad + true_b path (parallel/distributed.py)
        require_mesh_divisible(n_dev, bs=tr["bs"], bs_eval=tr["bs_eval"])
    opt_ae_state = opt_ae.init((dec_vars["params"], enc_vars["params"]))
    opt_dt_state = opt_dt.init(dt_vars["params"])
    opt_ds_state = opt_ds.init(ds_vars["params"])
    if tr.get("reload_path") and start_epoch > 0:
        # restore optimiser moments (reference stage1_VAE/main.py:129-131)
        for name, target in (
            ("GEN", opt_ae_state), ("DISC_t", opt_dt_state), ("DISC_s", opt_ds_state)
        ):
            if name in payloads and "optim_state_dict" in payloads[name]:
                restored = ckpt_io.restore_into(target, payloads[name]["optim_state_dict"])
                if name == "GEN":
                    opt_ae_state = restored
                elif name == "DISC_t":
                    opt_dt_state = restored
                else:
                    opt_ds_state = restored
    state = Stage1State(
        dec_vars, enc_vars, dt_vars, ds_vars,
        opt_ae_state, opt_dt_state, opt_ds_state,
    )
    # multi-host: enter the collective phase together — the build above runs
    # communication-free and can skew processes past the ~30 s Gloo
    # rendezvous timeout (parallel/distributed.barrier docstring)
    barrier("stage1-build")
    state = Stage1State(*[replicate(mesh, x) for x in state])

    step_fn = make_stage1_train_step(bundle, tr, (opt_ae, opt_dt, opt_ds))
    eval_fn = make_stage1_eval_step(bundle)

    # K steps per dispatch (lax.scan over the fused whole-step) — amortises
    # the per-dispatch relay RPC + per-step metric fetch and moves the
    # uint8→float decode + augmentation on-device into the same program; 1 =
    # one (or two, unfused) dispatches per step. See make_stage1_scan_step.
    spd = int(tr.get("steps_per_dispatch", 1))
    multi_fn = (
        make_stage1_scan_step(
            bundle, tr, (opt_ae, opt_dt, opt_ds), aug_train,
            true_b=int(tr["bs"]), img_size=int(opt.Data["img_size"]),
        )
        if spd > 1
        else None
    )
    # eager per-batch H2D staging for the chunk path (see make_chunk_stager)
    stage_fn, stack_staged = (
        make_chunk_stager(mesh, n_dev // proc_n)
        if multi_fn is not None
        else (None, None)
    )

    scheds = [
        LRController(tr["lr"], "exponential", gamma=tr["lr_gamma"]) for _ in range(3)
    ]
    if sched_state is not None:
        for s in scheds:
            s.load_state_dict(jax.tree.map(float, sched_state))

    actnorm_done = start_epoch > 0
    # 999 is the reference's FVD-scale best gate (stage1_VAE/main.py:61); our
    # eval-LOSS fallback (no I3D weights / eval_fvd=False) is not FVD-scaled,
    # so it compares against inf — otherwise a run whose first eval loss
    # exceeds 999 would never write best_PFVD_{GEN,ENC} at all (caught by
    # scripts/pipeline_drive.py on the cINN's NLL-scale analogue).
    best_PFVD = 999.0 if eval_fvd else float("inf")
    global_step = 0
    sequences = None

    def prep(batch, train, key):
        """Returns (batch-sharded global seq, true_b). ``true_b`` is None
        when no padding was needed; the jitted steps slice back to it so no
        loss, metric or GP term ever sees a pad row (see
        make_stage1_train_step).

        Multi-host: the batch holds only this host's rows; the RAW uint8 is
        assembled into the global array first and the jitted augmentation
        runs on the global sharded rows — per-clip subkeys are indexed by
        GLOBAL row, so the trajectory is bit-identical to a single-host run
        and to the scanned chunk path, and the 4×-larger float batch never
        round-trips through the host (parallel/distributed.py)."""
        if proc_n > 1:
            g = put_global_batch(mesh, {"seq_raw": np.asarray(batch["seq_raw"])})
            seq = (aug_train if train else aug_eval)(g["seq_raw"], key)
            return seq, None
        seq = (aug_train if train else aug_eval)(jnp.asarray(batch["seq_raw"]), key)
        b, true_b = make_global_batch(mesh, {"seq": seq})
        return b["seq"], true_b

    for epoch in range(start_epoch, tr["n_epochs"]):
        epoch_time = time.time()
        lr = scheds[0].lr

        # ---------------- train ----------------
        log_train.reset()

        def log_metrics(metrics):
            log_train.append(metrics)
            wandb_sink.log(metrics)

        # Deferred-fetch pipeline + chunk accumulation: shared machinery in
        # train/chunks.py; the payload carries the last (seq_gen, seq) pair
        # for the epoch GIF alongside the stacked metrics.
        def on_payload(payload):
            nonlocal sequences
            metrics, n, gen_d, seq_d = payload
            for m in iter_step_metrics(metrics, n):
                log_metrics(m)
            # plot_vid expects the torch (B,T,C,H,W) layout
            sequences = [
                np.transpose(np.asarray(gen_d), (0, 1, 4, 2, 3)),
                np.transpose(np.asarray(seq_d)[:, 1:], (0, 1, 4, 2, 3)),
            ]

        # fetch_local_rows_tree: the payload's video tensors are batch-
        # sharded — in multi-host each process fetches only its rows (the
        # GIF shows process 0's slice; plain device_get would raise)
        fetches = DeferredFetch(on_payload, fetch=fetch_local_rows_tree)

        def run_single(batch):
            nonlocal state, actnorm_done, global_step, sequences
            fetches.drain(all_pending=True)
            key = jax.random.fold_in(root_key, global_step)
            seq, tb = prep(batch, True, key)

            if not actnorm_done:
                # patch-disc ActNorm data-dependent init on the first batch's
                # TRUE rows (slice inside jit; pad rows would bias the stats)
                _, upd = jax.jit(
                    lambda v, s: bundle.disc_s.apply(
                        v, s[:tb].reshape((-1,) + s.shape[2:])[:20],
                        train=True, mutable=["actnorm_stats"],
                    )
                )(state.disc_s_vars, seq)
                new_ds_params = merge_actnorm_init(
                    state.disc_s_vars["params"], upd["actnorm_stats"]
                )
                ds_vars = dict(state.disc_s_vars)
                ds_vars["params"] = new_ds_params
                state = state._replace(
                    disc_s_vars=ds_vars, opt_ds=replicate(mesh, opt_ds.init(new_ds_params))
                )
                actnorm_done = True

            state, metrics, seq_gen = step_fn(
                state, seq, jnp.asarray(epoch), jax.random.fold_in(key, 1),
                true_b=tb,
            )
            log_metrics({k: float(v) for k, v in metrics.items()})
            # plot_vid expects the torch (B,T,C,H,W) layout; seq_gen is
            # already sliced to the true batch by the step, match it for
            # seq. fetch_local_rows: multi-host-safe fetch of the batch-
            # sharded tensors (this process's rows; plain asarray raises)
            sequences = [
                np.transpose(fetch_local_rows(seq_gen), (0, 1, 4, 2, 3)),
                np.transpose(fetch_local_rows(seq)[:tb, 1:], (0, 1, 4, 2, 3)),
            ]
            global_step += 1

        def run_chunk(chunk):
            nonlocal state, global_step
            # clips were staged batch-by-batch as they arrived (async puts,
            # padded to the LOCAL device multiple — multi-host asserts a
            # divisible global batch); assemble the (K,B,...) chunk on device
            keys = chunk_keys(root_key, global_step, len(chunk))
            state, metrics, seq_gen, seq = multi_fn(
                state, stack_staged(chunk), jnp.asarray(epoch), keys,
            )
            global_step += len(chunk)
            fetches.push((metrics, len(chunk), seq_gen, seq))

        drive_epoch(
            train_loader.epoch_iter(epoch),
            # the loader yields this host's rows (bs/proc_n in multi-host)
            full_bs=tr["bs"] // proc_n,
            spd=spd,
            chunk_ready=lambda: multi_fn is not None and actnorm_done,
            run_single=run_single,
            run_chunk=run_chunk,
            steps_done=lambda: global_step,
            max_steps=max_steps,
            interrupted=lambda: guard.should_stop,
            stage=stage_fn,
        )
        fetches.drain(all_pending=True)

        if sequences is not None and primary:
            gif = plot_vid(opt, sequences, epoch, mode="train")
            wandb_sink.log_video("train_video", gif)

        # ---------------- validate ----------------
        log_test.reset()
        sequences_eval = None
        # deferred fetch: metrics (and the last batch's recon video) stay on
        # device until after the loop — one host sync for the whole eval pass
        eval_metrics, last_eval = [], None
        for i, batch in enumerate(eval_loader.epoch_iter(epoch)):
            key = jax.random.fold_in(root_key, 20_000_000 + epoch * 10_000 + i)
            seq, tb = prep(batch, False, key)
            metrics, seq_gen = eval_fn(
                state.dec_vars, state.enc_vars, seq, key, true_b=tb
            )
            eval_metrics.append(metrics)
            last_eval = (seq_gen, seq, tb)
            if max_steps and i >= 1:
                break
        for metrics in jax.device_get(eval_metrics):
            log_test.append({k: float(v) for k, v in metrics.items()})
        if last_eval is not None:
            seq_gen, seq, tb = last_eval
            sequences_eval = [
                np.transpose(fetch_local_rows(seq_gen), (0, 1, 4, 2, 3)),
                np.transpose(fetch_local_rows(seq)[:tb, 1:], (0, 1, 4, 2, 3)),
            ]

        if sequences_eval is not None and primary:
            # reference logs the eval recon video too (stage1_VAE/main.py:82-83)
            gif = plot_vid(opt, sequences_eval, epoch, mode="eval")
            wandb_sink.log_video("eval_video", gif)

        # ---------------- FVD(posterior) ----------------
        PFVD = float("nan")
        if eval_fvd:
            try:
                from .fvd_eval import evaluate_FVD_posterior

                PFVD = evaluate_FVD_posterior(
                    eval_loader, aug_eval, bundle, state, tr.get("FVD", "FVD")
                )
                wandb_sink.log({"FVD": PFVD})
            except FileNotFoundError as e:
                # Loud, once-per-run: a typo'd models/ path must not silently
                # cost the run its model-selection metric (reference fails
                # hard instead, stage1_VAE/main.py:96).
                warnings.warn(
                    "posterior-FVD evaluation disabled for the rest of this "
                    f"run: I3D weights not found ({e}); best-checkpoint "
                    "selection falls back to eval loss and the PFVD CSV "
                    "column stays NaN."
                )
                eval_fvd = False
                if best_PFVD == 999.0:
                    # no FVD was ever computed: re-anchor the best gate to the
                    # loss scale (see best_PFVD's init comment)
                    best_PFVD = float("inf")

        # ---------------- checkpoints ----------------
        # multi-host: secondaries skip the host fetch + writes — state is
        # replicated, process 0's files describe the global run
        if primary:
            host_state = jax.device_get(state)
            sched_sd = scheds[0].state_dict()
            saves = {
                "GEN": (host_state.dec_vars, host_state.opt_ae),
                "ENC": (host_state.enc_vars, host_state.opt_ae),
                "DISC_t": (host_state.disc_t_vars, host_state.opt_dt),
                "DISC_s": (host_state.disc_s_vars, host_state.opt_ds),
            }
            # async writes: serialize+write overlaps the next epoch (flushed
            # by ckpt_io.wait() before return) — see utils/checkpoint.py
            for name, (vars_, opt_state) in saves.items():
                ckpt_io.save_async(
                    os.path.join(save_path, f"latest_checkpoint_{name}.msgpack"),
                    {
                        "epoch": epoch + 1,
                        "state_dict": vars_,
                        "optim_state_dict": opt_state,
                        "scheduler_state_dict": sched_sd,
                    },
                )
        metric = PFVD if PFVD == PFVD else log_test.log()[0]
        if metric < best_PFVD:
            if primary:
                for name in ("GEN", "ENC"):
                    vars_, opt_state = saves[name]
                    ckpt_io.save_async(
                        os.path.join(save_path, f"best_PFVD_{name}.msgpack"),
                        {
                            "epoch": epoch + 1,
                            "state_dict": vars_,
                            "optim_state_dict": opt_state,
                            "scheduler_state_dict": sched_sd,
                        },
                    )
            best_PFVD = metric

        # ---------------- schedulers ----------------
        new_lr_ae = scheds[0].step()
        set_lr(state.opt_ae, new_lr_ae)
        if epoch >= tr["pretrain"]:
            set_lr(state.opt_dt, scheds[1].step())
            set_lr(state.opt_ds, scheds[2].step())

        dt_epoch = time.time() - epoch_time
        full_log_train.write([epoch, dt_epoch, lr, *log_train.log()])
        full_log_test.write([epoch, dt_epoch, lr, *log_test.log(), PFVD])

        if max_steps and global_step >= max_steps:
            break
        if guard.should_stop:
            # latest checkpoints were just queued atomically (flushed by the
            # main() finally); exit cleanly so the next attempt resumes via
            # Training.reload_path
            break

    return {"save_path": save_path, "best_metric": best_PFVD, "state": state}
