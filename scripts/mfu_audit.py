"""Trainer MFU audit (round-4 judge item #6) — numbers land in BASELINE.md.

For each trainer program at the full reference sizes this script reports:
  * executed FLOPs/step from XLA's post-optimization HLO cost analysis of the
    actual jitted single-step program (includes remat recompute; exact trip
    count 1 — the scanned program is NOT analysed because HLO cost analysis
    does not multiply while-loop bodies by trip count),
  * device-resident step time: the trainer's own ``steps_per_dispatch`` scan
    program timed with all inputs pre-staged on device and a value-fetch
    barrier (CLAUDE.md: ``block_until_ready`` acks before remote execution
    completes on this rig), best of ``--repeats``,
  * achieved TF/s and % of the measured chip ceilings (BASELINE.md round-3
    revision: 140 TF/s bf16 / 120 fp32 matmul, 109-116 TF/s bf16 conv3d),
  * HBM traffic rate from ``bytes accessed`` (optimized HLO, so fusion is
    already accounted) vs the measured ~218-316 GB/s elementwise stream rate.

``--phases`` additionally times + cost-analyses the stage-1 disc and VAE
phases separately (the two programs of the non-fused step) to locate the gap.

Usage (on the TPU):
    python scripts/mfu_audit.py stage1            # fused bf16, bs=10, 64px
    python scripts/mfu_audit.py stage1 --img 128  # landscape family, bs=7
    python scripts/mfu_audit.py stage1 --phases   # disc vs VAE breakdown
    python scripts/mfu_audit.py stage2            # cINN bs=50
    python scripts/mfu_audit.py stage2 --dtype bfloat16
    python scripts/mfu_audit.py ae                # AE bs=30
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

# Measured ceilings for this chip (BASELINE.md "Speed-of-light context",
# round-3 revision). Nominal v5e peak is ~197 TF/s bf16; the measured matmul
# ceiling under XLA is what a perfect program could actually reach.
CEIL_BF16 = 140e12
CEIL_FP32 = 120e12
CEIL_CONV_BF16 = 112e12  # midpoint of the 109-116 TF/s conv3d band


def _cost(jitted, *args):
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _report(label, flops, bytes_acc, dt, k, ceil):
    per = dt / k
    tf = flops / per / 1e12
    gbs = bytes_acc / per / 1e9
    print(f"[{label}]")
    print(f"  FLOPs/step (optimized HLO): {flops/1e9:.1f} GFLOP")
    print(f"  bytes accessed/step:        {bytes_acc/1e9:.2f} GB")
    print(f"  step time (device-resident, scanned K={k}): {per*1000:.1f} ms")
    print(f"  achieved: {tf:.1f} TF/s = {100*tf*1e12/ceil:.1f}% of the "
          f"{ceil/1e12:.0f} TF/s measured ceiling")
    print(f"  HBM traffic rate: {gbs:.0f} GB/s (measured stream rate: "
          f"218 bf16 / 316 fp32 GB/s)")
    print(f"  arithmetic intensity: {flops/max(bytes_acc,1):.0f} FLOP/byte")
    return tf


def _best(fn, repeats):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def audit_stage2(bs, k, repeats, dtype):
    from image2video_synthesis_using_cinns_tpu.models.stage1.resnet3d import Encoder
    from image2video_synthesis_using_cinns_tpu.models.stage2.inn import (
        SupervisedTransformer,
    )
    from image2video_synthesis_using_cinns_tpu.train.stage2 import (
        make_scan_step, make_train_step,
    )

    p = PRESETS["bair"]
    s1, ae = stage1_config(p), stage2_ae_config(p)
    s2 = stage2_config(p, "/tmp/s1", "/tmp/ae")
    img, T, z = p["img_size"], p["seq_length"], p["z_dim"]

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
    optimizer = adam_torch(1e-4, betas=(0.9, 0.99), amsgrad=True)
    fp, frozen = net_vars["params"]["flow"], net_vars["params"]["embedder"]
    buffers = net_vars["buffers"]
    os_ = optimizer.init(fp)

    aug = build_augment(img, {"brightness": 0.2, "contrast": 0.2,
                              "saturation": 0.2, "hue": 0.1}, False, True)
    mp_dt = jnp.bfloat16 if dtype in ("bfloat16", "bf16") else None
    step, _ = make_train_step(network, encoder, enc_vars, optimizer,
                              control=False, mp_dt=mp_dt)
    multi = make_scan_step(network, encoder, enc_vars, optimizer, control=False,
                           augment=aug, true_b=bs, mp_dt=mp_dt)

    # cost analysis of the single-step program (what the scan body runs, minus
    # the on-device augment — noted in BASELINE.md). Rebuilt from the same
    # _make_loss_fn the factory uses, with every weight tree threaded as a jit
    # ARGUMENT — closure capture bakes the ~100MB frozen encoder into the
    # serialized HLO and overflows the remote-compile transport (HTTP 413);
    # see train/stage2.py::make_train_step docstring.
    from image2video_synthesis_using_cinns_tpu.train.stage2 import _make_loss_fn

    loss_fn = _make_loss_fn(network, encoder, False, mp_dt)

    @jax.jit
    def cost_fn(fp_, os2, frozen_, buffers_, enc_v, seq_, cond_, rng_):
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            fp_, frozen_, buffers_, enc_v, seq_, cond_, rng_)
        updates, os2 = optimizer.update(grads, os2, fp_)
        fp_ = jax.tree.map(lambda p, u: p + u, fp_, updates)
        return fp_, os2, aux

    seq = jnp.zeros((bs, T, img, img, 3), jnp.float32)
    cond = jnp.zeros((bs, 3), jnp.float32)
    rng = jax.random.PRNGKey(7)
    flops, bytes_acc = _cost(cost_fn, fp, os_, frozen, buffers, enc_vars,
                             seq, cond, rng)

    rngnp = np.random.default_rng(0)
    raw = rngnp.integers(0, 255, (k, bs, T, img, img, 3), dtype=np.uint8)
    raws = jax.device_put(raw)
    conds = jax.device_put(np.zeros((k, bs, 3), np.float32))
    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(42), j)
                      for j in range(k)])
    jax.block_until_ready((raws, conds, keys))

    state = {"fp": fp, "os": os_}

    def run():
        state["fp"], state["os"], auxs = multi(
            state["fp"], state["os"], frozen, buffers, raws, conds, keys)
        assert np.isfinite(jax.device_get(auxs)["Loss"]).all()

    run()  # compile
    dt = _best(run, repeats)
    ceil = CEIL_BF16 if mp_dt is not None else CEIL_FP32
    _report(f"stage2 cINN bs={bs} {dtype}", flops, bytes_acc, dt, k, ceil)
    # the scan step donates its (fp, os) arguments — hand back the LIVE
    # post-run state, not the deleted originals
    return (encoder, enc_vars, network, optimizer, state["fp"], frozen,
            buffers, state["os"], bs, k, repeats, mp_dt, T, img)


def audit_stage2_components(bs, k, repeats, dtype):
    """Where does the cINN step time go: frozen encoder fwd vs flow
    fwd+bwd+adam. Each component scanned K times with a serial data
    dependence chained through the carry (CLAUDE.md: an independent body is
    hoisted and you measure relay RPC)."""
    (encoder, enc_vars, network, optimizer, fp, frozen, buffers, os_, bs, k,
     repeats, mp_dt, T, img) = audit_stage2(bs, k, repeats, dtype)

    seq = jax.device_put(np.random.default_rng(0).random(
        (bs, T, img, img, 3), np.float32).astype(np.float32) * 2 - 1)
    dt_in = jnp.bfloat16 if mp_dt is not None else jnp.float32
    enc_in = seq[:, 1:].astype(dt_in)
    ev = jax.tree.map(lambda x: x.astype(dt_in), enc_vars) if mp_dt else enc_vars

    @jax.jit
    def enc_scan(ev, x, keys):
        def body(carry, key):
            post, *_ = encoder.apply(
                ev, x + 0 * carry, rngs={"sample": key})
            return jnp.mean(post).astype(x.dtype), jnp.mean(post)
        return jax.lax.scan(body, jnp.zeros((), x.dtype), keys)

    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(1), j)
                      for j in range(k)])

    def run_enc():
        _, ms = enc_scan(ev, enc_in, keys)
        assert np.isfinite(jax.device_get(ms)).all()

    @jax.jit
    def enc_cost(ev, x, key):
        post, *_ = encoder.apply(ev, x, rngs={"sample": key})
        return post

    eflops, ebytes = _cost(enc_cost, ev, enc_in, keys[0])

    # flow-only step: loss on a fixed posterior + conditioning, grad + adam
    from image2video_synthesis_using_cinns_tpu.losses.flow_loss import flow_loss

    post_dim = None
    post = jax.device_get(jax.jit(
        lambda ev_, x, key: encoder.apply(ev_, x, rngs={"sample": key})[0]
    )(enc_vars, seq[:, 1:], keys[0]))
    post = jnp.asarray(post.reshape(bs, -1))
    cond_img = seq[:, 0]

    def floss(fp_, post_, cond_):
        variables = {"params": {"flow": fp_, "embedder": frozen},
                     "buffers": buffers}
        gauss, logdet = network.apply(variables, post_, [cond_])
        return flow_loss(gauss, logdet)[0]

    @jax.jit
    def flow_scan(fp_, os2, post_, cond_, n):
        def body(carry, _):
            fp_, os2 = carry
            loss, grads = jax.value_and_grad(floss)(fp_, post_, cond_)
            updates, os2 = optimizer.update(grads, os2, fp_)
            fp_ = jax.tree.map(lambda p, u: p + u, fp_, updates)
            return (fp_, os2), loss
        return jax.lax.scan(body, (fp_, os2), None, length=k)

    box = {"s": (fp, os_)}

    def run_flow():
        box["s"], losses = flow_scan(box["s"][0], box["s"][1], post, cond_img,
                                     None)
        assert np.isfinite(jax.device_get(losses)).all()

    @jax.jit
    def flow_cost(fp_, os2, post_, cond_):
        loss, grads = jax.value_and_grad(floss)(fp_, post_, cond_)
        updates, os2 = optimizer.update(grads, os2, fp_)
        fp_ = jax.tree.map(lambda p, u: p + u, fp_, updates)
        return fp_, os2, loss

    fflops, fbytes = _cost(flow_cost, fp, os_, post, cond_img)

    run_enc()
    edt = _best(run_enc, repeats)
    run_flow()
    fdt = _best(run_flow, repeats)
    ceil = CEIL_BF16 if mp_dt is not None else CEIL_FP32
    _report(f"stage2 ENCODER fwd bs={bs} {dtype}", eflops, ebytes, edt, k,
            ceil)
    _report(f"stage2 FLOW step bs={bs} fp32", fflops, fbytes, fdt, k,
            CEIL_FP32)


def audit_ae(bs, k, repeats, img=64):
    from image2video_synthesis_using_cinns_tpu.models.backbones.lpips import LPIPS
    from image2video_synthesis_using_cinns_tpu.models.stage1.patch_disc import (
        NLayerDiscriminator,
    )
    from image2video_synthesis_using_cinns_tpu.models.stage2.biggan import BigAE
    from image2video_synthesis_using_cinns_tpu.train.stage2_ae import (
        make_ae_scan_step, make_ae_step,
    )

    opt = stage2_ae_config(PRESETS["bair"])
    network = BigAE(config=dict(opt.AE))
    gv = jax.jit(network.init)({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((1, img, img, 3)))
    disc = NLayerDiscriminator.from_config(opt.Discriminator_Patch)
    dv = jax.jit(disc.init)({"params": jax.random.PRNGKey(1)},
                            jnp.zeros((1, img, img, 3)))
    lpips = LPIPS()
    lpv = jax.jit(lpips.init)({"params": jax.random.PRNGKey(2)},
                              jnp.zeros((1, img, img, 3)),
                              jnp.zeros((1, img, img, 3)))
    og_opt, od_opt = adam_torch(1e-4), adam_torch(1e-4)
    aug = build_augment(img, {"brightness": 0.2}, False, True)
    train_step, _ = make_ae_step(network, disc, lpips, lpv, og_opt, od_opt,
                                 1e-6, 0)
    multi = make_ae_scan_step(network, disc, lpips, lpv, og_opt, od_opt, 1e-6,
                              0, augment=aug, true_b=bs, img_size=img)

    lv = jnp.zeros(())
    og, od = og_opt.init((gv["params"], lv)), od_opt.init(dv["params"])
    epoch = jnp.asarray(1)

    # pure step with LPIPS weights as a jit ARGUMENT (not a closure constant:
    # remote-compile transport limit — see train/stage2.py docstring)
    from image2video_synthesis_using_cinns_tpu.train.stage2_ae import _build_step

    pure = _build_step(network, disc, lpips, og_opt, od_opt, 1e-6, 0)
    cost_fn = jax.jit(
        lambda gv_, lv_, dv_, og_, od_, lpv_, im_: pure(
            gv_, lv_, dv_, og_, od_, lpv_, im_, epoch, True))
    im = jnp.zeros((bs, img, img, 3), jnp.float32)
    flops, bytes_acc = _cost(cost_fn, gv, lv, dv, og, od, lpv, im)

    rngnp = np.random.default_rng(0)
    raws = jax.device_put(rngnp.integers(
        0, 255, (k, bs, 1, img, img, 3), dtype=np.uint8))
    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(42), j)
                      for j in range(k)])
    jax.block_until_ready((raws, keys))
    state = {"s": (gv, lv, dv, og, od)}

    def run():
        gv_, lv_, dv_, og_, od_ = state["s"]
        gv_, lv_, dv_, og_, od_, _, _, metrics = multi(
            gv_, lv_, dv_, og_, od_, raws, keys, epoch)
        state["s"] = (gv_, lv_, dv_, og_, od_)
        assert np.isfinite(jax.device_get(metrics)["Loss"]).all()

    run()
    dt = _best(run, repeats)
    _report(f"stage2 AE bs={bs} fp32", flops, bytes_acc, dt, k, CEIL_FP32)


def _stage1_setup(img, no_gp=False):
    from image2video_synthesis_using_cinns_tpu.train.stage1 import build_stage1
    from image2video_synthesis_using_cinns_tpu.train.stage1_step import (
        Stage1State,
    )

    preset = "bair" if img == 64 else "landscape"
    opt = stage1_config(PRESETS[preset])
    tr = dict(opt.Training, compute_dtype="bfloat16", fused_step=True)
    if no_gp:
        tr["w_GP"] = 0  # A/B: quantify the GP double-backward's share
    bundle, dec_vars, enc_vars, dt_vars, ds_vars = build_stage1(
        opt, jax.random.PRNGKey(0))
    opts = (adam_torch(2e-4, betas=(0.5, 0.9)),) * 3
    state = Stage1State(
        dec_vars, enc_vars, dt_vars, ds_vars,
        opts[0].init((dec_vars["params"], enc_vars["params"])),
        opts[1].init(dt_vars["params"]), opts[2].init(ds_vars["params"]),
    )
    return opt, tr, bundle, opts, state


def audit_stage1(bs, k, repeats, img=64):
    from image2video_synthesis_using_cinns_tpu.train.stage1_step import (
        make_stage1_scan_step,
    )

    opt, tr, bundle, opts, state = _stage1_setup(img)
    aug = build_augment(img, {}, False, True)
    multi = make_stage1_scan_step(bundle, tr, opts, aug, true_b=bs,
                                  img_size=img)

    # cost analysis: the fused whole-step program with the LPIPS weights as a
    # jit ARGUMENT (closure capture overflows the remote-compile transport)
    from image2video_synthesis_using_cinns_tpu.train.stage1_step import (
        _build_phases, _compose_whole_step,
    )

    whole = _compose_whole_step(*_build_phases(bundle, tr, opts))
    T = 17
    seq = jnp.zeros((bs, T, img, img, 3), jnp.float32)
    epoch = jnp.int32(int(tr["pretrain"]))
    rng = jax.random.PRNGKey(7)
    ks, ksub, kp = jax.random.split(rng, 3)
    cost_fn = jax.jit(lambda st, lp_, seq_, a, b, c: whole(
        st, lp_, seq_, epoch, a, b, c))
    flops, bytes_acc = _cost(cost_fn, state, bundle.lpips_vars, seq, ks, ksub,
                             kp)

    rngnp = np.random.default_rng(0)
    raws = jax.device_put(rngnp.integers(
        0, 255, (k, bs, T, img, img, 3), dtype=np.uint8))
    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(42), j)
                      for j in range(k)])
    jax.block_until_ready((raws, keys))
    box = {"s": state}

    def run():
        box["s"], metrics, _, _ = multi(box["s"], raws, epoch, keys)
        assert np.isfinite(jax.device_get(metrics)["Loss_VAE"]).all()

    run()
    dt = _best(run, repeats)
    _report(f"stage1 {img}px bs={bs} fused bf16", flops, bytes_acc, dt, k,
            CEIL_BF16)


def audit_stage1_phases(bs, k, repeats, img=64, no_gp=False):
    """Disc phase vs VAE phase: separate cost analysis + separate scan timing
    (each phase scanned K times with its own state threaded as the carry)."""
    from image2video_synthesis_using_cinns_tpu.train.stage1_step import (
        _build_phases,
    )

    opt, tr, bundle, opts, state = _stage1_setup(img, no_gp=no_gp)
    disc_step, vae_step = _build_phases(bundle, tr, opts)

    T = 17
    seq = jnp.zeros((bs, T, img, img, 3), jnp.float32)
    epoch = jnp.int32(int(tr["pretrain"]))
    ks, ksub, kp = jax.random.split(jax.random.PRNGKey(7), 3)
    lp = bundle.lpips_vars

    disc_j = jax.jit(lambda dtv, dsv, odt, ods, dv, ev, seq_, ks_, ksub_, kp_:
                     disc_step(dtv, dsv, odt, ods, dv, ev, seq_, epoch,
                               ks_, ksub_, kp_))
    vae_j = jax.jit(lambda dv, ev, oae, dtv, dsv, lp_, seq_, ks_, ksub_, kp_:
                    vae_step(dv, ev, oae, dtv, dsv, lp_, seq_, epoch,
                             ks_, ksub_, kp_))

    dflops, dbytes = _cost(disc_j, state.disc_t_vars, state.disc_s_vars,
                           state.opt_dt, state.opt_ds, state.dec_vars,
                           state.enc_vars, seq, ks, ksub, kp)
    vflops, vbytes = _cost(vae_j, state.dec_vars, state.enc_vars,
                           state.opt_ae, state.disc_t_vars, state.disc_s_vars,
                           lp, seq, ks, ksub, kp)

    # scan each phase alone: thread its own state, fresh keys per iteration
    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(42), j)
                      for j in range(k)])

    @jax.jit
    def disc_scan(dtv, dsv, odt, ods, dv, ev, seq_, keys_):
        def body(carry, key):
            dtv, dsv, odt, ods = carry
            k3 = jax.random.split(key, 3)
            dtv, dsv, odt, ods, _, m = disc_step(
                dtv, dsv, odt, ods, dv, ev, seq_, epoch, k3[0], k3[1], k3[2])
            return (dtv, dsv, odt, ods), m
        carry, ms = jax.lax.scan(body, (dtv, dsv, odt, ods), keys_)
        return carry, ms

    @jax.jit
    def vae_scan(dv, ev, oae, dtv, dsv, lp_, seq_, keys_):
        def body(carry, key):
            dv, ev, oae = carry
            k3 = jax.random.split(key, 3)
            dv, ev, oae, m = vae_step(dv, ev, oae, dtv, dsv, lp_, seq_,
                                      epoch, k3[0], k3[1], k3[2])
            return (dv, ev, oae), m
        carry, ms = jax.lax.scan(body, (dv, ev, oae), keys_)
        return carry, ms

    seq_dev = jax.device_put(np.random.default_rng(0).random(
        (bs, T, img, img, 3), np.float32) * 2 - 1)
    jax.block_until_ready(seq_dev)

    def run_disc():
        carry, ms = disc_scan(state.disc_t_vars, state.disc_s_vars,
                              state.opt_dt, state.opt_ds, state.dec_vars,
                              state.enc_vars, seq_dev, keys)
        assert np.isfinite(jax.device_get(ms)["Loss_Disc_T"]).all()

    def run_vae():
        carry, ms = vae_scan(state.dec_vars, state.enc_vars, state.opt_ae,
                             state.disc_t_vars, state.disc_s_vars, lp,
                             seq_dev, keys)
        assert np.isfinite(jax.device_get(ms)["Loss_VAE"]).all()

    run_disc()
    ddt = _best(run_disc, repeats)
    run_vae()
    vdt = _best(run_vae, repeats)
    tag = " no-GP" if no_gp else ""
    _report(f"stage1 {img}px DISC phase bf16{tag}", dflops, dbytes, ddt, k,
            CEIL_BF16)
    _report(f"stage1 {img}px VAE phase bf16{tag}", vflops, vbytes, vdt, k,
            CEIL_BF16)


_S2B_MARKERS = ("space-to-batch", "space_to_batch", "SpaceToBatch")


def _scan_hlo(label, compiled_text):
    """Count space-to-batch signatures in optimized HLO text.

    XLA:TPU's SpaceToBatchConverter stamps rewritten graphs via op names /
    metadata; as a calibration backstop we also count convolutions whose
    operand carries the rewrite's signature haloed block dim (a trailing
    (..., blocks, 9|27, C) operand — see BASELINE.md round-3 'conv
    lowering'). The known-positive control below validates whichever marker
    this XLA version emits."""
    import re

    hits = {m: compiled_text.count(m) for m in _S2B_MARKERS}
    halo = len(re.findall(r"f32\[\d+,\d+,\d+,(?:9|27),\d+\]", compiled_text))
    halo += len(re.findall(r"bf16\[\d+,\d+,\d+,(?:9|27),\d+\]", compiled_text))
    nconv = compiled_text.count(" convolution(")
    print(f"[{label}] convs={nconv} s2b-markers={hits} haloed-9/27-dim "
          f"operands={halo}")
    return hits, halo


def s2b_check(bs, img=64):
    """Judge question (VERDICT round-3 #6): does the space-to-batch rewrite
    fire inside the stage-1 discriminators' strided convs at training batch
    sizes? Compile a known-positive control (bs=6 decoder conv, direct
    lowering) to calibrate the marker, then scan both phase programs."""
    from image2video_synthesis_using_cinns_tpu.train.stage1_step import (
        _build_phases,
    )

    # known-positive control: direct-lowered 3^3 conv at batch 6 (the exact
    # case round 3 measured the rewrite on — raw lax conv, no fold gate)
    @jax.jit
    def ctrl(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    x = jnp.zeros((6, 16, 64, 64, 128), jnp.bfloat16)
    w = jnp.zeros((3, 3, 3, 128, 128), jnp.bfloat16)
    txt = ctrl.lower(x, w).compile().as_text()
    _scan_hlo("CONTROL bs=6 direct 3^3 conv (rewrite expected)", txt)

    opt, tr, bundle, opts, state = _stage1_setup(img)
    disc_step, vae_step = _build_phases(bundle, tr, opts)
    T = 17
    seq = jnp.zeros((bs, T, img, img, 3), jnp.float32)
    epoch = jnp.int32(int(tr["pretrain"]))
    ks, ksub, kp = jax.random.split(jax.random.PRNGKey(7), 3)
    lp = bundle.lpips_vars

    disc_j = jax.jit(lambda dtv, dsv, odt, ods, dv, ev, seq_, ks_, ksub_, kp_:
                     disc_step(dtv, dsv, odt, ods, dv, ev, seq_, epoch,
                               ks_, ksub_, kp_))
    vae_j = jax.jit(lambda dv, ev, oae, dtv, dsv, lp_, seq_, ks_, ksub_, kp_:
                    vae_step(dv, ev, oae, dtv, dsv, lp_, seq_, epoch,
                             ks_, ksub_, kp_))
    txt = disc_j.lower(state.disc_t_vars, state.disc_s_vars, state.opt_dt,
                       state.opt_ds, state.dec_vars, state.enc_vars, seq,
                       ks, ksub, kp).compile().as_text()
    _scan_hlo(f"stage1 DISC phase bs={bs}", txt)
    txt = vae_j.lower(state.dec_vars, state.enc_vars, state.opt_ae,
                      state.disc_t_vars, state.disc_s_vars, lp, seq,
                      ks, ksub, kp).compile().as_text()
    _scan_hlo(f"stage1 VAE phase bs={bs}", txt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["stage1", "stage2", "ae"])
    ap.add_argument("--bs", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--img", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--phases", action="store_true")
    ap.add_argument("--components", action="store_true")
    ap.add_argument("--no-gp", action="store_true",
                    help="stage-1 phases with w_GP=0 (GP cost A/B)")
    ap.add_argument("--s2b-check", action="store_true",
                    help="scan optimized HLO for space-to-batch rewrites")
    ap.add_argument("--dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    a = ap.parse_args()
    if a.which == "stage2":
        if a.components:
            audit_stage2_components(a.bs or 50, a.k or 8, a.repeats, a.dtype)
        else:
            audit_stage2(a.bs or 50, a.k or 8, a.repeats, a.dtype)
    elif a.which == "ae":
        audit_ae(a.bs or 30, a.k or 8, a.repeats)
    elif a.s2b_check:
        s2b_check(a.bs or (10 if a.img == 64 else 7), img=a.img)
    elif a.phases:
        audit_stage1_phases(a.bs or (10 if a.img == 64 else 7), a.k or 4,
                            a.repeats, img=a.img, no_gp=a.no_gp)
    else:
        audit_stage1(a.bs or (10 if a.img == 64 else 7), a.k or 4, a.repeats,
                     img=a.img)


if __name__ == "__main__":
    main()
