"""Training-throughput microbenchmarks behind the BASELINE.md tables.

Measures the trainer-equivalent single-dispatch path (augment dispatch +
step dispatch(es) + per-step metric fetch) against the scanned
``steps_per_dispatch`` path for each trainer, at the full reference sizes,
on the current default device (run on the TPU; the relay's per-RPC latency
varies run-to-run, so compare the ratio, not absolute ms — see CLAUDE.md
timing gotchas: metric fetches are the only reliable barriers here).

Usage:
    python scripts/bench_training.py stage2         # cINN, bs=50, K=8
    python scripts/bench_training.py ae             # AE,  bs=30, K=8
    python scripts/bench_training.py stage1         # fused bf16, bs=10, K=4
    python scripts/bench_training.py stage1 --img 128   # landscape family
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


def bench_stage2(bs: int, k: int, repeats: int, dtype: str = "float32"):
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
    # --dtype bfloat16: frozen posterior encoder in bf16 (Training.compute_dtype)
    mp_dt = jnp.bfloat16 if dtype in ("bfloat16", "bf16") else None
    step, _ = make_train_step(network, encoder, enc_vars, optimizer, control=False,
                              mp_dt=mp_dt)
    multi = make_scan_step(network, encoder, enc_vars, optimizer, control=False,
                           augment=aug, true_b=bs, mp_dt=mp_dt)

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (bs, T, img, img, 3), dtype=np.uint8)
    raws, conds = np.stack([raw] * k), np.zeros((k, bs, 3), np.float32)
    root = jax.random.PRNGKey(42)

    def single(fp, os_, n, base):
        t0 = time.perf_counter()
        for j in range(n):
            key = jax.random.fold_in(root, base + j)
            seq = aug(jnp.asarray(raw), key)
            fp, os_, aux = step(fp, os_, frozen, buffers, seq,
                                jnp.zeros((bs, 3)), jax.random.fold_in(key, 2))
            _ = {kk: float(v) for kk, v in aux.items()}
        return fp, os_, time.perf_counter() - t0

    def scanned(fp, os_, base):
        keys = jnp.stack([jax.random.fold_in(root, base + j) for j in range(k)])
        t0 = time.perf_counter()
        fp, os_, auxs = multi(fp, os_, frozen, buffers, jnp.asarray(raws),
                              jnp.asarray(conds), keys)
        assert np.isfinite(jax.device_get(auxs)["Loss"]).all()
        return fp, os_, time.perf_counter() - t0

    return _run("stage2 cINN", single, scanned, (fp, os_), k, repeats)


def bench_ae(bs: int, k: int, repeats: int, img: int = 64):
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
                              jnp.zeros((1, img, img, 3)), jnp.zeros((1, img, img, 3)))
    og_opt, od_opt = adam_torch(1e-4), adam_torch(1e-4)
    aug = build_augment(img, {"brightness": 0.2}, False, True)
    train_step, _ = make_ae_step(network, disc, lpips, lpv, og_opt, od_opt, 1e-6, 0)
    multi = make_ae_scan_step(network, disc, lpips, lpv, og_opt, od_opt, 1e-6, 0,
                              augment=aug, true_b=bs, img_size=img)

    lv = jnp.zeros(())
    og, od = og_opt.init((gv["params"], lv)), od_opt.init(dv["params"])
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (bs, 1, img, img, 3), dtype=np.uint8)
    raws = np.stack([raw] * k)
    root, epoch = jax.random.PRNGKey(42), jnp.asarray(1)

    def single(state, n, base):
        gv, lv, dv, og, od = state
        t0 = time.perf_counter()
        for j in range(n):
            key = jax.random.fold_in(root, base + j)
            im = aug(jnp.asarray(raw), key)[:, 0]
            gv, lv, dv, og, od, metrics, _ = train_step(gv, lv, dv, og, od, im, epoch)
            _ = {kk: float(v) for kk, v in metrics.items()}
        return (gv, lv, dv, og, od), time.perf_counter() - t0

    def scanned(state, base):
        gv, lv, dv, og, od = state
        keys = jnp.stack([jax.random.fold_in(root, base + j) for j in range(k)])
        t0 = time.perf_counter()
        gv, lv, dv, og, od, _, _, metrics = multi(
            gv, lv, dv, og, od, jnp.asarray(raws), keys, epoch)
        assert np.isfinite(jax.device_get(metrics)["Loss"]).all()
        return (gv, lv, dv, og, od), time.perf_counter() - t0

    return _run("stage2 AE", single, scanned, (gv, lv, dv, og, od), k, repeats,
                packed_state=True)


def bench_stage1(bs: int, k: int, repeats: int, img: int = 64):
    from image2video_synthesis_using_cinns_tpu.train.stage1 import build_stage1
    from image2video_synthesis_using_cinns_tpu.train.stage1_step import (
        Stage1State, make_stage1_scan_step, make_stage1_train_step,
    )

    preset = "bair" if img == 64 else "landscape"
    opt = stage1_config(PRESETS[preset])
    tr = dict(opt.Training, compute_dtype="bfloat16", fused_step=True)
    bundle, dec_vars, enc_vars, dt_vars, ds_vars = build_stage1(
        opt, jax.random.PRNGKey(0))
    opts = (adam_torch(2e-4, betas=(0.5, 0.9)),) * 3
    aug = build_augment(img, {}, False, True)
    step = make_stage1_train_step(bundle, tr, opts)
    multi = make_stage1_scan_step(bundle, tr, opts, aug, true_b=bs, img_size=img)

    state = Stage1State(
        dec_vars, enc_vars, dt_vars, ds_vars,
        opts[0].init((dec_vars["params"], enc_vars["params"])),
        opts[1].init(dt_vars["params"]), opts[2].init(ds_vars["params"]),
    )
    T = 17
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (bs, T, img, img, 3), dtype=np.uint8)
    raws = np.stack([raw] * k)
    root, epoch = jax.random.PRNGKey(42), jnp.int32(int(tr["pretrain"]))

    def single(state, n, base):
        t0 = time.perf_counter()
        for j in range(n):
            key = jax.random.fold_in(root, base + j)
            seq = aug(jnp.asarray(raw), key)
            state, m, _ = step(state, seq, epoch, jax.random.fold_in(key, 1))
            _ = {kk: float(v) for kk, v in m.items()}
        return state, time.perf_counter() - t0

    def scanned(state, base):
        keys = jnp.stack([jax.random.fold_in(root, base + j) for j in range(k)])
        t0 = time.perf_counter()
        state, metrics, _, _ = multi(state, jnp.asarray(raws), epoch, keys)
        assert np.isfinite(jax.device_get(metrics)["Loss_VAE"]).all()
        return state, time.perf_counter() - t0

    return _run(f"stage1 {img}px (fused bf16)", single, scanned, state, k,
                repeats, packed_state=True)


def _run(label, single, scanned, state, k, repeats, packed_state=False):
    """Compile both paths, then run timed repeats; report best."""
    print(f"[{label}] compiling...", flush=True)
    if packed_state:
        state, _ = single(state, 1, 0)
        state, _ = scanned(state, 1)
        ts, tm = [], []
        for i in range(repeats):
            state, dt = single(state, k, 10 * (i + 1))
            ts.append(dt)
        for i in range(repeats):
            state, dt = scanned(state, 10 * (i + 7))
            tm.append(dt)
    else:
        fp, os_ = state
        fp, os_, _ = single(fp, os_, 1, 0)
        fp, os_, _ = scanned(fp, os_, 1)
        ts, tm = [], []
        for i in range(repeats):
            fp, os_, dt = single(fp, os_, k, 10 * (i + 1))
            ts.append(dt)
        for i in range(repeats):
            fp, os_, dt = scanned(fp, os_, 10 * (i + 7))
            tm.append(dt)
    bs_, bm = min(ts) / k, min(tm) / k
    print(f"[{label}] single-step dispatch: {bs_*1000:.1f} ms/step")
    print(f"[{label}] scanned K={k}:        {bm*1000:.1f} ms/step")
    print(f"[{label}] speedup: {bs_/bm:.2f}x")
    return bs_ / bm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["stage1", "stage2", "ae"])
    ap.add_argument("--bs", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--img", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="stage2 only: frozen-encoder compute dtype")
    a = ap.parse_args()
    if a.which == "stage2":
        bench_stage2(a.bs or 50, a.k or 8, a.repeats, dtype=a.dtype)
    elif a.which == "ae":
        bench_ae(a.bs or 30, a.k or 8, a.repeats)
    else:
        bench_stage1(a.bs or (10 if a.img == 64 else 7), a.k or 4, a.repeats,
                     img=a.img)


if __name__ == "__main__":
    main()
