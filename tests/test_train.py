"""Training smoke tests: a few real optimisation steps on synthetic data.

These exercise the full jitted train steps (stage-1 three-optimizer
adversarial step; stage-2 flow NLL step with frozen nets) including data
loading, on-device augmentation, actnorm data-dependent init, checkpointing
and CSV logging. FVD evaluation is skipped (no I3D weights in CI).
"""

import os

import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu import config as cfg
from image2video_synthesis_using_cinns_tpu.testing import (
    PRESETS,
    make_bair_data_dir,
    make_model_dir,
    stage1_config,
)

P = PRESETS["tiny"]


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("bair_data")
    return make_bair_data_dir(str(root) + "/", img=P["img_size"])


def test_stage1_training_smoke(tmp_path, data_dir, monkeypatch):
    from image2video_synthesis_using_cinns_tpu.train.stage1 import main
    from image2video_synthesis_using_cinns_tpu.utils.logging import WandbSink

    # stub sink: record media pushes even with wandb disabled, so the media
    # call points (reference stage1_VAE/main.py:49,83) stay wired
    videos = []
    monkeypatch.setattr(
        WandbSink, "log_video", lambda self, key, frames, fps=3: videos.append(key)
    )

    opt = stage1_config(P)
    opt.Data["data_path"] = data_dir
    opt.Data["framestore"] = "auto"  # exercise the packed-cache input path
    opt.Training["bs"] = 2
    opt.Training["bs_eval"] = 2
    opt.Training["workers"] = 2
    opt.Training["n_epochs"] = 1
    opt.Training["save_path"] = str(tmp_path)
    out = main(opt, max_steps=2, eval_fvd=False)
    assert os.path.exists(os.path.join(data_dir, ".framestore"))
    assert "train_video" in videos and "eval_video" in videos

    save_path = out["save_path"]
    assert os.path.exists(os.path.join(save_path, "config_stage1.yaml"))
    for n in ("GEN", "ENC", "DISC_t", "DISC_s"):
        assert os.path.exists(os.path.join(save_path, f"latest_checkpoint_{n}.msgpack"))
    assert os.path.exists(os.path.join(save_path, "best_PFVD_GEN.msgpack"))
    # losses must be finite
    train_losses = out["state"] is not None
    assert train_losses


def test_stage2_training_smoke(tmp_path, data_dir):
    from image2video_synthesis_using_cinns_tpu.train.stage2 import main

    root = str(tmp_path / "ckpts")
    stage2_dir = make_model_dir(root, preset="tiny")
    opt = cfg.load(os.path.join(stage2_dir, "config_stage2.yaml"))
    opt.Data["data_path"] = data_dir
    opt.Training["bs"] = 2
    opt.Training["bs_eval"] = 2
    opt.Training["workers"] = 2
    opt.Training["n_epochs"] = 1
    opt.Training["save_path"] = str(tmp_path / "out")
    out = main(opt, max_steps=2, eval_fvd=False)

    assert os.path.exists(os.path.join(out["save_path"], "config_stage2.yaml"))
    assert os.path.exists(os.path.join(out["save_path"], "cINN.msgpack"))
    assert np.isfinite(out["train_loss"]).all()


def test_stage2_scan_steps_match_single(tmp_path):
    """Training.steps_per_dispatch=K fuses K optimisation steps into one
    lax.scan dispatch (amortising per-dispatch RPC); the training trajectory
    must be identical to K sequential single-step dispatches — including the
    per-step RNG keys, the on-device augmentation and the pad-row semantics
    (bs=2 on the 8-device CPU mesh pads every batch, exercising the
    augmented-pad replication in make_scan_step)."""
    import jax

    from image2video_synthesis_using_cinns_tpu.train.stage2 import main
    from image2video_synthesis_using_cinns_tpu.utils import checkpoint as ckpt_io

    root = str(tmp_path / "ckpts")
    stage2_dir = make_model_dir(root, preset="tiny")
    # 10 clips -> 5 batches/epoch at bs=2, enough for two scanned chunks
    big_data = make_bair_data_dir(
        str(tmp_path / "data") + "/", n_videos=10, img=P["img_size"],
        modes=("train", "eval"),
    )

    def run(spd, out_name):
        opt = cfg.load(os.path.join(stage2_dir, "config_stage2.yaml"))
        opt.Data["data_path"] = big_data
        opt.Training["bs"] = 2
        opt.Training["bs_eval"] = 2
        opt.Training["workers"] = 2
        opt.Training["n_epochs"] = 1
        opt.Training["steps_per_dispatch"] = spd
        opt.Training["save_path"] = str(tmp_path / out_name)
        out = main(opt, max_steps=5, eval_fvd=False)
        payload = ckpt_io.load(
            os.path.join(out["save_path"], "cINN_latest.msgpack")
        )
        return payload["state_dict"]["params"]["flow"], out["train_loss"]

    # 5 steps: 1 single (ActNorm init batch) + two scanned chunks of 2
    flow_a, loss_a = run(1, "single")
    flow_b, loss_b = run(2, "scanned")

    np.testing.assert_allclose(np.asarray(loss_a), np.asarray(loss_b), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(flow_a), jax.tree.leaves(flow_b)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )


def test_stage2_resume(tmp_path, data_dir):
    """Stage-2 crash-resume (cINN_latest checkpoint) — an addition over the
    reference, which cannot resume stage-2 training (SURVEY §5.3)."""
    from image2video_synthesis_using_cinns_tpu.train.stage2 import main

    root = str(tmp_path / "ckpts")
    stage2_dir = make_model_dir(root, preset="tiny")
    opt = cfg.load(os.path.join(stage2_dir, "config_stage2.yaml"))
    opt.Data["data_path"] = data_dir
    opt.Training["bs"] = 2
    opt.Training["bs_eval"] = 2
    opt.Training["workers"] = 2
    opt.Training["n_epochs"] = 1
    opt.Training["save_path"] = str(tmp_path / "out")
    first = main(opt, max_steps=1, eval_fvd=False)
    assert os.path.exists(os.path.join(first["save_path"], "cINN_latest.msgpack"))

    opt2 = cfg.load(os.path.join(stage2_dir, "config_stage2.yaml"))
    opt2.Data["data_path"] = data_dir
    opt2.Training["bs"] = 2
    opt2.Training["bs_eval"] = 2
    opt2.Training["workers"] = 2
    opt2.Training["n_epochs"] = 2
    opt2.Training["save_path"] = str(tmp_path / "out2")
    opt2.Training["reload_path"] = first["save_path"]
    second = main(opt2, max_steps=1, eval_fvd=False)
    assert np.isfinite(second["train_loss"]).all()


def test_preemption_guard_signal():
    """SIGTERM flips should_stop; restore() reinstates the prior handler
    (SURVEY §5.3 — TPU pools preempt with SIGTERM)."""
    import signal

    from image2video_synthesis_using_cinns_tpu.utils.preemption import (
        PreemptionGuard,
    )

    guard = PreemptionGuard()
    assert not guard.should_stop
    signal.raise_signal(signal.SIGTERM)
    assert guard.should_stop
    guard.restore()
    assert signal.getsignal(signal.SIGTERM) is not guard._handler


def test_stage2_preemption_checkpoints_and_resumes(tmp_path, data_dir, monkeypatch):
    """A preemption signal mid-epoch must end the epoch early but still write
    the atomic cINN_latest checkpoint, and a fresh run must resume from it —
    the full §5.3 story, driven through the real trainer loop."""
    import image2video_synthesis_using_cinns_tpu.train.stage2 as s2

    class FakeGuard:
        """Trips after the trainer has polled should_stop twice (i.e. after
        two optimisation steps)."""

        def __init__(self):
            self.polls = 0

        @property
        def should_stop(self):
            self.polls += 1
            return self.polls > 2

        def restore(self):
            pass

    monkeypatch.setattr(s2, "PreemptionGuard", FakeGuard)
    root = str(tmp_path / "ckpts")
    stage2_dir = make_model_dir(root, preset="tiny")
    opt = cfg.load(os.path.join(stage2_dir, "config_stage2.yaml"))
    opt.Data["data_path"] = data_dir
    opt.Training["bs"] = 2
    opt.Training["bs_eval"] = 2
    opt.Training["workers"] = 2
    opt.Training["n_epochs"] = 5  # preemption must cut this short
    opt.Training["save_path"] = str(tmp_path / "out")
    first = s2.main(opt, eval_fvd=False)
    latest = os.path.join(first["save_path"], "cINN_latest.msgpack")
    assert os.path.exists(latest), "preempted run must leave a resume ckpt"
    from image2video_synthesis_using_cinns_tpu.utils import checkpoint as ckpt_io

    assert int(ckpt_io.load(latest)["epoch"]) == 1, "stopped during epoch 0"

    monkeypatch.undo()
    opt2 = cfg.load(os.path.join(stage2_dir, "config_stage2.yaml"))
    opt2.Data["data_path"] = data_dir
    opt2.Training["bs"] = 2
    opt2.Training["bs_eval"] = 2
    opt2.Training["workers"] = 2
    opt2.Training["n_epochs"] = 2
    opt2.Training["save_path"] = str(tmp_path / "out2")
    opt2.Training["reload_path"] = first["save_path"]
    second = s2.main(opt2, max_steps=1, eval_fvd=False)
    assert np.isfinite(second["train_loss"]).all()


def test_stage1_scan_steps_match_single(tmp_path, data_dir):
    """Training.steps_per_dispatch=K on the stage-1 trainer: the scanned
    chunk (lax.scan over the fused whole-step with on-device augmentation)
    must reproduce K sequential single-step dispatches — per-step RNG keys,
    ActNorm-init first batch, pad-row semantics under the 8-device CPU mesh
    (bs=2 pads every batch)."""
    import jax

    from image2video_synthesis_using_cinns_tpu.train.stage1 import main

    big_data = make_bair_data_dir(
        str(tmp_path / "data") + "/", n_videos=10, img=P["img_size"],
        modes=("train", "eval"),
    )

    def run(spd, out_name):
        opt = stage1_config(P)
        opt.Data["data_path"] = big_data
        opt.Training["bs"] = 2
        opt.Training["bs_eval"] = 2
        opt.Training["workers"] = 2
        opt.Training["n_epochs"] = 1
        opt.Training["steps_per_dispatch"] = spd
        opt.Training["save_path"] = str(tmp_path / out_name)
        out = main(opt, max_steps=5, eval_fvd=False)
        return jax.device_get(out["state"])

    # 5 steps: 1 single (ActNorm init batch) + two scanned chunks of 2
    st_a = run(1, "single")
    st_b = run(2, "scanned")

    # Tolerances follow the AE scan test: the scan body fuses differently
    # from the standalone jit (~1e-7 reassociation noise) and adam_torch's
    # g/sqrt(v) normalisation amplifies that on tiny-grad leaves over 5
    # steps. A wiring bug (wrong key, pad rows, step order) shifts params at
    # O(1).
    for part in ("dec_vars", "enc_vars", "disc_t_vars", "disc_s_vars"):
        n_bad = n_tot = 0
        for a, b in zip(
            jax.tree.leaves(getattr(st_a, part)), jax.tree.leaves(getattr(st_b, part))
        ):
            a, b = np.asarray(a), np.asarray(b)
            n_bad += int((np.abs(a - b) > (1e-3 + 1e-2 * np.abs(b))).sum())
            n_tot += a.size
        assert n_bad / n_tot < 0.05, f"{part}: {n_bad}/{n_tot} params diverged"


def test_stage1_fused_step_matches_split():
    """Training.fused_step=true composes both phases into ONE XLA program;
    params/metrics must match the two-program step (same phase functions,
    different program boundaries). SGD so fp reassociation noise stays
    proportional to the gradients (see the DP test rationale)."""
    import jax
    import jax.numpy as jnp
    import optax

    from image2video_synthesis_using_cinns_tpu.testing import stage1_config
    from image2video_synthesis_using_cinns_tpu.train.stage1 import build_stage1
    from image2video_synthesis_using_cinns_tpu.train.stage1_step import (
        Stage1State,
        make_stage1_train_step,
    )

    opt = stage1_config(P)
    tr = opt.Training
    bundle, dec_vars, enc_vars, dt_vars, ds_vars = build_stage1(
        opt, jax.random.PRNGKey(0)
    )
    opts = (optax.sgd(1e-4),) * 3

    def fresh_state():
        return Stage1State(
            jax.tree.map(jnp.array, dec_vars),
            jax.tree.map(jnp.array, enc_vars),
            jax.tree.map(jnp.array, dt_vars),
            jax.tree.map(jnp.array, ds_vars),
            opts[0].init((dec_vars["params"], enc_vars["params"])),
            opts[1].init(dt_vars["params"]),
            opts[2].init(ds_vars["params"]),
        )

    seq = jax.random.uniform(
        jax.random.PRNGKey(5),
        (2, P["seq_length"], P["img_size"], P["img_size"], 3),
        minval=-1, maxval=1,
    )
    rng = jax.random.PRNGKey(7)
    epoch = jnp.int32(tr["pretrain"])  # gate open: all three updates fire

    split_step = make_stage1_train_step(bundle, tr, opts)
    st_a, m_a, _ = split_step(fresh_state(), seq, epoch, rng)

    tr_fused = dict(tr)
    tr_fused["fused_step"] = True
    fused_step = make_stage1_train_step(bundle, tr_fused, opts)
    st_b, m_b, _ = fused_step(fresh_state(), seq, epoch, rng)

    for k in m_a:
        np.testing.assert_allclose(
            float(m_a[k]), float(m_b[k]), rtol=2e-4, atol=2e-4, err_msg=k
        )
    for part in ("dec_vars", "enc_vars", "disc_t_vars", "disc_s_vars"):
        for a, b in zip(
            jax.tree.leaves(getattr(st_a, part)), jax.tree.leaves(getattr(st_b, part))
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-3, atol=1e-4, err_msg=part
            )


def test_stage1_bf16_step_close_to_fp32():
    """Training.compute_dtype=bfloat16 runs the heavy forwards in bf16 with
    fp32 params/losses; one step must stay finite and track the fp32 step."""
    import jax
    import jax.numpy as jnp
    import optax

    from image2video_synthesis_using_cinns_tpu.testing import stage1_config
    from image2video_synthesis_using_cinns_tpu.train.stage1 import build_stage1
    from image2video_synthesis_using_cinns_tpu.train.stage1_step import (
        Stage1State,
        make_stage1_train_step,
    )

    opt = stage1_config(P)
    tr = opt.Training
    bundle, dec_vars, enc_vars, dt_vars, ds_vars = build_stage1(
        opt, jax.random.PRNGKey(0)
    )
    opts = (optax.sgd(1e-4),) * 3

    def fresh_state():
        return Stage1State(
            jax.tree.map(jnp.array, dec_vars),
            jax.tree.map(jnp.array, enc_vars),
            jax.tree.map(jnp.array, dt_vars),
            jax.tree.map(jnp.array, ds_vars),
            opts[0].init((dec_vars["params"], enc_vars["params"])),
            opts[1].init(dt_vars["params"]),
            opts[2].init(ds_vars["params"]),
        )

    seq = jax.random.uniform(
        jax.random.PRNGKey(5),
        (2, P["seq_length"], P["img_size"], P["img_size"], 3),
        minval=-1, maxval=1,
    )
    rng = jax.random.PRNGKey(7)
    epoch = jnp.int32(tr["pretrain"])

    step32 = make_stage1_train_step(bundle, tr, opts)
    st32, m32, _ = step32(fresh_state(), seq, epoch, rng)

    tr_bf16 = dict(tr)
    tr_bf16["compute_dtype"] = "bfloat16"
    step16 = make_stage1_train_step(bundle, tr_bf16, opts)
    st16, m16, _ = step16(fresh_state(), seq, epoch, rng)

    for k, v in m16.items():
        assert np.isfinite(float(v)), k
    # bf16 forwards track fp32 losses on well-scaled metrics (the random-init
    # patch-disc logits are ~1e5 before ActNorm init, where bf16's ~1%
    # relative error dominates; finiteness is asserted above for all)
    for k in ("Loss_L1", "Loss_KL", "PSNR", "SSIM"):
        a, b = float(m32[k]), float(m16[k])
        assert abs(a - b) <= 0.05 * max(1.0, abs(a)), (k, a, b)
    # params remain fp32 and updated
    for leaf in jax.tree.leaves(st16.dec_vars["params"]):
        assert leaf.dtype == jnp.float32
