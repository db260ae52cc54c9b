"""Endpoint-control variant: facade with cond, stage-2 control training smoke."""

import os

import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu import config as cfg
from image2video_synthesis_using_cinns_tpu.models.facade import Model
from image2video_synthesis_using_cinns_tpu.testing import (
    PRESETS,
    make_bair_data_dir,
    make_model_dir,
)


@pytest.fixture(scope="module")
def control_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ctrl")
    return make_model_dir(str(root), preset="tiny", control=True)


def test_control_facade_forward(control_dir):
    p = PRESETS["tiny"]
    model = Model(control_dir + "/", vid_length=8, seed=1)
    assert model.flow.control
    rng = np.random.default_rng(0)
    x0 = rng.uniform(-1, 1, (2, 3, p["img_size"], p["img_size"])).astype(np.float32)
    cond = rng.uniform(0.1, 0.9, (2, 3)).astype(np.float32)
    vid = model(x0, cond=cond)
    assert vid.shape == (2, 8, 3, p["img_size"], p["img_size"])

    # the endpoint conditioning must influence the output
    res = np.zeros((2, p["z_dim"]), np.float32)
    v1 = model.forward(x0, cond=cond, residual=res)
    v2 = model.forward(x0, cond=1.0 - cond, residual=res)
    assert not np.allclose(np.asarray(v1), np.asarray(v2))


def test_control_training_smoke(tmp_path, control_dir):
    from image2video_synthesis_using_cinns_tpu.train.stage2 import main

    data_dir = make_bair_data_dir(
        str(tmp_path / "data") + "/", img=PRESETS["tiny"]["img_size"]
    )
    opt = cfg.load(os.path.join(control_dir, "config_stage2.yaml"))
    opt.Data["data_path"] = data_dir
    opt.Training["bs"] = 2
    opt.Training["bs_eval"] = 2
    opt.Training["workers"] = 2
    opt.Training["n_epochs"] = 1
    opt.Training["save_path"] = str(tmp_path / "out")
    out = main(opt, max_steps=2, eval_fvd=False)
    assert np.isfinite(out["train_loss"]).all()


def test_bf16_facade(control_dir):
    p = PRESETS["tiny"]
    model = Model(control_dir + "/", vid_length=8, seed=1, compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    x0 = rng.uniform(-1, 1, (1, 3, p["img_size"], p["img_size"])).astype(np.float32)
    cond = rng.uniform(0.1, 0.9, (1, 3)).astype(np.float32)
    vid = np.asarray(model(x0, cond=cond))
    assert vid.dtype == np.float32
    assert np.isfinite(vid).all() and np.abs(vid).max() <= 1.0


def test_embed_pos_matches_reference_formula_at_boundaries():
    """Pin embed_pos against a verbatim transcription of the reference
    (stage2_cINN/modules/INN.py:49-57: ``(pos * 10 - 1e-4).long()`` with
    truncation toward zero), including exact bin boundaries — the reference's
    own -1e-4 pulls boundary values into the lower bin."""
    import jax.numpy as jnp

    from image2video_synthesis_using_cinns_tpu.models.stage2.inn import (
        SupervisedTransformer,
    )

    net = SupervisedTransformer(
        flow_in_channels=16, flow_embedding_channels=16, flow_mid_channels=32,
        flow_hidden_depth=2, n_flows=4, control=True,
    )
    boundaries = np.array([0.0, 0.1, 0.2, 0.5, 0.9, 1.0])
    eps = 1e-6
    vals = np.concatenate([boundaries, boundaries[1:] - eps, boundaries[:-1] + eps])
    pos = np.stack([vals, vals[::-1], np.full_like(vals, 0.35)], axis=1).astype(np.float32)

    ours = np.asarray(
        net.apply({}, jnp.asarray(pos), method=SupervisedTransformer.embed_pos)
    )

    n = 10
    idx = np.trunc(pos * n - 1e-4).astype(np.int64)  # torch .long(): trunc to 0
    ref = np.zeros((pos.shape[0], 3 * n), np.float32)
    for d in range(3):
        ref[np.arange(pos.shape[0]), d * n + np.clip(idx[:, d], 0, n - 1)] = 1
    np.testing.assert_array_equal(ours, ref)


def test_control_scan_steps_match_single(tmp_path, control_dir):
    """steps_per_dispatch on the CONTROL variant (the shipped
    bair_control config defaults to 8): the scanned chunk must thread the
    (K, B, 3) endpoint positions through the scan and reproduce K single
    dispatches exactly."""
    import jax

    from image2video_synthesis_using_cinns_tpu.train.stage2 import main
    from image2video_synthesis_using_cinns_tpu.utils import checkpoint as ckpt_io

    data_dir = make_bair_data_dir(
        str(tmp_path / "data") + "/", n_videos=10,
        img=PRESETS["tiny"]["img_size"], modes=("train", "eval"),
    )

    def run(spd, out_name):
        opt = cfg.load(os.path.join(control_dir, "config_stage2.yaml"))
        opt.Data["data_path"] = data_dir
        opt.Training["bs"] = 2
        opt.Training["bs_eval"] = 2
        opt.Training["workers"] = 2
        opt.Training["n_epochs"] = 1
        opt.Training["steps_per_dispatch"] = spd
        opt.Training["save_path"] = str(tmp_path / out_name)
        out = main(opt, max_steps=5, eval_fvd=False)
        payload = ckpt_io.load(os.path.join(out["save_path"], "cINN_latest.msgpack"))
        return payload["state_dict"]["params"]["flow"], out["train_loss"]

    flow_a, loss_a = run(1, "single")
    flow_b, loss_b = run(2, "scanned")

    np.testing.assert_allclose(np.asarray(loss_a), np.asarray(loss_b), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(flow_a), jax.tree.leaves(flow_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
