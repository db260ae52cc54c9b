"""Tests for the opt-in multi-host layer (parallel/distributed.py).

Fast tests pin the structural contracts in-process: the per-host batch
partition, the global-array assembly degenerating to plain sharding in
single-process mode, and the loader decoding exactly its host's slice of
every batch (SURVEY §5.8 names per-host input pipelines as part of the
parallelism component). The slow test is the real thing: it spawns TWO
separate Python processes that join one ``jax.distributed`` runtime (4
virtual CPU devices each, Gloo collectives between processes — the same
code path a TPU pod takes over DCN), drives the real stage-2 cINN trainer
through ``Training.distributed``, and compares the trajectory and final
checkpoint against a single-process 8-device run of the same config."""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu.parallel.distributed import (
    host_batch_slice,
    make_global_batch,
    maybe_initialize,
    put_global,
    put_global_batch,
)
from image2video_synthesis_using_cinns_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_maybe_initialize_noop_single_process():
    # falsy config: no jax.distributed.initialize call, identity process info
    assert maybe_initialize(None) == (0, 1)
    assert maybe_initialize(False) == (0, 1)


def test_host_batch_slice_partitions_exactly():
    """The per-host blocks are contiguous, ordered, disjoint and cover the
    global batch — matching the row-major device order of P('data')."""
    for pc in (1, 2, 4):
        got = []
        for pi in range(pc):
            s = host_batch_slice(8, pi, pc)
            got.extend(range(8)[s])
        assert got == list(range(8)), (pc, got)

    with pytest.raises(ValueError, match="divisible"):
        host_batch_slice(10, 0, 4)


def test_put_global_batch_single_process_is_shard_batch():
    mesh = make_mesh(8)
    batch = {"x": np.arange(16 * 3, dtype=np.float32).reshape(16, 3)}
    a = shard_batch(mesh, batch)["x"]
    b = put_global_batch(mesh, batch)["x"]
    assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_make_global_batch_single_process_pads_and_slices():
    """Single-process path: pad to the mesh multiple + true_b for the jitted
    slice; divisible batches pass through with true_b None."""
    mesh = make_mesh(8)
    sharded, true_b = make_global_batch(mesh, {"x": jnp.ones((10, 3))})
    assert sharded["x"].shape == (16, 3) and true_b == 10
    sharded, true_b = make_global_batch(mesh, {"x": jnp.ones((16, 3))})
    assert sharded["x"].shape == (16, 3) and true_b is None


def test_put_global_single_process_stacked_axis():
    mesh = make_mesh(8)
    sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data")
    )
    arr = np.ones((4, 8, 3), np.float32)
    out = put_global(sh, arr, batch_axis=1)
    assert out.shape == (4, 8, 3)
    np.testing.assert_array_equal(np.asarray(out), arr)


def test_loader_host_slices_assemble_to_global_batch(tmp_path):
    """Two simulated hosts (process_count=2) must decode disjoint contiguous
    halves of every batch that concatenate to the single-process batch — the
    same global order from the shared seed."""
    from image2video_synthesis_using_cinns_tpu.data import get_loader
    from image2video_synthesis_using_cinns_tpu.data.loader import Loader
    from image2video_synthesis_using_cinns_tpu.testing import (
        PRESETS,
        make_bair_data_dir,
        stage1_config,
    )

    P = PRESETS["tiny"]
    data_dir = make_bair_data_dir(
        str(tmp_path) + "/", n_videos=8, img=P["img_size"], modes=("train",)
    )
    opt = stage1_config(P)
    opt.Data["data_path"] = data_dir
    ds = get_loader("bair")(opt, mode="train")

    def batches(pi, pc):
        loader = Loader(
            ds, 4, workers=2, seed=7, process_index=pi, process_count=pc
        )
        return [b["seq_raw"] for b in loader.epoch_iter(epoch=1)]

    full = batches(0, 1)
    half0 = batches(0, 2)
    half1 = batches(1, 2)
    assert len(full) == len(half0) == len(half1) and len(full) > 0
    for f, h0, h1 in zip(full, half0, half1):
        assert h0.shape[0] == h1.shape[0] == f.shape[0] // 2
        np.testing.assert_array_equal(np.concatenate([h0, h1], axis=0), f)


@pytest.mark.slow
@pytest.mark.parametrize("spd", [1, 2])
def test_two_process_run_matches_single(tmp_path, spd):
    """REAL multi-process execution: two OS processes, one jax.distributed
    runtime, Gloo cross-process collectives, driving the real stage-2 cINN
    trainer end-to-end via Training.distributed. Asserts the multi-host
    trajectory and the process-0 checkpoint match a single-process 8-device
    spd=1 run of the same config (parallel/distributed.py's bit-identity
    design), and that only process 0 wrote files. ``spd=2`` additionally
    drives the scanned chunk path cross-process (per-batch async staging +
    on-device chunk assembly of globally-sharded rows, train/chunks.py)."""
    from image2video_synthesis_using_cinns_tpu import config as cfg
    from image2video_synthesis_using_cinns_tpu.testing import (
        make_bair_data_dir,
        make_model_dir,
    )
    from image2video_synthesis_using_cinns_tpu.train.stage2 import main as s2_main
    from image2video_synthesis_using_cinns_tpu.utils import checkpoint as ckpt_io

    # 16 clips / bs 8 → 2 mesh-divisible batches per epoch, no tail batch
    data_dir = make_bair_data_dir(
        str(tmp_path / "data") + "/", n_videos=16, img=32, modes=("train", "eval")
    )
    stage2_dir = make_model_dir(str(tmp_path / "ckpts"), preset="tiny")

    def mk_opt(k=1):
        opt = cfg.load(os.path.join(stage2_dir, "config_stage2.yaml"))
        opt.Data["data_path"] = data_dir
        opt.Training["bs"] = 8
        opt.Training["bs_eval"] = 8
        opt.Training["workers"] = 2
        opt.Training["n_epochs"] = 2
        opt.Training["steps_per_dispatch"] = k
        return opt

    max_steps = 4

    # ---- reference: single-process run on the 8-device CPU mesh ----
    opt = mk_opt()
    opt.Training["save_path"] = str(tmp_path / "single")
    ref = s2_main(opt, max_steps=max_steps, eval_fvd=False)

    # ---- 2-process run: 4 local devices each, same global mesh ----
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    cfg_path = str(tmp_path / "mh_config.yaml")
    opt = mk_opt(spd)
    cfg.save(opt, cfg_path)
    out_dir = str(tmp_path / "multi")
    os.makedirs(out_dir)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["I2V_MH_JAX_CACHE"] = str(tmp_path / "mh_cache")
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mh_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(p), "2", str(port), cfg_path, out_dir,
             str(max_steps)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for p in (0, 1)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, log in zip(procs, outs):
        assert p.returncode == 0, f"worker {p.args[2]} failed:\n{log[-4000:]}"
    results = []
    for p in (0, 1):
        with open(os.path.join(out_dir, f"result_{p}.json")) as f:
            results.append(json.load(f))
    assert results[0]["process_count"] == 2
    assert results[0]["local_devices"] == 4
    assert results[0]["global_devices"] == 8

    # identical replicated state ⇒ both processes log identical trajectories
    np.testing.assert_allclose(
        results[0]["train_loss"], results[1]["train_loss"], rtol=0, atol=0
    )
    # ... equal to the single-process trajectory (global-row augmentation +
    # shared-seed loaders make the global batches and RNG streams identical;
    # cross-process Gloo reductions must agree with the in-process ones)
    np.testing.assert_allclose(
        results[0]["train_loss"], ref["train_loss"], rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        results[0]["eval_loss"], ref["eval_loss"], rtol=1e-5, atol=1e-7
    )

    # only process 0 may touch the filesystem: exactly ONE run dir, with the
    # checkpoint + CSVs; process 1 wrote nothing
    run_dirs = [d for d in os.listdir(out_dir) if d.startswith("Stage2_")]
    assert len(run_dirs) == 1, run_dirs
    mh_dir = os.path.join(out_dir, run_dirs[0])
    assert os.path.exists(os.path.join(mh_dir, "log_per_epoch_train.csv"))

    # final checkpoint params match the single-process run leaf-for-leaf
    ref_ck = ckpt_io.load(os.path.join(ref["save_path"], "cINN_latest.msgpack"))
    mh_ck = ckpt_io.load(os.path.join(mh_dir, "cINN_latest.msgpack"))
    assert mh_ck["epoch"] == ref_ck["epoch"]
    ref_leaves = jax.tree.leaves_with_path(ref_ck["state_dict"]["params"]["flow"])
    mh_flow = mh_ck["state_dict"]["params"]["flow"]
    mh_leaves = dict(jax.tree.leaves_with_path(mh_flow))
    assert len(ref_leaves) == len(mh_leaves)
    for path, ref_leaf in ref_leaves:
        np.testing.assert_allclose(
            mh_leaves[path], ref_leaf, rtol=1e-5, atol=1e-7,
            err_msg=f"flow param {jax.tree_util.keystr(path)} diverged",
        )
