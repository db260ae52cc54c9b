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
    fetch_local_rows,
    host_batch_slice,
    make_global_batch,
    maybe_initialize,
    put_global,
    put_global_batch,
    require_mesh_divisible,
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


def test_require_mesh_divisible():
    require_mesh_divisible(8, bs=16, bs_eval=8)  # no raise
    with pytest.raises(ValueError, match="bs.*10"):
        require_mesh_divisible(8, bs=10)


def test_fetch_local_rows_assembles_sharded_rows():
    """Batch-sharded arrays reassemble exactly from their addressable shards
    (the multi-process path returns this process's contiguous block; in
    single-process every shard is addressable so the result is the full
    array), replicas over a second mesh axis are deduped, fully-replicated
    arrays and non-jax leaves pass through whole."""
    from image2video_synthesis_using_cinns_tpu.parallel.tp import make_2d_mesh

    mesh = make_mesh(8)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    sharded = shard_batch(mesh, {"x": x})["x"]
    np.testing.assert_array_equal(fetch_local_rows(sharded), x)

    # 2-D data x model mesh: P('data') shards are replicated over 'model' —
    # the per-start dedupe must not duplicate rows
    mesh2 = make_2d_mesh(4, 2)
    sharded2 = jax.device_put(
        x, jax.sharding.NamedSharding(mesh2, jax.sharding.PartitionSpec("data"))
    )
    np.testing.assert_array_equal(fetch_local_rows(sharded2), x)

    repl = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    np.testing.assert_array_equal(fetch_local_rows(repl), x)
    assert fetch_local_rows(7) == 7


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
    # persistent compile cache shared across test runs (the 2-process
    # topology's programs differ from the main suite's 8-device ones, but
    # repeat invocations of these slow tests hit it); I2V_TEST_JAX_CACHE
    # redirects it the same way conftest.py does for the main suite
    env["I2V_MH_JAX_CACHE"] = os.environ.get(
        "I2V_TEST_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
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


@pytest.mark.slow
def test_two_process_cached_run_matches_single(tmp_path):
    """REAL multi-process execution of the CACHED stage-2 path
    (``Training.cache_posteriors`` + ``Training.distributed``): the posterior
    -cache build is round-robin sharded over the two processes, the partial
    caches are summed across hosts (train/stage2.py), and the training steps
    consume window ids + 1-frame clips assembled into global arrays. With
    ``cache_videos_per_dispatch=1`` every video is encoded in its own
    dispatch, so the sharded build's moments are BIT-identical to the
    single-process build's and the comparison needs no reassociation slack
    beyond the cross-process Gloo reductions the uncached test already
    budgets (rtol=1e-5)."""
    from image2video_synthesis_using_cinns_tpu import config as cfg
    from image2video_synthesis_using_cinns_tpu.testing import (
        make_bair_data_dir,
        make_model_dir,
    )
    from image2video_synthesis_using_cinns_tpu.train.stage2 import main as s2_main

    data_dir = make_bair_data_dir(
        str(tmp_path / "data") + "/", n_videos=16, img=32, modes=("train", "eval")
    )
    stage2_dir = make_model_dir(str(tmp_path / "ckpts"), preset="tiny")

    def mk_opt():
        opt = cfg.load(os.path.join(stage2_dir, "config_stage2.yaml"))
        opt.Data["data_path"] = data_dir
        opt.Data["aug"] = False  # cache-mode precondition
        opt.Training["bs"] = 8
        opt.Training["bs_eval"] = 8
        opt.Training["workers"] = 2
        opt.Training["n_epochs"] = 2
        opt.Training["cache_posteriors"] = True
        opt.Training["cache_videos_per_dispatch"] = 1
        return opt

    max_steps = 4

    # ---- reference: single-process cached run on the 8-device CPU mesh ----
    opt = mk_opt()
    opt.Training["save_path"] = str(tmp_path / "single")
    ref = s2_main(opt, max_steps=max_steps, eval_fvd=False)

    # ---- 2-process cached run: sharded build + gathered cache ----
    cfg_path = str(tmp_path / "mh_config.yaml")
    cfg.save(mk_opt(), cfg_path)
    out_dir = str(tmp_path / "multi")
    os.makedirs(out_dir)
    results = _spawn_two_workers(tmp_path, cfg_path, out_dir, max_steps, "stage2")

    assert results[0]["process_count"] == 2
    assert results[0]["global_devices"] == 8
    # identical gathered cache + replicated state ⇒ bit-identical logs
    np.testing.assert_allclose(
        results[0]["train_loss"], results[1]["train_loss"], rtol=0, atol=0
    )
    np.testing.assert_allclose(
        results[0]["train_loss"], ref["train_loss"], rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        results[0]["eval_loss"], ref["eval_loss"], rtol=1e-5, atol=1e-7
    )


def _spawn_two_workers(tmp_path, cfg_arg, out_dir, max_steps, trainer):
    """Launch two mh_worker.py processes (4 virtual CPU devices each) and
    return their parsed result_<p>.json payloads."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # persistent compile cache shared across test runs (the 2-process
    # topology's programs differ from the main suite's 8-device ones, but
    # repeat invocations of these slow tests hit it); I2V_TEST_JAX_CACHE
    # redirects it the same way conftest.py does for the main suite
    env["I2V_MH_JAX_CACHE"] = os.environ.get(
        "I2V_TEST_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mh_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(p), "2", str(port), cfg_arg, out_dir,
             str(max_steps), trainer],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for p in (0, 1)
    ]
    outs = [p.communicate(timeout=2400)[0] for p in procs]
    for p, log in zip(procs, outs):
        assert p.returncode == 0, f"worker {p.args[2]} failed:\n{log[-6000:]}"
    results = []
    for p in (0, 1):
        with open(os.path.join(out_dir, f"result_{p}.json")) as f:
            results.append(json.load(f))
    return results


def _csv_metric_rows(path):
    """CSV rows as float lists, dropping the wall-clock 'Time' column."""
    import csv

    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert rows, path
    keys = [k for k in rows[0] if k != "Time"]
    return [[float(r[k]) for k in keys] for r in rows]


@pytest.mark.slow
def test_two_process_stage1_and_ae_match_single(tmp_path):
    """REAL multi-process execution of the OTHER two trainers: one worker
    process pair drives stage-1 and then its conditioning AE back-to-back
    via ``Training.distributed`` (exercising ``maybe_initialize``
    idempotency), with the AE on the scanned spd=2 chunk path. This is the
    coverage the stage-2-only test cannot give: both trainers fetch
    batch-sharded step outputs (epoch-GIF tensors, recon grids, the
    deferred chunk payload) every step, which requires the
    ``fetch_local_rows`` path — plain ``device_get`` raises on arrays
    spanning non-addressable devices. Asserts both processes log identical
    trajectories, equal to single-process 8-device runs, and that only
    process 0 wrote files."""
    from image2video_synthesis_using_cinns_tpu import config as cfg
    from image2video_synthesis_using_cinns_tpu.testing import (
        PRESETS,
        make_bair_data_dir,
        stage1_config,
        stage2_ae_config,
    )
    from image2video_synthesis_using_cinns_tpu.train.stage1 import main as s1_main
    from image2video_synthesis_using_cinns_tpu.train.stage2_ae import main as ae_main

    P = dict(PRESETS["tiny"])
    # 16 clips / global bs 8 → 2 mesh-divisible batches per epoch, no tail
    d32 = make_bair_data_dir(
        str(tmp_path / "d32") + "/", n_videos=16, img=32, modes=("train", "eval")
    )
    d64 = make_bair_data_dir(
        str(tmp_path / "d64") + "/", n_videos=32, img=64, modes=("train", "eval")
    )
    s1_steps = 2

    def mk_s1():
        opt = stage1_config(P)
        opt.Data["data_path"] = d32
        opt.Training["bs"] = 8
        opt.Training["bs_eval"] = 8
        opt.Training["workers"] = 2
        opt.Training["n_epochs"] = 1
        return opt

    def mk_ae():
        opt = stage2_ae_config(P)
        opt.AE["in_size"] = 64
        opt.AE["z_dim"] = 64
        opt.AE["chn"] = 8
        opt.AE["encoder_type"] = "resnet18"
        opt.Data["img_size"] = 64
        opt.Data["data_path"] = d64
        opt.Training["bs"] = 8
        opt.Training["workers"] = 2
        opt.Training["n_epochs"] = 1
        # scanned chunk path: 1 single (ActNorm init) + one chunk of 2 + 1
        # flushed single at the max_steps boundary
        opt.Training["steps_per_dispatch"] = 2
        return opt

    # ---- references: single-process runs on the 8-device CPU mesh ----
    opt = mk_s1()
    opt.Training["save_path"] = str(tmp_path / "single_s1")
    ref1 = s1_main(opt, max_steps=s1_steps, eval_fvd=False)
    opt = mk_ae()
    opt.Training["save_path"] = str(tmp_path / "single_ae")
    ref2 = ae_main(opt, max_steps=s1_steps * 2)

    # ---- 2-process run: stage-1 then AE in each worker process ----
    cfg_dir = str(tmp_path / "cfgs")
    os.makedirs(cfg_dir)
    cfg.save(mk_s1(), os.path.join(cfg_dir, "config_stage1.yaml"))
    cfg.save(mk_ae(), os.path.join(cfg_dir, "config_stage2_AE.yaml"))
    out_dir = str(tmp_path / "multi")
    os.makedirs(out_dir)
    results = _spawn_two_workers(tmp_path, cfg_dir, out_dir, s1_steps, "s1ae")

    assert results[0]["process_count"] == 2
    assert results[0]["global_devices"] == 8

    # identical replicated state ⇒ both processes log IDENTICAL trajectories
    # (bit-exact: any cross-process divergence of the replicated params/aux
    # would show here first)
    np.testing.assert_allclose(
        results[0]["ae_train_loss"], results[1]["ae_train_loss"], rtol=0, atol=0
    )
    # ... and ≈ the single-process AE run. Tolerance note: cross-process
    # Gloo allreduce sums in a different order than the in-process XLA
    # reduction (~1e-7 relative on the raw grads), and the ADVERSARIAL
    # steps amplify it — the AE's adaptive d_weight is a ratio of two
    # gradient norms, stage-1 runs a GP double-grad + 3 Adam partitions
    # (g/√v normalisation of near-zero leaves) — measured ≤0.5% (AE) and
    # ≤1.7% (stage-1) after 2 steps on this harness. A real wiring bug
    # (pad rows in a loss, wrong per-row augmentation keys, row drops)
    # shifts these metrics at O(10%)–O(1). The tight rtol=1e-5 anchor for
    # the multi-host machinery itself is the stage-2 cINN test above
    # (single optimiser, smooth NLL — no adversarial amplification).
    np.testing.assert_allclose(
        results[0]["ae_train_loss"], ref2["train_loss"], rtol=2e-2, atol=2e-3
    )

    # only process 0 wrote run dirs; its CSV trajectories match the
    # single-process runs row-for-row (all columns except wall-clock Time;
    # tolerance per the amplification note above)
    for sub, prefix, ref_path in (
        ("s1", "Stage1_", ref1["save_path"]),
        ("ae", "Stage2_AE_", ref2["save_path"]),
    ):
        run_dirs = [
            d for d in os.listdir(os.path.join(out_dir, sub))
            if d.startswith(prefix)
        ]
        assert len(run_dirs) == 1, (sub, run_dirs)
        mh_dir = os.path.join(out_dir, sub, run_dirs[0])
        mh_rows = _csv_metric_rows(os.path.join(mh_dir, "log_per_epoch_train.csv"))
        ref_rows = _csv_metric_rows(os.path.join(ref_path, "log_per_epoch_train.csv"))
        np.testing.assert_allclose(
            mh_rows, ref_rows, rtol=2e-2, atol=2e-3,
            err_msg=f"{sub} train CSV trajectory diverged",
        )
