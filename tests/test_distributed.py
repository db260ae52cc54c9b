"""Structural tests for the opt-in multi-host layer (parallel/distributed.py).

A single pytest process cannot run true multi-process JAX, so these pin the
structural contracts: the per-host batch partition, the global-array assembly
degenerating to plain sharding in single-process mode, and the loader
decoding exactly its host's slice of every batch (SURVEY §5.8 names per-host
input pipelines as part of the parallelism component)."""

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
