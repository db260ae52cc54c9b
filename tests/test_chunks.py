"""Unit tests for the shared chunk-pipeline machinery (train/chunks.py).

The scan-vs-single trainer drives (tests/test_train.py, tests/test_stage2_ae.py)
pin the end-to-end trajectory; these tests pin the host-side pieces in
isolation — cheap enough to run in the fast suite.
"""

import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu.parallel.mesh import make_mesh
from image2video_synthesis_using_cinns_tpu.train.chunks import (
    chunk_keys,
    drive_epoch,
    make_chunk_stager,
    pad_batch_rows,
    pad_chunk_axis,
)


def test_pad_batch_rows_matches_chunk_axis(rng):
    """Per-batch row padding then stacking must equal stacking then chunk-axis
    padding — the two layouts the stager and the old host-stacked path use."""
    batches = [
        rng.integers(0, 255, (5, 4, 8, 8, 3), dtype=np.uint8) for _ in range(3)
    ]
    per_batch = np.stack([pad_batch_rows(b, 8) for b in batches])
    stacked = pad_chunk_axis(np.stack(batches), 8)
    np.testing.assert_array_equal(per_batch, stacked)
    # no-op when already divisible
    b = batches[0][:4]
    assert pad_batch_rows(b, 4) is b


def test_chunk_stager_bytes_match_host_stack(rng):
    """make_chunk_stager's on-device assembly (per-batch async puts + jitted
    stack) must produce the exact bytes of the round-2 host-stacked
    device_put — the property the trainer scan steps rely on (proven at
    trainer level by a bit-exact stage-1 A/B; pinned here as a unit test)."""
    import jax

    mesh = make_mesh()
    n_dev = mesh.devices.size
    stage, stack_staged = make_chunk_stager(mesh, n_dev)

    batches = [
        {"seq_raw": rng.integers(0, 255, (2, 3, 8, 8, 3), dtype=np.uint8),
         "other": object()}
        for _ in range(3)
    ]
    staged = [stage(b) for b in batches]
    # host fields survive staging (the tail flush runs the single-step path
    # on the original batch dict)
    for orig, st in zip(batches, staged):
        assert st["seq_raw"] is orig["seq_raw"]
        assert st["other"] is orig["other"]
        assert "_dev_seq" not in orig  # stage() must not mutate its input

    out = stack_staged(staged)
    expect = pad_chunk_axis(np.stack([b["seq_raw"] for b in batches]), n_dev)
    assert out.shape == expect.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(jax.device_get(out), expect)
    # sharded (None, 'data') over the mesh like the old stacked put
    assert out.sharding.spec == jax.sharding.PartitionSpec(None, "data")


def test_chunk_keys_single_dispatch_matches_eager_fold():
    """chunk_keys runs as ONE jitted program; its values must equal the
    eager per-step derivation the single-step path uses
    (fold_in(root_key, global_step + j))."""
    import jax

    root = jax.random.PRNGKey(7)
    got = np.asarray(chunk_keys(root, 13, 4))
    expect = np.stack(
        [np.asarray(jax.random.fold_in(root, 13 + j)) for j in range(4)]
    )
    np.testing.assert_array_equal(got, expect)
    # different global_step must not recompile (weak-typed traced arg)
    np.testing.assert_array_equal(
        np.asarray(chunk_keys(root, 21, 4))[0],
        np.asarray(jax.random.fold_in(root, 21)),
    )


def _mk(b, tag):
    return {"seq_raw": np.zeros((b, 1)), "tag": tag}


def test_drive_epoch_stage_hook_applies_to_chunked_batches_only():
    """The stage hook fires exactly when a batch is accumulated into a chunk;
    partial batches bypass it, and a flushed chunk hands the STAGED dicts to
    run_single (they still carry the original host fields)."""
    staged_tags, single_tags, chunk_tags = [], [], []
    steps = [0]

    def stage(b):
        staged_tags.append(b["tag"])
        return dict(b, staged=True)

    def run_single(b):
        single_tags.append((b["tag"], b.get("staged", False)))
        steps[0] += 1

    def run_chunk(chunk):
        chunk_tags.append([b["tag"] for b in chunk])
        assert all(b["staged"] for b in chunk)
        steps[0] += len(chunk)

    # full, full (chunk 1), full, partial (flush staged + partial via single),
    # full, full (chunk 2)
    batches = [_mk(4, 0), _mk(4, 1), _mk(4, 2), _mk(2, 3), _mk(4, 4), _mk(4, 5)]
    stopped = drive_epoch(
        batches, full_bs=4, spd=2, chunk_ready=lambda: True,
        run_single=run_single, run_chunk=run_chunk,
        steps_done=lambda: steps[0], stage=stage,
    )
    assert not stopped
    assert chunk_tags == [[0, 1], [4, 5]]
    # batch 2 was staged (accumulated) then flushed through single; batch 3
    # (partial) was never staged
    assert staged_tags == [0, 1, 2, 4, 5]
    assert single_tags == [(2, True), (3, False)]


def test_drive_epoch_no_stage_hook_unchanged():
    """Without a stage hook batches flow through untouched (the spd=1 and
    pre-stager semantics)."""
    seen = []
    steps = [0]

    def run_single(b):
        seen.append(b["tag"])
        steps[0] += 1

    batches = [_mk(2, 0), _mk(2, 1)]
    drive_epoch(
        batches, full_bs=4, spd=2, chunk_ready=lambda: True,
        run_single=run_single, run_chunk=lambda c: None,
        steps_done=lambda: steps[0],
    )
    assert seen == [0, 1]
