"""Posterior-moment caching (``Training.cache_posteriors``).

The cached trainer replaces the frozen-encoder forward with a gather from a
precomputed (mu, logvar) cache + in-step reparameterised resampling
(train/posterior_cache.py). With augmentation off, the cached trajectory must
match the uncached trainer's — same augmented frames, same moments, same eps
stream (the loss hands the encoder its sample rng positionally, so the cached
path can reproduce ``jax.random.normal(k_enc, (B, z))`` exactly). These tests
run on the default 8-device CPU mesh, so the padded-batch / true_b slicing of
the cached step is exercised too (bs=2 pads every batch to 8).
"""

import os

import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu import config as cfg
from image2video_synthesis_using_cinns_tpu.testing import (
    PRESETS,
    make_bair_data_dir,
    make_model_dir,
)

P = PRESETS["tiny"]


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("bair_data_cache")
    return make_bair_data_dir(
        str(root) + "/", n_videos=10, img=P["img_size"], modes=("train", "eval")
    )


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpts_cache")
    return make_model_dir(str(root), preset="tiny")


def _run_stage2(model_dir, data_dir, out_dir, *, cached, spd=1, max_steps=4,
                aug=False):
    import jax

    from image2video_synthesis_using_cinns_tpu.train.stage2 import main
    from image2video_synthesis_using_cinns_tpu.utils import checkpoint as ckpt_io

    opt = cfg.load(os.path.join(model_dir, "config_stage2.yaml"))
    opt.Data["data_path"] = data_dir
    opt.Data["aug"] = aug
    opt.Training["bs"] = 2
    opt.Training["bs_eval"] = 2
    opt.Training["workers"] = 2
    opt.Training["n_epochs"] = 1
    opt.Training["steps_per_dispatch"] = spd
    opt.Training["cache_posteriors"] = cached
    opt.Training["save_path"] = out_dir
    out = main(opt, max_steps=max_steps, eval_fvd=False)
    payload = ckpt_io.load(os.path.join(out["save_path"], "cINN_latest.msgpack"))
    return (
        jax.tree.leaves(payload["state_dict"]["params"]["flow"]),
        np.asarray(out["train_loss"]),
    )


def test_cached_trajectory_matches_uncached(tmp_path, model_dir, data_dir):
    """With Data.aug off the cached trainer must reproduce the uncached
    trainer's trajectory: identical augmented frames, identical (mu, logvar)
    (same encoder weights on the same windows), identical eps per step. The
    tolerance absorbs batch-layout reassociation only (the cache is built at
    a different encoder batch size than the in-step forward, ~4e-6 abs on the
    moments, amplified through 4 Adam steps — a wrong window/eps would be
    O(1) on the losses)."""
    flow_u, loss_u = _run_stage2(
        model_dir, data_dir, str(tmp_path / "uncached"), cached=False
    )
    flow_c, loss_c = _run_stage2(
        model_dir, data_dir, str(tmp_path / "cached"), cached=True
    )
    np.testing.assert_allclose(loss_u, loss_c, rtol=1e-5)
    for a, b in zip(flow_u, flow_c):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5
        )


def test_cached_scan_matches_cached_single(tmp_path, model_dir, data_dir):
    """steps_per_dispatch under caching: a scanned K-step chunk of the cached
    step must reproduce K sequential cached single steps (same per-step keys,
    same true_b slicing of ids/frames — see make_scan_step_cached)."""
    flow_1, loss_1 = _run_stage2(
        model_dir, data_dir, str(tmp_path / "spd1"), cached=True, spd=1,
        max_steps=5,
    )
    flow_2, loss_2 = _run_stage2(
        model_dir, data_dir, str(tmp_path / "spd2"), cached=True, spd=2,
        max_steps=5,
    )
    np.testing.assert_allclose(loss_1, loss_2, rtol=1e-5)
    for a, b in zip(flow_1, flow_2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )


def test_cache_refuses_augmentation(tmp_path, model_dir, data_dir):
    """Cached moments are invalid under per-epoch re-augmentation (the
    reference's protocol) — the trainer must refuse loudly, not train on
    stale posteriors."""
    with pytest.raises(ValueError, match="cache_posteriors"):
        _run_stage2(
            model_dir, data_dir, str(tmp_path / "bad"), cached=True, aug=True
        )


def test_build_cache_moments_match_direct_encoder(data_dir):
    """Cache rows must equal the encoder's (mu, logvar) on each window: pins
    the window-id layout (offsets[v] + start) and the frames-1: slice
    (dynamic_slice at s+1) against a direct per-window forward at a different
    batching. Tolerance absorbs conv reassociation across batch layouts
    (measured ~4e-6 abs on this machine) — an indexing bug would be O(1)."""
    import jax
    import jax.numpy as jnp

    from image2video_synthesis_using_cinns_tpu.data.augment import build_augment
    from image2video_synthesis_using_cinns_tpu.data.datasets import BairDataset
    from image2video_synthesis_using_cinns_tpu.data.loader import _imread_rgb
    from image2video_synthesis_using_cinns_tpu.models.stage1.resnet3d import Encoder
    from image2video_synthesis_using_cinns_tpu.testing import stage1_config
    from image2video_synthesis_using_cinns_tpu.train.posterior_cache import (
        WindowIndex,
        build_cache,
        make_clip_reader,
    )

    T = 9
    opt = cfg.Config(
        {"Data": {"data_path": data_dir, "sequence_length": T, "dataset": "BAIR"}}
    )
    ds = BairDataset(opt, mode="train")
    enc = Encoder.from_config(stage1_config(P).Encoder)
    img = P["img_size"]
    enc_vars = jax.jit(enc.init)(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, T - 1, img, img, 3)),
    )
    aug = build_augment(img, {}, False, False)  # deterministic pipeline

    # odd videos_per_dispatch so the tail-chunk padding path runs too
    cache = np.asarray(
        build_cache(enc, enc_vars, ds, T, aug, make_clip_reader(ds),
                    videos_per_dispatch=3)
    )
    offsets = WindowIndex(ds, T).offsets
    n_w = 30 - T + 1
    assert cache.shape == (len(ds.videos) * n_w, 2, P["z_dim"])

    # direct forward: all windows of one video in one batch
    enc_j = jax.jit(lambda v, x: enc.apply(v, x, jax.random.PRNGKey(0)))
    for v in (0, len(ds.videos) - 1):
        clip = np.stack(
            [_imread_rgb(ds.frame_path(ds.videos[v], f)) for f in range(30)], 0
        )
        clip_f = np.asarray(aug(jnp.asarray(clip)[None], jax.random.PRNGKey(0)))[0]
        wins = np.stack([clip_f[s + 1 : s + T] for s in range(n_w)], 0)
        _, mu, logvar = enc_j(enc_vars, jnp.asarray(wins))
        np.testing.assert_allclose(
            cache[offsets[v] : offsets[v] + n_w, 0], np.asarray(mu),
            rtol=1e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            cache[offsets[v] : offsets[v] + n_w, 1], np.asarray(logvar),
            rtol=1e-4, atol=2e-5,
        )


def test_cache_dedups_oversampled_videos(data_dir):
    """Oversampled datasets repeat entries in ``dataset.videos`` (reference
    dataloader_iPER.py:29-32 repeats each video iter_mode x int(vid[-1])
    times). The cache must be invariant to the repeats: same unique window
    count, each unique video encoded ONCE, repeated entries' ids landing on
    the shared rows, and identical cache contents."""
    import copy

    import jax
    import jax.numpy as jnp

    from image2video_synthesis_using_cinns_tpu.data.augment import build_augment
    from image2video_synthesis_using_cinns_tpu.data.datasets import BairDataset
    from image2video_synthesis_using_cinns_tpu.models.stage1.resnet3d import Encoder
    from image2video_synthesis_using_cinns_tpu.testing import stage1_config
    from image2video_synthesis_using_cinns_tpu.train.posterior_cache import (
        WindowIndex,
        build_cache,
        make_clip_reader,
    )

    T = 9
    opt = cfg.Config(
        {"Data": {"data_path": data_dir, "sequence_length": T, "dataset": "BAIR"}}
    )
    ds = BairDataset(opt, mode="train")
    ds_rep = copy.copy(ds)
    ds_rep.videos = list(ds.videos) * 3  # iter_mode-style repeat blocks
    ds_rep.num_frames = list(ds.num_frames) * 3

    wi = WindowIndex(ds, T)
    wr = WindowIndex(ds_rep, T)
    assert wr.n_windows == wi.n_windows
    assert wr.duplication == 3.0
    # a repeat-block entry maps onto the base entry's rows
    base = wi.ids(ds, [2, 5], [0, 4])
    for block in range(3):
        off = block * len(ds.videos)
        np.testing.assert_array_equal(
            wr.ids(ds_rep, [2 + off, 5 + off], [0, 4]), base
        )

    enc = Encoder.from_config(stage1_config(P).Encoder)
    img = P["img_size"]
    enc_vars = jax.jit(enc.init)(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, T - 1, img, img, 3)),
    )
    aug = build_augment(img, {}, False, False)

    reads: list[int] = []
    base_reader = make_clip_reader(ds_rep)

    def counting_reader(vids, n):
        reads.extend(int(v) for v in vids)
        return base_reader(vids, n)

    cache_rep = np.asarray(
        build_cache(enc, enc_vars, ds_rep, T, aug, counting_reader,
                    videos_per_dispatch=4)
    )
    cache_base = np.asarray(
        build_cache(enc, enc_vars, ds, T, aug, make_clip_reader(ds),
                    videos_per_dispatch=4)
    )
    assert cache_rep.shape == cache_base.shape == (wi.n_windows, 2, P["z_dim"])
    np.testing.assert_array_equal(cache_rep, cache_base)
    # every read was a base-block (unique) entry; tail padding may repeat the
    # last unique video, but no repeat-block entry is ever decoded
    assert max(reads) < len(ds.videos)
    assert set(reads) == set(range(len(ds.videos)))


def test_sharded_builds_sum_to_full_cache(data_dir):
    """Multi-process cache build (train/stage2.py): each host encodes the
    unique videos with ``u % n == i`` into a zero-initialised cache; the
    per-host partials must be disjoint on ownership and sum to the
    single-host cache. The assemble step itself adds fp32 zeros (exact); the
    tolerance here absorbs only the encoder-batch reassociation between the
    sharded and full builds' different dispatch groupings (~4e-6 abs, same
    as test_build_cache_moments_match_direct_encoder). Also pins the
    more-hosts-than-videos refusal the trainer's fallback branch relies
    on."""
    import jax
    import jax.numpy as jnp

    from image2video_synthesis_using_cinns_tpu.data.augment import build_augment
    from image2video_synthesis_using_cinns_tpu.data.datasets import BairDataset
    from image2video_synthesis_using_cinns_tpu.models.stage1.resnet3d import Encoder
    from image2video_synthesis_using_cinns_tpu.testing import stage1_config
    from image2video_synthesis_using_cinns_tpu.train.posterior_cache import (
        WindowIndex,
        build_cache,
        make_clip_reader,
    )

    T = 9
    opt = cfg.Config(
        {"Data": {"data_path": data_dir, "sequence_length": T, "dataset": "BAIR"}}
    )
    ds = BairDataset(opt, mode="train")
    enc = Encoder.from_config(stage1_config(P).Encoder)
    img = P["img_size"]
    enc_vars = jax.jit(enc.init)(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, T - 1, img, img, 3)),
    )
    aug = build_augment(img, {}, False, False)
    reader = make_clip_reader(ds)

    full = np.asarray(
        build_cache(enc, enc_vars, ds, T, aug, reader, videos_per_dispatch=4)
    )
    wi = WindowIndex(ds, T)
    parts = [
        np.asarray(
            build_cache(enc, enc_vars, ds, T, aug, reader,
                        videos_per_dispatch=4, shard=(i, 3))
        )
        for i in range(3)
    ]
    owned = [(np.abs(p).sum(axis=(1, 2)) > 0) for p in parts]
    # ownership is disjoint and covers every window (moments are never all
    # -zero for a real window: logvar of a fresh encoder isn't identically 0)
    assert (np.stack(owned).sum(axis=0) == 1).all()
    np.testing.assert_allclose(sum(parts), full, rtol=1e-4, atol=2e-5)
    assert wi.n_windows == full.shape[0]

    with pytest.raises(ValueError, match="owns no videos"):
        build_cache(enc, enc_vars, ds, T, aug, reader,
                    shard=(len(ds.videos) + 1, len(ds.videos) + 2))


def test_window_ids_out_of_range_fails_loudly(data_dir):
    """The in-step gather clamps out-of-bounds ids (JAX default), so a bad
    (offsets, video_of) mapping must be caught host-side in WindowIndex.ids
    rather than silently training on a wrong-but-valid posterior row."""
    from image2video_synthesis_using_cinns_tpu.data.datasets import BairDataset
    from image2video_synthesis_using_cinns_tpu.train.posterior_cache import (
        WindowIndex,
    )

    T = 9
    opt = cfg.Config(
        {"Data": {"data_path": data_dir, "sequence_length": T, "dataset": "BAIR"}}
    )
    ds = BairDataset(opt, mode="train")
    wi = WindowIndex(ds, T)
    # a start beyond the last full window of the final video overflows the table
    with pytest.raises(IndexError, match="out of range"):
        wi.ids(ds, [len(ds.videos) - 1], [30 - T + 1])


def test_loader_first_frame_meta_consistent(data_dir):
    """frames_per_item=1 must ship frame `start` of the SAME window a
    full-window load of the same (seed, epoch) would sample, plus its
    (index, start) meta."""
    from image2video_synthesis_using_cinns_tpu.data.datasets import BairDataset
    from image2video_synthesis_using_cinns_tpu.data.loader import Loader

    opt = cfg.Config(
        {"Data": {"data_path": data_dir, "sequence_length": 9, "dataset": "BAIR"}}
    )
    ds = BairDataset(opt, mode="train")
    full = list(Loader(ds, 4, workers=2, drop_last=False, seed=7).epoch_iter(3))
    lean = list(
        Loader(ds, 4, workers=2, drop_last=False, seed=7, frames_per_item=1,
               with_meta=True).epoch_iter(3)
    )
    assert len(full) == len(lean)
    for fb, lb in zip(full, lean):
        assert lb["seq_raw"].shape[1] == 1
        np.testing.assert_array_equal(fb["seq_raw"][:, 0], lb["seq_raw"][:, 0])
        assert lb["index"].shape == lb["start"].shape == (fb["seq_raw"].shape[0],)
        assert (lb["start"] >= 0).all() and (lb["start"] <= 30 - 9).all()
