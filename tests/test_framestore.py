"""Framestore: pack a synthetic dataset, read windows via native + numpy paths."""

import os

import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu.data.datasets import BairDataset, VideoDataset
from image2video_synthesis_using_cinns_tpu.data.framestore import (
    _LIB,
    FrameStore,
    open_or_build,
)
from image2video_synthesis_using_cinns_tpu.data.loader import Loader, _imread_rgb
from image2video_synthesis_using_cinns_tpu.testing import make_bair_data_dir, stage1_config, PRESETS


@pytest.fixture(scope="module")
def store_and_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("fs")
    data_dir = make_bair_data_dir(str(root / "data") + "/", img=32)
    opt = stage1_config(PRESETS["tiny"])
    opt.Data["data_path"] = data_dir
    ds = BairDataset(opt, mode="train")
    store = FrameStore.build(ds, str(root / "cache" / "train.fstore"))
    return store, ds


def test_backend_and_meta(store_and_ds):
    store, ds = store_and_ds
    if _LIB is not None:
        assert store.backend == "native"
    assert store.n_videos == len(ds.videos)
    assert store.num_frames(0) == 30
    assert (store.height, store.width, store.channels) == (32, 32, 3)


def test_window_matches_decoded_frames(store_and_ds):
    store, ds = store_and_ds
    batch = store.read_batch([0, 1], [3, 7], 5)
    assert batch.shape == (2, 5, 32, 32, 3)
    # cross-check against direct decode
    for bi, (v, s) in enumerate([(0, 3), (1, 7)]):
        for t in range(5):
            ref = _imread_rgb(ds.frame_path(ds.videos[v], s + t))
            np.testing.assert_array_equal(batch[bi, t], ref)


def test_numpy_fallback_identical(store_and_ds):
    store, ds = store_and_ds
    fallback = FrameStore(store.path, use_native=False)
    assert fallback.backend == "numpy"
    a = store.read_batch([1, 0], [0, 10], 8)
    b = fallback.read_batch([1, 0], [0, 10], 8)
    np.testing.assert_array_equal(a, b)


def test_loader_integration(store_and_ds):
    store, ds = store_and_ds
    loader = Loader(ds, batch_size=2, workers=2, seed=0, framestore=store)
    batch = next(iter(loader))
    assert batch["seq_raw"].shape == (2, ds.seq_length, 32, 32, 3)


def test_out_of_bounds(store_and_ds):
    store, _ = store_and_ds
    with pytest.raises(IndexError):
        store.read_batch([0], [28], 5)  # 28 + 5 > 30


# ---------------------------------------------------------------------------
# open_or_build + trainer wiring


def _bair_ds(tmp_path, img=24):
    data_dir = make_bair_data_dir(str(tmp_path / "data") + "/", img=img)
    opt = stage1_config(PRESETS["tiny"])
    opt.Data["data_path"] = data_dir
    return BairDataset(opt, mode="train")


def test_open_or_build_off_and_auto(tmp_path):
    ds = _bair_ds(tmp_path)
    assert open_or_build(ds, "off") is None
    assert open_or_build(ds, None) is None
    store = open_or_build(ds, "auto", "train")
    assert store is not None
    assert os.path.exists(os.path.join(ds.data_path, ".framestore"))
    # second open reuses the cache (fingerprint match): mtime unchanged
    mtime = os.path.getmtime(store.path)
    store2 = open_or_build(ds, "auto", "train")
    assert os.path.getmtime(store2.path) == mtime
    # different dataset content (other mode name -> other file) builds anew
    store3 = open_or_build(ds, "auto", "eval")
    assert store3.path != store.path


def test_open_or_build_explicit_path_and_rebuild(tmp_path):
    ds = _bair_ds(tmp_path)
    path = str(tmp_path / "cache" / "explicit.fst")
    store = open_or_build(ds, path)
    assert store.path == path
    # stale fingerprint -> rebuild
    import json

    with open(path + ".json") as f:
        meta = json.load(f)
    meta["fingerprint"] = "stale"
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    before = os.path.getmtime(path)
    os.utime(path, (before - 10, before - 10))
    store2 = open_or_build(ds, path)
    assert os.path.getmtime(store2.path) > before - 10  # rewritten


class _OversampledDataset(VideoDataset):
    """Landscape/iPER-style oversampling: videos repeated in the index."""

    def __init__(self, base: BairDataset, repeats: int):
        self.base = base
        self.data_path = base.data_path
        self.seq_length = base.seq_length
        self.deterministic_start = False
        self.videos = [v for v in base.videos for _ in range(repeats)]
        self.num_frames = [n for n in base.num_frames for _ in range(repeats)]

    def frame_path(self, video, frame):
        return self.base.frame_path(video, frame)


def test_build_dedupes_oversampled_videos(tmp_path):
    base = _bair_ds(tmp_path)
    ds = _OversampledDataset(base, repeats=3)
    store = FrameStore.build(ds, str(tmp_path / "dedup.fst"))
    assert store.n_videos == len(base.videos)  # packed once, not 3x
    # every oversampled index maps back to the right packed video
    rng = np.random.default_rng(0)
    for idx in range(len(ds)):
        item = ds.sample(idx, rng)
        window = store.read_window(item)
        ref = np.stack([_imread_rgb(p) for p in item["paths"]], axis=0)
        np.testing.assert_array_equal(window, ref)


def test_loader_batches_identical_with_and_without_store(tmp_path):
    """The framestore path must be a pure IO optimisation: same seed, same
    batches as the decode-per-epoch path."""
    ds = _bair_ds(tmp_path)
    store = open_or_build(ds, "auto", "train")
    plain = Loader(ds, batch_size=2, workers=2, seed=11)
    fast = Loader(ds, batch_size=2, workers=2, seed=11, framestore=store)
    for a, b in zip(plain.epoch_iter(1), fast.epoch_iter(1)):
        np.testing.assert_array_equal(a["seq_raw"], b["seq_raw"])
