"""Framestore: pack a synthetic dataset, read windows via native + numpy paths."""

import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu.data.datasets import BairDataset
from image2video_synthesis_using_cinns_tpu.data.framestore import _LIB, FrameStore
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
