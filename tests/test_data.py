"""Data layer: dataset indexers (all four families), windowing semantics,
on-device augmentation behaviour, loader determinism."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from image2video_synthesis_using_cinns_tpu import config as cfg
from image2video_synthesis_using_cinns_tpu.data import get_eval_loader, get_loader
from image2video_synthesis_using_cinns_tpu.data.augment import build_augment
from image2video_synthesis_using_cinns_tpu.data.datasets import (
    BairDataset,
    BairEndpointDataset,
    DTDBDataset,
    LandscapeDataset,
)
from image2video_synthesis_using_cinns_tpu.data.loader import Loader
from image2video_synthesis_using_cinns_tpu.testing import (
    PRESETS,
    make_bair_data_dir,
    stage1_config,
)


@pytest.fixture(scope="module")
def bair_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return make_bair_data_dir(str(root) + "/", img=32)


def _opt(bair_dir, seq=9):
    opt = stage1_config(PRESETS["tiny"])
    opt.Data["data_path"] = bair_dir
    opt.Data["sequence_length"] = seq
    return opt


def test_bair_windowing(bair_dir):
    ds = BairDataset(_opt(bair_dir), mode="train")
    assert len(ds) == 2
    rng = np.random.default_rng(0)
    item = ds.sample(0, rng)
    assert len(item["paths"]) == 9
    assert 0 <= item["start"] <= 21
    # test mode: deterministic start at 0
    ds_test = BairDataset(_opt(bair_dir), mode="test")
    assert ds_test.sample(0, rng)["start"] == 0


def test_bair_endpoint_cond(bair_dir):
    ds = BairEndpointDataset(_opt(bair_dir), mode="train")
    rng = np.random.default_rng(0)
    item = ds.sample(1, rng)
    assert item["cond"].shape == (3,)
    # cond is the window's LAST frame position (reference
    # dataloader_bair_endpoint.py:51)
    expected = ds.positions[1, item["start"] + ds.seq_length - 1]
    np.testing.assert_allclose(item["cond"], expected.astype(np.float32))


def test_registry_dispatch(bair_dir):
    assert get_loader("BAIR") is BairDataset
    assert get_loader("bair", control=True) is BairEndpointDataset
    opt = _opt(bair_dir)
    ds = get_eval_loader("bair", 10, bair_dir, opt)
    assert opt.Data["sequence_length"] == 10  # mutated in place like reference
    assert ds.deterministic_start


def test_landscape_and_dtdb_indexers(tmp_path):
    # landscape layout: sky_train/<vid>/frame<k>.jpg with split lists
    import image2video_synthesis_using_cinns_tpu.data.datasets as D

    root = tmp_path / "land"
    for vid in ("vid_a", "vid_b"):
        d = root / "sky_train" / vid
        d.mkdir(parents=True)
        for k in range(12):
            Image.new("RGB", (16, 16), (k, 0, 0)).save(d / f"frame{k}.jpg")
    split_dir = tmp_path / "splits" / "landscape"
    split_dir.mkdir(parents=True)
    (split_dir / "train.txt").write_text("vid_a vid_b")
    old = D._SPLIT_DIR
    D._SPLIT_DIR = str(tmp_path / "splits")
    try:
        opt = cfg.Config({"Data": {
            "data_path": str(root) + "/", "sequence_length": 5, "iter_train": 3,
        }})
        ds = LandscapeDataset(opt, mode="train")
        assert len(ds) == 6  # 2 videos x iter_train 3
        item = ds.sample(0, np.random.default_rng(0))
        assert os.path.exists(item["paths"][0])
    finally:
        D._SPLIT_DIR = old

    # DTDB layout: <texture>/train/<vid>/frame<k>.jpg
    droot = tmp_path / "dtdb"
    for vid in ("v0", "v1"):
        d = droot / "fire" / "train" / vid
        d.mkdir(parents=True)
        for k in range(8):
            Image.new("RGB", (16, 16), (0, k, 0)).save(d / f"frame{k}.jpg")
    opt = cfg.Config({"Data": {
        "data_path": str(droot) + "/", "texture": "fire", "image_format": "jpg",
        "sequence_length": 4, "iter_train": 2,
    }})
    ds = DTDBDataset(opt, mode="train")
    assert len(ds) == 4
    item = ds.sample(0, np.random.default_rng(0))
    assert os.path.exists(item["paths"][0])


def test_loader_reproducible_epochs(bair_dir):
    ds = BairDataset(_opt(bair_dir), mode="train")
    loader = Loader(ds, batch_size=2, workers=2, seed=7)
    a = next(iter(loader.epoch_iter(3)))
    b = next(iter(loader.epoch_iter(3)))
    np.testing.assert_array_equal(a["seq_raw"], b["seq_raw"])
    c = next(iter(loader.epoch_iter(4)))
    assert not np.array_equal(a["seq_raw"], c["seq_raw"])


def test_loader_tail_multiple_drops_indivisible_tail(bair_dir):
    """Multi-host runs cannot pad an indivisible tail batch per-process
    (parallel/distributed.py); with tail_multiple set the loader drops it
    loudly instead of letting global assembly crash mid-epoch."""
    import warnings

    ds = BairDataset(_opt(bair_dir), mode="train")
    n = len(ds)
    bs = 4 if n % 4 else 3
    assert n % bs, "fixture must leave a tail batch"
    tail = n % bs

    # single-host (no tail_multiple): the tail batch is yielded as usual
    plain = Loader(ds, batch_size=bs, drop_last=False, workers=2, seed=7)
    sizes = [b["seq_raw"].shape[0] for b in plain.epoch_iter(0)]
    assert sizes == [bs] * (n // bs) + [tail]

    # multi-host: the 8-device-indivisible tail is dropped with ONE warning
    multi = Loader(
        ds, batch_size=bs, drop_last=False, workers=2, seed=7, tail_multiple=8
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        sizes = [b["seq_raw"].shape[0] for b in multi.epoch_iter(0)]
        assert len(multi) == len(sizes)
    assert sizes == [bs] * (n // bs)
    assert sum("dropping the tail batch" in str(w.message) for w in caught) == 1

    # divisible tails survive tail_multiple
    ok = Loader(
        ds, batch_size=bs, drop_last=False, workers=2, seed=7,
        tail_multiple=tail,
    )
    assert [b["seq_raw"].shape[0] for b in ok.epoch_iter(0)][-1] == tail


def test_augment_eval_is_resize_normalize(bair_dir):
    aug = build_augment(16, {}, False, False)
    raw = np.random.default_rng(0).integers(0, 255, (2, 3, 32, 32, 3), dtype=np.uint8)
    out = np.asarray(aug(jnp.asarray(raw), jax.random.PRNGKey(0)))
    assert out.shape == (2, 3, 16, 16, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # eval path is deterministic
    out2 = np.asarray(aug(jnp.asarray(raw), jax.random.PRNGKey(5)))
    np.testing.assert_array_equal(out, out2)


def test_augment_train_same_transform_per_clip():
    params = {"brightness": 0.3, "contrast": 0.3, "saturation": 0.3,
              "hue": 0.1, "prob_hflip": 1.0}
    aug = build_augment(16, params, False, True)
    # identical frames within a clip → identical augmented frames (shared draw)
    frame = np.random.default_rng(1).integers(0, 255, (16, 16, 3), dtype=np.uint8)
    clip = np.broadcast_to(frame, (4, 16, 16, 3))
    batch = np.stack([clip, clip], 0)
    out = np.asarray(aug(jnp.asarray(batch), jax.random.PRNGKey(2)))
    for t in range(1, 4):
        np.testing.assert_array_equal(out[0, 0], out[0, t])
    # but different clips get different draws
    assert not np.array_equal(out[0, 0], out[1, 0])


def test_augment_hflip():
    aug = build_augment(16, {"prob_hflip": 1.0}, False, True)
    raw = np.zeros((1, 2, 16, 16, 3), dtype=np.uint8)
    raw[:, :, :, :8] = 255  # left half white
    out = np.asarray(aug(jnp.asarray(raw), jax.random.PRNGKey(0)))
    assert out[0, 0, 0, -1, 0] > 0.9  # white moved to the right
    assert out[0, 0, 0, 0, 0] < -0.9


def test_augment_random_crop_shape():
    aug = build_augment(16, {"prob_hflip": 0.0}, True, True)
    raw = np.random.default_rng(0).integers(0, 255, (2, 3, 40, 40, 3), dtype=np.uint8)
    out = np.asarray(aug(jnp.asarray(raw), jax.random.PRNGKey(0)))
    assert out.shape == (2, 3, 16, 16, 3)


def test_augment_random_crop_offsets_decorrelated():
    # Regression: y0/x0 used to be drawn from the SAME key, so every crop had
    # y0 == x0 (only the 17 diagonal positions out of 17x17 were reachable).
    # Encode pixel coordinates in the image so the crop offset is readable
    # from the output: channel0 = 7*y, channel1 = 7*x on a 32x32 canvas
    # (img_size=16 -> resize target 32 is identity for 32x32 input).
    aug = build_augment(16, {"prob_hflip": 0.0}, True, True)
    n = 1200
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    img[..., 0] = (7 * yy).astype(np.uint8)
    img[..., 1] = (7 * xx).astype(np.uint8)
    batch = np.broadcast_to(img, (n, 1, 32, 32, 3))
    out = np.asarray(aug(jnp.asarray(batch), jax.random.PRNGKey(3)))
    vals = (out[:, 0, 0, 0, :2] * 0.5 + 0.5) * 255.0  # top-left pixel, (y,x) chans
    offs = np.round(vals / 7.0).astype(int)
    y0, x0 = offs[:, 0], offs[:, 1]
    assert set(np.unique(y0)) == set(range(17))
    assert set(np.unique(x0)) == set(range(17))
    # decorrelated: off-diagonal pairs dominate and most of the 17x17 grid is hit
    assert np.mean(y0 != x0) > 0.8
    assert len({(a, b) for a, b in zip(y0, x0)}) > 150  # bug gives <= 17


def test_augment_color_jitter_random_order():
    # torchvision/kornia ColorJitter applies the enabled adjustments in a
    # random permutation per call (reference data/augmentation.py:12-13).
    # With brightness+contrast enabled, reconstruct both candidate orders from
    # the clip's key and check both occur across clips.
    from image2video_synthesis_using_cinns_tpu.data import augment as A

    params = {"brightness": 0.8, "contrast": 0.8, "prob_hflip": 0.0}
    aug = build_augment(16, params, False, True)
    n = 120
    raw = np.random.default_rng(7).integers(40, 200, (n, 1, 16, 16, 3), dtype=np.uint8)
    out = np.asarray(aug(jnp.asarray(raw), jax.random.PRNGKey(11)))
    keys = jax.random.split(jax.random.PRNGKey(11), n)
    counts = {"bc": 0, "cb": 0}
    for i in range(n):
        ks = jax.random.split(keys[i], 8)
        k_b, k_c = ks[3], ks[4]
        fb = jax.random.uniform(k_b, (), minval=0.2, maxval=1.8)
        fc = jax.random.uniform(k_c, (), minval=0.2, maxval=1.8)
        x = jnp.asarray(raw[i].astype(np.float32) / 255.0)
        bc = np.asarray((A._adjust_contrast(A._adjust_brightness(x, fb), fc) - 0.5) / 0.5)
        cb = np.asarray((A._adjust_brightness(A._adjust_contrast(x, fc), fb) - 0.5) / 0.5)
        d_bc = np.abs(out[i] - bc).max()
        d_cb = np.abs(out[i] - cb).max()
        assert min(d_bc, d_cb) < 1e-5, "output matches neither application order"
        if d_bc < d_cb:
            counts["bc"] += 1
        else:
            counts["cb"] += 1
    assert counts["bc"] > n * 0.25 and counts["cb"] > n * 0.25, counts


def test_iper_indexer_oversampling(tmp_path):
    import image2video_synthesis_using_cinns_tpu.data.datasets as D

    root = tmp_path / "iper"
    # video names end in a digit that drives oversampling (reference
    # dataloader_iPER.py:29-32: repeats = iter_mode x int(vid[-1]))
    for vid in ("001_1_1", "001_1_2"):
        d = root / vid
        d.mkdir(parents=True)
        for k in range(10):
            Image.new("RGB", (16, 16), (0, 0, k)).save(d / f"frame_{k}.png")
    split_dir = tmp_path / "splits" / "iPER"
    split_dir.mkdir(parents=True)
    (split_dir / "train.txt").write_text("001/1/1 001/1/2")
    (split_dir / "test.txt").write_text("001/1/1")
    old = D._SPLIT_DIR
    D._SPLIT_DIR = str(tmp_path / "splits")
    try:
        opt = cfg.Config({"Data": {
            "data_path": str(root) + "/", "sequence_length": 4, "iter_train": 2,
        }})
        ds = D.IperDataset(opt, mode="train")
        # 2*(1) + 2*(2) = 6 samples
        assert len(ds) == 6
        item = ds.sample(5, np.random.default_rng(0))
        assert os.path.exists(item["paths"][0])

        ev = D.IperEvaluation(seq_length=4, img_size=16, path=str(root) + "/")
        assert len(ev) == 1000  # fixed eval length (reference line 79)
        item = ev.sample(123, np.random.default_rng(1))
        assert os.path.exists(item["paths"][-1])
    finally:
        D._SPLIT_DIR = old
