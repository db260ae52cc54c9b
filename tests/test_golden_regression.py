"""Golden numeric regression: fixed-seed tiny-model sampling output snapshot.

Guards future refactors against silent numeric drift (layout changes,
fusion-order changes, kernel swaps). The snapshot is (re)generated with
``--snapshot-update`` semantics: delete the file and run the test once.
"""

import os

import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu.models.facade import Model
from image2video_synthesis_using_cinns_tpu.testing import make_model_dir

_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN = os.path.join(_DIR, "tiny_sample_v1.npz")
GOLDEN_TRANSFER = os.path.join(_DIR, "tiny_transfer_v1.npz")
GOLDEN_CONTROL = os.path.join(_DIR, "tiny_control_v1.npz")
GOLDEN_CACHED = os.path.join(_DIR, "tiny_cached_posterior_v1.npz")


def _check(path: str, **arrays):
    """Compare fp32 arrays against the fp16-stored snapshot at ``path``,
    creating it on first run (delete the file to regenerate)."""
    if not os.path.exists(path):
        os.makedirs(_DIR, exist_ok=True)
        np.savez_compressed(
            path, **{k: v.astype(np.float16) for k, v in arrays.items()}
        )
        pytest.skip(f"golden snapshot {os.path.basename(path)} created — rerun")
    ref = np.load(path)
    for k, v in arrays.items():
        r = ref[k].astype(np.float32)
        assert r.shape == v.shape, k
        # fp16 storage + cross-backend fusion differences → loose-ish
        # tolerance, still far tighter than any behavioural change
        np.testing.assert_allclose(v, r, rtol=2e-2, atol=2e-2, err_msg=k)


def test_fixed_seed_sampling_snapshot(tmp_path):
    d = make_model_dir(str(tmp_path), preset="tiny", seed=1234)
    model = Model(d + "/", vid_length=8, seed=0, use_pallas=False)
    rng = np.random.default_rng(42)
    x0 = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    residual = rng.standard_normal((2, 16)).astype(np.float32)
    vid = np.asarray(model.forward(x0, residual=residual))
    _check(GOLDEN, vid=vid)


def test_fixed_seed_transfer_snapshot(tmp_path):
    """Locks the transfer path (encode query → flow fwd → flow⁻¹ under new
    start frames → decode) — the reference can't pin it (torch RNG), so this
    guards against self-drift across rounds."""
    d = make_model_dir(str(tmp_path), preset="tiny", seed=1234)
    model = Model(d + "/", vid_length=8, seed=7, transfer=True, use_pallas=False)
    rng = np.random.default_rng(43)
    q = rng.uniform(-1, 1, (1, 9, 3, 32, 32)).astype(np.float32)
    x0 = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    vid = np.asarray(model.transfer(q, x0))
    _check(GOLDEN_TRANSFER, vid=vid)


def test_fixed_seed_control_snapshot(tmp_path):
    """Locks endpoint-control sampling: the one-hot position embedding path
    (cond binning + per-block 'cond' coupling masks) through flow⁻¹ and the
    decoder."""
    d = make_model_dir(str(tmp_path), preset="tiny", seed=1234, control=True)
    model = Model(d + "/", vid_length=8, seed=0, use_pallas=False)
    rng = np.random.default_rng(44)
    x0 = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    cond = rng.uniform(0, 1, (2, 3)).astype(np.float32)
    residual = rng.standard_normal((2, 16)).astype(np.float32)
    vid = np.asarray(model.forward(x0, cond, residual=residual))
    _check(GOLDEN_CONTROL, vid=vid)


def test_fixed_seed_cached_posterior_snapshot(tmp_path):
    """Locks the posterior-cache build (window layout + deterministic aug +
    encoder forward) and the in-step reparameterised resample — paths with no
    reference counterpart to parity-test against."""
    import jax
    import jax.numpy as jnp

    from image2video_synthesis_using_cinns_tpu import config as cfg
    from image2video_synthesis_using_cinns_tpu.data.augment import build_augment
    from image2video_synthesis_using_cinns_tpu.data.datasets import BairDataset
    from image2video_synthesis_using_cinns_tpu.models.stage1.resnet3d import Encoder
    from image2video_synthesis_using_cinns_tpu.testing import (
        PRESETS,
        make_bair_data_dir,
        stage1_config,
    )
    from image2video_synthesis_using_cinns_tpu.train.posterior_cache import (
        build_cache,
        make_clip_reader,
        resample_posterior,
    )

    P = PRESETS["tiny"]
    data = make_bair_data_dir(
        str(tmp_path / "data") + "/", n_videos=2, img=P["img_size"],
        modes=("train",),
    )
    T = 9
    opt = cfg.Config(
        {"Data": {"data_path": data, "sequence_length": T, "dataset": "BAIR"}}
    )
    ds = BairDataset(opt, mode="train")
    enc = Encoder.from_config(stage1_config(P).Encoder)
    enc_vars = jax.jit(enc.init)(
        {"params": jax.random.PRNGKey(1234), "sample": jax.random.PRNGKey(1234)},
        jnp.zeros((1, T - 1, P["img_size"], P["img_size"], 3)),
    )
    aug = build_augment(P["img_size"], {}, False, False)
    cache = np.asarray(
        build_cache(enc, enc_vars, ds, T, aug, make_clip_reader(ds))
    )
    sample = np.asarray(
        resample_posterior(
            jnp.asarray(cache[:4, 0]), jnp.asarray(cache[:4, 1]),
            jax.random.PRNGKey(5),
        )
    )
    _check(GOLDEN_CACHED, cache=cache, sample=sample)
