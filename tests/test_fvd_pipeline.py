"""FVD / DTFVD scoring machinery end-to-end with random-init backbones
(weights are converted offline in production; the machinery — resize, denorm,
time tiling, activation batching, Fréchet — is what these tests pin down)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu.metrics import fvd as fvd_mod
from image2video_synthesis_using_cinns_tpu.models.backbones.i3d import I3D


def _random_model(kind: str) -> fvd_mod.I3DModel:
    if kind == "kinetics":
        module = I3D(num_classes=400, head="logits")
        t = 16
    elif kind == "dt16":
        module = I3D(num_classes=18, head="representation", avg_pool_t=2)
        t = 16
    else:
        module = I3D(num_classes=18, head="representation", avg_pool_t=4)
        t = 32
    variables = jax.jit(module.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, t, 224, 224, 3))
    )
    return fvd_mod.I3DModel(module, variables, kind)


@pytest.fixture(scope="module")
def kin_model():
    return _random_model("kinetics")


def test_fvd_same_distribution_small(kin_model, rng):
    vids = rng.uniform(-1, 1, (8, 16, 32, 32, 3)).astype(np.float32)
    score = fvd_mod.calculate_FVD(kin_model, vids[:4], vids[4:], batch_size=4)
    assert np.isfinite(score)
    ident = fvd_mod.calculate_FVD(kin_model, vids[:4], vids[:4], batch_size=4)
    assert ident < 1e-3  # identical sets → ~0


def test_fvd_separates_distributions(kin_model, rng):
    a = rng.uniform(-1, 1, (6, 16, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + 0.8, -1, 1)
    near = fvd_mod.calculate_FVD(kin_model, a[:3], a[3:], batch_size=3)
    far = fvd_mod.calculate_FVD(kin_model, a, b, batch_size=3)
    assert far > near


def test_dtfvd_time_tiling(rng):
    model = _random_model("dt16")
    # 8-frame clips tile x3 then truncate to 16 (reference DTFVD_Score.py:174)
    vids = rng.uniform(-1, 1, (4, 8, 32, 32, 3)).astype(np.float32)
    score = fvd_mod.calculate_FVD(model, vids[:2], vids[2:], batch_size=2)
    assert np.isfinite(score)


def test_activation_tail_drop_pinned(kin_model, rng):
    """get_activations drops the N % batch_size trailing clips — deliberate
    parity with the reference's FID-matching batching (n_batches = N // bs,
    /root/reference/metrics/PyTorch_FVD/FVD_logging.py:100-127)."""
    vids = rng.uniform(-1, 1, (7, 16, 32, 32, 3)).astype(np.float32)
    acts = fvd_mod.get_activations(kin_model, vids, batch_size=3)
    assert acts.shape[0] == 6  # (7 // 3) * 3 clips scored, 1 dropped
    full = fvd_mod.get_activations(kin_model, vids, batch_size=7)
    assert full.shape[0] == 7
    np.testing.assert_allclose(acts, full[:6], rtol=2e-4, atol=2e-4)


def test_activations_invariant_to_batch_sign(kin_model, rng):
    # Denorm follows the *declared* input_range, not batch content: an
    # all-nonnegative batch in [-1,1] must be preprocessed exactly like any
    # other [-1,1] batch (reference denorms unconditionally,
    # metrics/PyTorch_FVD/FVD_logging.py:190-203).
    pos = rng.uniform(0.0, 1.0, (2, 16, 32, 32, 3)).astype(np.float32)
    act_declared = fvd_mod.get_activations(kin_model, pos, 2, input_range=(-1.0, 1.0))
    act_manual = fvd_mod.get_activations(
        kin_model, (pos + 1.0) / 2.0, 2, input_range=(0.0, 1.0)
    )
    np.testing.assert_allclose(act_declared, act_manual, atol=1e-5)


def test_official_protocol_grouping(kin_model, rng, monkeypatch):
    monkeypatch.setattr(fvd_mod, "load_model", lambda *a, **k: kin_model)
    # grouped tensors (G, 16, T, C, H, W) like eval_synthesis_quality builds
    # kinetics I3D needs >=16 frames (temporal pooling chain, like the ref)
    g = rng.uniform(-1, 1, (1, 16, 16, 3, 32, 32)).astype(np.float32)
    r = rng.uniform(-1, 1, (1, 16, 16, 3, 32, 32)).astype(np.float32)
    score = fvd_mod.compute_fvd_official_protocol(g, r)
    assert np.isfinite(score)


class _FakeLoader:
    """Minimal loader: yields deterministic uint8 clip batches."""

    def __init__(self, n_batches=3, bs=2, t=16, img=32, seed=0):
        self._batches = []
        r = np.random.default_rng(seed)
        for _ in range(n_batches):
            self._batches.append(
                {"seq_raw": r.integers(0, 255, (bs, t, img, img, 3), dtype=np.uint8)}
            )

    def epoch_iter(self, _epoch):
        yield from self._batches


def _fake_run(batch):
    """Deterministic stand-in for the sample/recon program: clips in [-1,1]."""
    seq = jnp.asarray(batch["seq_raw"]).astype(jnp.float32) / 127.5 - 1.0
    return seq * 0.9, seq  # 'generated' vs 'real'


def test_streaming_fvd_matches_collected(kin_model):
    """train/fvd_eval streams I3D activations from on-device clips (no host
    round-trip of the videos); the score must equal the collect-then-score
    path on the same clips."""
    from image2video_synthesis_using_cinns_tpu.metrics.frechet import (
        frechet_from_activations,
    )
    from image2video_synthesis_using_cinns_tpu.train import fvd_eval

    loader = _FakeLoader()
    act1, act2, host_g, host_o = fvd_eval._stream_fvd(
        _fake_run, loader, kin_model, keep_clips=4
    )
    assert host_g.shape[0] >= 4 and host_o.shape[0] >= 4
    streamed = frechet_from_activations(act1, act2)

    gen = np.concatenate(
        [np.asarray(_fake_run(b)[0]) for b in loader._batches], 0
    )
    orig = np.concatenate(
        [np.asarray(_fake_run(b)[1]) for b in loader._batches], 0
    )
    collected = fvd_mod.calculate_FVD(kin_model, gen, orig, batch_size=2)
    np.testing.assert_allclose(streamed, collected, rtol=1e-3, atol=1e-4)


def test_streaming_fvd_dt16_tiling(rng):
    """The DT-16 time-tiling happens on device in the streaming path and must
    match the host _prep_dt semantics."""
    from image2video_synthesis_using_cinns_tpu.metrics.frechet import (
        frechet_from_activations,
    )
    from image2video_synthesis_using_cinns_tpu.train import fvd_eval

    model = _random_model("dt16")
    loader = _FakeLoader(n_batches=2, t=8)
    act1, act2, _, _ = fvd_eval._stream_fvd(_fake_run, loader, model)
    streamed = frechet_from_activations(act1, act2)

    gen = np.concatenate(
        [np.asarray(_fake_run(b)[0]) for b in loader._batches], 0
    )
    orig = np.concatenate(
        [np.asarray(_fake_run(b)[1]) for b in loader._batches], 0
    )
    collected = fvd_mod.calculate_FVD(model, gen, orig, batch_size=2)
    np.testing.assert_allclose(streamed, collected, rtol=1e-3, atol=1e-4)
