"""Streaming offline eval (metrics/streaming_eval.py) vs the materialised
reference path.

The streamed CLIs must produce the SAME metric values as the materialised
functions — including the reference's deliberate tail-dropping populations —
while retaining only activation rows on the host. Backbone networks are
substituted with cheap deterministic stand-ins shared by BOTH paths (the real
backbones' numerics are pinned by tests/test_torch_parity.py; what's under
test here is batching independence, population selection and reductions —
all protocol code, resize/denorm/DT-tiling included, still runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu.metrics import fid as fid_mod
from image2video_synthesis_using_cinns_tpu.metrics import fvd as fvd_mod
from image2video_synthesis_using_cinns_tpu.metrics import lpips_eval as lpips_mod
from image2video_synthesis_using_cinns_tpu.metrics.streaming_eval import (
    DiversityStream,
    SynthesisQualityStream,
)


class _FakeBackbone:
    """Order-sensitive deterministic stand-in: projects pooled pixels through
    a fixed random matrix. Per-sample outputs are independent of batching —
    the property the real backbones have and the streaming rework relies on."""

    def __init__(self, d_out: int, seed: int, tuple_out: bool = False):
        rng = np.random.default_rng(seed)
        self.w = jnp.asarray(rng.standard_normal((4, d_out)).astype(np.float32))
        self.tuple_out = tuple_out

    def apply(self, variables, x):
        red = tuple(range(1, x.ndim - 1))
        pooled = jnp.stack([
            jnp.mean(x, axis=red + (x.ndim - 1,)),
            jnp.std(x.reshape(x.shape[0], -1), axis=1),
            jnp.mean(jnp.abs(x), axis=red + (x.ndim - 1,)),
            jnp.max(x.reshape(x.shape[0], -1), axis=1),
        ], axis=1)  # (N, 4)
        out = pooled @ self.w
        return (out, out) if self.tuple_out else out


class _FakeLPIPS:
    def apply(self, variables, a, b):
        return jnp.mean(jnp.abs(a - b), axis=(1, 2, 3))


@pytest.fixture()
def fake_backbones(monkeypatch):
    models = {}

    def load_model(kind="kinetics", weights_root="models"):
        if kind not in models:
            net = _FakeBackbone(
                64, seed={"kinetics": 3, "dt16": 4, "dt32": 5}[kind],
                tuple_out=(kind == "kinetics"))
            models[kind] = fvd_mod.I3DModel(net, {}, kind)
        return models[kind]

    inception = (_FakeBackbone(48, seed=7), {})
    lpips = (_FakeLPIPS(), {})
    monkeypatch.setattr(fvd_mod, "load_model", load_model)
    monkeypatch.setattr(fid_mod, "load_inception", lambda *a, **k: inception)
    monkeypatch.setattr(lpips_mod, "load_lpips", lambda *a, **k: lpips)


def _clips(rng, n, t=16, hw=24):
    return rng.uniform(-1, 1, (n, t, 3, hw, hw)).astype(np.float32)


def test_synthesis_stream_matches_materialized(fake_backbones):
    """All four metrics, streamed per-batch (ragged tail batch included) vs
    the materialised whole-set path the CLI used before. N=37 exercises every
    tail-drop: FVD keeps 32 (×16 groups), DTFVD keeps 37 (bs=min(40,37)),
    FID keeps 550 of 592 frames (bs=50), LPIPS 59 batches of 10."""
    rng = np.random.default_rng(11)
    fake = _clips(rng, 37)
    real = _clips(rng, 37)

    stream = SynthesisQualityStream(want_fid=True, want_lpips=True,
                                    want_fvd=True, want_dtfvd=True,
                                    seq_length=16)
    for lo in range(0, 37, 6):  # bs=6 with a ragged final batch of 1
        stream.add_batch(fake[lo:lo + 6], real[lo:lo + 6])
    got = stream.results()

    # materialised reference path (the old CLI body)
    pd_imgs = fake.reshape((-1,) + fake.shape[2:])
    gt_imgs = real.reshape((-1,) + real.shape[2:])
    want_fid, _ = fid_mod.calculate_FID(fid_mod.load_inception(),
                                        pd_imgs, gt_imgs, 50, 2048)
    want_lpips = lpips_mod.compute_lpips(pd_imgs, gt_imgs, batch_size=10)
    s1 = np.transpose(fake, (0, 1, 3, 4, 2))
    s2 = np.transpose(real, (0, 1, 3, 4, 2))
    want_dtfvd = fvd_mod.calculate_FVD(fvd_mod.load_model("dt16"), s1, s2, 40)
    g = fake[: 37 // 16 * 16].reshape((-1, 16) + fake.shape[1:])
    r = real[: 37 // 16 * 16].reshape((-1, 16) + real.shape[1:])
    want_fvd = fvd_mod.compute_fvd_official_protocol(g, r)

    np.testing.assert_allclose(got["FID"], want_fid, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got["LPIPS"], want_lpips, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got["DTFVD"], want_dtfvd, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got["FVD"], want_fvd, rtol=1e-4, atol=1e-5)


def test_synthesis_stream_memory_bounded(fake_backbones):
    """200-clip synthetic eval set (the VERDICT r3 #5 criterion): the stream
    retains activation rows only — orders of magnitude below the materialised
    fp32 clip arrays the old CLI held."""
    rng = np.random.default_rng(12)
    stream = SynthesisQualityStream(want_fid=True, want_lpips=True,
                                    want_fvd=True, want_dtfvd=True,
                                    seq_length=16)
    clip_bytes = 0
    for _ in range(20):
        fake, real = _clips(rng, 10), _clips(rng, 10)
        clip_bytes += fake.nbytes + real.nbytes
        stream.add_batch(fake, real)
    res = stream.results()
    assert set(res) == {"FID", "LPIPS", "FVD", "DTFVD"}
    assert all(np.isfinite(v) for v in res.values())
    # 200 clips × 16f × 3×24² fp32 ×2 ≈ 44 MB materialised; the stream holds
    # ~3200 frame rows × (48+1) + 400 clip rows × 64 floats ≈ <2 MB
    assert stream.retained_bytes < clip_bytes / 10, (
        stream.retained_bytes, clip_bytes)


def test_diversity_stream_matches_materialized(fake_backbones):
    """I3D + DTI3D diversity, batch-major streamed vs the realisation-major
    materialised functions. N=21 items exercises both populations (I3D keeps
    16 of 21; DTI3D keeps 20 with bs=min(20,21))."""
    from image2video_synthesis_using_cinns_tpu.metrics.diversity import (
        compute_DTI3D_diversity,
        compute_I3D_diversity,
    )

    rng = np.random.default_rng(13)
    n_realiz = 3
    stack = rng.uniform(-1, 1, (21, n_realiz, 16, 3, 24, 24)).astype(np.float32)

    stream = DiversityStream(n_realiz, want_i3d=True, want_dti3d=True,
                             seq_length=16)
    for lo in range(0, 21, 6):
        stream.add_batch(stack[lo:lo + 6])
    got = stream.results()

    want_i3d = compute_I3D_diversity(stack, n_realiz)
    want_dt = compute_DTI3D_diversity(stack)
    np.testing.assert_allclose(got["I3D"], want_i3d, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(got["DTI3D"], want_dt, rtol=1e-4, atol=1e-6)


def test_diversity_vgg_stream_matches_materialized():
    """VGG diversity runs the REAL VGG16 (deterministic PRNGKey(0) init in
    both paths — no weights file needed); tiny set keeps CPU time sane."""
    from image2video_synthesis_using_cinns_tpu.metrics.diversity import (
        compute_vgg_diversity,
    )

    rng = np.random.default_rng(14)
    stack = rng.uniform(-1, 1, (4, 2, 3, 3, 24, 24)).astype(np.float32)

    stream = DiversityStream(2, want_vgg=True, seq_length=3)
    for lo in range(0, 4, 3):  # ragged batches: 3 + 1
        stream.add_batch(stack[lo:lo + 3])
    got = stream.results()["VGG"]
    want = compute_vgg_diversity(stack)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_draw_residual_preserves_realisation_major_order():
    """The diversity CLI's batch-major loop must pair each (realisation,
    batch) with exactly the ν the old realisation-major loop drew: generate
    realisation-major with forward(residual=None) on one facade, batch-major
    with pre-drawn injected residuals on a second identically-seeded facade,
    and require identical videos per (realisation, batch)."""
    import tempfile

    from image2video_synthesis_using_cinns_tpu.models.facade import Model
    from image2video_synthesis_using_cinns_tpu.testing import make_model_dir

    d = make_model_dir(tempfile.mkdtemp(), preset="tiny")
    rng = np.random.default_rng(15)
    sizes = [2, 1]
    x0 = [rng.uniform(-1, 1, (s, 3, 32, 32)).astype(np.float32) for s in sizes]

    # old CLI order: realisation-major, facade draws ν internally
    m_old = Model(d + "/", vid_length=4, seed=249)
    old = [[np.asarray(m_old(x0[i])) for i in range(len(sizes))]
           for _ in range(2)]

    # new CLI order: pre-draw realisation-major, consume batch-major
    m_new = Model(d + "/", vid_length=4, seed=249)
    res = [[m_new.draw_residual(s) for s in sizes] for _ in range(2)]
    new = [[None] * len(sizes) for _ in range(2)]
    for i in range(len(sizes)):
        for r in range(2):
            new[r][i] = np.asarray(m_new.forward(x0[i], residual=res[r][i]))
    for r in range(2):
        for i in range(len(sizes)):
            np.testing.assert_array_equal(old[r][i], new[r][i])


def test_eval_synthesis_quality_cli_streams(tmp_path, monkeypatch, capsys,
                                            fake_backbones):
    """Drive the reworked eval CLI end-to-end (tiny model, synthetic BAIR,
    all four metric flags, fake backbones): finite scores printed, protocols
    exercised through the streaming path."""
    import sys

    import eval_synthesis_quality as cli

    from image2video_synthesis_using_cinns_tpu.testing import (
        make_bair_data_dir,
        make_model_dir,
    )

    ckpt = make_model_dir(str(tmp_path / "ckpt"), preset="tiny")
    data = make_bair_data_dir(str(tmp_path / "data") + "/", n_videos=16)
    monkeypatch.setattr(
        sys, "argv",
        ["eval_synthesis_quality.py", "-dataset", "bair", "-ckpt_path",
         ckpt + "/", "-data_path", data, "-seq_length", "4", "-bs", "6",
         "-FID", "1", "-LPIPS", "1", "-FVD", "1", "-DTFVD", "1"],
    )
    cli.main()
    out = capsys.readouterr().out
    for name in ("FID", "LPIPS", "DTFVD", "FVD"):
        line = [ln for ln in out.splitlines() if ln.startswith(f"{name} score of")]
        assert line, (name, out)
        assert np.isfinite(float(line[0].rsplit(" ", 1)[1])), line


def test_eval_diversity_cli_streams(tmp_path, monkeypatch, capsys,
                                    fake_backbones):
    import sys

    import eval_diversity as cli

    from image2video_synthesis_using_cinns_tpu.testing import (
        make_bair_data_dir,
        make_model_dir,
    )

    ckpt = make_model_dir(str(tmp_path / "ckpt"), preset="tiny")
    data = make_bair_data_dir(str(tmp_path / "data") + "/", n_videos=4)
    monkeypatch.setattr(
        sys, "argv",
        # -I3D omitted: its ×16-grouping population is empty below 16 eval
        # items (faithful to the reference grouping) and 16 tiny-model items
        # would slow the smoke test; the I3D path's value parity is pinned by
        # test_diversity_stream_matches_materialized above
        ["eval_diversity.py", "-dataset", "bair", "-ckpt_path", ckpt + "/",
         "-data_path", data, "-seq_length", "4", "-bs", "3", "-n_realiz", "2",
         "-VGG", "1", "-DTI3D", "1"],
    )
    cli.main()
    out = capsys.readouterr().out
    scores = [ln for ln in out.splitlines() if ln.startswith("Diversity score of")]
    assert len(scores) == 2, out  # VGG + DTI3D
    for ln in scores:
        assert np.isfinite(float(ln.split(" ")[3])), ln
