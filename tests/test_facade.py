"""End-to-end facade test: fabricate a chained checkpoint dir, sample videos."""

import jax.numpy as jnp
import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu.models.facade import Model
from image2video_synthesis_using_cinns_tpu.testing import PRESETS, make_model_dir


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpts")
    return make_model_dir(str(root), preset="tiny")


def test_forward_shapes_and_determinism(model_dir):
    p = PRESETS["tiny"]
    model = Model(model_dir + "/", vid_length=8, seed=7)
    x0 = np.random.default_rng(0).standard_normal((2, 3, p["img_size"], p["img_size"])).astype(np.float32)
    vid = model(x0)
    assert vid.shape == (2, 8, 3, p["img_size"], p["img_size"])

    # injected residual → deterministic output
    res = np.zeros((2, p["z_dim"]), np.float32)
    v1 = model.forward(x0, residual=res)
    v2 = model.forward(x0, residual=res)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)

    # different residuals → different videos (stochastic synthesis)
    v3 = model.forward(x0, residual=res + 1.0)
    assert not np.allclose(np.asarray(v1), np.asarray(v3))


def test_autoregressive_extension(model_dir):
    p = PRESETS["tiny"]
    model = Model(model_dir + "/", vid_length=20, seed=7)
    x0 = np.zeros((1, 3, p["img_size"], p["img_size"]), np.float32)
    vid = model(x0)
    # base clip is 8 frames; 20 requested → 3 decoder applications, truncated
    assert vid.shape[1] == 20


def test_transfer(model_dir):
    p = PRESETS["tiny"]
    model = Model(model_dir + "/", vid_length=8, transfer=True, seed=7)
    rng = np.random.default_rng(1)
    query = rng.standard_normal((1, p["seq_length"], 3, p["img_size"], p["img_size"])).astype(np.float32)
    x0 = rng.standard_normal((3, 3, p["img_size"], p["img_size"])).astype(np.float32)
    out = model.transfer(query, x0)
    assert out.shape == (3, 8, 3, p["img_size"], p["img_size"])


def test_transfer_long_sequence_fused_matches_loop(model_dir):
    """Long-sequence transfer extends autoregressively INSIDE the jitted
    program (one dispatch); numerics must match the reference-style host
    dispatch-per-chunk loop (get_model.py:99-101)."""
    import jax

    p = PRESETS["tiny"]
    model = Model(model_dir + "/", vid_length=20, transfer=True, seed=7)
    rng = np.random.default_rng(2)
    query = rng.standard_normal((1, p["seq_length"], 3, p["img_size"], p["img_size"])).astype(np.float32)
    x0 = rng.standard_normal((3, 3, p["img_size"], p["img_size"])).astype(np.float32)
    out = model.transfer(query, x0)
    assert out.shape == (3, 20, 3, p["img_size"], p["img_size"])
    assert np.isfinite(np.asarray(out)).all()

    # extension parity: fused lax.scan vs the host loop, same base clip + z
    z = jnp.asarray(rng.standard_normal((3, p["z_dim"])), jnp.float32)
    x0_cl = jnp.transpose(jnp.asarray(x0), (0, 2, 3, 1))
    base = model._decode_fn()(model.decoder_vars, x0_cl, z)
    fused = jax.jit(model._extend_traced)(model.decoder_vars, base, z)
    loop = model._extend(base, z)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(loop), atol=1e-5)


def test_landscape_128px_family(tmp_path_factory):
    """End-to-end facade on the 128px landscape-style architecture
    (nf 32, per-axis upsampling [2,2]/[2,1], resnet50 'bn' embedder)."""
    root = tmp_path_factory.mktemp("ckpts_landscape")
    d = make_model_dir(str(root), preset="landscape")
    model = Model(d + "/", vid_length=16, seed=3)
    x0 = np.zeros((1, 3, 128, 128), np.float32)
    vid = model(x0)
    assert vid.shape == (1, 16, 3, 128, 128)
    assert np.isfinite(np.asarray(vid)).all()
