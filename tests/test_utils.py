"""Utils: config roundtrip + OmegaConf-style access, checkpoint atomicity and
typed restore, logging accumulators, step timer."""

import os

import jax.numpy as jnp
import numpy as np
import optax

from image2video_synthesis_using_cinns_tpu import config as cfg
from image2video_synthesis_using_cinns_tpu.utils import checkpoint as ckpt_io
from image2video_synthesis_using_cinns_tpu.utils.logging import CSVlogger, Logging
from image2video_synthesis_using_cinns_tpu.utils.profiling import StepTimer


def test_config_roundtrip_and_access(tmp_path):
    c = cfg.loads("""
Decoder:
  z_dim: 64
  upsample_s: [2, 1]
Training:
  lr: 2.0e-4
""")
    # both OmegaConf access styles work
    assert c.Decoder["z_dim"] == 64
    assert c.Decoder.z_dim == 64
    assert c.Training.lr == 2e-4
    # in-place mutation + save/load chain (the reference's config contract)
    c.Training["save_path"] = str(tmp_path / "run")
    path = tmp_path / "config.yaml"
    cfg.save(c, str(path))
    c2 = cfg.load(str(path))
    assert c2.Training["save_path"] == str(tmp_path / "run")
    assert list(c2.Decoder["upsample_s"]) == [2, 1]
    # missing attribute mirrors OmegaConf-optional behaviour via .get
    assert c2.get("Logging") is None


def test_checkpoint_roundtrip_with_optax_state(tmp_path):
    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}
    opt = optax.adam(1e-3)
    state = opt.init(params)
    g = {"w": jnp.full((3, 2), 0.1), "b": jnp.full((2,), 0.2)}
    _, state = opt.update(g, state, params)

    path = str(tmp_path / "ck.msgpack")
    ckpt_io.save(path, {"epoch": 3, "state_dict": params, "optim_state_dict": state})
    payload = ckpt_io.load(path)
    assert payload["epoch"] == 3
    np.testing.assert_array_equal(payload["state_dict"]["w"], np.ones((3, 2)))

    # typed restore reconstructs the optax NamedTuple structure
    fresh = opt.init(params)
    restored = ckpt_io.restore_into(fresh, payload["optim_state_dict"])
    assert type(restored) is type(fresh)
    for a, b in zip(
        np.asarray(restored[0].mu["w"]).ravel(), np.asarray(state[0].mu["w"]).ravel()
    ):
        assert a == b


def test_checkpoint_find_prefers_native(tmp_path):
    stem = str(tmp_path / "model")
    open(stem + ".pth", "wb").write(b"x")
    assert ckpt_io.find(stem).endswith(".pth")
    ckpt_io.save(stem + ".msgpack", {"state_dict": {"a": jnp.zeros(1)}})
    assert ckpt_io.find(stem).endswith(".msgpack")


def test_logging_accumulator_and_csv(tmp_path):
    log = Logging(["a", "b"])
    for i in range(5):
        log.append({"a": i, "b": 2 * i})
    assert log.log() == [2.0, 4.0]
    assert log.get_iteration_mean(2) == [3.5, 7.0]
    log.reset()
    assert np.isnan(log.log()[0])

    csv_path = str(tmp_path / "log.csv")
    csv = CSVlogger(csv_path, ["Epoch", "a"])
    csv.write([0, 1.5])
    lines = open(csv_path).read().strip().split("\n")
    assert lines[0] == "Epoch,a" and lines[1] == "0,1.5"


def test_step_timer():
    t = StepTimer()
    with t.measure():
        _ = jnp.sum(jnp.ones((100, 100)))
    assert t.last_ms > 0
    assert t.ema_ms == t.last_ms


def test_checkpoint_save_async_orders_and_flushes(tmp_path):
    """save_async: FIFO per path (last write wins), wait() flushes to disk,
    and the file is a normal loadable checkpoint."""
    p = str(tmp_path / "ck.msgpack")
    for i in range(3):
        ckpt_io.save_async(p, {"epoch": i, "state_dict": {"w": np.full((4,), i, np.float32)}})
    ckpt_io.wait()
    payload = ckpt_io.load(p)
    assert int(payload["epoch"]) == 2
    np.testing.assert_array_equal(payload["state_dict"]["w"], np.full((4,), 2, np.float32))
