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


def test_convert_i3d_tf_hub_structural():
    """The TF-hub official-FVD converter (utils/convert.py::
    convert_i3d_tf_hub) must produce exactly our I3D's parameter tree from a
    TF-named variable dict: same treedef and shapes, kernels pass through
    untransposed (TF conv3d is (D,H,W,In,Out) — the flax layout), sonnet's
    scale-less BatchNorm maps beta→bn_bias with bn_scale = ones, and the
    converted tree is consumable by a real forward. No TF weights exist in
    this environment (zero egress), so this pins the structure the real
    dump will flow through."""
    import jax

    from image2video_synthesis_using_cinns_tpu.models.backbones.i3d import I3D
    from image2video_synthesis_using_cinns_tpu.utils import convert as C

    module = I3D(num_classes=400, head="logits")
    template = jax.eval_shape(
        lambda: module.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 9, 32, 32, 3))
        )
    )["params"]

    # synthesize the TF var dict from the inverse name map, shapes from the
    # template (exercises the RGB/inception_i3d/ prefix and :0 stripping)
    rng = np.random.default_rng(0)
    var_dict = {}

    def emit(fkey, tkey, bn=True, bias=False):
        node = template
        for part in fkey.split("/"):
            node = node[part]
        k = rng.standard_normal(node["conv3d"]["kernel"].shape).astype(np.float32)
        var_dict[f"RGB/inception_i3d/{tkey}/conv_3d/w:0"] = k
        if bias:
            var_dict[f"RGB/inception_i3d/{tkey}/conv_3d/b:0"] = (
                rng.standard_normal(node["conv3d"]["bias"].shape).astype(np.float32)
            )
        if bn:
            c = node["bn_bias"].shape
            for name in ("beta", "moving_mean", "moving_variance"):
                var_dict[f"RGB/inception_i3d/{tkey}/batch_norm/{name}:0"] = (
                    rng.standard_normal((1, 1, 1, 1) + c).astype(np.float32)
                )

    for ours, theirs in C.TF_I3D_UNITS.items():
        emit(ours, theirs)
    for m in C.MIXED_NAMES:
        for ours, theirs in C.TF_I3D_BRANCHES.items():
            emit(f"{m}/{ours}", f"{m.replace('mixed', 'Mixed')}/{theirs}")
    emit("conv3d_0c_1x1", "Logits/Conv3d_0c_1x1", bn=False, bias=True)

    out = C.convert_i3d_tf_hub(var_dict)["params"]

    t_leaves = dict(jax.tree_util.tree_flatten_with_path(template)[0])
    o_leaves = dict(jax.tree_util.tree_flatten_with_path(out)[0])
    assert set(t_leaves) == set(o_leaves)
    for path, t_leaf in t_leaves.items():
        assert o_leaves[path].shape == t_leaf.shape, jax.tree_util.keystr(path)
    # value pass-through: kernels untransposed, bn_scale ones
    np.testing.assert_array_equal(
        out["conv3d_1a_7x7"]["conv3d"]["kernel"],
        var_dict["RGB/inception_i3d/Conv3d_1a_7x7/conv_3d/w:0"],
    )
    np.testing.assert_array_equal(
        out["mixed_4d"]["branch_2b"]["bn_scale"],
        np.ones_like(out["mixed_4d"]["branch_2b"]["bn_scale"]),
    )
    np.testing.assert_array_equal(
        out["mixed_4d"]["branch_2b"]["bn_mean"],
        var_dict["RGB/inception_i3d/Mixed_4d/Branch_2/Conv3d_0b_3x3/batch_norm/moving_mean:0"].reshape(-1),
    )

    # consumable: abstract-eval the forward at the real 224px protocol size
    # (exact shape/dtype threading without burning CPU on a full I3D)
    probs, logits = jax.eval_shape(
        lambda p, x: module.apply({"params": p}, x),
        out, jax.ShapeDtypeStruct((1, 16, 224, 224, 3), jnp.float32),
    )
    assert logits.shape == (1, 400), logits.shape


def test_mjpeg_avi_roundtrip(tmp_path):
    """Pure-Python MJPEG AVI writer (the no-ffmpeg video artifact,
    utils/video.py): the container must round-trip through our own reader —
    frame count/shape exact, pixel values within JPEG error on smooth
    content."""
    from image2video_synthesis_using_cinns_tpu.utils.video import (
        read_mjpeg_avi,
        write_mjpeg_avi,
    )

    # smooth spatial gradients shifting over time (JPEG-friendly content)
    yy, xx = np.meshgrid(np.arange(24), np.arange(32), indexing="ij")
    frames = np.stack(
        [
            np.stack(
                [(yy * 4 + t * 20) % 256, (xx * 4) % 256, np.full_like(yy, 96)],
                axis=-1,
            )
            for t in range(5)
        ]
    ).astype(np.uint8)

    p = str(tmp_path / "clip.avi")
    write_mjpeg_avi(p, frames, fps=3)
    back = read_mjpeg_avi(p)
    assert back.shape == frames.shape
    err = np.abs(back.astype(np.int32) - frames.astype(np.int32)).mean()
    assert err < 8.0, f"mean JPEG round-trip error {err}"


def test_save_video_always_writes_artifact(tmp_path):
    """save_video (reference utils/auxiliaries.py:25-30 writes a 6x-looped
    mp4) must always produce a video file: mp4 when an ffmpeg backend
    exists, otherwise the MJPEG AVI fallback next to the requested path."""
    from image2video_synthesis_using_cinns_tpu.utils.video import (
        read_mjpeg_avi,
        save_video,
    )

    frames = np.linspace(0, 255, 4 * 16 * 16 * 3, dtype=np.float32).reshape(
        4, 16, 16, 3
    )
    save_video(str(tmp_path / "v.mp4"), frames, fps=3, loops=2)
    wrote = [f.name for f in tmp_path.iterdir()]
    assert wrote, "no video artifact written"
    if "v.avi" in wrote:  # no-ffmpeg environment (this rig)
        assert read_mjpeg_avi(str(tmp_path / "v.avi")).shape[0] == 8  # 2 loops
    else:
        assert "v.mp4" in wrote


def test_enable_persistent_cache_respects_existing(tmp_path, monkeypatch):
    """Entry points enable a persistent XLA compile cache; an
    already-configured cache dir (tests, JAX_COMPILATION_CACHE_DIR users)
    must be left untouched, and I2V_JAX_CACHE picks the location otherwise."""
    import jax

    from image2video_synthesis_using_cinns_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    # conftest configured tests/.jax_cache → no-op, returns the existing dir
    existing = jax.config.jax_compilation_cache_dir
    assert existing
    assert enable_persistent_cache() == existing
    assert jax.config.jax_compilation_cache_dir == existing

    # unconfigured → I2V_JAX_CACHE wins and the dir is created
    monkeypatch.setenv("I2V_JAX_CACHE", str(tmp_path / "cc"))
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        got = enable_persistent_cache()
        assert got == str(tmp_path / "cc")
        assert (tmp_path / "cc").is_dir()
        assert jax.config.jax_compilation_cache_dir == got
    finally:
        jax.config.update("jax_compilation_cache_dir", existing)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def test_pretrained_init_biggan_missing_file_errors(tmp_path):
    """AE.pretrained=true without the (manually-supplied) ImageNet checkpoint
    must fail actionably, pointing at docs/WEIGHTS.md — the reference crashes
    with a bare assert here (ckpt_util.py:37)."""
    import pytest

    from image2video_synthesis_using_cinns_tpu.utils import convert as C

    with pytest.raises(FileNotFoundError, match="WEIGHTS.md"):
        C.pretrained_init_biggan({}, {"in_size": 64}, weights_root=str(tmp_path))
