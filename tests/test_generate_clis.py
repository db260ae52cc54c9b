"""generate_transfer / visualize_endpoint CLIs driven in-process on tiny
fixtures (synthetic assets + synthetic BAIR data), CPU."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

from image2video_synthesis_using_cinns_tpu.testing import (
    PRESETS,
    make_bair_data_dir,
    make_model_dir,
)


def _write_frames(d, n, img):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for k in range(n):
        arr = rng.integers(0, 255, (img, img, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"{k:03d}.png"))


def test_generate_transfer_cli(tmp_path, monkeypatch):
    import generate_transfer as cli

    p = PRESETS["tiny"]
    ckpt = make_model_dir(str(tmp_path / "ckpt"), preset="tiny")
    # CLI reads ./assets/GT_samples/landscape/transfer/<vid>/
    monkeypatch.chdir(tmp_path)
    for vid in ("vid0", "vid1"):
        _write_frames(
            str(tmp_path / "assets" / "GT_samples" / "landscape" / "transfer" / vid),
            p["seq_length"], p["img_size"],
        )
    monkeypatch.setattr(
        sys, "argv",
        ["generate_transfer.py", "-gpu", "0", "-dataset", "landscape",
         "-ckpt_path", ckpt + "/", "-seq_length", str(p["seq_length"]),
         "-data_parallel"],  # TPU-only serving flags (8-device CPU mesh here)
    )
    cli.main()
    out = tmp_path / "assets" / "results" / "landscape"
    assert (out / "transfer_0.gif").exists()
    assert (out / "transfer_1.gif").exists()


def test_visualize_endpoint_cli(tmp_path, monkeypatch):
    import visualize_endpoint as cli

    p = PRESETS["tiny"]
    data_dir = make_bair_data_dir(str(tmp_path / "data") + "/", img=p["img_size"])
    ckpt = make_model_dir(str(tmp_path / "ckpt"), preset="tiny", control=True)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["visualize_endpoint.py", "-gpu", "0", "-dataset", "bair",
         "-ckpt_path", ckpt + "/", "-data_path", data_dir,
         "-seq_length", "8", "-n_samples", "2", "-n_realiz", "2", "-bs", "2",
         # DP serving of the control-conditioned forward (cond rows are
         # sharded alongside the batch — facade._shard_rows)
         "-data_parallel"],
    )
    cli.main()
    out = tmp_path / "assets" / "results" / "bair_endpoint"
    assert (out / "endpoint_0.gif").exists()
    assert (out / "endpoint_0.png").exists()


def test_load_images_preprocessing_matches_torch_bilinear(tmp_path):
    """generate_samples normalises then resizes, like the reference
    (generate_samples.py:36-40: ``resize(normalize(img/255))`` via kornia,
    which wraps F.interpolate bilinear). Pin our cv2 path against torch
    bilinear on a recorded input so the two stay numerically equal."""
    torch = pytest.importorskip("torch")
    from PIL import Image

    from generate_samples import load_images

    rng = np.random.default_rng(4)
    raw = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
    Image.fromarray(raw).save(tmp_path / "a.png")

    ours = load_images(str(tmp_path), img_res=32)  # (1,3,32,32)

    x = torch.from_numpy(raw.astype(np.float32) / 255.0).permute(2, 0, 1)[None]
    x = (x - 0.5) / 0.5
    ref = torch.nn.functional.interpolate(
        x, size=(32, 32), mode="bilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_generate_samples_spatial_shard_end_to_end(tmp_path, monkeypatch):
    """-spatial_shard N must actually reach Model (the flag was once parsed
    but dropped — regression lock) and the width-sharded decoder must produce
    the gif end-to-end on the CPU mesh."""
    import jax
    import generate_samples as cli

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 virtual devices")
    p = PRESETS["tiny"]
    ckpt = make_model_dir(str(tmp_path / "ckpt"), preset="tiny")
    monkeypatch.chdir(tmp_path)
    _write_frames(str(tmp_path / "assets" / "GT_samples" / "bair"),
                  3, p["img_size"])
    monkeypatch.setattr(
        sys, "argv",
        ["generate_samples.py", "-gpu", "0", "-dataset", "bair",
         "-ckpt_path", ckpt + "/", "-seq_length", str(p["seq_length"]),
         "-bs", "2", "-spatial_shard", "2"],
    )
    cli.main()
    assert (tmp_path / "assets" / "results" / "bair" / "results.gif").exists()


@pytest.mark.parametrize("cli_name,extra", [
    ("generate_samples", []),
    ("generate_transfer", []),
    ("visualize_endpoint", ["-data_path", "unused/", "-dataset", "bair"]),
    ("eval_synthesis_quality", ["-data_path", "unused/"]),
    ("eval_diversity", ["-data_path", "unused/"]),
])
def test_spatial_shard_flag_reaches_model(cli_name, extra, monkeypatch):
    """Every sampling/eval CLI forwards -spatial_shard into Model(...) —
    guards against a declared-but-dropped argparse flag (found once in
    generate_samples). The stub aborts main() right after construction so
    no fixtures are needed."""
    import importlib

    from image2video_synthesis_using_cinns_tpu.models import facade

    cli = importlib.import_module(cli_name)
    seen = {}

    class _Abort(Exception):
        pass

    def fake_model(*a, **kw):
        seen.update(kw)
        raise _Abort

    monkeypatch.setattr(facade, "Model", fake_model)
    monkeypatch.setattr(
        sys, "argv",
        [cli_name + ".py", "-gpu", "0", "-dataset", "landscape",
         "-ckpt_path", "unused/", "-spatial_shard", "2"] + extra,
        # later duplicates of -dataset (e.g. bair for visualize_endpoint)
        # override the default landscape
    )
    with pytest.raises(_Abort):
        cli.main()
    assert seen.get("spatial_shard") == 2
