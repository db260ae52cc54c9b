"""Eval CLI protocol: generation loop + dataset-specific frame concatenation
(run in-process on CPU with a tiny fixture, metrics disabled — the metric
backends are unit-tested separately and need converted weights)."""

import sys

import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu.testing import (
    PRESETS,
    make_bair_data_dir,
    make_model_dir,
)


def test_eval_synthesis_quality_generation(tmp_path, monkeypatch):
    import eval_synthesis_quality as cli

    data_dir = make_bair_data_dir(
        str(tmp_path / "data") + "/", img=PRESETS["tiny"]["img_size"]
    )
    ckpt = make_model_dir(str(tmp_path / "ckpt"), preset="tiny")

    monkeypatch.setattr(
        sys, "argv",
        ["eval_synthesis_quality.py", "-gpu", "0", "-dataset", "bair",
         "-ckpt_path", ckpt + "/", "-data_path", data_dir,
         "-seq_length", "8", "-bs", "2"],
    )
    cli.main()  # generation + bair FVD-paper frame protocol, no metrics


def test_eval_synthesis_quality_data_parallel(tmp_path, monkeypatch):
    """-data_parallel shards the sampling loop over the 8-device CPU mesh
    (batch 2 → padded/unpadded by the facade); protocol output unchanged."""
    import jax
    import eval_synthesis_quality as cli

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    data_dir = make_bair_data_dir(
        str(tmp_path / "data") + "/", img=PRESETS["tiny"]["img_size"]
    )
    ckpt = make_model_dir(str(tmp_path / "ckpt"), preset="tiny")

    monkeypatch.setattr(
        sys, "argv",
        ["eval_synthesis_quality.py", "-gpu", "0", "-dataset", "bair",
         "-ckpt_path", ckpt + "/", "-data_path", data_dir,
         "-seq_length", "8", "-bs", "2", "-data_parallel"],
    )
    cli.main()


def test_eval_diversity_generation(tmp_path, monkeypatch):
    import eval_diversity as cli

    data_dir = make_bair_data_dir(
        str(tmp_path / "data") + "/", img=PRESETS["tiny"]["img_size"]
    )
    ckpt = make_model_dir(str(tmp_path / "ckpt"), preset="tiny")

    monkeypatch.setattr(
        sys, "argv",
        ["eval_diversity.py", "-gpu", "0", "-dataset", "bair",
         "-ckpt_path", ckpt + "/", "-data_path", data_dir,
         "-seq_length", "8", "-n_realiz", "2", "-bs", "2"],
    )
    cli.main()
