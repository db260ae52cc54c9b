"""scripts/parity_report.py end-to-end on the synthetic reference-style
checkpoint dir from test_migration: conversion, both stacks, JSON verdict."""

import json
import os
import sys

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from test_migration import _write_reference_style_dir  # noqa: E402

import parity_report  # noqa: E402


def test_parity_report_end_to_end(tmp_path):
    root = str(tmp_path)
    s1, ae, s2, tdec, tflow = _write_reference_style_dir(root)

    out_path = os.path.join(root, "report.json")
    report = parity_report.main([
        "--ckpt_dir", s2, "--bs", "2", "--seq_length", "8",
        "--seed", "11", "--out", out_path,
    ])

    # conversion wrote the decoder + cINN msgpacks next to the .pth files
    assert os.path.exists(os.path.join(s1, "best_PFVD_GEN.msgpack"))
    assert os.path.exists(os.path.join(s2, "cINN.msgpack"))
    assert len(report["conversion"]["written"]) >= 2

    # our stack ran and is deterministic
    assert report["ours"]["finite"]
    assert report["ours"]["deterministic"]
    assert report["ours"]["output_shape"] == [2, 8, 3, 32, 32]

    # torch side ran and both component parities hold
    assert report["torch_ref"]["available"], report["torch_ref"]
    assert report["parity_flow_inverse"]["pass"], report["parity_flow_inverse"]
    assert report["parity_decoder"]["pass"], report["parity_decoder"]
    assert report["pass"]

    # the JSON on disk matches the returned report
    with open(out_path) as f:
        assert json.load(f)["pass"] == report["pass"]


def test_parity_report_skip_torch(tmp_path):
    root = str(tmp_path)
    _, _, s2, _, _ = _write_reference_style_dir(root)
    report = parity_report.run_report(s2, bs=2, seq_length=8, seed=3,
                                      skip_torch=True)
    assert report["torch_ref"] == {"available": False,
                                   "reason": "skipped by flag"}
    assert report["ours"]["finite"]
