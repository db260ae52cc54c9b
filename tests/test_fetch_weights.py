"""Integrity-check logic of the weights bootstrap (scripts/fetch_weights.py).

The reference md5-checks its one auto-download (ckpt_util.py:36-46); the
bootstrap extends that to every torch source, including manually supplied
files. Network never touched here.
"""

import json
import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
if SCRIPTS not in sys.path:
    sys.path.append(SCRIPTS)

import fetch_weights as fw  # noqa: E402


def _write(path, data: bytes):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return path


def test_published_md5_enforced(tmp_path):
    p = _write(str(tmp_path / "vgg.pth"), b"not the real lpips file")
    with pytest.raises(ValueError, match="md5"):
        fw.verify("lpips", p, str(tmp_path))


def test_sha256_prefix_enforced(tmp_path):
    p = _write(str(tmp_path / "vgg16.pth"), b"wrong")
    with pytest.raises(ValueError, match="sha256"):
        fw.verify("vgg16", p, str(tmp_path))


def test_trust_on_first_use_records_then_enforces(tmp_path):
    root = str(tmp_path)
    p = _write(str(tmp_path / "model_rgb.pth"), b"payload-v1")
    fw.verify("pi3d", p, root)  # records
    rec = json.load(open(os.path.join(root, fw.CHECKSUMS)))
    assert rec["pi3d"] == fw.md5_file(p)
    fw.verify("pi3d", p, root)  # matches
    _write(p, b"payload-TAMPERED")
    with pytest.raises(ValueError, match="previously recorded"):
        fw.verify("pi3d", p, root)


def test_registry_covers_every_reference_external_weight():
    """Every external pretrained artifact the reference needs has a registry
    entry: LPIPS pair, PI3D, DTI3D 16/32, FID inception, biggan 64/128, and
    the official TF-hub backbone (reference README.md:166,187,
    ckpt_util.py:5-8, FVD_logging.py:208-214, DTFVD_Score.py:225-234)."""
    assert set(fw.WEIGHTS) >= {
        "lpips", "vgg16", "pi3d", "dti3d16", "dti3d32", "fid",
        "biggan_64", "biggan_128", "i3d_tf_hub",
    }
    for name, spec in fw.WEIGHTS.items():
        assert spec["path"] and spec["note"], name
