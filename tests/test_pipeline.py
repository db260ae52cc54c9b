"""Full-pipeline integration gate on REAL trained artifacts.

Everything else in the suite tests the trainers and consumers against
fabricated checkpoint dirs (``testing.make_model_dir``); this drives the
reference README workflow end-to-end from empty disk — stage-1 → AE → cINN
*from the saved dirs* → ``Model(<real cINN output dir>)`` → generate GIF →
eval CLI — asserting the file contracts as written-by-trainers and
read-by-consumers (reference ``get_model.py:15-45``,
``stage2_cINN/main.py:77-88``, ``stage2_cINN/AE/main.py:152-155``).
A drift between what a trainer writes (filename/key/config) and what the
next stage reads fails HERE, before a user hits it.
"""

import os

import pytest


@pytest.mark.slow
def test_full_pipeline_from_empty_disk(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from pipeline_drive import run_pipeline

    out = run_pipeline(str(tmp_path), preset="tiny", steps=2, n_videos=4, bs=2)

    # the chain's own asserts already gated the per-stage contracts; re-check
    # the headline artifacts from here so the test reads as the spec
    assert os.path.exists(os.path.join(out["stage1"], "best_PFVD_GEN.msgpack"))
    assert os.path.exists(os.path.join(out["ae"], "Encoder_stage2.msgpack"))
    assert os.path.exists(os.path.join(out["stage2"], "cINN.msgpack"))
    assert os.path.exists(out["gif"])
    assert out["video_shape"][0] == 2
