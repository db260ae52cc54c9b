"""Golden numeric regression: fixed-seed tiny-model sampling output snapshot.

Guards future refactors against silent numeric drift (layout changes,
fusion-order changes, kernel swaps). The snapshot is (re)generated with
``--snapshot-update`` semantics: delete the file and run the test once.
"""

import os

import numpy as np
import pytest

from image2video_synthesis_using_cinns_tpu.models.facade import Model
from image2video_synthesis_using_cinns_tpu.testing import make_model_dir

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_sample_v1.npz")


def test_fixed_seed_sampling_snapshot(tmp_path):
    d = make_model_dir(str(tmp_path), preset="tiny", seed=1234)
    model = Model(d + "/", vid_length=8, seed=0, use_pallas=False)
    rng = np.random.default_rng(42)
    x0 = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    residual = rng.standard_normal((2, 16)).astype(np.float32)
    vid = np.asarray(model.forward(x0, residual=residual))

    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, vid=vid.astype(np.float16))
        pytest.skip("golden snapshot created — rerun to compare")

    ref = np.load(GOLDEN)["vid"].astype(np.float32)
    assert ref.shape == vid.shape
    # fp16 storage + cross-backend fusion differences → loose-ish tolerance,
    # still far tighter than any behavioural change would produce
    np.testing.assert_allclose(vid, ref, rtol=2e-2, atol=2e-2)
