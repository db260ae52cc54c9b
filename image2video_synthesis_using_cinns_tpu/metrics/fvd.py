"""FVD / DTFVD scoring on TPU.

Protocol parity:
  * kinetics FVD (reference ``metrics/PyTorch_FVD/FVD_logging.py``):
    bilinear-resize frames to 224 (align_corners=True), denorm [-1,1]→[0,1]
    if needed, I3D 400-d *logits* activations, Fréchet distance.
  * DTFVD (reference ``metrics/DTFVD/DTFVD_Score.py``): DTDB-trained I3D,
    1024-d pre-logits representation; the 16-frame path tiles the video 3x in
    time then truncates to 16 (line 174); 32-frame path asserts length 32.
  * official FVD (reference ``metrics/FVD/FVD.py``, TF1 + TF-hub): replaced by
    the JAX kinetics-I3D logits path — same metric definition (I3D logits +
    Fréchet), and videos are grouped in 16s by the eval CLI exactly like the
    reference (``eval_synthesis_quality.py:110-112``). Comparability caveat,
    stated plainly: scores are comparable to published/official FVD numbers
    ONLY when the backbone runs the actual TF-hub ``i3d-kinetics-400/1``
    weights (dump them to ``.npz`` on a networked machine and convert with
    ``utils/convert.py::convert_i3d_tf_hub`` — the converter's name/layout
    mapping is numerically validated offline in
    ``tests/test_torch_parity.py::test_i3d_tf_hub_converter_numerical_parity``;
    procedure in ``docs/WEIGHTS.md``). With the PyTorch-port kinetics weights
    (``models/PI3D``) the metric definition is identical but the weight
    provenance differs, so treat those scores as internally consistent
    (A-vs-B within this repo), not as official-FVD values.

Weights: converted checkpoints at ``models/PI3D/model_rgb.msgpack`` and
``models/DTI3D/length{16,32}/...`` (mirroring the reference's manual-download
paths); ``utils/convert.py`` produces them from the torch files. Without them
``load_model`` raises FileNotFoundError and callers degrade gracefully.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbones.i3d import I3D
from ..ops.resize import resize_bilinear_align_corners
from ..utils import checkpoint as ckpt_io
from .frechet import frechet_from_activations


class I3DModel(NamedTuple):
    module: I3D
    variables: dict
    kind: str  # 'kinetics' | 'dt16' | 'dt32'


def load_model(kind: str = "kinetics", weights_root: str = "models") -> I3DModel:
    if kind == "kinetics":
        module = I3D(num_classes=400, head="logits")
        path = os.path.join(weights_root, "PI3D", "model_rgb.msgpack")
    elif kind == "dt16":
        module = I3D(num_classes=18, head="representation", avg_pool_t=2, bn_eps=1e-5)
        path = os.path.join(weights_root, "DTI3D", "length16", "I3D_16.msgpack")
    elif kind == "dt32":
        module = I3D(num_classes=18, head="representation", avg_pool_t=4, bn_eps=1e-5)
        path = os.path.join(weights_root, "DTI3D", "length32", "I3D_32.msgpack")
    else:
        raise ValueError(kind)

    found = ckpt_io.find(os.path.splitext(path)[0])
    if found is None:
        raise FileNotFoundError(
            f"I3D weights not found at {path}; convert the reference weights "
            "with utils/convert.py (see README)"
        )
    payload = ckpt_io.load(found)
    variables = payload.get("state_dict", payload)
    return I3DModel(module, variables, kind)


def _resize224(videos: jax.Array) -> jax.Array:
    b, t = videos.shape[:2]
    flat = videos.reshape((-1,) + videos.shape[2:])
    flat = resize_bilinear_align_corners(flat, (224, 224))
    return flat.reshape((b, t, 224, 224, videos.shape[-1]))


def _activation_fn(model: I3DModel, input_range: tuple[float, float]):
    lo, hi = float(input_range[0]), float(input_range[1])

    @jax.jit
    def run(variables, batch):
        x = _resize224(batch)
        # Denorm per the *declared* input range — never per batch content.
        # (The reference denorms unconditionally per declared range,
        # metrics/PyTorch_FVD/FVD_logging.py:190-203; a data-dependent
        # `min(x) < 0` check would make activations depend on batch sign.)
        x = (x - lo) / (hi - lo)
        out = model.module.apply(variables, x)
        if model.kind == "kinetics":
            return out[1]  # logits
        return out

    return run


def activation_fn(model: I3DModel, input_range: tuple[float, float] = (-1.0, 1.0)):
    """Public jitted per-batch activation program — lets callers stream
    activations from on-device videos (train/fvd_eval.py) without a host
    round-trip of the raw clips."""
    return _activation_fn(model, input_range)


def prep_dt_time(videos: jax.Array, length: int) -> jax.Array:
    """Device-side analogue of ``_prep_dt`` (reference DTFVD_Score.py:174)."""
    if length == 16:
        return jnp.concatenate([videos] * 3, axis=1)[:, :16]
    assert videos.shape[1] == 32, "DTFVD-32 requires 32-frame videos"
    return videos


def get_activations(
    model: I3DModel,
    videos,
    batch_size: int,
    input_range: tuple[float, float] = (-1.0, 1.0),
) -> np.ndarray:
    """videos: (N, T, H, W, 3) channels-last float array (any device), with
    values in the declared ``input_range`` (default [-1,1])."""
    run = _activation_fn(model, input_range)
    n = videos.shape[0]
    bs = min(batch_size, n)
    # Deliberate: the n % bs trailing clips are DROPPED, exactly like the
    # reference's FID-matching batching (n_batches = N // bs, leftover never
    # scored — /root/reference/metrics/PyTorch_FVD/FVD_logging.py:100-127).
    # Pass a divisor batch_size to score every clip. The streaming trainer
    # path (train/fvd_eval.py) scores every clip instead — see its docstring.
    n_batches = n // bs
    outs = []
    for i in range(n_batches):
        batch = jnp.asarray(videos[i * bs : (i + 1) * bs])
        outs.append(np.asarray(run(model.variables, batch)))
    return np.concatenate(outs, axis=0)


def _prep_dt(videos, length: int):
    if length == 16:
        # tile 3x along time then truncate (reference DTFVD_Score.py:174)
        videos = np.concatenate([videos] * 3, axis=1)[:, :16]
    else:
        assert videos.shape[1] == 32, "DTFVD-32 requires 32-frame videos"
    return videos


def calculate_FVD(
    model: I3DModel,
    data_gen,
    data_orig,
    batch_size: int,
    input_range: tuple[float, float] = (-1.0, 1.0),
) -> float:
    """Channels-last videos (N,T,H,W,3) in the declared ``input_range``
    (default [-1,1]); pass (0,1) for already-denormed data."""
    data_gen = np.asarray(data_gen)
    data_orig = np.asarray(data_orig)
    if model.kind == "dt16":
        data_gen, data_orig = _prep_dt(data_gen, 16), _prep_dt(data_orig, 16)
    elif model.kind == "dt32":
        data_gen, data_orig = _prep_dt(data_gen, 32), _prep_dt(data_orig, 32)
    act1 = get_activations(model, data_gen, batch_size, input_range)
    act2 = get_activations(model, data_orig, batch_size, input_range)
    return frechet_from_activations(act1, act2)


def compute_fvd_official_protocol(seq_fake, seq_real) -> float:
    """Replacement for the TF1 official-FVD driver
    (``metrics/FVD/evaluate_FVD.py:13-55``): accepts the grouped (G, 16, T, C,
    H, W) torch-layout tensors the eval CLI builds, flattens the groups and
    scores with the kinetics I3D.

    Comparability: identical protocol to the official metric, but the score
    equals the official FVD only when ``models/PI3D`` holds weights converted
    from the actual TF-hub module (see the module docstring / docs/WEIGHTS.md);
    with the PyTorch-port weights the number is an in-repo FVD, not citable
    against published tables."""
    model = load_model("kinetics")
    f = np.asarray(seq_fake)
    r = np.asarray(seq_real)
    f = f.reshape((-1,) + f.shape[2:])
    r = r.reshape((-1,) + r.shape[2:])
    # (N, T, C, H, W) → channels-last
    f = np.transpose(f, (0, 1, 3, 4, 2))
    r = np.transpose(r, (0, 1, 3, 4, 2))
    return calculate_FVD(model, f, r, batch_size=16)
