"""FID scoring (protocol parity with reference ``metrics/FID/FID_Score.py``):
InceptionV3 pool3 2048-d activations over flattened frames in [-1,1],
batch size 50, Fréchet distance."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import checkpoint as ckpt_io
from .frechet import frechet_from_activations
from .inception import InceptionV3FID


def load_inception(weights_root: str = "models"):
    module = InceptionV3FID()
    path = ckpt_io.find(os.path.join(weights_root, "FID", "pt_inception"))
    if path is None:
        raise FileNotFoundError(
            "FID inception weights not found under models/FID/; convert "
            "pt_inception-2015-12-05 with utils/convert.py"
        )
    payload = ckpt_io.load(path)
    return module, payload.get("state_dict", payload)


def get_activations(module, variables, images, batch_size: int = 50) -> np.ndarray:
    """images: (N, H, W, 3) channels-last in [-1, 1]."""
    run = jax.jit(lambda v, x: module.apply(v, x))
    n = images.shape[0]
    bs = min(batch_size, n)
    outs = []
    for i in range(n // bs):
        outs.append(np.asarray(run(variables, jnp.asarray(images[i * bs : (i + 1) * bs]))))
    return np.concatenate(outs, axis=0)


def calculate_FID(inception, seq_gen, seq_orig, batch_size: int = 50, dims: int = 2048):
    """Torch-layout entry matching the reference signature: (N, C, H, W)
    frames. Returns (FID, num_images)."""
    module, variables = inception
    g = np.transpose(np.asarray(seq_gen), (0, 2, 3, 1))
    r = np.transpose(np.asarray(seq_orig), (0, 2, 3, 1))
    a1 = get_activations(module, variables, g, batch_size)
    a2 = get_activations(module, variables, r, batch_size)
    return frechet_from_activations(a1, a2), g.shape[0]
