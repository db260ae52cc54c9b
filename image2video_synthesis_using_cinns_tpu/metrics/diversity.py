"""Diversity metrics: mean pairwise distance between realisations.

Protocol parity with reference ``metrics/Diversity/``:
  * VGG (``VGG.py:8-45``): per-frame ImageNet-normalised 224px VGG16 features,
    mean squared difference over all 5 slices for every ordered pair of
    realisations (note the reference uses *squared* L2 means here).
  * I3D kinetics (``I3D.py:7-29``): videos grouped ×16, kinetics-I3D
    embeddings (our JAX I3D replaces the TF-hub path), pairwise over
    realisations.
  * DT-I3D (``I3D.py:32-59``): DTDB-I3D representation embeddings, 16/32-frame
    variant by sequence length, score reported ×1000 like the reference.

Inputs follow the eval CLI layout: (B, n_realiz, T, C, H, W) in [-1, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbones.vgg16 import VGG16Features
from ..ops.resize import resize_bilinear
from . import fvd as fvd_mod

_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406])
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225])


def compute_vgg_diversity(videos, vgg_variables=None) -> float:
    videos = np.asarray(videos)
    assert videos.min() < 0 and videos.max() <= 1.0
    videos = (videos + 1.0) / 2.0
    b, n_samples, t = videos.shape[:3]

    vgg = VGG16Features()
    if vgg_variables is None:
        vgg_variables = jax.jit(vgg.init)(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 224, 224, 3))
        )

    @jax.jit
    def feats(frames):
        x = (frames - _IMAGENET_MEAN) / _IMAGENET_STD
        x = resize_bilinear(x, (224, 224))
        return vgg.apply(vgg_variables, x)

    div = []
    for video in videos:  # (n_samples, T, C, H, W)
        frames = np.transpose(video.reshape((-1,) + video.shape[2:]), (0, 2, 3, 1))
        fmap = feats(jnp.asarray(frames))
        for level in range(5):
            f = np.asarray(fmap[level]).reshape((n_samples, t) + fmap[level].shape[1:])
            for i in range(n_samples):
                for j in range(n_samples):
                    if i != j:
                        div.append(float(np.mean((f[i] - f[j]) ** 2)))
    return float(np.mean(div))


def compute_I3D_diversity(seq1, n_samples: int) -> float:
    seq1 = np.asarray(seq1)
    assert seq1.min() < 0
    input_b = seq1.shape[0] // 16 * 16
    grouped = seq1[:input_b].reshape(
        (-1, 16) + seq1.shape[2:]
    )  # (G*16 videos regrouped like the reference)
    flat = grouped.reshape((-1,) + grouped.shape[2:])  # (N, T, C, H, W)
    flat = np.transpose(flat, (0, 1, 3, 4, 2))
    model = fvd_mod.load_model("kinetics")
    embed = fvd_mod.get_activations(model, flat, batch_size=16)
    embed = embed.reshape(input_b, n_samples, -1)
    div = [
        float(np.mean((embed[:, i] - embed[:, j]) ** 2))
        for i in range(n_samples)
        for j in range(n_samples)
        if i != j
    ]
    return float(np.mean(div))


def compute_DTI3D_diversity(seq1) -> float:
    seq1 = np.asarray(seq1)
    assert seq1.min() < 0
    length = seq1.shape[2]
    model = fvd_mod.load_model("dt32" if length > 16 else "dt16")
    n_samples = seq1.shape[1]
    embeds = []
    for s in range(n_samples):
        vids = np.transpose(seq1[:, s], (0, 1, 3, 4, 2))
        if length <= 16:
            vids = np.concatenate([vids] * 3, axis=1)[:, :16]
        embeds.append(fvd_mod.get_activations(model, vids, batch_size=20))
    embed = np.stack(embeds, axis=1)
    div = [
        float(np.mean((embed[:, i] - embed[:, j]) ** 2))
        for i in range(n_samples)
        for j in range(n_samples)
        if i != j
    ]
    return float(np.mean(div) * 1000)
