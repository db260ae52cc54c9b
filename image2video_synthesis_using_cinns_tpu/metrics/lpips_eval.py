"""Offline LPIPS evaluation (protocol parity with the pip ``lpips`` usage in
reference ``eval_synthesis_quality.py:80-92``: VGG flavour, batches of 10,
mean per batch then mean over batches)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbones.lpips import LPIPS
from ..utils import checkpoint as ckpt_io


def load_lpips(weights_root: str = "models"):
    module = LPIPS()
    variables = None
    path = ckpt_io.find(os.path.join(weights_root, "lpips", "vgg_lpips"))
    if path is not None:
        payload = ckpt_io.load(path)
        variables = payload.get("state_dict", payload)
    if variables is None:
        variables = jax.jit(module.init)(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
        )
    return module, variables


def compute_lpips(pd_imgs, gt_imgs, batch_size: int = 10) -> float:
    """Torch-layout frames (N, C, H, W) in [-1, 1]."""
    module, variables = load_lpips()
    run = jax.jit(lambda v, a, b: module.apply(v, a, b))
    pd = np.transpose(np.asarray(pd_imgs), (0, 2, 3, 1))
    gt = np.transpose(np.asarray(gt_imgs), (0, 2, 3, 1))
    n_batches = pd.shape[0] // batch_size
    total = 0.0
    for i in range(n_batches):
        sl = slice(i * batch_size, (i + 1) * batch_size)
        total += float(jnp.mean(run(variables, jnp.asarray(pd[sl]), jnp.asarray(gt[sl]))))
    return total / max(n_batches, 1)
