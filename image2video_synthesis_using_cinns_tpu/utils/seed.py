"""Determinism helpers.

The reference seeds python/numpy/torch globally (``utils/auxiliaries.py:57-63``).
JAX has no global RNG; determinism comes from explicit key threading, so
``set_seed`` seeds the host-side RNGs (used by data shuffling / numpy) and
returns a root ``jax.random.PRNGKey`` from which all device randomness is
derived. Per-device streams are obtained with ``fold_in`` (replacing torch's
implicit per-GPU CUDA RNG).
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def step_rngs(root: jax.Array, step: int, names: tuple[str, ...]):
    """Derive a dict of named per-step rngs from the root key."""
    key = jax.random.fold_in(root, step)
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))
