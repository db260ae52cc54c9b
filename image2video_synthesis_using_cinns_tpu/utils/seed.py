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


def require_partitionable_threefry() -> None:
    """Fail loudly if ``jax_threefry_partitionable`` is off.

    The scanned multi-step trainers (``steps_per_dispatch > 1``) augment the
    mesh-PADDED batch and rely on per-element random bits being prefix-stable
    across batch sizes (``jax.random.split(key, B_pad)[:b] ==
    jax.random.split(key, b)``) to reproduce the single-step trajectory
    exactly. That holds only under the partitionable threefry lowering
    (default-on in this JAX, but user-overridable via env/config); with it
    disabled the scanned and single-step trajectories would silently diverge.
    """
    if not jax.config.jax_threefry_partitionable:
        raise RuntimeError(
            "steps_per_dispatch > 1 requires jax_threefry_partitionable=True "
            "(the scanned chunk's documented 'identical trajectory' guarantee "
            "relies on prefix-stable jax.random.split across batch sizes); "
            "re-enable it or set Training.steps_per_dispatch: 1."
        )
