"""Persistent XLA compile cache for the user-facing entry points.

The reference pays CUDA-kernel JIT costs once per process and amortises them
over the run; here the first compile of a full sampling or training program
is the expensive step (XLA compiles the whole program — 20 s to minutes for
the big models, more through a remote-compile TPU relay). Every CLI and the
facade therefore enable JAX's persistent compilation cache, so any
invocation after the first starts in seconds.

Respect an existing configuration: tests pin their own cache
(tests/conftest.py) and users may set ``JAX_COMPILATION_CACHE_DIR`` — in
both cases this is a no-op.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's compilation cache at a persistent directory and return it.

    Resolution order: an already-configured ``jax_compilation_cache_dir``
    (kept untouched) → explicit ``path`` argument → ``I2V_JAX_CACHE`` env →
    ``~/.cache/i2v_cinn_jax``. Safe to call multiple times and from multiple
    processes (the cache uses atomic per-entry files).
    """
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    path = (
        path
        or os.environ.get("I2V_JAX_CACHE")
        or os.path.join(os.path.expanduser("~"), ".cache", "i2v_cinn_jax")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimisation — never fail an entry point
        return ""
    return path
