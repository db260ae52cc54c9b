"""Benchmark: frames/sec/chip for 16-frame 64x64 BAIR stochastic sampling.

Mirrors the reference flagship path (``generate_samples.py`` with the default
bs=6): per batch, draw ν ~ N(0, I), run the 20-block flow inverse under the
ResNet-50 start-frame embedding, decode to a 16-frame 64x64 video. The model
is the full-size BAIR architecture (random weights — throughput is
architecture-bound, not weight-bound).

Measurement notes:
  * all timings force a host value fetch — on this rig ``block_until_ready``
    acks before remote execution completes, so fetching a scalar reduction is
    the only reliable barrier;
  * throughput fuses ``N_ROUNDS`` sampling rounds into ONE jitted scan
    (fresh ν per round) so per-dispatch RPC overhead is amortised like a
    production serving loop;
  * the headline number runs the decoder in bfloat16 (the TPU-native serving
    dtype; fp32 is reported alongside). The flow inverse stays fp32 — it is
    <1% of the FLOPs and exactness preserves invertibility.

Prints ONE JSON line:
  {"metric": "frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": R, "extra": {...}}

``vs_baseline`` divides by a recorded V100 PyTorch estimate for the same path
(BASELINE.md: the reference publishes no numbers). The SPADE decoder costs
~370 GFLOP per 16-frame video (dominated by the two highest-resolution
GeneratorBlocks); a V100 at a generous 35% MFU on these 3D convs sustains
~5.5 TFLOP/s → ~14.9 videos/s → ~238 frames/s at bs=6.
"""

from __future__ import annotations

import json
import time

BS = 6
N_ROUNDS = 16  # sampling rounds fused into one dispatch
N_REPEATS = 3
SEQ_FRAMES = 16

V100_REFERENCE_FRAMES_PER_SEC = 238.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    sample_step, (flow_vars, dec_vars, x0, residual) = entry()

    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, x0.shape, minval=-1.0, maxval=1.0)

    def make_many(dtype):
        @jax.jit
        def sample_many(flow_vars, dec_vars, x0, key):
            def body(carry, k):
                nu = jax.random.normal(k, (x0.shape[0], residual.shape[1]))
                if dtype == jnp.bfloat16:
                    out = _sample_bf16(flow_vars, dec_vars, x0, nu)
                else:
                    out = sample_step(flow_vars, dec_vars, x0, nu)
                # consume each video into a scalar so no round is dead code
                return carry + jnp.mean(out.astype(jnp.float32)), None

            keys = jax.random.split(key, N_ROUNDS)
            acc, _ = jax.lax.scan(body, jnp.zeros(()), keys)
            return acc

        return sample_many

    def _sample_bf16(flow_vars, dec_vars, x0, nu):
        # flow inverse in fp32 (exactness), decoder in bf16 (MXU-native)
        zlat = _flow_reverse(flow_vars, x0, nu)
        dec_bf16 = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            dec_vars,
        )
        out = _decoder.apply(
            dec_bf16, x0.astype(jnp.bfloat16), zlat.astype(jnp.bfloat16)
        )
        return out

    # rebuild the module handles entry() used so bf16 path shares them
    from image2video_synthesis_using_cinns_tpu.models.stage1.decoder import Generator
    from image2video_synthesis_using_cinns_tpu.models.stage2.inn import (
        SupervisedTransformer,
    )
    from image2video_synthesis_using_cinns_tpu.testing import (
        PRESETS, stage1_config, stage2_ae_config, stage2_config,
    )

    p = PRESETS["bair"]
    s1 = stage1_config(p)
    _decoder = Generator.from_config(s1.Decoder)
    _flow = SupervisedTransformer.from_configs(
        stage2_config(p, "/tmp/s1", "/tmp/ae"), s1.Decoder, stage2_ae_config(p).AE
    )

    def _flow_reverse(flow_vars, x0, nu):
        z = _flow.apply(flow_vars, nu, [x0], reverse=True)
        return z.reshape(x0.shape[0], -1)

    def timed_fps(dtype):
        fn = make_many(dtype)
        float(fn(flow_vars, dec_vars, x0, key))  # compile + run once
        best = float("inf")
        for i in range(N_REPEATS):
            t0 = time.perf_counter()
            float(fn(flow_vars, dec_vars, x0, jax.random.fold_in(key, i)))
            best = min(best, time.perf_counter() - t0)
        return N_ROUNDS * BS * SEQ_FRAMES / best

    fps_bf16 = timed_fps(jnp.bfloat16)
    fps_fp32 = timed_fps(jnp.float32)

    # single-dispatch latency (value-fetched)
    one = jax.jit(
        lambda fv, dv, x0, nu: jnp.mean(sample_step(fv, dv, x0, nu))
    )
    float(one(flow_vars, dec_vars, x0, residual))
    lat = []
    for i in range(10):
        nu = jax.random.normal(jax.random.fold_in(key, 100 + i), residual.shape)
        t0 = time.perf_counter()
        float(one(flow_vars, dec_vars, x0, nu))
        lat.append((time.perf_counter() - t0) * 1000.0)
    lat.sort()
    p50 = lat[len(lat) // 2]

    result = {
        "metric": "frames_per_sec_per_chip",
        "value": round(fps_bf16, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps_bf16 / V100_REFERENCE_FRAMES_PER_SEC, 3),
        "extra": {
            "batch_size": BS,
            "rounds_per_dispatch": N_ROUNDS,
            "fps_fp32": round(fps_fp32, 2),
            "video_latency_ms_p50_fp32": round(p50, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
