"""Subprocess worker for the REAL multi-process multi-host tests.

Launched by tests/test_distributed.py as
``python tests/mh_worker.py <proc_id> <nproc> <port> <cfg> <out> <max_steps>
[trainer]``: each process brings 4 virtual CPU devices, joins the 2-process
JAX distributed runtime (Gloo collectives across processes — the same code
path a TPU pod uses over DCN), and drives REAL trainers through
``Training.distributed``. The parent compares train trajectories and the
final checkpoints against single-process 8-device runs of the same configs.

Trainer modes:
  * ``stage2`` (default): the stage-2 cINN trainer; ``<cfg>`` is its YAML.
  * ``s1ae``: stage-1 THEN its conditioning AE, back-to-back in ONE process
    (the reference's sequential workflow) — exercises ``maybe_initialize``
    idempotency plus the batch-sharded fetch paths (epoch-GIF tensors,
    recon grids, the AE's scanned-chunk deferred payload). ``<cfg>`` is a
    directory holding ``config_stage1.yaml`` + ``config_stage2_AE.yaml``.
"""

import json
import os
import sys


def main() -> None:
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    cfg_path, out_dir, max_steps = sys.argv[4], sys.argv[5], int(sys.argv[6])
    trainer = sys.argv[7] if len(sys.argv) > 7 else "stage2"

    import jax

    # CPU with 4 local devices per process → 8 global. Must run before the
    # backend client is created (CLAUDE.md: env JAX_PLATFORMS is a no-op
    # here because a sitecustomize pre-imports jax).
    jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("I2V_MH_JAX_CACHE")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from image2video_synthesis_using_cinns_tpu import config as cfg

    # the trainers' maybe_initialize() performs jax.distributed.initialize
    dist = {
        "coordinator_address": f"localhost:{port}",
        "num_processes": nproc,
        "process_id": proc_id,
    }
    result = {}

    if trainer == "stage2":
        from image2video_synthesis_using_cinns_tpu.train.stage2 import main as s2_main

        opt = cfg.load(cfg_path)
        opt.Training["distributed"] = dist
        opt.Training["save_path"] = out_dir
        out = s2_main(opt, max_steps=max_steps, eval_fvd=False)
        result = {
            "train_loss": out["train_loss"],
            "eval_loss": out["eval_loss"],
            "save_path": out["save_path"],
        }
    elif trainer == "s1ae":
        from image2video_synthesis_using_cinns_tpu.train.stage1 import main as s1_main
        from image2video_synthesis_using_cinns_tpu.train.stage2_ae import (
            main as ae_main,
        )

        opt1 = cfg.load(os.path.join(cfg_path, "config_stage1.yaml"))
        opt1.Training["distributed"] = dist
        opt1.Training["save_path"] = os.path.join(out_dir, "s1")
        out1 = s1_main(opt1, max_steps=max_steps, eval_fvd=False)

        # second trainer in the same process: maybe_initialize must reuse
        # the live jax.distributed runtime instead of crashing
        opt2 = cfg.load(os.path.join(cfg_path, "config_stage2_AE.yaml"))
        opt2.Training["distributed"] = dist
        opt2.Training["save_path"] = os.path.join(out_dir, "ae")
        out2 = ae_main(opt2, max_steps=max_steps * 2)
        result = {
            "s1_save_path": out1["save_path"],
            "s1_best": out1["best_metric"],
            "ae_save_path": out2["save_path"],
            "ae_train_loss": out2["train_loss"],
        }
    else:  # pragma: no cover
        raise SystemExit(f"unknown trainer mode {trainer!r}")

    result.update(
        process_count=jax.process_count(),
        local_devices=jax.local_device_count(),
        global_devices=jax.device_count(),
    )
    with open(os.path.join(out_dir, f"result_{proc_id}.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
