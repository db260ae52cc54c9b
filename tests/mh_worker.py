"""Subprocess worker for the REAL multi-process multi-host test.

Launched by tests/test_distributed.py::test_two_process_run_matches_single
as ``python tests/mh_worker.py <proc_id> <nproc> <port> <cfg> <out>``: each
process brings 4 virtual CPU devices, joins the 2-process JAX distributed
runtime (Gloo collectives across processes — the same code path a TPU pod
uses over DCN), and drives the REAL stage-2 cINN trainer through
``Training.distributed``. The parent compares train trajectories and the
final checkpoint against a single-process 8-device run of the same config.
"""

import json
import os
import sys


def main() -> None:
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    cfg_path, out_dir = sys.argv[4], sys.argv[5]

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
    from image2video_synthesis_using_cinns_tpu.train.stage2 import main as s2_main

    opt = cfg.load(cfg_path)
    # the trainer's maybe_initialize() performs jax.distributed.initialize
    opt.Training["distributed"] = {
        "coordinator_address": f"localhost:{port}",
        "num_processes": nproc,
        "process_id": proc_id,
    }
    opt.Training["save_path"] = out_dir
    out = s2_main(opt, max_steps=int(sys.argv[6]), eval_fvd=False)

    with open(os.path.join(out_dir, f"result_{proc_id}.json"), "w") as f:
        json.dump(
            {
                "train_loss": out["train_loss"],
                "eval_loss": out["eval_loss"],
                "save_path": out["save_path"],
                "process_count": jax.process_count(),
                "local_devices": jax.local_device_count(),
                "global_devices": jax.device_count(),
            },
            f,
        )


if __name__ == "__main__":
    main()
