"""Epoch-scale steps_per_dispatch validation (round-2 verdict, Next #8).

The per-step 2.8x stage-2 claim in BASELINE.md was measured on toy 8-step
epochs, where fixed per-epoch costs dominate. This script drives a synthetic
~200-step epoch through the REAL stage-2 cINN trainer (``train/stage2.main``
— the full epoch path: dispatch granularity, deferred fetches, CSV/wandb
logging, async checkpointing, eval pass) at the full BAIR sizes (bs=50,
17x64x64 clips), with ``steps_per_dispatch`` 1 vs K, and reports steady-state
epoch wall-clock from the trainer's own CSV.

The input pipeline is a synthetic in-memory loader (pre-generated random
uint8 clips): decode cost is excluded by design — the native framestore makes
real decode near-free (BASELINE.md input-pipeline table) — so the measured
delta isolates the epoch path itself.

Run on the TPU (serially — one chip behind the relay):
    python scripts/bench_epoch.py --steps 200 --k 8
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class SyntheticLoader:
    """Loader-API-compatible in-memory batch source (one shared uint8 clip
    buffer, fresh views per batch)."""

    def __init__(self, n_batches: int, bs: int, T: int, img: int, seed: int):
        self.n_batches = n_batches
        rng = np.random.default_rng(seed)
        # one buffer reused for every batch: epoch cost must not include
        # generating 200 x 50 random clips on the host
        self.raw = rng.integers(0, 255, (bs, T, img, img, 3), dtype=np.uint8)

    def __len__(self):
        return self.n_batches

    def epoch_iter(self, epoch: int):
        for _ in range(self.n_batches):
            yield {"seq_raw": self.raw}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200, help="train steps per epoch")
    ap.add_argument("--k", type=int, default=8, help="steps_per_dispatch to compare vs 1")
    ap.add_argument("--bs", type=int, default=50)
    ap.add_argument("--epochs", type=int, default=2,
                    help="epoch 0 pays compile; the LAST epoch is reported")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the host CPU (smoke-testing the harness)")
    a = ap.parse_args()

    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from image2video_synthesis_using_cinns_tpu import config as cfg
    from image2video_synthesis_using_cinns_tpu.testing import PRESETS, make_model_dir
    import image2video_synthesis_using_cinns_tpu.train.stage2 as s2

    p = PRESETS["bair"]
    work = tempfile.mkdtemp(prefix="bench_epoch_")
    stage2_dir = make_model_dir(work, preset="bair")

    class _FakeDataset:
        def __init__(self, *args, **kw):
            pass

    def run(spd: int) -> float:
        opt = cfg.load(os.path.join(stage2_dir, "config_stage2.yaml"))
        opt.Training["bs"] = a.bs
        opt.Training["bs_eval"] = a.bs
        opt.Training["workers"] = 1
        opt.Training["n_epochs"] = a.epochs
        opt.Training["steps_per_dispatch"] = spd
        opt.Training["save_path"] = os.path.join(work, f"spd{spd}")
        opt.Data["framestore"] = "off"

        loaders = []

        def fake_loader(dataset, bs, **kw):
            # trainer builds train loader first, then eval loader
            n = a.steps if not loaders else 2
            loaders.append(None)
            return SyntheticLoader(n, bs, p["seq_length"], p["img_size"], seed=len(loaders))

        orig_get_loader, orig_loader = s2.get_loader, s2.Loader
        s2.get_loader = lambda *args, **kw: _FakeDataset
        s2.Loader = fake_loader
        try:
            out = s2.main(opt, eval_fvd=False)
        finally:
            s2.get_loader, s2.Loader = orig_get_loader, orig_loader

        with open(os.path.join(out["save_path"], "log_per_epoch_train.csv")) as f:
            rows = list(csv.DictReader(f))
        times = [float(r["Time"]) for r in rows]
        print(f"spd={spd}: per-epoch wall-clock {['%.1f' % t for t in times]} s "
              f"({a.steps} steps/epoch)")
        return times[-1]  # steady state (epoch 0 pays compile)

    t1 = run(1)
    tk = run(a.k)
    print(f"\nEPOCH-SCALE ({a.steps} steps, bs={a.bs}): "
          f"spd=1 {t1:.1f} s/epoch, spd={a.k} {tk:.1f} s/epoch -> {t1 / tk:.2f}x")


if __name__ == "__main__":
    main()
