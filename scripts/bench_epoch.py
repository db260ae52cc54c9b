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
    buffer, fresh views per batch). ``meta=(n_windows, T)`` switches to the
    posterior-cache input contract: 1-frame clips + (index, start) ids."""

    def __init__(self, n_batches: int, bs: int, T: int, img: int, seed: int,
                 meta=None):
        self.n_batches = n_batches
        self.meta = meta
        rng = np.random.default_rng(seed)
        # one buffer reused for every batch: epoch cost must not include
        # generating 200 x 50 random clips on the host
        frames = 1 if meta else T
        self.raw = rng.integers(0, 255, (bs, frames, img, img, 3), dtype=np.uint8)
        if meta:
            n_videos, win_t = meta
            self.index = rng.integers(0, n_videos, (n_batches, bs))
            self.start = rng.integers(0, 30 - win_t + 1, (n_batches, bs))

    def __len__(self):
        return self.n_batches

    def epoch_iter(self, epoch: int):
        for i in range(self.n_batches):
            if self.meta:
                yield {"seq_raw": self.raw, "index": self.index[i],
                       "start": self.start[i]}
            else:
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
    ap.add_argument("--cache", action="store_true",
                    help="compare Training.cache_posteriors on vs off at spd=k "
                         "(synthetic clip corpus, aug off)")
    ap.add_argument("--videos", type=int, default=600,
                    help="--cache: synthetic corpus size (videos of 30 frames)")
    ap.add_argument("--preset", default="bair",
                    help="testing.PRESETS architecture ('tiny' for harness smokes)")
    a = ap.parse_args()

    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from image2video_synthesis_using_cinns_tpu import config as cfg
    from image2video_synthesis_using_cinns_tpu.testing import PRESETS, make_model_dir
    import image2video_synthesis_using_cinns_tpu.train.stage2 as s2

    p = PRESETS[a.preset]
    work = tempfile.mkdtemp(prefix="bench_epoch_")
    stage2_dir = make_model_dir(work, preset=a.preset)

    class _FakeDataset:
        """Dataset facade for the posterior-cache build: N synthetic 30-frame
        videos (the Loader itself is monkeypatched, so only the attributes
        window_offsets/window_ids/make_clip_reader touch are needed)."""

        videos = list(range(a.videos))
        num_frames = [30] * a.videos

        def __init__(self, *args, **kw):
            pass

        def video_of(self, idx):
            return idx

    class _FakeFramestore:
        """read_batch source for make_clip_reader: one shared random buffer
        per clip length (corpus generation must not pollute the build time)."""

        index: dict = {}
        _buf = None

        def read_batch(self, vids, starts, length):
            if self._buf is None or self._buf.shape[1] != length:
                rng = np.random.default_rng(1)
                type(self)._buf = rng.integers(
                    0, 255, (1, length, p["img_size"], p["img_size"], 3), np.uint8
                )
            return np.broadcast_to(
                self._buf, (len(vids),) + self._buf.shape[1:]
            )

    def run(spd: int, cached: bool = False) -> float:
        opt = cfg.load(os.path.join(stage2_dir, "config_stage2.yaml"))
        opt.Training["bs"] = a.bs
        opt.Training["bs_eval"] = a.bs
        opt.Training["workers"] = 1
        opt.Training["n_epochs"] = a.epochs
        opt.Training["steps_per_dispatch"] = spd
        opt.Training["cache_posteriors"] = cached
        opt.Training["save_path"] = os.path.join(
            work, f"spd{spd}" + ("_cached" if cached else "")
        )
        opt.Data["framestore"] = "off"
        if a.cache:
            opt.Data["aug"] = False  # cache validity + like-for-like A/B

        loaders = []

        def fake_loader(dataset, bs, **kw):
            # trainer builds train loader first, then eval loader
            n = a.steps if not loaders else 2
            loaders.append(None)
            meta = (a.videos, p["seq_length"]) if kw.get("with_meta") else None
            return SyntheticLoader(
                n, bs, p["seq_length"], p["img_size"], seed=len(loaders),
                meta=meta,
            )

        orig = s2.get_loader, s2.Loader, s2.open_or_build
        s2.get_loader = lambda *args, **kw: _FakeDataset
        s2.Loader = fake_loader
        s2.open_or_build = lambda *args, **kw: _FakeFramestore() if cached else None
        try:
            out = s2.main(opt, eval_fvd=False)
        finally:
            s2.get_loader, s2.Loader, s2.open_or_build = orig

        with open(os.path.join(out["save_path"], "log_per_epoch_train.csv")) as f:
            rows = list(csv.DictReader(f))
        times = [float(r["Time"]) for r in rows]
        tag = f"spd={spd}" + (" cached" if cached else "")
        print(f"{tag}: per-epoch wall-clock {['%.1f' % t for t in times]} s "
              f"({a.steps} steps/epoch)")
        return times[-1]  # steady state (epoch 0 pays compile)

    if a.cache:
        tu = run(a.k, cached=False)
        tc = run(a.k, cached=True)
        print(f"\nPOSTERIOR CACHE ({a.steps} steps, bs={a.bs}, spd={a.k}, "
              f"aug off, {a.videos} synthetic videos): uncached {tu:.1f} "
              f"s/epoch, cached {tc:.1f} s/epoch -> {tu / tc:.2f}x")
        return

    t1 = run(1)
    tk = run(a.k)
    print(f"\nEPOCH-SCALE ({a.steps} steps, bs={a.bs}): "
          f"spd=1 {t1:.1f} s/epoch, spd={a.k} {tk:.1f} s/epoch -> {t1 / tk:.2f}x")


if __name__ == "__main__":
    main()
