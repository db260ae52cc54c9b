"""Host-side batch loader: threaded decode + prefetch feeding the device.

Replaces torch ``DataLoader`` workers: a thread pool decodes PNG/JPG frames
into pinned uint8 batches (decode releases the GIL in cv2/PIL), a small
prefetch queue overlaps IO with TPU compute, and the jitted augmentation
(``augment.py``) runs on device. An optional native C++ framestore
(``native/framestore``) packs datasets into a memory-mapped uint8 cache to
skip per-epoch decoding entirely (see ``data/framestore.py``).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _imread_rgb(path: str) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:  # pragma: no cover
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))


class Loader:
    """Iterate dicts: {'seq_raw': uint8 (B,T,H,W,3), 'cond': float32 (B,3)?}.

    ``seed`` drives both shuffling and window sampling so epochs are
    reproducible; pass ``epoch`` to ``__iter__`` to reshuffle per epoch.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        workers: int = 8,
        seed: int = 0,
        prefetch: int = 4,
        framestore=None,
        process_index: int = 0,
        process_count: int = 1,
        tail_multiple: int | None = None,
        frames_per_item: int | None = None,
        with_meta: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.workers = max(1, workers)
        self.seed = seed
        self.prefetch = prefetch
        self.framestore = framestore
        # Multi-host input pipeline (parallel/distributed.py): every process
        # computes the SAME global batch order from the shared seed, then
        # decodes only its contiguous block of each batch. batch_size stays
        # the GLOBAL batch size.
        self.process_index = process_index
        self.process_count = process_count
        # Multi-host runs cannot pad indivisible batches (no per-process
        # shape freedom in make_array_from_process_local_data), so even with
        # a divisible Training.bs the drop_last=False TAIL batch (n % bs
        # rows) would crash batch assembly. ``tail_multiple`` (trainers pass
        # the global device count when Training.distributed is on) drops
        # batches whose global size does not divide it — loudly, once.
        self.tail_multiple = tail_multiple
        self._warned_tail = False
        # Posterior-cache input mode (train/posterior_cache.py): decode only
        # the first ``frames_per_item`` frames of each sampled window (the
        # conditioning frame) — the rest of the clip never leaves the host —
        # and ship the (index, start) window identity with the batch so the
        # trainer can gather the window's cached (mu, logvar) on device.
        self.frames_per_item = frames_per_item
        self.with_meta = with_meta

    def __len__(self) -> int:
        n = len(self.dataset)
        full, rem = n // self.batch_size, n % self.batch_size
        if self.drop_last:
            return full
        if rem and self.tail_multiple is not None and rem % self.tail_multiple:
            if not self._warned_tail:
                import warnings

                warnings.warn(
                    f"multi-host run: dropping the tail batch of {rem} clips "
                    f"(not divisible by the {self.tail_multiple}-device mesh; "
                    "pad rows cannot be assembled per-process — see "
                    "parallel/distributed.py)"
                )
                self._warned_tail = True
            return full  # indivisible tail batch is dropped
        return full + (1 if rem else 0)

    def _load_item(self, idx: int, rng: np.random.Generator):
        item = self.dataset.sample(idx, rng)
        if self.frames_per_item is not None:
            # window identity ('start') is sampled from the FULL window range
            # first, so the truncated decode sees the same per-item RNG stream
            # as a full-window load of the same (seed, epoch, idx)
            item = dict(item, paths=item["paths"][: self.frames_per_item])
        if self.framestore is not None:
            frames = self.framestore.read_window(item)
        else:
            frames = np.stack([_imread_rgb(p) for p in item["paths"]], axis=0)
        return frames, item.get("cond"), item["index"], item["start"]

    def __iter__(self):
        return self.epoch_iter(0)

    def epoch_iter(self, epoch: int):
        rng = np.random.default_rng((self.seed, epoch))
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(order)

        n_batches = len(self)
        batches_idx = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        if self.process_count > 1:
            from ..parallel.distributed import host_batch_slice

            batches_idx = [
                idxs[host_batch_slice(len(idxs), self.process_index, self.process_count)]
                for idxs in batches_idx
            ]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.workers) as pool:
                for bi, idxs in enumerate(batches_idx):
                    if stop.is_set():
                        return
                    item_rngs = [
                        np.random.default_rng((self.seed, epoch, int(i))) for i in idxs
                    ]
                    results = list(pool.map(self._load_item, idxs, item_rngs))
                    seq = np.stack([r[0] for r in results], axis=0)
                    batch = {"seq_raw": seq}
                    if results[0][1] is not None:
                        batch["cond"] = np.stack([r[1] for r in results], axis=0)
                    if self.with_meta:
                        batch["index"] = np.asarray([r[2] for r in results], np.int64)
                        batch["start"] = np.asarray([r[3] for r in results], np.int64)
                    q.put(batch)
            q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
