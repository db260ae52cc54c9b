"""Checkpoint I/O.

Same checkpoint *contract* as the reference (``utils/auxiliaries.py:8-12``):
per-model dicts ``{'epoch', 'state_dict', 'optim_state_dict',
'scheduler_state_dict'}`` written next to a re-serialised config — downstream
stages discover architecture from the saved config and weights from these
files. Storage is flax msgpack (``.msgpack``); ``load`` transparently falls
back to converting a torch ``.pth`` with the same stem via
``utils/convert.py`` so reference checkpoints remain usable.

Writes are atomic (tmp + rename) so a preempted TPU job never leaves a torn
checkpoint — the preemption-safe half of crash-resume (reference keeps only
"latest" files for this purpose, ``stage1_VAE/main.py:224-228``).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Any

import flax.serialization
import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def save(path: str, payload: dict) -> None:
    payload = dict(payload)
    # to_state_dict turns optax/NamedTuple states into plain dicts msgpack
    # can carry; restore_into() rebuilds the typed structure from a target.
    state = flax.serialization.to_state_dict(_to_numpy(payload))
    data = flax.serialization.msgpack_serialize(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


# ---- async writer ---------------------------------------------------------
# Serialize+write runs at disk speed (~20 MB/s here): a full stage-2 payload
# costs 20-40 s per file, which dominated the epoch wall-clock when written
# inline (BASELINE.md "Epoch-scale validation"). One daemon thread drains a
# bounded FIFO queue, so epoch N+1's compute overlaps epoch N's writes while
# preserving write order (and tmp+rename atomicity) per path. Payloads must
# be host trees the caller no longer mutates — the trainers pass freshly
# device_get'ed state. The queue bound (~one epoch of stage-1 saves) gives
# backpressure instead of unbounded host-memory growth when disk is slower
# than the epoch loop.
_write_q: queue.Queue | None = None
_write_errs: list = []


def _writer_loop() -> None:
    while True:
        item = _write_q.get()
        try:
            if item is not None:
                save(*item)
        except Exception as e:
            # surfaced by the NEXT save_async (fail fast, while device state
            # is still alive) or by wait()
            _write_errs.append(e)
        finally:
            _write_q.task_done()


def _raise_pending() -> None:
    if _write_errs:
        errs, first = list(_write_errs), _write_errs[0]
        _write_errs.clear()
        if len(errs) > 1:
            raise RuntimeError(
                f"{len(errs)} checkpoint writes failed; first: {errs[0]!r}"
            ) from first
        raise first


def save_async(path: str, payload: dict) -> None:
    """Queue an atomic checkpoint write on the background writer thread.

    Raises any error from PREVIOUS queued writes immediately (a persistent
    disk failure must not silently discard every later checkpoint). Call
    :func:`wait` before reading the file or exiting the trainer."""
    global _write_q
    _raise_pending()
    if _write_q is None:
        _write_q = queue.Queue(maxsize=8)
        threading.Thread(target=_writer_loop, daemon=True).start()
    _write_q.put((path, payload))  # blocks (backpressure) when 8 writes deep


def wait() -> None:
    """Block until all queued checkpoint writes hit disk; re-raise writer
    errors (all drained, first one raised)."""
    if _write_q is not None:
        _write_q.join()
    _raise_pending()


def restore_into(target: Any, state_dict: Any) -> Any:
    """Rebuild a typed pytree (e.g. an optax state) from a loaded plain-dict
    checkpoint payload."""
    return flax.serialization.from_state_dict(target, state_dict)


def load(path: str) -> dict:
    if not os.path.exists(path) and path.endswith(".msgpack"):
        torch_path = path[: -len(".msgpack")] + ".pth"
        if os.path.exists(torch_path):
            from .convert import load_torch_checkpoint

            return load_torch_checkpoint(torch_path)
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def get_save_dict(variables: Any, opt_state: Any, epoch: int, extra: dict | None = None) -> dict:
    dic = {
        "epoch": epoch + 1,
        "state_dict": _to_numpy(variables),
        "optim_state_dict": _to_numpy(opt_state),
    }
    if extra:
        dic.update(_to_numpy(extra))
    return dic


def find(path_no_ext: str) -> str | None:
    """Return the existing checkpoint path for a stem, trying native then torch."""
    for suffix in (".msgpack", ".pth", ".pth.tar"):
        p = path_no_ext + suffix
        if os.path.exists(p):
            return p
    return None
