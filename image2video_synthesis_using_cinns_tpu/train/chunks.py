"""Shared chunk-pipeline machinery for the three trainers.

``Training.steps_per_dispatch: K`` fuses K optimisation steps into one
``lax.scan`` dispatch (see ``stage2.make_scan_step`` for the rationale). The
host-side machinery around that — accumulating K full batches into a chunk,
padding the batch axis to the mesh multiple, deriving per-step RNG keys, the
deferred-fetch queue that overlaps a chunk's host→device transfer with the
previous chunk's compute, and the single-step fallback for tail/partial
batches — was triplicated across the trainers in round 2 (flagged by the
round-2 verdict); this module is the single implementation.

Semantics (unchanged from the in-trainer versions, pinned by the
scan-vs-single parity tests in tests/test_train.py and tests/test_stage2_ae.py):

* a chunk is dispatched only when K FULL batches are available, every prior
  single-step prerequisite is done (ActNorm init), and ``max_steps`` leaves
  at least K steps of headroom — a full chunk consumes K steps INCLUDING the
  ones already accumulated (the global step has not advanced for them yet),
  so the headroom check must not subtract the accumulated count;
* otherwise accumulated batches are flushed through the single-step path in
  order, preserving the exact per-step key sequence;
* a dispatched chunk's results stay on device until the NEXT chunk is
  dispatched (one pending entry), so the next chunk's (async) uint8
  host→device transfer and the current chunk's compute overlap — values and
  logging order are unchanged, only the fetch is late;
* the epoch tail shorter than one chunk runs through the single-step path,
  unless the epoch was cut short by ``max_steps`` or an interruption.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.distributed import put_global


class DeferredFetch:
    """Deferred-fetch queue: results of dispatched chunks stay on device
    until the next chunk is dispatched (or the epoch ends), then are fetched
    and handed to ``on_payload`` in dispatch order.

    ``fetch`` defaults to ``jax.device_get``; trainers whose payloads carry
    batch-sharded arrays (the stage-1 GIF tensors, the AE recon grids) pass
    ``parallel.distributed.fetch_local_rows_tree`` instead — plain
    ``device_get`` raises on arrays spanning non-addressable devices in
    multi-process runs."""

    def __init__(
        self,
        on_payload: Callable[[Any], None],
        fetch: Callable[[Any], Any] = jax.device_get,
    ):
        self._on_payload = on_payload
        self._fetch = fetch
        self._pending: list = []

    def push(self, payload: Any) -> None:
        self._pending.append(payload)
        self.drain()  # fetch the PREVIOUS chunk while this one executes

    def drain(self, all_pending: bool = False) -> None:
        while self._pending and (all_pending or len(self._pending) > 1):
            payload = self._pending.pop(0)
            self._on_payload(self._fetch(payload))


def iter_step_metrics(stacked: dict, n: int) -> Iterator[dict]:
    """Unstack a fetched {name: (K, ...)} metric dict into K per-step
    {name: float} dicts, in step order."""
    for j in range(n):
        yield {k: float(v[j]) for k, v in stacked.items()}


def pad_chunk_axis(arr: np.ndarray, n_dev: int) -> np.ndarray:
    """Pad axis 1 (the batch axis of a stacked (K, B, ...) chunk) to the mesh
    multiple by repeating the last row (the scan steps are built with the
    static true batch size and ignore the pad rows)."""
    rem = (-arr.shape[1]) % n_dev
    if rem:
        arr = np.concatenate([arr, np.repeat(arr[:, -1:], rem, axis=1)], 1)
    return arr


def pad_batch_rows(arr: np.ndarray, n_dev: int) -> np.ndarray:
    """Per-batch variant of :func:`pad_chunk_axis`: pad axis 0 (B) of one
    (B, ...) batch to the mesh multiple by repeating the last row."""
    rem = (-arr.shape[0]) % n_dev
    if rem:
        arr = np.concatenate([arr, np.repeat(arr[-1:], rem, axis=0)], 0)
    return arr


def make_chunk_stager(mesh: Mesh, n_dev_local: int, axis_name: str = "data"):
    """Eager per-batch H2D staging for the chunk path.

    Round 2 shipped each chunk's uint8 clips as ONE stacked (K, B, T, H, W, 3)
    ``device_put`` issued right before the scan dispatch. At full stage-2 size
    (bs=50, K=8) that is an ~83 MB transfer serialized against the dispatch —
    and on a host link that streams tens of MB/s (this rig's relay; measured
    in BASELINE.md "Epoch-scale" round 3) the input stream, not compute,
    bounds the epoch, making spd=8 *slower* than spd=1.

    This stager instead issues one small async ``device_put`` per batch AS IT
    ARRIVES from the loader — the transfer overlaps the previous chunk's
    compute and the loader's own decode — and assembles the (K, B, ...) chunk
    ON DEVICE with a tiny jitted stack (HBM-bandwidth copy + one dispatch).
    Values are bit-identical to the host-stacked path: same uint8 bytes, same
    pad rows, same key schedule.

    Returns ``(stage, stack_staged)``: ``stage(batch) -> batch'`` adds the
    staged device array under ``"_dev_seq"`` (pass as ``drive_epoch``'s
    ``stage`` hook; the original host fields stay, so a tail flush through
    the single-step path still works), and ``stack_staged(chunk)`` returns
    the (K, B_padded, ...) device array for the scan step.
    """
    row_sharding = NamedSharding(mesh, P(axis_name))
    stacked_sharding = NamedSharding(mesh, P(None, axis_name))
    stack = jax.jit(lambda *xs: jnp.stack(xs), out_shardings=stacked_sharding)

    def stage(batch: dict) -> dict:
        staged = dict(batch)
        staged["_dev_seq"] = put_global(
            row_sharding,
            pad_batch_rows(np.asarray(batch["seq_raw"]), n_dev_local),
            batch_axis=0,
        )
        return staged

    def stack_staged(chunk: list) -> jax.Array:
        return stack(*[b["_dev_seq"] for b in chunk])

    return stage, stack_staged


@partial(jax.jit, static_argnames="k")
def _chunk_keys(root_key: jax.Array, start, k: int) -> jax.Array:
    return jax.vmap(lambda j: jax.random.fold_in(root_key, j))(
        start + jnp.arange(k)
    )


def chunk_keys(root_key: jax.Array, global_step: int, k: int) -> jax.Array:
    """Per-step keys for a K-step chunk: step j consumes
    ``fold_in(root_key, global_step + j)`` exactly as the single-step path
    does, so a scanned chunk reproduces K sequential single dispatches.

    One jitted program (fold_in is value-identical under vmap/trace) — the
    eager version issued K fold_in dispatches plus a stack per chunk, which
    on a 30-90 ms/dispatch relay link cost more than the fused scan saved."""
    return _chunk_keys(root_key, global_step, k)


def drive_epoch(
    batches: Iterable[dict],
    *,
    full_bs: int,
    spd: int,
    chunk_ready: Callable[[], bool],
    run_single: Callable[[dict], None],
    run_chunk: Callable[[list], None],
    steps_done: Callable[[], int],
    max_steps: int | None = None,
    interrupted: Callable[[], bool] | None = None,
    stage: Callable[[dict], dict] | None = None,
) -> bool:
    """Drive one training epoch, chunking full batches when possible.

    ``chunk_ready()`` gates the chunked path (scan step built AND one-time
    prerequisites like ActNorm init done). ``steps_done()`` reports the
    global step count, polled after every dispatch. ``interrupted()`` is the
    preemption poll (polled once per source batch, after the max_steps
    check, matching the round-2 in-trainer ordering). ``stage`` (optional)
    is applied to each batch as it is accumulated into a chunk — the
    :func:`make_chunk_stager` hook that starts the batch's async H2D
    transfer immediately so it overlaps the previous chunk's compute.
    Returns True when the epoch was cut short (max_steps reached or
    interrupted) — in that case the accumulated tail is NOT flushed,
    matching the prior behaviour.
    """
    chunk: list = []
    stopped = False
    for batch in batches:
        full = batch["seq_raw"].shape[0] == full_bs
        steps_left = (max_steps - steps_done()) if max_steps else spd
        if spd > 1 and chunk_ready() and full and steps_left >= spd:
            chunk.append(stage(batch) if stage is not None else batch)
            if len(chunk) == spd:
                run_chunk(chunk)
                chunk = []
        else:
            for b in chunk:
                run_single(b)
            chunk = []
            run_single(batch)
        if max_steps and steps_done() >= max_steps:
            stopped = True
            break
        if interrupted is not None and interrupted():
            stopped = True
            break
    if not stopped:
        for b in chunk:  # epoch tail shorter than one chunk
            run_single(b)
    return stopped
