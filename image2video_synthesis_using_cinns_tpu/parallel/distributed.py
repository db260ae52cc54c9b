"""Opt-in multi-host (multi-process) execution — SURVEY §5.8.

The reference is strictly single-GPU (SURVEY §2.8); single-host multi-chip
data parallelism is this framework's default (``parallel/mesh.py``). This
module adds the multi-PROCESS layer on top: ``jax.distributed.initialize()``,
per-host input pipelines (each process decodes only its contiguous slice of
every global batch), and global-batch assembly with
``jax.make_array_from_process_local_data`` so ``jit`` sees one global array
sharded over all hosts' devices (collectives ride ICI within a host and DCN
across hosts — the standard JAX multi-host recipe).

Opt-in via ``Training.distributed``:

.. code-block:: yaml

    Training:
      distributed: true                      # TPU pod: auto-detect from env
      # or explicit (GPU/CPU clusters):
      distributed:
        coordinator_address: "10.0.0.1:1234"
        num_processes: 4
        process_id: 0

Semantics and constraints (enforced loudly, not silently):

* the GLOBAL batch size must divide the total device count in multi-host
  runs. The single-host padding + static-``true_b``-slice path cannot be
  expressed here: pad rows would have to live on the last host only, which
  ``make_array_from_process_local_data`` has no per-process shape for. Use a
  divisible ``Training.bs`` (assert in :func:`host_batch_slice`); the
  loaders additionally DROP (loudly) an indivisible drop_last=False tail
  batch (``Loader(tail_multiple=...)``) — it cannot be padded per-process
  either.
* every process must run the same trainer with the same config/seed: batch
  ORDER is identical across hosts (the loader shuffles from the shared
  seed), and each host takes rows ``[p·B/P, (p+1)·B/P)`` of each batch —
  matching the row-major device order of a ``P('data')`` sharding.
* the trainers assemble the RAW uint8 batch into the global array first and
  run the jitted augmentation on the global sharded rows, so per-clip
  augmentation subkeys are indexed by GLOBAL row: a multi-host trajectory is
  bit-identical to the single-host run of the same config (for the
  mesh-divisible batches multi-host requires) and to the scanned
  ``steps_per_dispatch`` chunk path. Training-time FVD pools the per-host
  activation slices with ``process_allgather`` so every process scores the
  full eval set and best-checkpoint selection agrees across hosts.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize(dist_cfg) -> tuple[int, int]:
    """Initialize multi-process JAX when configured.

    ``dist_cfg`` is the ``Training.distributed`` config value: falsy → no-op
    (single-process), ``True`` → ``jax.distributed.initialize()`` with full
    auto-detection (TPU pods), a mapping → passed through as kwargs
    (``coordinator_address``, ``num_processes``, ``process_id``, ...).

    Returns ``(process_index, process_count)`` either way, so trainers can
    thread them into their loaders unconditionally.

    Idempotent: running two trainers back-to-back in one process (stage-1
    then its AE, the reference's sequential workflow) calls this twice; the
    second call reuses the live runtime instead of crashing.
    """
    if dist_cfg:
        from jax._src import distributed as _jdist

        # already initialised (second trainer in this process): reuse the
        # live runtime — a second initialize() raises, with a message that
        # depends on whether the XLA backend has run compute since
        if _jdist.global_state.client is None:
            kwargs = dict(dist_cfg) if isinstance(dist_cfg, dict) else {}
            jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def barrier(name: str, timeout_s: float = 1800.0) -> None:
    """Synchronise all processes via the coordination service. No-op
    single-process.

    Why trainers need this: the CPU Gloo collective rendezvous has a hard
    ~30 s key-exchange timeout (``GetKeyValue() timed out``). The trainers'
    build phase (model inits, loader/framestore construction, jit warm-up)
    runs with NO cross-process communication, and on contended hosts (or
    with asymmetric compile-cache hits) processes can skew past 30 s — the
    fast process then reaches the FIRST collective (the ``replicate`` of
    the train state) and dies in Gloo context initialisation while the slow
    one is still compiling. One barrier after the build phase, with a
    generous coordination-service timeout, makes every process enter the
    collective phase together. (TPU pods have the same pattern with a
    larger default timeout; this is standard multi-host hygiene.)"""
    if jax.process_count() == 1:
        return
    from jax._src import distributed as _jdist

    client = _jdist.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def require_mesh_divisible(n_devices: int, **batch_sizes: int) -> None:
    """Multi-host setup guard: every named batch size must divide the global
    mesh. Called by the trainers once at startup when ``process_count > 1``.

    Two failure modes make a loud early error mandatory here: (a) the
    single-host pad + static-``true_b``-slice path cannot be expressed across
    processes (``make_array_from_process_local_data`` has no per-process
    shape freedom), and (b) the chunk stager pads rows PER PROCESS
    (``train/chunks.py::make_chunk_stager``) — with an indivisible global
    batch those pads would interleave mid-global-batch while the scanned
    step's ``true_b`` slice assumes tail padding, silently training on pad
    rows and dropping real ones."""
    bad = {k: v for k, v in batch_sizes.items() if int(v) % n_devices}
    if bad:
        raise ValueError(
            f"multi-host runs need mesh-divisible batch sizes: {bad} do not "
            f"divide the {n_devices}-device mesh — choose divisible "
            "Training batch sizes (see parallel/distributed.py)"
        )


def fetch_local_rows(x):
    """``device_get`` that is safe for batch-sharded global arrays in
    multi-process runs: returns THIS process's contiguous rows (its
    :func:`host_batch_slice` block, assembled from the addressable shards).

    Fetching a ``jax.Array`` that spans non-addressable devices raises in
    JAX, so trainers must not ``np.asarray`` batch-sharded step outputs
    (e.g. the epoch-GIF video tensors) directly. Fully-replicated arrays
    (losses/metrics) and non-``jax.Array`` leaves pass through whole.
    Assumes the sharded axis is axis 0 (every batch sharding here is
    ``P('data', ...)``); asserts that assumption instead of mis-assembling.
    """
    if not isinstance(x, jax.Array):
        return x
    if x.is_fully_replicated:
        return np.asarray(x)
    by_start: dict[int, np.ndarray] = {}
    for s in x.addressable_shards:
        assert all(
            sl.start in (None, 0) for sl in s.index[1:]
        ), f"fetch_local_rows expects axis-0 batch sharding, got {s.index}"
        start = s.index[0].start or 0
        if start not in by_start:  # dedupe replicas over other mesh axes
            by_start[start] = np.asarray(s.data)
    return np.concatenate([by_start[k] for k in sorted(by_start)], axis=0)


def fetch_local_rows_tree(tree: Any) -> Any:
    """Tree-mapped :func:`fetch_local_rows`; the multi-host-safe drop-in for
    ``jax.device_get`` on deferred-fetch payloads (``train/chunks.py``)."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    return jax.tree.map(fetch_local_rows, tree)


def host_batch_slice(
    global_bs: int, process_index: int | None = None, process_count: int | None = None
) -> slice:
    """The contiguous block of each global batch this process loads.

    Block ``p`` is rows ``[p·B/P, (p+1)·B/P)`` — exactly the rows whose
    ``P('data')`` shards live on process ``p``'s devices (device order is
    row-major over the mesh)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_bs % pc:
        raise ValueError(
            f"multi-host runs need the global batch size ({global_bs}) to be "
            f"divisible by the process count ({pc}): pad rows cannot be "
            "assembled per-process — choose a divisible Training.bs (see "
            "parallel/distributed.py)"
        )
    per = global_bs // pc
    return slice(pi * per, (pi + 1) * per)


def put_global_batch(mesh: Mesh, host_local: Any, axis_name: str = "data") -> Any:
    """Assemble per-process local batch rows into global batch-sharded arrays.

    Single-process: a plain ``device_put`` (identical to
    ``mesh.shard_batch``). Multi-process: every process passes its OWN rows
    (the :func:`host_batch_slice` block) and receives a view of the global
    ``jax.Array`` — jit then runs SPMD across all hosts."""
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), host_local)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(put, host_local)


def make_global_batch(mesh: Mesh, tree: Any, axis_name: str = "data"):
    """The one prep entry point for all trainers: returns
    ``(batch-sharded global tree, true_b)``.

    Single-process: pad the batch to the mesh multiple and ``device_put``;
    ``true_b`` is the static slice bound the jitted steps use to ignore the
    pad rows (``None`` when no padding — see ``mesh.pad_to_multiple``).
    Multi-process: assemble each host's local rows into the global array; no
    padding is possible here, so the assembled global batch must divide the
    mesh (raises otherwise) and ``true_b`` is always ``None``."""
    from .mesh import pad_to_multiple, shard_batch

    pc = jax.process_count()
    if pc == 1:
        padded, true_b = pad_to_multiple(tree, mesh.devices.size)
        return shard_batch(mesh, padded, axis_name), true_b
    leaves = jax.tree.leaves(tree)
    b_global = leaves[0].shape[0] * pc
    if b_global % mesh.devices.size:
        raise ValueError(
            f"multi-host global batch ({b_global}) must divide the mesh "
            f"({mesh.devices.size} devices); choose a divisible Training.bs "
            "(see parallel/distributed.py)"
        )
    return put_global_batch(mesh, tree, axis_name), None


def put_global(sharding: NamedSharding, arr, batch_axis: int = 0):
    """Like :func:`put_global_batch` for a single array with the sharded
    batch dimension at ``batch_axis`` (e.g. the scan-chunk layout
    ``(K, B, ...)`` under ``P(None, 'data')``)."""
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    global_shape = list(arr.shape)
    global_shape[batch_axis] *= jax.process_count()
    return jax.make_array_from_process_local_data(
        sharding, arr, tuple(global_shape)
    )
