"""Spatial (width-axis) sharding for the SPADE video decoder — prototype.

DP (``parallel/mesh.py``) scales throughput with batch; nothing there helps
the latency of a SINGLE video. This module shards the decoder's activations
over the width axis of the (B, T, H, W, C) video tensor across a mesh axis,
letting GSPMD insert the conv halo exchanges (``collective-permute`` of one
1-column slab per side per 3³ conv) and the tiny (B, groups)-stat
``all-reduce``s for the GroupNorm/InstanceNorm chains. No reference
counterpart (the reference is strictly single-GPU, SURVEY §2.8); this is the
"How to Scale Your Model" recipe: annotate shardings, let XLA place
collectives.

Design: a trace-time contextvar scope (same pattern as
``models/layers.py::conv3d_fold_divisor``) consulted by
``Generator.__call__``, which calls :func:`constrain_spatial` on its video
tensor at each resolution stage. Outside the scope the call is the identity,
so single-device paths are untouched. Stages whose W does not divide the mesh
axis (the 4- and 8-wide head blocks) stay replicated — they are <2% of the
decoder FLOPs; GSPMD re-shards at the first divisible stage.

Numerics: halo-exchange convolution is exact (same partial sums); only the
norm-stat reductions reassociate, so outputs match single-device to ~1e-5 in
fp32 (pinned by ``tests/test_parallel.py::
test_spatial_sharded_decoder_matches_single_device``).

Go/no-go analysis for real multi-chip latency scaling lives in BASELINE.md
("Decoder spatial sharding"); measured collective traffic comes from
``scripts/spatial_audit.py``.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_scope: contextvars.ContextVar[
    tuple[Mesh, str, str | None] | None
] = contextvars.ContextVar("i2v_spatial_sharding", default=None)


@contextlib.contextmanager
def spatial_sharding(mesh: Mesh, axis_name: str = "data", batch_axis: str | None = None):
    """Scope: decoder video tensors get width-sharded over ``mesh[axis_name]``.

    Wrap the *traced* body (inside ``jit``), not the dispatch site — the
    constraint is staged into the jaxpr at trace time. Composes with the DP
    batch sharding (use a 2-D mesh and a different axis name) and with
    ``conv3d_fold_divisor`` (the fold reshapes (B,T,H,W,C)→(B·T,H,W,C), which
    preserves the W sharding).

    ``batch_axis`` names the mesh axis the caller's BATCH dim rides (the
    facade's ``data`` axis under ``data_parallel`` + ``spatial_shard``).
    ``with_sharding_constraint`` specs are hard: an unmentioned mesh axis
    means REPLICATED over it, so without this the first decoder constraint
    would all-gather the DP-sharded batch across the data axis and every
    data-row of devices would redundantly decode the full batch.
    """
    token = _scope.set((mesh, axis_name, batch_axis))
    try:
        yield
    finally:
        _scope.reset(token)


def constrain_spatial(x: jax.Array) -> jax.Array:
    """Width-shard a (B, T, H, W, C) video tensor if a scope is active.

    Identity when no scope is set or W does not divide the mesh axis (GSPMD
    would have to pad; the non-divisible stages are the cheap low-res head).
    The batch dim keeps its ``batch_axis`` sharding (see
    :func:`spatial_sharding`) when that axis is live and divides B.
    """
    scope = _scope.get()
    if scope is None:
        return x
    mesh, axis_name, batch_axis = scope
    n = mesh.shape[axis_name]
    if x.ndim != 5 or x.shape[3] % n != 0:
        return x
    b_axis = (
        batch_axis
        if batch_axis is not None
        and mesh.shape[batch_axis] > 1
        and x.shape[0] % mesh.shape[batch_axis] == 0
        else None
    )
    spec = P(b_axis, None, None, axis_name, None)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
