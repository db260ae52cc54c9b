"""Tensor parallelism for the cINN flow (2-D ``data x model`` mesh).

DP alone saturates for these model sizes, but the flow's coupling MLPs are
the one dense hot spot that scales past a chip when configs grow
(hidden = z_dim * flow_mid_channels_factor): each block holds 4 MLPs of
(d_in→H, H→H, H→H, H→C/2). This module shards them Megatron-style over a
'model' mesh axis *declaratively* — parameters get ``NamedSharding``s and
XLA's SPMD partitioner derives the matmul partitioning and the reduce
collectives from them (no hand-written psums):

  * l0 (d_in, H): column-parallel — H sharded,
  * l1, l2 (H, H): row-then-column blocks — sharded on the contracting then
    the output dim alternately so activations stay sharded between layers,
  * l3 (H, C/2): row-parallel — contraction sharded, output replicated
    (XLA inserts the all-reduce).

Everything else (actnorm, shuffle, embedder, batch) follows the usual DP
rules: batch on 'data', small params replicated.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_2d_mesh(n_data: int, n_model: int) -> Mesh:
    devices = np.asarray(jax.devices()[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def flow_param_specs(blocks: Any) -> Any:
    """PartitionSpec tree matching a stacked-blocks flow param tree."""

    def mlp_spec(name_l: str) -> P:
        # leading axis is the block-stack; never sharded
        if name_l == "l0":
            return P(None, None, "model")  # column-parallel
        if name_l == "l3":
            return P(None, "model", None)  # row-parallel (contraction sharded)
        return P(None, "model", None)  # hidden blocks: contract over shard

    specs: dict = {
        "actnorm": {"loc": P(), "scale": P()},
        "coupling": {},
    }
    for net in ("s0", "t0", "s1", "t1"):
        net_specs = {}
        for lname in blocks["coupling"][net]:
            w_spec = mlp_spec(lname)
            b_spec = P(None, "model") if lname == "l0" else P()
            net_specs[lname] = {"w": w_spec, "b": b_spec}
        specs["coupling"][net] = net_specs
    return specs


def shard_flow_params(mesh: Mesh, blocks: Any) -> Any:
    specs = flow_param_specs(blocks)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), blocks, specs
    )


def replicated(mesh: Mesh, tree: Any) -> Any:
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def batch_sharded(mesh: Mesh, tree: Any) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), tree
    )
