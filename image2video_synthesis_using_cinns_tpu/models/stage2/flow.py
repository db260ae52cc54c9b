"""Conditional normalizing flow (the cINN core), TPU-native.

Capability parity with reference ``stage2_cINN/modules/flow_blocks.py`` /
``modules.py``: a stack of ``n_flows`` blocks, each
``ActNorm → InvLeakyRelu(0.9) → double affine coupling → fixed channel
shuffle``, with the conditioning embedding fed to every block. Forward
accumulates the exact log-determinant; reverse is the exact inverse.

TPU-first design, deliberately different from the reference's Python loop over
20 ``nn.Module``s (reference ``flow_blocks.py:44-57``):

  * all blocks are **homogeneous stacked parameters** (leading axis = block)
    and the chain is a single ``lax.scan`` — one compiled loop instead of 20
    Python-level module calls, so XLA pipelines the per-block matmuls and the
    whole flow is one fusion region;
  * the endpoint-control variant (reference mode='cond' for blocks with
    ``fl % 4 != 0``, ``flow_blocks.py:24``) is expressed as a per-block input
    mask: coupling MLPs always take ``concat(x_half, embedding)`` and the
    x-half is multiplied by 0 on 'cond' blocks — functionally identical to the
    reference's cond-only MLP while keeping every block the same shape (the
    masked weights receive zero gradient);
  * the shuffle is a gather with fixed per-block index buffers (non-trainable,
    stored in the ``"buffers"`` collection like torch's registered buffers);
  * ActNorm data-dependent init (reference ``modules.py:43-78``: ungated — it
    initialises even in eval mode on the first batch) is an explicit
    ``init_actnorm`` pass returning updated parameters;
  * an optional fused Pallas kernel (ops/pallas/flow_kernel.py) executes the
    same stacked parameters for the latency-critical sampling path.

Shapes: x is (B, C); embedding is (B, E). (The reference carries phantom
trailing (1,1) spatial dims through the flow — ``flow_blocks.py:46`` — which we
drop; the facade reshapes at the boundary.)
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.01  # torch nn.LeakyReLU() default inside the coupling MLPs
INV_LRELU_ALPHA = 0.9


# --------------------------------------------------------------------------
# parameter construction
# --------------------------------------------------------------------------

def _linear_init(key, n_blocks: int, d_in: int, d_out: int):
    """torch nn.Linear default init, stacked across blocks."""
    wkey, bkey = jax.random.split(key)
    bound_w = 1.0 / math.sqrt(d_in)
    w = jax.random.uniform(wkey, (n_blocks, d_in, d_out), jnp.float32, -bound_w, bound_w)
    b = jax.random.uniform(bkey, (n_blocks, d_out), jnp.float32, -bound_w, bound_w)
    return {"w": w, "b": b}


def _mlp_init(key, n_blocks: int, d_in: int, hidden: int, depth: int, d_out: int):
    """BasicFullyConnectedNet (reference modules.py:9-30): Linear(d_in,h),
    LReLU, depth x [Linear(h,h), LReLU], Linear(h,d_out)."""
    dims = [(d_in, hidden)] + [(hidden, hidden)] * depth + [(hidden, d_out)]
    keys = jax.random.split(key, len(dims))
    return {f"l{i}": _linear_init(k, n_blocks, di, do) for i, (k, (di, do)) in enumerate(zip(keys, dims))}


def init_flow_blocks(
    key,
    in_channels: int,
    embedding_dim: int,
    hidden_dim: int,
    hidden_depth: int,
    n_flows: int,
):
    """Stacked parameters for all flow blocks (leading axis = block index)."""
    half = in_channels // 2
    d_in = half + embedding_dim
    k_act, k_c = jax.random.split(key)
    keys = jax.random.split(k_c, 4)
    coupling = {
        name: _mlp_init(k, n_flows, d_in, hidden_dim, hidden_depth, half)
        for name, k in zip(("s0", "t0", "s1", "t1"), keys)
    }
    return {
        "actnorm": {
            "loc": jnp.zeros((n_flows, in_channels)),
            "scale": jnp.ones((n_flows, in_channels)),
        },
        "coupling": coupling,
    }


def init_shuffle_buffers(key, in_channels: int, n_flows: int):
    """Fixed random channel permutations + inverses (reference
    flow_blocks.py:142-154)."""
    keys = jax.random.split(key, n_flows)
    fwd = jnp.stack([jax.random.permutation(k, in_channels) for k in keys])
    inv = jnp.argsort(fwd, axis=-1)
    return {"fwd": fwd.astype(jnp.int32), "inv": inv.astype(jnp.int32)}


def control_mask(n_flows: int, control: bool) -> jnp.ndarray:
    """1.0 where the coupling conditions on (x_half, embedding); 0.0 where on
    the embedding alone (reference flow_blocks.py:24: mode='cond' iff
    ``fl % 4 != 0 and control``)."""
    if not control:
        return jnp.ones((n_flows,), jnp.float32)
    return jnp.asarray([0.0 if fl % 4 != 0 else 1.0 for fl in range(n_flows)], jnp.float32)


# --------------------------------------------------------------------------
# functional forward / reverse
# --------------------------------------------------------------------------

def _mlp_apply(p, x):
    n_layers = len(p)
    h = x
    for i in range(n_layers):
        lp = p[f"l{i}"]
        h = jnp.dot(h, lp["w"], preferred_element_type=jnp.float32) + lp["b"]
        if i < n_layers - 1:
            h = jnp.where(h >= 0, h, LRELU_SLOPE * h)
    return h


def _coupling_fwd(p, x, emb, xmask):
    """Double affine coupling, forward. x: (B,C), emb: (B,E)."""
    logdet = 0.0
    for i, (s_name, t_name) in enumerate((("s0", "t0"), ("s1", "t1"))):
        if i % 2 != 0:
            x = jnp.concatenate(jnp.split(x, 2, axis=-1)[::-1], axis=-1)
        x_apply, x_keep = jnp.split(x, 2, axis=-1)
        cin = jnp.concatenate([x_apply * xmask, emb], axis=-1)
        scale = _mlp_apply(p[s_name], cin)
        t = _mlp_apply(p[t_name], cin)
        x_keep = x_keep * jnp.exp(scale) + t
        x = jnp.concatenate([x_apply, x_keep], axis=-1)
        logdet = logdet + jnp.sum(scale, axis=-1)
    return x, logdet


def _coupling_rev(p, x, emb, xmask):
    for i in (1, 0):
        if i % 2 == 0:
            x = jnp.concatenate(jnp.split(x, 2, axis=-1)[::-1], axis=-1)
        x_apply, x_keep = jnp.split(x, 2, axis=-1)
        cin = jnp.concatenate([x_apply * xmask, emb], axis=-1)
        s_name, t_name = (f"s{i}", f"t{i}")
        scale = _mlp_apply(p[s_name], cin)
        t = _mlp_apply(p[t_name], cin)
        x_keep = (x_keep - t) * jnp.exp(-scale)
        x = jnp.concatenate([x_apply, x_keep], axis=-1)
    return x


def _inv_lrelu_fwd(x):
    return jnp.where(x >= 0, x, INV_LRELU_ALPHA * x)


def _inv_lrelu_rev(x):
    return jnp.where(x >= 0, x, x / INV_LRELU_ALPHA)


def flow_forward(blocks, buffers, x, embedding, xmask):
    """x: (B,C) → (out, logdet (B,)). ``xmask``: (n_flows,) control mask."""

    def step(carry, inputs):
        h, logdet = carry
        p, buf, m = inputs
        # ActNorm: h = (x + loc) * scale ; logdet = sum log|scale| (H=W=1)
        h = (h + p["actnorm"]["loc"]) * p["actnorm"]["scale"]
        ld = jnp.sum(jnp.log(jnp.abs(p["actnorm"]["scale"])))
        logdet = logdet + ld
        # InvLeakyRelu contributes 0 logdet in the reference (flow_blocks.py:177-182)
        h = _inv_lrelu_fwd(h)
        h, ld_c = _coupling_fwd(p["coupling"], h, embedding, m)
        logdet = logdet + ld_c
        # fixed shuffle, logdet 0
        h = jnp.take(h, buf["fwd"], axis=-1)
        return (h, logdet), None

    logdet0 = jnp.zeros((x.shape[0],), x.dtype)
    (out, logdet), _ = jax.lax.scan(step, (x, logdet0), (blocks, buffers, xmask))
    return out, logdet


def flow_reverse(blocks, buffers, x, embedding, xmask):
    def step(h, inputs):
        p, buf, m = inputs
        h = jnp.take(h, buf["inv"], axis=-1)
        h = _coupling_rev(p["coupling"], h, embedding, m)
        h = _inv_lrelu_rev(h)
        h = h / p["actnorm"]["scale"] - p["actnorm"]["loc"]
        return h, None

    out, _ = jax.lax.scan(step, x, (blocks, buffers, xmask), reverse=True)
    return out


def actnorm_init(blocks, buffers, x, embedding, xmask):
    """Data-dependent ActNorm init (reference modules.py:43-63, ungated
    variant): per block, loc = -mean, scale = 1/(std+1e-6) with *unbiased*
    std over the batch, computed on that block's input — i.e. sequentially
    through the chain. Returns a new stacked-blocks pytree."""

    def step(h, inputs):
        p, buf, m = inputs
        mean = jnp.mean(h, axis=0)
        std = jnp.std(h, axis=0, ddof=1)
        loc = -mean
        scale = 1.0 / (std + 1e-6)
        h = (h + loc) * scale
        h = _inv_lrelu_fwd(h)
        h, _ = _coupling_fwd(p["coupling"], h, embedding, m)
        h = jnp.take(h, buf["fwd"], axis=-1)
        return h, (loc, scale)

    _, (locs, scales) = jax.lax.scan(step, x, (blocks, buffers, xmask))
    new_blocks = dict(blocks)
    new_blocks["actnorm"] = {"loc": locs, "scale": scales}
    return new_blocks


# --------------------------------------------------------------------------
# linen wrapper
# --------------------------------------------------------------------------

class ConditionalFlow(nn.Module):
    """Linen wrapper owning the stacked block params + shuffle buffers.

    Config keys follow the reference ``Flow`` section: n_flows,
    flow_hidden_depth (``hidden_depth``), hidden dim = z_dim *
    flow_mid_channels_factor. ``conditioning_option`` parallel/sequential 1x1
    transforms are unused at every reference call site ("None" at
    ``get_model.py:40`` and ``stage2_cINN/main.py:98``) and are not replicated.
    """

    in_channels: int
    embedding_dim: int
    hidden_dim: int
    hidden_depth: int
    n_flows: int
    control: bool = False
    use_pallas: bool = False

    def setup(self):
        self.blocks = self.param(
            "blocks",
            lambda key: init_flow_blocks(
                key, self.in_channels, self.embedding_dim, self.hidden_dim,
                self.hidden_depth, self.n_flows,
            ),
        )
        self.shuffle = self.variable(
            "buffers",
            "shuffle",
            lambda: init_shuffle_buffers(
                self.make_rng("params"), self.in_channels, self.n_flows
            ),
        )

    def _mask(self):
        return control_mask(self.n_flows, self.control)

    def __call__(self, x: jax.Array, embedding: jax.Array, reverse: bool = False):
        if self.use_pallas and not reverse:
            from ...ops.pallas.flow_kernel import flow_forward_fused

            return flow_forward_fused(self.blocks, self.shuffle.value, x, embedding, self._mask())
        if self.use_pallas and reverse:
            from ...ops.pallas.flow_kernel import flow_reverse_fused

            return flow_reverse_fused(self.blocks, self.shuffle.value, x, embedding, self._mask())
        if reverse:
            return flow_reverse(self.blocks, self.shuffle.value, x, embedding, self._mask())
        return flow_forward(self.blocks, self.shuffle.value, x, embedding, self._mask())

    def reverse(self, out: jax.Array, embedding: jax.Array):
        return self(out, embedding, reverse=True)

    def init_actnorm(self, x: jax.Array, embedding: jax.Array):
        """Returns data-dependent-initialised stacked block params."""
        return actnorm_init(self.blocks, self.shuffle.value, x, embedding, self._mask())
