"""Fused Pallas TPU kernel for the conditional flow (forward + inverse).

The reference evaluates 20 sequential flow blocks as Python-level module calls
(~320 small matmuls with interleaved elementwise ops,
``flow_blocks.py:44-57``). The XLA `lax.scan` version already compiles to one
loop; this kernel goes further and fuses the *entire chain into a single
Pallas program*:

  * grid = (n_flows,): one grid step per block, executed sequentially on the
    core. The batch activations (B, C) and the conditioning embedding stay
    resident in VMEM for the whole chain;
  * per-block weights are streamed HBM→VMEM by the Pallas pipeline with
    automatic double buffering (block i+1's weights prefetch while block i
    computes), so the chain is bandwidth-bound at ~weights-bytes/HBM-BW with
    zero dispatch overhead per block;
  * weights are carried in bfloat16 (matmuls accumulate in fp32 via
    ``preferred_element_type``) which halves the streamed bytes — the flow is
    tiny (z=64) so the bf16 weight quantisation is far below the decoder's
    tanh output resolution;
  * the fixed channel shuffles are applied as (C, C) one-hot permutation
    matmuls — an MXU-friendly formulation of a lane-dim gather.

Only the reference architecture shape is specialised (hidden_depth=2, i.e. 4
linear layers per coupling MLP); anything else falls back to the XLA scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.stage2.flow import INV_LRELU_ALPHA, LRELU_SLOPE, flow_forward, flow_reverse

N_LAYERS = 4  # hidden_depth=2 → Linear x4 (reference modules.py:9-30)


def _supported(blocks) -> bool:
    return set(blocks["coupling"]["s0"].keys()) == {f"l{i}" for i in range(N_LAYERS)}


def _perm_matrices(idx: jax.Array, C: int) -> jax.Array:
    """(n, C) int32 → (n, C, C) one-hot so that x @ P == x[:, idx]."""
    return jax.nn.one_hot(idx, C, axis=-2, dtype=jnp.float32)


def _pack_weights(blocks, dtype=jnp.bfloat16):
    """Stacked block params → flat tuple of arrays fed to pallas_call."""
    ws, bs = [], []
    for net in ("s0", "t0", "s1", "t1"):
        for li in range(N_LAYERS):
            lp = blocks["coupling"][net][f"l{li}"]
            ws.append(lp["w"].astype(dtype))
            bs.append(lp["b"].astype(jnp.float32))
    return ws, bs


def _mlp(cin, w_refs, b_refs, base: int):
    """4-layer MLP on a VMEM-resident (B, din) activation."""
    h = cin
    for li in range(N_LAYERS):
        w = w_refs[base + li][0]  # (din, dout) — leading block axis sliced to 1
        b = b_refs[base + li][0]
        h = jnp.dot(h.astype(w.dtype), w, preferred_element_type=jnp.float32) + b
        if li < N_LAYERS - 1:
            h = jnp.where(h >= 0, h, LRELU_SLOPE * h)
    return h


def _make_kernel(n_flows: int, half: int, reverse: bool):
    def kernel(emb_ref, mask_ref, loc_ref, scale_ref, perm_ref, x_in_ref,
               *wb_refs):
        n_w = 4 * N_LAYERS
        w_refs = wb_refs[:n_w]
        b_refs = wb_refs[n_w : 2 * n_w]
        x_out_ref = wb_refs[2 * n_w]
        logdet_ref = wb_refs[2 * n_w + 1]
        x_scr = wb_refs[2 * n_w + 2]
        ld_scr = wb_refs[2 * n_w + 3]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            x_scr[:] = x_in_ref[:]
            ld_scr[:] = jnp.zeros_like(ld_scr)

        x = x_scr[:]
        emb = emb_ref[:]
        m = mask_ref[0]  # scalar control mask for this block
        loc = loc_ref[0]
        scale = scale_ref[0]
        perm = perm_ref[0]

        def coupling_pass(x, s_base, t_base):
            xa = x[:, :half]
            xk = x[:, half:]
            cin = jnp.concatenate([xa * m, emb], axis=-1)
            s = _mlp(cin, w_refs, b_refs, s_base)
            t = _mlp(cin, w_refs, b_refs, t_base)
            if reverse:
                xk = (xk - t) * jnp.exp(-s)
                ld = jnp.zeros((x.shape[0],), jnp.float32)
            else:
                xk = xk * jnp.exp(s) + t
                ld = jnp.sum(s, axis=-1)
            return jnp.concatenate([xa, xk], axis=-1), ld

        def swap(x):
            return jnp.concatenate([x[:, half:], x[:, :half]], axis=-1)

        # layer bases in the packed weight list: s0, t0, s1, t1
        S0, T0, S1, T1 = 0, N_LAYERS, 2 * N_LAYERS, 3 * N_LAYERS

        if not reverse:
            # actnorm → invlrelu → coupling(2 passes) → shuffle
            x = (x + loc) * scale
            ld_scr[:] = ld_scr[:] + jnp.sum(jnp.log(jnp.abs(scale)))
            x = jnp.where(x >= 0, x, INV_LRELU_ALPHA * x)
            x, ld0 = coupling_pass(x, S0, T0)
            x = swap(x)
            x, ld1 = coupling_pass(x, S1, T1)
            ld_scr[:] = ld_scr[:] + ld0 + ld1
            x = jnp.dot(x, perm, preferred_element_type=jnp.float32)
        else:
            # shuffle⁻¹ → coupling⁻¹ (pass1 then pass0) → invlrelu⁻¹ → actnorm⁻¹
            x = jnp.dot(x, perm, preferred_element_type=jnp.float32)
            x, _ = coupling_pass(x, S1, T1)
            x = swap(x)
            x, _ = coupling_pass(x, S0, T0)
            x = jnp.where(x >= 0, x, x / INV_LRELU_ALPHA)
            x = x / scale - loc

        x_scr[:] = x

        @pl.when(i == n_flows - 1)
        def _():
            x_out_ref[:] = x_scr[:]
            logdet_ref[:] = ld_scr[:]

    return kernel


@partial(jax.jit, static_argnames=("reverse",))
def _flow_fused(blocks, buffers, x, embedding, xmask, reverse: bool):
    n_flows, C = blocks["actnorm"]["loc"].shape
    half = C // 2
    B = x.shape[0]

    ws, bs = _pack_weights(blocks)
    if reverse:
        idx_order = buffers["inv"]
    else:
        idx_order = buffers["fwd"]
    perms = _perm_matrices(idx_order, C)
    # shuffle matrix semantics: forward x[:, fwd] == x @ onehot(fwd, axis=-2)
    # NB: streamed arrays carry a singleton axis after the block axis so the
    # Mosaic block shape's trailing two dims never include the grid axis.
    loc = blocks["actnorm"]["loc"].astype(jnp.float32)[:, None]
    scale = blocks["actnorm"]["scale"].astype(jnp.float32)[:, None]
    mask = xmask.astype(jnp.float32).reshape(n_flows, 1, 1)
    bs = [b[:, None] for b in bs]

    # per-block streamed specs: leading axis = block; reverse flips the order
    def order(i):
        return (n_flows - 1 - i) if reverse else i

    def blk(shape_tail):
        return pl.BlockSpec(
            (1, *shape_tail), lambda i: (order(i),) + (0,) * len(shape_tail),
            memory_space=pltpu.VMEM,
        )

    resident = pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [
        resident,                 # embedding
        blk((1, 1)),              # mask
        blk((1, C)),              # loc
        blk((1, C)),              # scale
        blk((C, C)),              # perm
        resident,                 # x_in
    ]
    in_specs += [blk(w.shape[1:]) for w in ws]
    in_specs += [blk(b.shape[1:]) for b in bs]

    kernel = _make_kernel(n_flows, half, reverse)
    x_out, logdet = pl.pallas_call(
        kernel,
        grid=(n_flows,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, C), jnp.float32),
            jax.ShapeDtypeStruct((B,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, C), jnp.float32),
            pltpu.VMEM((B,), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(embedding.astype(jnp.float32), mask, loc, scale, perms,
      x.astype(jnp.float32), *ws, *bs)
    if reverse:
        return x_out
    return x_out, logdet


def flow_forward_fused(blocks, buffers, x, embedding, xmask):
    if not _supported(blocks):
        return flow_forward(blocks, buffers, x, embedding, xmask)
    return _flow_fused(blocks, buffers, x, embedding, xmask, reverse=False)


def flow_reverse_fused(blocks, buffers, x, embedding, xmask):
    if not _supported(blocks):
        return flow_reverse(blocks, buffers, x, embedding, xmask)
    return _flow_fused(blocks, buffers, x, embedding, xmask, reverse=True)
