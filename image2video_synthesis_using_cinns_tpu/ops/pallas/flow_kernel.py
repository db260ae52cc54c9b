"""Fused Pallas kernel for the 20-block conditional flow (hot sampling path).

Placeholder stage: delegates to the XLA ``lax.scan`` implementation, which is
already a single compiled loop. The fused kernel (streaming per-block MLP
weights HBM→VMEM with double buffering while the activations stay resident in
VMEM) lands behind the same interface; callers select it via
``ConditionalFlow(use_pallas=True)``.
"""

from __future__ import annotations

from ...models.stage2.flow import flow_forward, flow_reverse


def flow_forward_fused(blocks, buffers, x, embedding, xmask):
    return flow_forward(blocks, buffers, x, embedding, xmask)


def flow_reverse_fused(blocks, buffers, x, embedding, xmask):
    return flow_reverse(blocks, buffers, x, embedding, xmask)
