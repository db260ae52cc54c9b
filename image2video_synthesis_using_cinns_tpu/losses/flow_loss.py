"""cINN NLL objective.

Parity with reference ``stage2_cINN/modules/loss.py:5-28`` (``FlowLoss``):
``loss = mean(0.5·Σ gauss²) − mean(logdet)``, with a reference NLL of true
Gaussian noise logged for calibration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nll(sample: jax.Array) -> jax.Array:
    reduce_axes = tuple(range(1, sample.ndim))
    return 0.5 * jnp.sum(jnp.square(sample), axis=reduce_axes)


def flow_loss(gauss: jax.Array, logdet: jax.Array, rng: jax.Array | None = None):
    nll_loss = jnp.mean(nll(gauss))
    nlogdet_loss = -jnp.mean(logdet)
    loss = nll_loss + nlogdet_loss
    aux = {
        "Loss": loss,
        "nlogdet_loss": nlogdet_loss,
        "nll_loss": nll_loss,
    }
    if rng is not None:
        aux["reference_nll_loss"] = jnp.mean(
            nll(jax.random.normal(rng, gauss.shape, gauss.dtype))
        )
    return loss, aux
