"""Optimizers + LR scheduling with torch-matching semantics.

The reference uses torch Adam with L2 weight decay (coupled — added to the
gradient *before* the moment updates), optionally amsgrad, and epoch-level
schedulers (ExponentialLR / StepLR / ReduceLROnPlateau). We build the optax
chain to match, and expose the learning rate through
``optax.inject_hyperparams`` so a host-side ``LRController`` replicates the
torch scheduler.step() behaviour (including plateau logic) without recompiling
the train step.
"""

from __future__ import annotations

from typing import Any

import optax


def adam_torch(
    lr: float,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    amsgrad: bool = False,
):
    """torch.optim.Adam equivalent (coupled L2 weight decay)."""

    def make(learning_rate):
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        if amsgrad:
            parts.append(optax.scale_by_amsgrad(b1=betas[0], b2=betas[1], eps=eps))
        else:
            parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        parts.append(optax.scale(-learning_rate))
        return optax.chain(*parts)

    return optax.inject_hyperparams(make)(learning_rate=lr)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    import jax.numpy as jnp

    cur = opt_state.hyperparams["learning_rate"]
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=cur.dtype)
    return opt_state


class LRController:
    """Host-side scheduler mirroring the torch schedulers used by the
    reference trainers.

    modes:
      * 'exponential' — lr *= gamma per ``step()``  (stage1, ExponentialLR)
      * 'step'        — lr *= gamma every ``step_size`` steps (stage2, StepLR)
      * 'plateau'     — ReduceLROnPlateau(factor=0.5, patience=1, min_lr=1e-8,
                         threshold=1e-4 abs) (stage2 AE)
    """

    def __init__(self, base_lr: float, mode: str, gamma: float = 0.98,
                 step_size: int = 1, factor: float = 0.5, patience: int = 1,
                 min_lr: float = 1e-8, threshold: float = 1e-4):
        self.lr = base_lr
        self.mode = mode
        self.gamma = gamma
        self.step_size = step_size
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self._count = 0
        self._best = float("inf")
        self._bad_epochs = 0

    def step(self, metric: float | None = None) -> float:
        self._count += 1
        if self.mode == "exponential":
            self.lr *= self.gamma
        elif self.mode == "step":
            if self._count % self.step_size == 0:
                self.lr *= self.gamma
        elif self.mode == "plateau":
            assert metric is not None
            if metric < self._best - self.threshold:
                self._best = metric
                self._bad_epochs = 0
            else:
                self._bad_epochs += 1
                if self._bad_epochs > self.patience:
                    self.lr = max(self.lr * self.factor, self.min_lr)
                    self._bad_epochs = 0
        else:
            raise ValueError(self.mode)
        return self.lr

    def state_dict(self) -> dict[str, Any]:
        return {
            "lr": self.lr, "count": self._count,
            "best": self._best, "bad_epochs": self._bad_epochs,
        }

    def load_state_dict(self, d: dict[str, Any]) -> None:
        self.lr = d["lr"]
        self._count = d["count"]
        self._best = d["best"]
        self._bad_epochs = d["bad_epochs"]
