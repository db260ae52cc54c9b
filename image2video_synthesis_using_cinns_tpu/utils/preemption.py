"""Preemption handling (SURVEY §5.3 — the reference only has crash-resume).

TPU pools preempt with SIGTERM; ``PreemptionGuard`` installs a handler that
flips a flag, and trainers call ``should_stop`` once per step — on preemption
they write the latest checkpoint (atomic, see utils/checkpoint.py) and exit
cleanly so the next attempt resumes from it.

Also hosts the debug-NaN switch (SURVEY §5.2): set ``I2V_DEBUG_NANS=1`` to
make XLA raise on the first NaN-producing op instead of silently training
into garbage — the JAX-native stand-in for runtime sanitizers.
"""

from __future__ import annotations

import os
import signal


def maybe_enable_debug_nans() -> bool:
    if os.environ.get("I2V_DEBUG_NANS", "") not in ("", "0"):
        import jax

        jax.config.update("jax_debug_nans", True)
        return True
    return False


class PreemptionGuard:
    def __init__(self, signals=(signal.SIGTERM,)):
        self._stop = False
        self._prev = {}
        for sig in signals:
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):  # non-main thread / unsupported
                pass

    def _handler(self, signum, frame):
        self._stop = True

    @property
    def should_stop(self) -> bool:
        return self._stop

    def restore(self) -> None:
        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
