"""Learning-rate schedules as optax-compatible pure functions.

IterExponential parity with reference src/util/lr_scheduler.py:7-32:
linear warmup to 1.0, then exponential decay reaching `final_ratio` at
`total_iter_length`, flat afterwards.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import optax


def iter_exponential_ratio(n_iter, total_iter_length: int, final_ratio: float,
                           warmup_steps: int = 0):
    """Scalar LR multiplier at step `n_iter` (works on python ints and arrays)."""
    n = jnp.asarray(n_iter, jnp.float32)
    effective = total_iter_length - warmup_steps
    warm = jnp.where(warmup_steps > 0, n / jnp.maximum(warmup_steps, 1), 1.0)
    decay = jnp.exp((n - warmup_steps) / effective * jnp.log(final_ratio))
    ratio = jnp.where(
        n < warmup_steps, warm,
        jnp.where(n >= total_iter_length, final_ratio, decay),
    )
    return ratio


def iter_exponential_schedule(base_lr: float, total_iter_length: int,
                              final_ratio: float, warmup_steps: int = 0
                              ) -> optax.Schedule:
    def schedule(count):
        return base_lr * iter_exponential_ratio(
            count, total_iter_length, final_ratio, warmup_steps)
    return schedule


class IterExponential:
    """Callable mirror of the reference class (host-side, numpy)."""

    def __init__(self, total_iter_length: int, final_ratio: float,
                 warmup_steps: int = 0):
        self.total_length = total_iter_length
        self.effective_length = total_iter_length - warmup_steps
        self.final_ratio = final_ratio
        self.warmup_steps = warmup_steps

    def __call__(self, n_iter: int) -> float:
        if n_iter < self.warmup_steps:
            return 1.0 * n_iter / self.warmup_steps
        if n_iter >= self.total_length:
            return self.final_ratio
        actual = n_iter - self.warmup_steps
        return float(np.exp(actual / self.effective_length * np.log(self.final_ratio)))
