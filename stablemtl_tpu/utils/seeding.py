"""Deterministic, resumable randomness.

The reference keeps a checkpointed list of pre-generated seeds consumed one
per step (src/util/seeding.py:27-54). The TPU-native design derives every
step's randomness functionally:  key(step) = fold_in(base_key, step).
Resume therefore needs only the integer step — no seed list in the checkpoint
— while remaining bit-reproducible.

`generate_seed_sequence` is kept for protocol parity (eval seeds).
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_all(seed: int = 0) -> None:
    random.seed(seed)
    np.random.seed(seed % (2**32))


def generate_seed_sequence(
    initial_seed: int | None,
    length: int,
    min_val: int = -0x8000_0000_0000_0000,
    max_val: int = 0xFFFF_FFFF_FFFF_FFFF,
) -> list:
    """Pre-generated seed list, identical semantics to the reference."""
    rng = random.Random(initial_seed)
    return [rng.randint(min_val, max_val) for _ in range(length)]


def step_key(base_seed: int, step: int) -> jax.Array:
    """Per-step PRNG key: reproducible for any step without history."""
    return jax.random.fold_in(jax.random.PRNGKey(base_seed), step)


def step_rng(base_seed: int, step: int, salt: int = 0) -> np.random.Generator:
    """Host-side numpy Generator deterministically derived from (seed, step)."""
    ss = np.random.SeedSequence([base_seed & 0xFFFF_FFFF, step, salt])
    return np.random.default_rng(ss)
