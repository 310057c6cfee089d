"""Seeding discipline.

The reference seeds every RNG from a single global constant
(``change_randomseed.py:1``, ``main.py:31-37``) and forces deterministic
kernels. In JAX determinism is the default; the analog of the reference's
global seeding is a single root ``jax.random.PRNGKey(RANDOMSEED)`` from which
every consumer derives keys by pure splitting — no hidden global state.

``KeyChain`` is a tiny convenience for call sites that want sequential keys
(data shuffling, init, per-step noise) without manually threading splits.
"""

from __future__ import annotations

import random as _pyrandom

import jax
import numpy as np

RANDOMSEED = 12345


def root_key(seed: int = RANDOMSEED) -> jax.Array:
    """Root PRNG key for a run (reference: main.py:31-37 global seeding)."""
    return jax.random.PRNGKey(seed)


def seed_everything(seed: int = RANDOMSEED) -> jax.Array:
    """Seed host-side RNGs (python/numpy, used only for data order fallback)
    and return the root JAX key. Device-side randomness must come from the
    returned key, never from numpy."""
    _pyrandom.seed(seed)
    np.random.seed(seed)
    return root_key(seed)


class KeyChain:
    """Sequential PRNG key dispenser. Each ``next()`` is an independent key.

    Fold-in based, so the chain is reproducible and O(1) state.
    """

    def __init__(self, key: jax.Array):
        self._key = key
        self._counter = 0

    def next(self) -> jax.Array:
        k = jax.random.fold_in(self._key, self._counter)
        self._counter += 1
        return k

    def split(self, n: int) -> list[jax.Array]:
        return [self.next() for _ in range(n)]
