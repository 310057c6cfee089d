"""Weight-initialization laws.

Parity with reference ``weights_init`` (model/DCGAN.py:70-76): every Conv*
weight ~ N(0, 0.02); every BatchNorm scale ~ N(1, 0.02), bias = 0. Linear
layers in the reference CGAN discriminator keep torch's default
Kaiming-uniform init (weights_init only matches 'Conv'/'BatchNorm' class
names, model/CGAN.py:165-171), reproduced here as ``linear_init``.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def conv_init(key: jax.Array, shape: Tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    """N(0, 0.02) — reference weights_init for Conv/ConvTranspose."""
    return 0.02 * jax.random.normal(key, shape, dtype)


def bn_scale_init(key: jax.Array, shape: Tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    """N(1, 0.02) — reference weights_init for BatchNorm scale."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def linear_init(key: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch nn.Linear default: Kaiming-uniform(a=sqrt(5)) for W,
    U(-1/sqrt(fan_in), +) for b. Returns (W(fan_in, fan_out), b)."""
    kw, kb = jax.random.split(key)
    bound_w = 1.0 / math.sqrt(fan_in)  # kaiming_uniform with a=sqrt(5) reduces to this
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound_w, bound_w)
    bound_b = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound_b, bound_b)
    return w, b
