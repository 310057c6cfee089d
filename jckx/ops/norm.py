"""Batch normalization, train-mode (batch-stats) semantics.

The reference's G/D never leave train mode (the trainers never call
``.eval()`` on the GAN models — train/dcgan_trainer.py uses ``torch.no_grad``
only, :199), so every forward normalizes by the *current batch's* statistics
with biased variance — exactly what this function computes. Running stats are
returned for checkpoint parity but are not used in the data path.

Under a sharded-batch jit, the ``jnp.mean`` over the batch axis is a global
reduction: XLA lowers it to an ICI all-reduce, so multi-chip training has
bit-identical semantics to one big device (sync BN for free — the TPU answer
to the reference's single-device BN).

Statistics are computed in float32 regardless of the activation dtype.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def batch_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
    running: Optional[Tuple[jax.Array, jax.Array]] = None,
    momentum: float = 0.1,
):
    """Normalize NHWC (or N,C) activations by batch statistics.

    Returns ``y`` or ``(y, (new_mean, new_var))`` when ``running`` is given.
    Matches torch BatchNorm2d train-mode forward: biased variance in the
    normalization, unbiased in the running-stat update (torch semantics).
    """
    reduce_axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=reduce_axes)
    var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * (inv * scale.astype(jnp.float32)) + bias.astype(jnp.float32)
    y = y.astype(x.dtype)
    if running is None:
        return y
    n = 1
    for a in reduce_axes:
        n *= x.shape[a]
    unbiased = var * (n / max(n - 1, 1))
    run_mean, run_var = running
    new_mean = (1 - momentum) * run_mean + momentum * mean
    new_var = (1 - momentum) * run_var + momentum * unbiased
    return y, (new_mean, new_var)
