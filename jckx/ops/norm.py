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

import functools
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


# --------------------------------------------------------------------------
# Fused train-mode BN + ReLU with a hand-written VJP.
#
# Train-mode batch-stat BN is the InceptionV3 fine-tune step's largest
# non-conv cost (SURVEY §2 #18 workload). The hand-written VJP pins the
# minimal pass structure in both directions:
#   forward : ONE moment sweep (sum + self-einsum, f32 accumulation on bf16
#             reads) + ONE elementwise normalize+relu pass.
#   backward: ONE fused reduction sweep over (dy, x) producing dbeta and
#             sum(dz*x) — dgamma = inv*(sum(dz*x) - mean*dbeta), so
#             normalized activations are never materialized — + ONE
#             elementwise pass for dx. Residuals are x itself (shared with
#             the conv that produced it) plus per-channel vectors: no f32
#             full-tensor intermediates survive the forward.
#
# Perf note (measured, v5e, 299²/bs128 fine-tune step): XLA's own
# convert+reduce fusions already run the two-operand moment sweeps at
# ~550 GB/s effective (275 GB/s per-read), and the elementwise passes sit
# at the HBM floor, so this formulation is throughput-NEUTRAL vs naive
# autodiff (69.7 vs 68.7 ms/step) — its value is the pinned structure and
# memory behavior. Hand-written Pallas accumulation kernels for the same
# reductions were measured 4-6x SLOWER than XLA's reduce codegen
# (40-80 GB/s) and were dropped; see README "speed of light" notes.
#
# The mean/var outputs exist for the running-stat update and are defined as
# gradient-free (stop_gradient semantics) — exactly how torch treats
# running stats and how the fine-tune step consumes them.
# --------------------------------------------------------------------------


def _bn_moments(x, n):
    """Per-channel (mean, E[x^2]) in one logical sweep of x: the sum and the
    self-contraction fuse into adjacent convert_reduce fusions (fastest
    measured form). Reductions run over the ORIGINAL axes — no reshape — so
    a batch-sharded x lowers to per-shard partial sums + one ICI all-reduce
    (sync-BN), never a regather."""
    axes = tuple(range(x.ndim - 1))
    sub = "nhwc" if x.ndim == 4 else "nc"
    s1 = jnp.sum(x, axis=axes, dtype=jnp.float32)
    s2 = jnp.einsum(f"{sub},{sub}->c", x, x, preferred_element_type=jnp.float32)
    return s1 / n, s2 / n


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_relu_train(x: jax.Array, scale: jax.Array, bias: jax.Array,
                  eps: float = 1e-3):
    """relu(batch-norm(x)) with batch statistics, NHWC (or (N, C)).

    Returns ``(out, mean, biased_var)``; out has x's dtype, stats are f32.
    mean/var carry NO gradient (running-stat semantics). Differentiable
    once (reverse mode); not for use under grad-of-grad (the GAN GP path
    keeps the plain ``batch_norm`` above).
    """
    out, mean, var, _ = _bn_relu_fwd_impl(x, scale, bias, eps)
    return out, mean, var


def _bn_relu_fwd_impl(x, scale, bias, eps):
    C = x.shape[-1]
    n = x.size // C
    mean, meansq = _bn_moments(x, n)
    var = meansq - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    a = scale.astype(jnp.float32) * inv
    sh = bias.astype(jnp.float32) - mean * a
    z = x.astype(jnp.float32) * a + sh
    out = jnp.maximum(z, 0.0).astype(x.dtype)
    return out, mean, var, (a, sh, inv, mean)


def _bn_relu_fwd(x, scale, bias, eps):
    out, mean, var, res = _bn_relu_fwd_impl(x, scale, bias, eps)
    return (out, mean, var), (x,) + res


def _bn_relu_bwd(eps, res, cts):
    x, a, sh, inv, mean = res
    do = cts[0]  # cotangents of mean/var: defined zero
    C = x.shape[-1]
    n = x.size // C
    # dz = d(out)/d(pre-relu) — relu mask recomputed from x (nothing
    # saved). Reduction operands stay in x's dtype so the self-einsum
    # is an MXU-native bf16 contraction with f32 accumulation.
    zpos = x.astype(jnp.float32) * a + sh > 0.0
    dz = jnp.where(zpos, do, jnp.zeros((), do.dtype))
    axes = tuple(range(x.ndim - 1))
    sub = "nhwc" if x.ndim == 4 else "nc"
    dbeta = jnp.sum(dz, axis=axes, dtype=jnp.float32)
    s_dzx = jnp.einsum(f"{sub},{sub}->c", dz, x,
                       preferred_element_type=jnp.float32)
    dgamma = inv * (s_dzx - mean * dbeta)
    # dx = a*(dz - dbeta/n - xhat*dgamma/n), dz/xhat recomputed inline
    g1 = dbeta / n
    g2 = dgamma / n
    xf = x.astype(jnp.float32)
    dzf = jnp.where(xf * a + sh > 0.0, do.astype(jnp.float32), 0.0)
    dx = a * (dzf - g1 - (xf - mean) * inv * g2)
    return dx.astype(x.dtype), dgamma, dbeta


bn_relu_train.defvjp(_bn_relu_fwd, _bn_relu_bwd)
