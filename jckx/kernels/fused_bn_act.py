"""Fused BatchNorm + activation.

This is the hot elementwise chain of both GAN nets (reference runs
BatchNorm2d + (Leaky)ReLU after every conv, model/DCGAN.py:10-28/42-58).
On TPU the chain is HBM-bandwidth-bound; keeping normalize+scale+activate in
one pass over VMEM-resident tiles is the win.

Two implementations:
- ``_bn_act_xla``: jnp composition. XLA fuses the normalize/activate chain
  into the conv epilogue; crucially it is differentiable to ANY order, which
  the WGAN-GP double-backward (grad-of-grad through D) requires.
- ``_bn_act_pallas``: a Pallas TPU kernel for the normalize+activate stage
  (stats still via XLA's optimal reduce). Used on the non-differentiated
  fast paths (sampling / eval). Grid over (N*H*W // TILE) rows, channels on
  the 128-wide lane axis.

``bn_act`` dispatches: Pallas only when explicitly enabled, shapes are
lane-aligned, and we are on TPU; otherwise XLA. The two paths agree to
float tolerance (tested in tests/test_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_USE_PALLAS = False  # flipped by enable_pallas(); XLA path is always correct


def enable_pallas(on: bool = True) -> None:
    global _USE_PALLAS
    _USE_PALLAS = on


class pallas_inference:
    """Trace-time scope that routes bn_act through the Pallas kernel.

    Use around the TRACING of inference-only jits (samplers, eval paths).
    Measured on v5e at bs512/64²: G+D forward 2.7 ms with Pallas vs 1251 ms
    with the XLA composition — XLA's fusion of the f32 normalize chain into
    the lhs-dilated conv epilogue picks a catastrophic conv-transpose
    lowering in forward-only programs (the fused TRAIN program does not
    exhibit this; it stays on the XLA path because the WGAN-GP grad-of-grad
    cannot differentiate through a pallas_call).
    """

    def __enter__(self):
        global _USE_PALLAS
        self._prev = _USE_PALLAS
        _USE_PALLAS = True
        return self

    def __exit__(self, *exc):
        global _USE_PALLAS
        _USE_PALLAS = self._prev
        return False


def _stats(x: jax.Array):
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
    return mean, var


def _bn_act_xla(x, scale, bias, act, negative_slope, eps):
    mean, var = _stats(x)
    inv = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    shift = bias.astype(jnp.float32) - mean * inv
    y = x.astype(jnp.float32) * inv + shift
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "leaky_relu":
        y = jnp.where(y >= 0, y, negative_slope * y)
    elif act != "none":
        raise ValueError(f"unknown act {act}")
    return y.astype(x.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "negative_slope", "eps", "interpret")
)
def _bn_act_pallas_call(x2d, inv, shift, act, negative_slope, eps, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, chans = x2d.shape
    tile_r = 256 if rows % 256 == 0 else 8

    def kernel(x_ref, inv_ref, shift_ref, o_ref):
        y = x_ref[:].astype(jnp.float32) * inv_ref[:] + shift_ref[:]
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        elif act == "leaky_relu":
            y = jnp.where(y >= 0, y, negative_slope * y)
        o_ref[:] = y.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        grid=(rows // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, chans), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chans), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chans), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, chans), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2d, inv, shift)


def _bn_act_pallas(x, scale, bias, act, negative_slope, eps):
    mean, var = _stats(x)
    inv = (jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32))[None, :]
    shift = (bias.astype(jnp.float32) - mean * inv[0])[None, :]
    x2d = x.reshape(-1, x.shape[-1])
    # kernel sanitizer (SURVEY §5): JCKX_PALLAS_INTERPRET=1 runs the Pallas
    # kernel in interpreter mode (python-level bounds/shape checking, works
    # on CPU) — the jckx analog of the reference's always-on anomaly
    # detector for hand-written kernels. Read OUTSIDE the kernel jit and
    # passed as a static arg so it is part of this jit's cache key (toggling
    # mid-process takes effect for direct calls; a caller's own outer jit
    # still caches whatever was set when IT first traced — set the env var
    # before building samplers).
    import os

    interpret = os.environ.get("JCKX_PALLAS_INTERPRET") == "1"
    y = _bn_act_pallas_call(x2d, inv, shift, act, negative_slope, eps, interpret)
    return y.reshape(x.shape)


def bn_act(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    act: str = "none",
    negative_slope: float = 0.2,
    eps: float = 1e-5,
) -> jax.Array:
    """Batch-stat BN fused with activation. See module docstring."""
    if (
        _USE_PALLAS
        and jax.default_backend() == "tpu"
        and x.shape[-1] % 128 == 0
        and (x.size // x.shape[-1]) % 8 == 0
    ):
        return _bn_act_pallas(x, scale, bias, act, negative_slope, eps)
    return _bn_act_xla(x, scale, bias, act, negative_slope, eps)
