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
lane-aligned, and we are on TPU (or in interpret mode, which emulates the
kernel on any backend); otherwise XLA. The two paths agree to float
tolerance (tested in tests/test_kernels.py).

The Pallas stage is wrapped in ``custom_partitioning`` so mesh-sharded
inference programs (multi-chip serving) shard it on the row axis instead of
all-gathering around an opaque custom call — see ``_partitioned_pallas_call``.
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


@functools.lru_cache(maxsize=None)
def _partitioned_pallas_call(act: str, negative_slope: float, interpret: bool):
    """The normalize+activate kernel, wrapped in ``custom_partitioning`` so
    the SPMD partitioners (Shardy/GSPMD) shard it on the ROW axis instead of
    treating the custom call as opaque. Without this, a mesh-sharded
    inference program (multi-chip serving, jckx/serve.py) all-gathered the
    full activation into every chip before the elementwise stage and sliced
    after it — the kernel is elementwise over rows given replicated
    per-channel vectors, so row sharding is collective-free by construction
    (verified: no all-gather in the sharded HLO, tests/test_kernels.py).

    One wrapper per (act, slope, interpret) — the cache keeps tracing cheap
    and equal configs pointing at one primitive.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def raw(x2d, inv, shift):
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

    @custom_partitioning
    def pallas_rows(x2d, inv, shift):
        return raw(x2d, inv, shift)

    def _row_axis(mesh, arg_shapes):
        # the mesh axis (or axes) the partitioner put on x2d's row dim;
        # None = replicate. Fall back to replication when the per-shard row
        # count would break the kernel's 8-row tiling.
        sh = getattr(arg_shapes[0], "sharding", None)
        if sh is None or len(sh.spec) == 0 or sh.spec[0] is None:
            return None
        row = sh.spec[0]
        axes = (row,) if isinstance(row, str) else tuple(row)
        n = 1
        for a in axes:
            n *= mesh.shape[a]
        if (arg_shapes[0].shape[0] // n) % 8 != 0:
            return None
        return row

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_row_axis(mesh, arg_shapes), None))

    def partition(mesh, arg_shapes, result_shape):
        row = _row_axis(mesh, arg_shapes)
        arg_sh = (
            NamedSharding(mesh, P(row, None)),
            NamedSharding(mesh, P(None, None)),
            NamedSharding(mesh, P(None, None)),
        )
        return mesh, raw, NamedSharding(mesh, P(row, None)), arg_sh

    pallas_rows.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        # Shardy propagation rule: rows ('i') may shard, channels stay with
        # the replicated per-channel vectors' lane dim ('j').
        sharding_rule="i j, k j, k j -> i j",
    )
    return pallas_rows


def _bn_act_pallas(x, scale, bias, act, negative_slope, eps):
    mean, var = _stats(x)
    inv = (jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32))[None, :]
    shift = (bias.astype(jnp.float32) - mean * inv[0])[None, :]
    x2d = x.reshape(-1, x.shape[-1])
    # kernel sanitizer (SURVEY §5): JCKX_PALLAS_INTERPRET=1 runs the Pallas
    # kernel in interpreter mode (python-level bounds/shape checking, works
    # on CPU) — the jckx analog of the reference's always-on anomaly
    # detector for hand-written kernels. Read at trace time and part of
    # _partitioned_pallas_call's lru_cache key, so toggling mid-process
    # takes effect for fresh traces; a caller's own outer jit still caches
    # whatever was set when IT first traced — set the env var before
    # building samplers.
    import os

    interpret = os.environ.get("JCKX_PALLAS_INTERPRET") == "1"
    y = _partitioned_pallas_call(act, float(negative_slope), interpret)(
        x2d, inv, shift)
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
    # interpret mode also UNLOCKS the Pallas path off-TPU, so the CPU test
    # mesh can exercise the exact serving dispatch (kernel + partitioning)
    import os

    interpret = os.environ.get("JCKX_PALLAS_INTERPRET") == "1"
    if (
        _USE_PALLAS
        and (jax.default_backend() == "tpu" or interpret)
        and x.shape[-1] % 128 == 0
        and (x.size // x.shape[-1]) % 8 == 0
    ):
        return _bn_act_pallas(x, scale, bias, act, negative_slope, eps)
    return _bn_act_xla(x, scale, bias, act, negative_slope, eps)
