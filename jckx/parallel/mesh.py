"""Device mesh + sharding utilities.

The reference has NO distributed code — it picks one device
(``utils.py:4-8``) and leaves vestigial ``gpu_rank``/``parallel`` hooks
(``logger/main_logger.py:23,61-68``). jckx makes scaling first-class the
TPU way: a ``jax.sharding.Mesh`` over all chips, batches sharded on the
``data`` axis, parameters replicated (with an optional ``model`` axis kept
plumbed for tensor sharding of wide layers). The fused train step is jitted
over the mesh; XLA inserts the gradient / batch-stat all-reduces over ICI —
no hand-written collectives in the data path.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code runs across hosts (mesh is built from ``jax.devices()``).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def parse_mesh_shape(spec: str):
    """'4,2' → (4, 2); '' → None. The one parser for every CLI mesh flag."""
    return tuple(int(v) for v in str(spec).split(",")) if spec else None


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axes: Sequence[str] = (DATA_AXIS,),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh. Default: all visible devices on one ``data`` axis.

    ``shape=(4, 2), axes=('data', 'model')`` gives a 2-D mesh for combined
    data/tensor parallelism.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
        axes = tuple(axes[:1]) or (DATA_AXIS,)
    total = int(np.prod(shape))
    if total != len(devices):
        if total > len(devices):
            raise ValueError(f"mesh shape {tuple(shape)} needs {total} devices, have {len(devices)}")
        devices = devices[:total]
    dev_array = np.array(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, ndim: int = 4, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding for a batch-major array: leading dim split on the data axis."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of host arrays on the mesh, batch-sharded on 'data'."""
    def put(x):
        return jax.device_put(x, batch_sharding(mesh, ndim=x.ndim))

    return jax.tree_util.tree_map(put, tree)


def local_batch_size(global_batch: int, mesh: Mesh, axis: str = DATA_AXIS) -> int:
    n = mesh.shape[axis]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by data-axis size {n}")
    return global_batch // n


def spatial_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard an NHWC activation on its HEIGHT dimension.

    The TPU answer to scaling image RESOLUTION (SURVEY.md §5: the reference's
    scaling axes are batch and resolution; attention-style sequence
    parallelism has no analog in a conv GAN). GSPMD spatially partitions the
    convolutions and inserts the halo exchanges over ICI; correctness vs the
    unsharded layout is tested in tests/test_tensor_parallel.py. Apply via
    ``jax.lax.with_sharding_constraint(x, spatial_sharding(mesh, axis))``;
    pass ``axis=MODEL_AXIS`` on a 2-D mesh to spatially shard H while the
    batch stays on 'data' (combine by hand with
    ``NamedSharding(mesh, P('data', 'model', None, None))`` for N+H)."""
    return NamedSharding(mesh, P(None, axis, None, None))


def put_global(arr, sharding: NamedSharding):
    """Place a host-global array on a (possibly multi-process) mesh.

    jckx's multi-host contract (SURVEY §2 comm backend; the reference's
    vestigial ``gpu_rank``/``parallel`` hooks made real): every process
    holds the SAME host-global value — identical dataset files, identical
    seeded permutations, identical init keys — so each process materializes
    only its addressable shards and the per-process pieces assemble into one
    global ``jax.Array``. Single-process this is a plain ``device_put``
    (identical behavior and cost to before); multi-process it is the feed
    path that ``jax.device_put`` of a host array cannot provide (it would
    need every shard addressable)."""
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def put_global_tree(tree, shardings):
    """``put_global`` over a pytree. ``shardings`` is either one sharding
    applied to every leaf or a matching pytree of shardings (e.g. the
    ``tp_state_sharding`` tree). Single-process this is ONE ``device_put``
    call over the whole tree (batched dispatch — per-leaf puts would cost a
    ~0.4 s round-trip each through the remote TPU runtime)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)
    if isinstance(shardings, jax.sharding.Sharding):
        return jax.tree_util.tree_map(lambda x: put_global(x, shardings), tree)
    return jax.tree_util.tree_map(put_global, tree, shardings)


@functools.lru_cache(maxsize=64)
def _reshard_identity(sharding):
    """One jitted identity PER sharding (jit's own cache then handles input
    shapes). Building a fresh ``jax.jit`` per reshard() call re-traced the
    identity on every invocation — and reshard sits on per-eval hot paths
    (Metrics device-resident extraction, the trainer's TP param gather),
    where a remote re-lower costs 10-300 s (ADVICE r4)."""
    return jax.jit(lambda t: t, out_shardings=sharding)


def reshard(tree, sharding):
    """Reshard device-resident (global) arrays to ``sharding``.

    Single-process: ``jax.device_put`` (a no-op when already placed).
    Multi-process: a jitted identity with ``out_shardings`` — every process
    participates in the XLA resharding program (an ICI collective when data
    actually moves), which is the supported way to move GLOBAL arrays whose
    shards are not all process-addressable. The jitted identity is cached
    per sharding (module-level LRU) so repeated evals reuse one executable."""
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return _reshard_identity(sharding)(tree)


def tp_state_sharding(state, mesh: Mesh, axis: str = MODEL_AXIS, min_dim: int = 128):
    """Tensor-parallel sharding tree for a GANTrainState (or any pytree of
    conv-net params + mirrored optimizer moments).

    Layout rule: 4-D conv kernels shard on OUTPUT channels over the
    ``model`` axis; 1-D channel vectors (BN scale/bias and their moments)
    shard on the same axis — so each model-shard owns a contiguous slice of
    every layer's filters. GSPMD propagates the activation shardings and
    inserts the all-gathers/reduce-scatters between layers; numerics are
    tested identical to the replicated layout (tests/test_tensor_parallel).

    Small/indivisible leaves (z-projection, 3-channel output conv, scalars)
    stay replicated via ``min_dim``.
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no '{axis}' axis: {mesh.axis_names}")
    n = mesh.shape[axis]

    def spec_of(x):
        shape = getattr(x, "shape", ())
        if len(shape) == 4 and shape[-1] >= min_dim and shape[-1] % n == 0:
            return NamedSharding(mesh, P(None, None, None, axis))
        if len(shape) == 1 and shape[0] >= min_dim and shape[0] % n == 0:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_of, state)
