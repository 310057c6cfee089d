"""Bulk host→device transfer.

On this TPU topology every device_put is a ~0.4 s round-trip through the
remote runtime tunnel, so materializing a pytree of ~500 small arrays
(InceptionV3 weights) leaf-by-leaf costs minutes. ``bulk_device_put`` packs
all leaves into ONE flat float32 buffer, ships it in a single transfer, and
unpacks with one jitted slice/reshape program on device.

Non-float32 leaves are transferred individually (rare path).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _unpack_fn(spec: tuple):
    """spec: tuple of (offset, size, shape) per leaf."""

    @jax.jit
    def unpack(flat):
        return [
            jax.lax.dynamic_slice_in_dim(flat, off, size).reshape(shape)
            for off, size, shape in spec
        ]

    return unpack


def bulk_device_put(tree: Any, device=None) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    f32 = [
        (i, np.asarray(l, np.float32))
        for i, l in enumerate(leaves)
        if np.asarray(l).dtype == np.float32
    ]
    out: list = list(leaves)
    if f32:
        offsets, bufs, spec = [], [], []
        off = 0
        for _, arr in f32:
            bufs.append(arr.ravel())
            spec.append((off, arr.size, tuple(arr.shape)))
            off += arr.size
        flat = jnp.asarray(np.concatenate(bufs))  # ONE transfer
        if device is not None:
            flat = jax.device_put(flat, device)
        unpacked = _unpack_fn(tuple(spec))(flat)
        for (i, _), dev_arr in zip(f32, unpacked):
            out[i] = dev_arr
    for i, l in enumerate(out):
        if not isinstance(l, jax.Array):
            out[i] = jnp.asarray(l)
    return jax.tree_util.tree_unflatten(treedef, out)
