"""Optimized-HLO inspection helpers: cross-shard collective inventory.

Shared by the capacity planner (``jckx.plan``) and the profiling tools
(``tools/profiling/spatial_halo_cost.py``). Parsing notes that took a
round to learn (r5):

- Shapes in a post-SPMD module are PER-PARTITION; payload bytes are
  per-chip per-op.
- TPU modules spell collectives ASYNC (``all-gather-start`` +
  ``-done``) and the ``-start`` result is a tuple whose text contains
  SPACES (``(bf16[..]{..}, bf16[..]{..})``) — a ``\\S+`` shape regex
  silently misses every one of them. Count the ``-start`` (payload =
  the LARGEST tuple element, the out-buffer; summing would double-count
  the aliased input buffer) and skip the ``-done``.
- Sync fused all-reduces are tuples of N SEPARATE buffers — there the
  sum is correct.
"""

from __future__ import annotations

import re

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8}

_COMM_RE = re.compile(
    r"\s(collective-permute|all-reduce|all-gather|reduce-scatter"
    r"|all-to-all)(-start|-done)?\(")
_SHAPE_RE = re.compile(r"[a-z0-9]+\[[\d,]*\]")


def shape_bytes(shape_str: str) -> int:
    """'bf16[32,8,128,256]{...}' → payload bytes (0 for tokens/opaque)."""
    m = re.match(r"([a-z0-9]+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    if dt not in _DTYPE_BYTES:
        return 0
    size = 1
    for d in dims.split(","):
        if d:
            size *= int(d)
    return size * _DTYPE_BYTES[dt]


def comm_inventory(hlo: str) -> dict:
    """op → {count, bytes_total, by_dtype} over an optimized SPMD module."""
    comm: dict = {}
    for line in hlo.splitlines():
        m = _COMM_RE.search(line)
        if not m or "=" not in line[: m.start()]:
            continue
        op = m.group(1)
        if m.group(2) == "-done":  # one entry per async transfer, at -start
            continue
        kind = comm.setdefault(op, {"count": 0, "bytes_total": 0,
                                    "by_dtype": {}})
        kind["count"] += 1
        parts = _SHAPE_RE.findall(line[: m.start()])
        if m.group(2) == "-start":
            nbytes = max((shape_bytes(p) for p in parts), default=0)
            parts = sorted(parts, key=shape_bytes, reverse=True)[:1]
        else:
            nbytes = sum(shape_bytes(p) for p in parts)
        kind["bytes_total"] += nbytes
        dt = re.match(r"([a-z0-9]+)\[", parts[0]).group(1) if parts else "?"
        d = kind["by_dtype"].setdefault(dt, {"count": 0, "bytes": 0})
        d["count"] += 1
        d["bytes"] += nbytes
    return comm
