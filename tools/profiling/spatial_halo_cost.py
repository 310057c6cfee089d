"""Spatial-partitioning halo-exchange cost analysis (no multi-chip needed).

The trainer's ``--model_axis_mode spatial`` shards activation HEIGHT over
the mesh's ``model`` axis; GSPMD inserts halo exchanges (collective-permute
of the conv boundary rows) between the shards. With one chip attached this
machine cannot TIME the exchanges — but XLA's compiled program for the
virtual mesh states exactly what they are: this tool compiles the REAL
fused DCGAN step spatially sharded on an N-way virtual CPU mesh, walks the
optimized HLO, and reports every cross-shard communication op with its
payload bytes, next to the step's total HBM byte budget and the v5e ICI
bandwidth — i.e. whether halo traffic could ever bind on real hardware.

Methodology note: shapes in the optimized HLO are PER-PARTITION (SPMD), so
payload bytes are per-chip per-op; "bytes_total" multiplies by op count
only (each chip sends/receives its own boundary rows concurrently over
ICI). CPU-backend HLO uses the same SPMD partitioner as TPU — the op
inventory is the design's, the backend only changes the leaf kernels.

Usage (repo root, no TPU required):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/profiling/spatial_halo_cost.py [--image_size 128]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))  # repo root

# v5e ICI: ~4 links/chip at ~50 GB/s effective each direction (public specs
# quote 400 Gbps/link); use a conservative single-link figure for the bound
ICI_BYTES_PER_S = 45e9

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8}


def _shape_bytes(shape_str: str) -> int:
    """'bf16[32,8,128,256]{...}' → payload bytes (0 for tuples/tokens)."""
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


def analyze(image_size: int, batch_size: int, n_devices: int,
            spatial_ways: int, constrain_fake: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    jax.config.update("jax_platforms", "cpu")
    from jckx.configs import Config
    from jckx.models import dcgan
    from jckx.models.dcgan import GANGeometry
    from jckx.parallel import MODEL_AXIS, make_mesh
    from jckx.train.state import GANTrainState, make_optimizer
    from jckx.train.steps import make_dcgan_train_step
    from jckx.data.pipeline import decode_batch

    mesh = make_mesh(shape=(n_devices // spatial_ways, spatial_ways),
                     axes=("data", MODEL_AXIS))
    cfg = Config()
    cfg.image_size = image_size
    cfg.batch_size = batch_size
    cfg.compute_dtype = "bfloat16"
    geo = GANGeometry(z_dim=cfg.z_dim, image_size=image_size,
                      channels=cfg.channels, base_width=cfg.base_width)
    params_g = dcgan.generator_init(jax.random.PRNGKey(0), geo)
    params_d = dcgan.discriminator_init(jax.random.PRNGKey(1), geo)
    tx = make_optimizer(cfg)
    state = GANTrainState(
        params_g=params_g, params_d=params_d, opt_g=tx.init(params_g),
        opt_d=tx.init(params_d), step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(2), ema_g=None)

    spatial_spec = NamedSharding(mesh, P("data", MODEL_AXIS, None, None))
    repl = NamedSharding(mesh, P())
    fc = ((lambda x: jax.lax.with_sharding_constraint(x, spatial_spec))
          if constrain_fake else None)
    base = make_dcgan_train_step(cfg, geo, fake_constraint=fc)

    def step(s, u8):
        real = decode_batch(u8, image_size, jnp.bfloat16)
        real = jax.lax.with_sharding_constraint(real, spatial_spec)
        return base(s, real)

    u8 = np.zeros((batch_size, image_size, image_size, 3), np.uint8)
    jitted = jax.jit(step, in_shardings=(repl, NamedSharding(mesh, P("data"))),
                     out_shardings=(repl, repl))
    compiled = jitted.lower(state, u8).compile()
    ca = compiled.cost_analysis() or {}
    hlo = compiled.as_text()

    # cross-shard communication inventory of the optimized SPMD module
    comm = {}
    for line in hlo.splitlines():
        m = re.search(r"=\s*(\S+)\s+(collective-permute|all-reduce|all-gather"
                      r"|reduce-scatter|all-to-all)\(", line)
        if not m:
            continue
        shape_str, op = m.groups()
        kind = comm.setdefault(op, {"count": 0, "bytes_total": 0})
        kind["count"] += 1
        # tuple shapes: sum the element payloads
        parts = re.findall(r"[a-z0-9]+\[[\d,]*\]", shape_str)
        kind["bytes_total"] += sum(_shape_bytes(p) for p in parts)

    halo = comm.get("collective-permute", {"count": 0, "bytes_total": 0})
    total_bytes = float(ca.get("bytes accessed", 0.0))
    report = {
        "geometry": f"{image_size}x{image_size} bs{batch_size}",
        "constrain_fake": bool(constrain_fake),
        "mesh": {"data": n_devices // spatial_ways, "model": spatial_ways,
                 "mode": "spatial"},
        "step_flops": float(ca.get("flops", 0.0)),
        "step_bytes_accessed_per_chip": total_bytes,
        "cross_shard_ops": comm,
        "halo_bytes_per_chip_per_step": halo["bytes_total"],
        "halo_vs_hbm_traffic": (round(halo["bytes_total"] / total_bytes, 5)
                                if total_bytes else None),
        "halo_ici_floor_us": round(1e6 * halo["bytes_total"] / ICI_BYTES_PER_S, 2),
        "note": ("per-partition shapes: bytes are per-chip; ICI floor assumes "
                 "one conservative 45 GB/s link, exchanges not overlapped"),
    }
    return report


def main():
    p = argparse.ArgumentParser(description="spatial halo cost analysis")
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--spatial_ways", type=int, default=2)
    p.add_argument("--constrain_fake", type=int, default=0,
                   help="1 = also pin G's output to the spatial layout "
                        "(the trainer's setting)")
    a = p.parse_args()
    os.environ.setdefault(
        "XLA_FLAGS", f"--xla_force_host_platform_device_count={a.devices}")
    print(json.dumps(analyze(a.image_size, a.batch_size, a.devices,
                             a.spatial_ways, bool(a.constrain_fake)),
                     indent=1))


if __name__ == "__main__":
    main()
