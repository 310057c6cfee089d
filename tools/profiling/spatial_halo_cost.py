"""Spatial-partitioning cross-shard traffic analysis (no multi-chip needed).

The trainer's ``--model_axis_mode spatial`` shards activation HEIGHT over
the mesh's ``model`` axis; GSPMD inserts the cross-shard communication
(halo collective-permutes, filter-grad reductions, layer-boundary
gathers). With one chip attached this machine cannot TIME the exchanges —
but XLA's compiled program states exactly what they are: this tool
compiles the REAL fused DCGAN step spatially sharded on an 8-way mesh,
walks the optimized HLO, and reports every cross-shard communication op
with its payload bytes, next to the step's total HBM byte budget and the
v5e ICI bandwidth — i.e. whether cross-shard traffic could ever bind on
real hardware.

Two lowering paths:

- ``--tpu_topology v5e:2x4`` (DEFAULT): AOT-compiles against a detached
  TPU topology descriptor (``jax.experimental.topologies``) — the
  resulting module is the REAL v5e SPMD program, bf16 convs and all. This
  is the ground truth: no chips needed, just the TPU compiler.
- ``--tpu_topology ""``: the r4 virtual-CPU-mesh path. KNOWN ARTIFACT
  (r5 finding): the CPU backend legalizes every bf16 convolution to f32
  (converts hoisted above the collectives), so the CPU module shows f32
  activation all-gathers at every D scale that DO NOT EXIST in the TPU
  program — the TPU module gathers bf16, only at the smallest spatial
  scale, and syncs filter grads by all-reduce instead. r4's "inherent
  f32 all-gathers" conclusion came from this artifact; keep the CPU path
  only for comparing partitioner behavior across backends.

Methodology note: shapes in the optimized HLO are PER-PARTITION (SPMD), so
payload bytes are per-chip per-op; "bytes_total" multiplies by op count
only (each chip sends/receives its own boundary rows concurrently over
ICI).

Usage (repo root, no TPU attached — the topology path needs only the
compiler):
    python tools/profiling/spatial_halo_cost.py [--image_size 128]
    python tools/profiling/spatial_halo_cost.py --image_size 256 --batch_size 32
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

# shared with the jckx.plan capacity planner — one parser, one set of
# HLO-text traps (async -start tuples, per-partition shapes)
from jckx.utils.hlo import comm_inventory as _comm_inventory  # noqa: E402
from jckx.utils.hlo import shape_bytes as _shape_bytes  # noqa: E402, F401


def _build_step(image_size: int, batch_size: int, mesh, constrain_fake: bool,
                shapes_only: bool, replicate_grads: bool = False,
                mode: str = "spatial"):
    """The trainer's model-axis step (``mode``: "spatial" shards activation
    height, "tp" shards params/moments on output channels via
    ``tp_state_sharding`` — the same layouts gan_trainer._build_jits
    wires), jitted over ``mesh``; returns (jitted, example_args) where args
    are ShapeDtypeStructs when ``shapes_only`` (the AOT-topology path
    cannot materialize arrays)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jckx.configs import Config
    from jckx.data.pipeline import decode_batch
    from jckx.models import dcgan
    from jckx.models.dcgan import GANGeometry
    from jckx.parallel import MODEL_AXIS
    from jckx.train.state import GANTrainState, make_optimizer
    from jckx.train.steps import make_dcgan_train_step

    cfg = Config()
    cfg.image_size = image_size
    cfg.batch_size = batch_size
    cfg.compute_dtype = "bfloat16"
    geo = GANGeometry(z_dim=cfg.z_dim, image_size=image_size,
                      channels=cfg.channels, base_width=cfg.base_width)

    def make_state():
        pg = dcgan.generator_init(jax.random.PRNGKey(0), geo)
        pd = dcgan.discriminator_init(jax.random.PRNGKey(1), geo)
        tx = make_optimizer(cfg)
        return GANTrainState(
            params_g=pg, params_d=pd, opt_g=tx.init(pg), opt_d=tx.init(pd),
            step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(2),
            ema_g=None)

    spatial_spec = NamedSharding(mesh, P("data", MODEL_AXIS, None, None))
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    fc = ((lambda x: jax.lax.with_sharding_constraint(x, spatial_spec))
          if constrain_fake else None)
    gc = ((lambda tree: jax.tree_util.tree_map(
        lambda g: jax.lax.with_sharding_constraint(g, repl), tree))
        if replicate_grads and mode == "spatial" else None)
    base = make_dcgan_train_step(cfg, geo, fake_constraint=fc,
                                 grad_constraint=gc)

    state_shape = jax.eval_shape(make_state)
    if mode == "tp":
        from jckx.parallel import tp_state_sharding

        st_sh = tp_state_sharding(state_shape, mesh, min_dim=cfg.tp_min_dim)
    else:
        st_sh = repl

    def step(s, u8):
        real = decode_batch(u8, image_size, jnp.bfloat16)
        if mode == "spatial":
            real = jax.lax.with_sharding_constraint(real, spatial_spec)
        return base(s, real)

    if shapes_only:
        state = jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            state_shape,
            st_sh if mode == "tp" else jax.tree_util.tree_map(
                lambda _: repl, state_shape))
        u8 = jax.ShapeDtypeStruct(
            (batch_size, image_size, image_size, 3), np.uint8,
            sharding=batch_sh)
        jitted = jax.jit(step, out_shardings=(st_sh, repl))
    else:
        state = make_state()
        u8 = np.zeros((batch_size, image_size, image_size, 3), np.uint8)
        jitted = jax.jit(step, in_shardings=(st_sh, batch_sh),
                         out_shardings=(st_sh, repl))
    return jitted, (state, u8)


def analyze(image_size: int, batch_size: int, n_devices: int,
            spatial_ways: int, constrain_fake: bool = False,
            tpu_topology: str = "v5e:2x4", replicate_grads: bool = False,
            mode: str = "spatial"):
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from jckx.parallel import MODEL_AXIS, make_mesh

    if tpu_topology:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name=tpu_topology)
        if len(topo.devices) != n_devices:
            raise SystemExit(f"topology {tpu_topology} has "
                             f"{len(topo.devices)} devices, not {n_devices}")
        mesh = Mesh(np.array(topo.devices).reshape(
            n_devices // spatial_ways, spatial_ways), ("data", MODEL_AXIS))
        backend = f"tpu-aot:{tpu_topology}"
    else:
        jax.config.update("jax_platforms", "cpu")
        mesh = make_mesh(shape=(n_devices // spatial_ways, spatial_ways),
                         axes=("data", MODEL_AXIS))
        backend = "cpu-virtual (KNOWN f32-conv legalization artifact)"

    jitted, args = _build_step(image_size, batch_size, mesh, constrain_fake,
                               shapes_only=bool(tpu_topology),
                               replicate_grads=replicate_grads, mode=mode)
    compiled = jitted.lower(*args).compile()
    ca = compiled.cost_analysis() or {}
    comm = _comm_inventory(compiled.as_text())

    halo = comm.get("collective-permute", {"count": 0, "bytes_total": 0})
    cross = sum(k["bytes_total"] for k in comm.values())
    total_bytes = float(ca.get("bytes accessed", 0.0))
    report = {
        "geometry": f"{image_size}x{image_size} bs{batch_size}",
        "backend": backend,
        "constrain_fake": bool(constrain_fake),
        "replicate_grads": bool(replicate_grads),
        "mesh": {"data": n_devices // spatial_ways, "model": spatial_ways,
                 "mode": mode},
        "step_flops": float(ca.get("flops", 0.0)),
        "step_bytes_accessed_per_chip": total_bytes,
        "cross_shard_ops": comm,
        "cross_shard_bytes_per_chip_per_step": cross,
        "halo_bytes_per_chip_per_step": halo["bytes_total"],
        "halo_vs_hbm_traffic": (round(halo["bytes_total"] / total_bytes, 5)
                                if total_bytes else None),
        "cross_shard_vs_hbm_traffic": (round(cross / total_bytes, 5)
                                       if total_bytes else None),
        "cross_shard_ici_floor_us": round(1e6 * cross / ICI_BYTES_PER_S, 2),
        "halo_ici_floor_us": round(1e6 * halo["bytes_total"] / ICI_BYTES_PER_S, 2),
        "note": ("per-partition shapes: bytes are per-chip; ICI floor assumes "
                 "one conservative 45 GB/s link, exchanges not overlapped"),
    }
    return report


def main():
    p = argparse.ArgumentParser(description="spatial cross-shard cost analysis")
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--spatial_ways", type=int, default=2)
    p.add_argument("--constrain_fake", type=int, default=0,
                   help="1 = also pin G's output to the spatial layout "
                        "(the trainer's setting)")
    p.add_argument("--mode", default="spatial", choices=["spatial", "tp"],
                   help="model-axis strategy to analyze (same layouts the "
                        "trainer wires)")
    p.add_argument("--replicate_grads", type=int, default=0,
                   help="1 = constrain G/D grads replicated after jax.grad "
                        "(kills the sharded-f32-Adam all-gather path)")
    p.add_argument("--tpu_topology", default="v5e:2x4",
                   help="detached TPU topology to AOT-compile against "
                        "(ground truth); '' = r4's virtual-CPU-mesh path "
                        "(known f32-conv legalization artifact)")
    a = p.parse_args()
    if not a.tpu_topology:
        os.environ.setdefault(
            "XLA_FLAGS", f"--xla_force_host_platform_device_count={a.devices}")
    print(json.dumps(analyze(a.image_size, a.batch_size, a.devices,
                             a.spatial_ways, bool(a.constrain_fake),
                             a.tpu_topology, bool(a.replicate_grads),
                             a.mode),
                     indent=1))


if __name__ == "__main__":
    main()
