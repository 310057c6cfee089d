"""Deployment capacity planner: compile the REAL training step for a
target TPU topology — no chips needed — and report what a pod would do.

The scaling workflow for TPU SPMD programs is: pick a mesh, annotate
shardings, let XLA insert the collectives, inspect, iterate. The
reference (single-GPU PyTorch) has no analog of the inspect step; jckx
makes it a first-class CLI. ``jax.experimental.topologies`` provides
detached device descriptions for which the TPU compiler can AOT-compile
the exact program a pod would run (args are ``ShapeDtypeStruct``s — no
arrays are materialized, nothing executes), and the compiled executable
reports its own cost model, per-chip memory, and cross-shard collective
inventory.

    python -m jckx.plan -m DCGAN --image_size 128 -b 64 \\
        --mesh_shape 4,2 --mesh_axes data,model --model_axis_mode spatial
    python -m jckx.plan --topology v5e:2x4 -m CGAN --dataset cifar100
    python -m jckx.plan --topology "" --devices 8   # virtual-CPU fallback

Prints ONE JSON report: per-step FLOPs and HBM bytes per chip, per-chip
memory (arguments / temporaries / peak vs the chip's HBM), every
cross-shard collective with payload bytes and dtypes, and the roofline
floors (MXU compute, HBM bandwidth, ICI) with a bound verdict — i.e.
whether the configured sharding is compute-, bandwidth-, or
interconnect-limited before you commit a pod to it.

Caveat the report states explicitly: the virtual-CPU fallback
(``--topology ""``) uses the CPU backend, which legalizes bf16
convolutions to f32 and may pick different GSPMD strategies — dtype and
strategy conclusions are only trustworthy from a real TPU topology
(measured r5: the CPU module showed f32 activation all-gathers that do
not exist in the v5e module).
"""

from __future__ import annotations

import argparse
import json
import sys

# v5e public specs; override per target via flags
V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9
V5E_ICI_BYTES_PER_S = 45e9  # one conservative link direction
V5E_HBM_BYTES = 16 * 1024**3


def _build(cfg, mesh, mode: str):
    """The trainer's exact one-step program (gan_trainer._build_jits
    layouts: TP state sharding / spatial activation constraint / plain DP),
    jitted over ``mesh`` with ShapeDtypeStruct args for AOT lowering."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jckx.data.pipeline import decode_batch
    from jckx.enums import ModelEnum
    from jckx.models import cgan, dcgan
    from jckx.models.dcgan import GANGeometry
    from jckx.parallel import MODEL_AXIS, tp_state_sharding
    from jckx.train.state import GANTrainState, make_optimizer
    from jckx.train.steps import make_cgan_train_step, make_dcgan_train_step

    conditional = cfg.model == ModelEnum.CGAN
    geo = GANGeometry(z_dim=cfg.z_dim, image_size=cfg.image_size,
                      channels=cfg.channels, base_width=cfg.base_width)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    spatial = (mode == "spatial" and MODEL_AXIS in mesh.axis_names
               and mesh.shape[MODEL_AXIS] > 1)
    tp = (mode == "tp" and MODEL_AXIS in mesh.axis_names
          and mesh.shape[MODEL_AXIS] > 1)

    def make_state():
        tx = make_optimizer(cfg)
        if conditional:
            pg = cgan.cgenerator_init(jax.random.PRNGKey(0), geo,
                                      cfg.num_classes)
            pd = cgan.cdiscriminator_init(jax.random.PRNGKey(1), geo,
                                          cfg.num_classes)
        else:
            pg = dcgan.generator_init(jax.random.PRNGKey(0), geo)
            pd = dcgan.discriminator_init(jax.random.PRNGKey(1), geo)
        ema = (jax.tree_util.tree_map(lambda x: x, pg)
               if cfg.ema_decay > 0 else None)
        return GANTrainState(
            params_g=pg, params_d=pd, opt_g=tx.init(pg), opt_d=tx.init(pd),
            step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(2),
            ema_g=ema)

    state_shape = jax.eval_shape(make_state)
    st_sh = (tp_state_sharding(state_shape, mesh, min_dim=cfg.tp_min_dim)
             if tp else jax.tree_util.tree_map(lambda _: repl, state_shape))

    spatial_spec = (NamedSharding(mesh, P("data", MODEL_AXIS, None, None))
                    if spatial else None)
    gc = None
    if spatial and getattr(cfg, "spatial_replicate_grads", 1):
        def gc(tree):  # the trainer's default grad-layout pin
            return jax.tree_util.tree_map(
                lambda g: jax.lax.with_sharding_constraint(g, repl), tree)
    if conditional:
        base = make_cgan_train_step(cfg, geo, grad_constraint=gc)
    else:
        base = make_dcgan_train_step(cfg, geo, grad_constraint=gc)

    def step(s, u8, lab):
        real = decode_batch(u8, cfg.image_size, jnp.bfloat16
                            if cfg.compute_dtype == "bfloat16"
                            else jnp.float32)
        if spatial:
            real = jax.lax.with_sharding_constraint(real, spatial_spec)
        if conditional:
            return base(s, real, jax.nn.one_hot(lab, cfg.num_classes))
        return base(s, real)

    state = jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        state_shape, st_sh)
    u8 = jax.ShapeDtypeStruct(
        (cfg.batch_size, cfg.image_size, cfg.image_size, cfg.channels),
        np.uint8, sharding=batch_sh)
    lab = jax.ShapeDtypeStruct((cfg.batch_size,), np.int32,
                               sharding=batch_sh)
    return jax.jit(step, out_shardings=(st_sh, repl)), (state, u8, lab)


def plan(argv=None) -> dict:
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()

    p = argparse.ArgumentParser(
        prog="jckx.plan",
        description="AOT capacity planner (unknown flags forward to the "
                    "training config: -m, -b, --image_size, --mesh_shape, "
                    "--model_axis_mode, ...)")
    p.add_argument("--topology", default="v5e:2x4",
                   help="detached TPU topology (jax.experimental."
                        "topologies name, e.g. v5e:2x4); '' = virtual CPU "
                        "devices (dtype/strategy caveat applies)")
    p.add_argument("--devices", type=int, default=8,
                   help="device count for --topology ''")
    p.add_argument("--peak_tflops", type=float, default=V5E_BF16_FLOPS / 1e12)
    p.add_argument("--hbm_gbps", type=float,
                   default=V5E_HBM_BYTES_PER_S / 1e9)
    p.add_argument("--ici_gbps", type=float,
                   default=V5E_ICI_BYTES_PER_S / 1e9)
    p.add_argument("--hbm_gib", type=float, default=V5E_HBM_BYTES / 1024**3)
    args, rest = p.parse_known_args(argv)

    from jckx.configs import get_arg_parse

    cfg = get_arg_parse(rest)

    import jax
    import numpy as np
    from jax.sharding import Mesh

    if args.topology:
        from jax.experimental import topologies

        devs = np.array(topologies.get_topology_desc(
            platform="tpu", topology_name=args.topology).devices)
        backend = f"tpu-aot:{args.topology}"
    else:
        jax.config.update("jax_platforms", "cpu")
        devs = np.array(jax.devices()[: args.devices])
        backend = ("cpu-virtual (CAVEAT: bf16 convs legalize to f32; "
                   "dtype/strategy conclusions need a TPU topology)")

    shape = cfg.mesh_shape or (len(devs),)
    axes = tuple(cfg.mesh_axes)[: len(shape)]
    if int(np.prod(shape)) != len(devs):
        raise SystemExit(f"--mesh_shape {shape} needs "
                         f"{int(np.prod(shape))} devices; topology has "
                         f"{len(devs)}")
    mesh = Mesh(devs.reshape(shape), axes)

    jitted, sds_args = _build(cfg, mesh, cfg.model_axis_mode)
    compiled = jitted.lower(*sds_args).compile()

    from jckx.utils.hlo import comm_inventory

    ca = compiled.cost_analysis() or {}
    comm = comm_inventory(compiled.as_text())
    try:
        ms = compiled.memory_analysis()
        mem = {"argument_mb": round(ms.argument_size_in_bytes / 2**20, 1),
               "output_mb": round(ms.output_size_in_bytes / 2**20, 1),
               "temp_mb": round(ms.temp_size_in_bytes / 2**20, 1),
               "peak_mb": round(ms.peak_memory_in_bytes / 2**20, 1),
               "hbm_mb": round(args.hbm_gib * 1024, 1),
               "fits": ms.peak_memory_in_bytes < args.hbm_gib * 1024**3}
    except Exception as e:  # noqa: BLE001 — backend-dependent
        mem = {"error": f"{type(e).__name__}: {e}"}

    flops = float(ca.get("flops", 0.0))
    hbm_bytes = float(ca.get("bytes accessed", 0.0))
    cross = sum(k["bytes_total"] for k in comm.values())
    floors_us = {
        "mxu_compute": round(1e6 * flops / (args.peak_tflops * 1e12), 1),
        "hbm_bandwidth": round(1e6 * hbm_bytes / (args.hbm_gbps * 1e9), 1),
        "ici_serialized": round(1e6 * cross / (args.ici_gbps * 1e9), 1),
    }
    bound = max(floors_us, key=floors_us.get)
    step_floor_s = max(floors_us.values()) / 1e6
    report = {
        "model": cfg.model.name,
        "geometry": f"{cfg.image_size}x{cfg.image_size} "
                    f"bs{cfg.batch_size} {cfg.compute_dtype}",
        "backend": backend,
        "mesh": {"shape": dict(mesh.shape),
                 "model_axis_mode": cfg.model_axis_mode},
        "per_chip": {
            "step_flops": flops,
            "step_hbm_bytes": hbm_bytes,
            "cross_shard_bytes": cross,
            "memory": mem,
        },
        "cross_shard_ops": comm,
        "step_floors_us": floors_us,
        "bound": bound,
        "max_steps_per_s": (round(1.0 / step_floor_s, 1)
                            if step_floor_s else None),
        "max_images_per_s_global": (round(cfg.batch_size / step_floor_s)
                                    if step_floor_s else None),
        "note": ("AOT cost model + optimized-HLO inventory; floors assume "
                 "no compute/comm overlap (real steps overlap, so these "
                 "are upper bounds on cost, lower bounds on throughput). "
                 "Per-partition shapes: bytes are per chip."),
    }
    return report


def main(argv=None) -> int:
    print(json.dumps(plan(argv), indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
