"""Standalone checkpoint evaluation: FID / IS / intra-FID outside training.

The reference computes metrics only INSIDE its training loop
(train/dcgan_trainer.py:198-226, train/cgan_trainer.py:200-270) — there is
no way to score an existing checkpoint. jckx exposes the trainers' exact
eval protocol as a CLI over any checkpoint, including an imported reference
torch ``.pt``:

    python -m jckx.evaluate --ckpt save/dcgan/<ts>/latest.ckpt --dataset cifar100
    python -m jckx.evaluate --ckpt path/to/5000_0.1000_88.4000.pt

Protocol identical to the in-training eval (gan_trainer._fixed_eval_inputs
/ _evaluate): seeded z = fold_in(PRNGKey(seed), 999); ``--sample_count``
unconditional samples rendered in ONE batch (DCGAN trainer protocol) or
the class-major 10×num_classes grid in 500-image chunks (CGAN trainer
protocol — batching is part of the function under batch-stat BN); jitted
with the Pallas inference path the trainers' samplers trace; ONE backbone
pass feeds IS + FID (+ intra-FID). So a checkpoint scored here reproduces
the numbers its training run logged at the same step (same backbone, same
seed, same batching → the same samples).

Prints one JSON line: {"step", "n", "is", "fid"[, "intra_fid"]}; ``--kid 1``
/ ``--prdc 1`` append the beyond-reference metrics (kid, kid_std /
precision, recall, density, coverage — metrics/extra.py) computed from the
same single extraction.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp


def get_args(argv=None):
    p = argparse.ArgumentParser(description="jckx checkpoint evaluation")
    p.add_argument("--ckpt", required=True,
                   help="checkpoint (.ckpt, or a reference torch .pt)")
    p.add_argument("--dataset", default="cifar100",
                   help="real-side dataset (cifar100/cifar10/mnist/synthetic, "
                        "or npz/folder with --data_path)")
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--data_path", default="",
                   help="custom real-side data: the .npz file (npz) or image "
                        "directory (folder)")
    p.add_argument("--synthetic_size", type=int, default=None)
    p.add_argument("--sample_count", type=int, default=None,
                   help="unconditional sample count (default: trainer's "
                        "sample_count; conditional always 10/class)")
    p.add_argument("--eval_batch_size", type=int, default=None)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--seed", type=int, default=None,
                   help="eval-noise seed (default: the training seed, so the "
                        "samples match the run's own eval boundaries)")
    p.add_argument("--use_ema", action="store_true", default=None,
                   help="score the EMA generator (default: the sidecar's say)")
    # explicit overrides, forwarded to GeneratorService (rejected when they
    # contradict a .pt's inferred config)
    p.add_argument("--conditional", action="store_true", default=None)
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--channels", type=int, default=None)
    p.add_argument("--base_width", type=int, default=None)
    p.add_argument("--z_dim", type=int, default=None)
    p.add_argument("--kid", type=int, default=0,
                   help="1 = also report Kernel Inception Distance "
                        "(kid, kid_std — metrics/extra.py)")
    p.add_argument("--prdc", type=int, default=0,
                   help="1 = also report precision/recall/density/coverage "
                        "(k-NN manifolds — metrics/extra.py)")
    p.add_argument("--eval_fast_stem", type=int, default=0,
                   help="1 = space-to-depth InceptionV3 stem in the metric "
                        "forward — pass when rescoring a run trained with "
                        "--eval_fast_stem 1 (features differ at rounding "
                        "level; the real-feature cache is keyed separately)")
    p.add_argument("--quant", default="", choices=["", "int8"],
                   help="int8 = score the W8A8 quantized sampler instead of "
                        "the float one (ops/quant.py) — measures the serving "
                        "quantization's metric impact in FID/IS terms")
    p.add_argument("--truncation", type=float, default=0.0,
                   help="draw the eval z from N(0,1) truncated to [-t, t] — "
                        "scores what `jckx.serve --truncation t` actually "
                        "deploys (deviates from the trainer z protocol by "
                        "construction; 0 = off)")
    p.add_argument("--calib_seed", type=int, default=0,
                   help="int8 calibration seed — must match the serving "
                        "process's --seed (default 0 on both CLIs, so "
                        "default evaluate scores exactly what default serve "
                        "deploys). Deliberately decoupled from --seed, which "
                        "drives the eval-noise protocol")
    return p.parse_args(argv)


def evaluate(args, metrics=None):
    """→ result dict (the printed JSON line). ``metrics`` injects a
    prebuilt/stub engine (tests); default builds Metrics on the dataset."""
    from jckx.configs import Config
    from jckx.serve import GeneratorService

    trunc = float(getattr(args, "truncation", 0.0) or 0.0)
    if trunc < 0:
        # same contract as GeneratorService: silently scoring the
        # UNtruncated sampler for a knob serve refuses would break the
        # "--truncation scores what serve deploys" promise (review finding);
        # checked before the (slow) service + Metrics construction
        raise ValueError(f"truncation {trunc} must be >= 0 (0 = off)")
    overrides = {k: getattr(args, k)
                 for k in ("z_dim", "image_size", "channels", "base_width")
                 if getattr(args, k) is not None}
    svc = GeneratorService(
        args.ckpt, conditional=args.conditional, num_classes=args.num_classes,
        geo_overrides=overrides or None, use_ema=args.use_ema,
        batch_size=1,  # the render programs are for serving; never traced here
    )
    geo, conditional, ncls = svc.geo, svc.conditional, svc.num_classes
    cd = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    cfg = Config()
    cfg.log_file = 0  # a scoring CLI must not strew .log files around CWD
    cfg.eval_fast_stem = int(getattr(args, "eval_fast_stem", 0) or 0)
    cfg.dataset = args.dataset
    cfg.data_dir = args.data_dir
    cfg.data_path = getattr(args, "data_path", "")
    cfg.image_size = geo.image_size
    cfg.channels = geo.channels
    cfg.num_classes = ncls
    if args.synthetic_size is not None:
        cfg.synthetic_size = args.synthetic_size
    seed = cfg.seed if args.seed is None else args.seed
    # the real side must follow the seed too: the trainers derive BOTH the
    # eval-noise z and the dataset (synthetic plane: pixels are generated
    # from cfg.seed) from one config seed, so scoring a seeded run against
    # default-seed synthetic "real" pixels would shift FID while IS (fake-
    # only) matches — caught by the -t drive on a --seed 777 run
    cfg.seed = seed
    n_samples = (10 * ncls if conditional
                 else (args.sample_count or cfg.sample_count))

    if metrics is None:
        from jckx.data.pipeline import (CGANDataPreprocessor,
                                        DCGANDataPreprocessor)
        from jckx.metrics import Metrics

        pre = (CGANDataPreprocessor if conditional else DCGANDataPreprocessor)(cfg)
        pre.transform_data()
        if conditional and pre.num_classes != ncls:
            raise ValueError(
                f"checkpoint has {ncls} classes, dataset {args.dataset} has "
                f"{pre.num_classes}")
        from jckx.parallel import make_mesh

        metrics = Metrics(
            (pre.images_u8, pre.labels_np), cfg,
            batch_size=args.eval_batch_size or cfg.eval_batch_size,
            compute_dtype=cd, cache_dir=cfg.data_dir, num_classes=ncls,
            # extraction sharded over all attached chips (no-op on one)
            mesh=make_mesh(cfg.mesh_shape, cfg.mesh_axes))

    # the trainers' fixed eval inputs (gan_trainer._fixed_eval_inputs);
    # --truncation swaps the z law for the serving knob's truncated normal
    key = jax.random.fold_in(jax.random.PRNGKey(seed), 999)
    z = (jax.random.truncated_normal(key, -trunc, trunc,
                                     (n_samples, geo.z_dim))
         if trunc > 0 else jax.random.normal(key, (n_samples, geo.z_dim)))
    onehot = (jax.nn.one_hot(jnp.repeat(jnp.arange(ncls), 10), ncls)
              if conditional else None)

    # EXACT trainer generation protocol (batch-stat BN makes batching part
    # of the function): DCGAN renders all samples in ONE batch
    # (gan_trainer.py DCGANTrainer._evaluate), CGAN in 500-image chunks
    # (CGANTrainer._evaluate); both jitted with the Pallas inference path —
    # the same executable shape the trainers' samplers trace.
    from jckx.kernels.fused_bn_act import pallas_inference

    # --quant int8: score the SERVING sampler's quantized forward instead
    # of the float one — same z protocol/batching, so (score_float −
    # score_int8) isolates the quantization's metric impact. make_sampler
    # (ops/quant.py) is GeneratorService's own calibrate+quantize+dispatch
    # path — same key derivation, same probe distribution — so the pytree
    # scored here is bit-for-bit the one `jckx.serve --quant int8` serves
    # when both CLIs use matching (calibration) seeds, which the DEFAULTS
    # do: --calib_seed defaults to 0 = serve's --seed default. The
    # eval-noise seed (--seed, trainer protocol) stays independent — it
    # must NOT leak into calibration or matching serve would force
    # abandoning the trainer-matching z protocol.
    from jckx.ops.quant import make_sampler

    params_for_eval, sampler_apply = make_sampler(
        svc.params_g, geo, quant=getattr(args, "quant", "") or None,
        conditional=conditional, num_classes=ncls, compute_dtype=cd,
        seed=getattr(args, "calib_seed", 0))

    def apply_unc(pg, zz):
        return sampler_apply(pg, zz, None)

    def apply_cond(pg, zz, oh):
        return sampler_apply(pg, zz, oh)

    if conditional:
        sample = jax.jit(apply_cond)
        chunks = []
        with pallas_inference():
            for i in range(0, n_samples, 500):
                chunks.append(sample(params_for_eval, z[i:i + 500],
                                     onehot[i:i + 500]))
        fake = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
    else:
        sample = jax.jit(apply_unc)
        with pallas_inference():
            fake = sample(params_for_eval, z)

    feats = metrics.extract_features(fake)
    result = {
        "step": svc.step,
        "n": n_samples,
        **({"quant": "int8"} if getattr(args, "quant", "") == "int8" else {}),
        **({"truncation": trunc} if trunc > 0 else {}),
        "is": float(metrics.inception_score(logits=feats)),
        "fid": float(metrics.fid(features=feats)),
    }
    if conditional:
        result["intra_fid"] = float(metrics.intra_fid(features=feats))
    # beyond-reference metrics, same extraction (opt-in: they are not part
    # of the reference eval protocol, so default output stays drop-in)
    if getattr(args, "kid", 0):
        result["kid"], result["kid_std"] = metrics.kid(features=feats)
    if getattr(args, "prdc", 0):
        result.update(metrics.prdc(features=feats))
    return result


def main(argv=None):
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()
    print(json.dumps(evaluate(get_args(argv))))


if __name__ == "__main__":
    main()
