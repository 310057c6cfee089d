"""Configuration system.

The reference's config surface is 11 argparse flags (``main.py:40-61``) plus
hyper-parameters hard-coded inside the trainers (lambda_gp=10, Adam betas
(0.5, 0.999), label smoothing 0.9/0.1, instance-noise blend 0.9/0.1,
eval-every-500; ``train/dcgan_trainer.py:49,61-64,135-137,160,171,198``).

Here everything lives in one dataclass. The CLI mirrors the reference flag
names and defaults exactly (including the flags the reference parses but never
reads: ``-t``, ``-milr``, ``-wd``, ``-snt`` — kept for CLI parity), and the
previously hard-coded constants are promoted to config fields whose defaults
are the reference values.

TPU-specific knobs (mesh shape, compute dtype, donation, eval batch) are new;
they have no reference analog because the reference is single-GPU PyTorch.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass
from typing import Optional

from jckx.enums import ModelEnum
from jckx.rng import RANDOMSEED

# The reference's only published performance number: its InceptionV3
# fine-tune train loop at ≈2.92 it/s × batch 128 on an unnamed CUDA GPU
# (inceptionnet.ipynb cell 14, "391it [02:14, 2.92it/s]"). Single source
# for every bench's vs_baseline ratio.
REFERENCE_IMG_PER_SEC = 374.0

# TPU v5e single-chip peaks used by every roofline computation (bench_eval,
# tools/profiling/*) — one source so the floors can't silently diverge.
V5E_BF16_PEAK_FLOPS = 197e12   # bf16 MXU
V5E_INT8_PEAK_OPS = 394e12     # int8 MXU (2x bf16 — the --quant int8 ceiling)
V5E_HBM_BYTES_PER_S = 819e9    # HBM bandwidth


@dataclass
class Config:
    # --- reference CLI flags (names/defaults preserved, main.py:40-61) ---
    test: int = 0                      # -t   (dead in reference; jckx: 1 = eval-only mode, main.run_test_mode)
    model_path: str = ""               # -pm  run-dir name to reuse
    log_file: int = 1                  # -lf  write a log file
    model: ModelEnum = ModelEnum.DCGAN  # -m
    num_worker: int = 0                # -w   host-side loader workers
    batch_size: int = 128              # -b   GLOBAL batch size
    epoch: int = 100                   # -e
    max_learning_rate: float = 0.1     # -mlr (Adam lr, dcgan_trainer.py:61)
    min_learning_rate: float = 1e-4    # -milr (dead in reference; jckx: cosine floor under --lr_schedule)
    weight_decay: float = 5e-4         # -wd  (parsed-but-unused in reference)
    nesterov: int = 1                  # -snt (parsed-but-unused in reference)

    # --- promoted trainer constants (reference values as defaults) ---
    lambda_gp: float = 10.0            # dcgan_trainer.py:49
    adam_beta1: float = 0.5            # dcgan_trainer.py:61-62
    adam_beta2: float = 0.999
    label_real: float = 0.9            # dcgan_trainer.py:136
    label_fake: float = 0.1            # dcgan_trainer.py:137
    instance_noise: float = 0.1        # blend 0.9*x + 0.1*N(0,1), :160,171
    eval_every: int = 500              # dcgan_trainer.py:198
    log_every: int = 100               # dcgan_trainer.py:191
    # Learning-rate schedule for the GAN Adam optimizers. "constant" is the
    # reference behavior (-milr is parsed but never read, main.py:55); "cosine"
    # is the opt-in fix of that dead flag: effective lr decays
    # max_learning_rate -> min_learning_rate over lr_decay_steps steps
    # (0 = auto: the trainer fills in epochs x steps_per_epoch). The decay is
    # count-based inside the optimizer state, so checkpoints/resume and the
    # opt-state structure are identical to the constant case (train/state.py).
    lr_schedule: str = "constant"
    lr_decay_steps: int = 0
    # Faithful-vs-fixed quirk gate: the reference DCGAN trainer computes the
    # gradient penalty but never backprops it (dcgan_trainer.py:178-180 has no
    # backward on error_d); the CGAN trainer does (cgan_trainer.py:201-203).
    # Default: the fixed behavior (GP in D's gradient) for both; set False to
    # replicate the DCGAN quirk bit-for-bit.
    gp_in_d_grad: bool = True

    # --- model / data geometry ---
    base_width: int = 64               # channel width at the last G stage
    z_dim: int = 100                   # DCGAN.py:42 (latent 100)
    num_classes: int = 100             # CIFAR-100
    image_size: int = 64               # pipeline Resize(64)
    channels: int = 3
    # cifar100 | cifar10 | mnist | synthetic, plus the custom-data planes
    # npz (one .npz: x uint8 NHWC, optional y/names) and folder (directory of
    # images; class subdirs = labels, ImageFolder convention) — both read
    # --data_path and fail loudly instead of falling back to synthetic
    dataset: str = "cifar100"
    data_dir: str = "./data"
    data_path: str = ""                # the npz file / image dir for the custom planes
    # synthetic-fallback sample count (0 = 4096; 50000 reproduces the
    # CIFAR-scale workload shape for reference-protocol runs without data)
    synthetic_size: int = 0

    # --- seeding ---
    seed: int = RANDOMSEED

    # --- TPU-native knobs (no reference analog) ---
    mesh_shape: Optional[tuple] = None  # e.g. (8,) data-parallel; None = all devices on 'data'
    mesh_axes: tuple = ("data",)
    # role of the 'model' mesh axis when present: "tp" shards conv kernels /
    # BN vectors / optimizer moments on output channels (tensor parallelism);
    # "spatial" shards activation HEIGHT (resolution scaling for ≥128²
    # geometries — GSPMD inserts the conv halo exchanges over ICI)
    model_axis_mode: str = "tp"
    # leaves smaller than this stay replicated under TP (z-projection,
    # 3-channel output conv, scalars); lower it only for toy geometries
    tp_min_dim: int = 128
    # spatial mode only: constrain G/D grads replicated after jax.grad so
    # XLA all-reduces bf16 grads instead of all-gathering the f32 sharded
    # Adam outputs (r5 real-v5e AOT A/B: −40% cross-shard bytes/step at
    # 128²; identity semantics — a GSPMD layout hint, not an algorithm
    # change). 0 restores XLA's own strategy.
    spatial_replicate_grads: int = 1
    # data plane: "hbm" keeps the uint8 dataset device-resident (CIFAR-scale;
    # zero host work per step), "stream" gathers per-superstep slabs on host
    # (num_worker C++ gather threads) and uploads one transfer per launch,
    # "auto" picks stream when the dataset exceeds hbm_data_budget bytes
    data_placement: str = "auto"
    hbm_data_budget: int = 4 << 30
    compute_dtype: str = "bfloat16"    # matmul/conv compute dtype; params stay f32
    # rematerialization policy for the fused step: "none" | "g" | "d" |
    # "both". Measured on v5e: 64²/bs128 none=3.83 ms/step, g=4.08, d=5.05,
    # both=5.29; 128²/bs64 none=16.1, g=16.7, both=20.9; 256²/bs32
    # none=37.1, both=49.3 (cost model: remat adds ~10 GB/step of recompute
    # traffic while nothing spills at bs32 — both variants run at 1.00× of
    # their own HBM byte floor, so the smaller-byte program wins). "none"
    # is the default; the knob exists for batch/width combinations whose
    # residuals genuinely exceed HBM.
    remat: str = "none"
    # EMA of generator weights (0 = off, reference-parity default). When on,
    # eval/serving sample from the averaged generator — standard GAN practice
    # the reference lacks; typical values 0.999.
    ema_decay: float = 0.0
    # FusedProp (arXiv:2004.03335, PAPERS.md): share the fake-side D forward
    # between the D and G updates — one fewer G forward + D forward per step
    # (real HBM bytes; the step is byte-bound). OFF by default because it
    # changes the game's semantics vs the reference loop: G's gradient flows
    # through the PRE-update D (simultaneous update), d_gz2 == d_gz1 (one
    # shared forward), and CGAN's fake-side passes share a dropout mask.
    fused_prop: int = 0
    eval_batch_size: int = 256         # metric feature-extraction batch (bs*2 in ref)
    sample_count: int = 64             # fixed-noise eval grid (dcgan_trainer.py:143)
    metric_backbone: str = ""          # path to InceptionV3 checkpoint ('' = auto)
    sanitize: bool = False             # jax_debug_nans analog of set_detect_anomaly
    # abort on non-finite step telemetry (checked at launch boundaries where
    # the scalars are host-side anyway — zero extra device work)
    nan_guard: bool = True
    # graceful preemption: while train() runs, SIGTERM is caught and the run
    # checkpoints latest.ckpt at the next launch boundary, then returns —
    # --resume continues bit-identically. This is what Cloud TPU preemption
    # and most cluster schedulers send before the hard kill. The reference
    # has no analog (its resume was never implemented, dcgan_trainer.py:102-107).
    preempt_save: bool = True
    multihost: bool = False            # jax.distributed.initialize() before mesh
    profile_dir: str = ""              # jax.profiler trace dir ('' = off)
    save_root: str = "./save"
    resume: bool = False               # auto-resume from latest checkpoint
    # warm-start from a reference torch .pt (train/dcgan_trainer.py:86-91
    # format): params + Adam moments + step are imported, so training
    # continues where the reference's optimizer left off. --resume, when a
    # jckx latest.ckpt exists in the run dir, takes precedence.
    init_from_torch: str = ""
    # opt-in space-to-depth form of the InceptionV3 stem conv in the metric
    # backbone's EVAL forward (inception_v3._bconv_1a_s2d): same function,
    # rounding-level numeric drift, deeper MXU contraction. Default off —
    # metric absolutes must never shift silently.
    eval_fast_stem: int = 0
    # opt-in beyond-reference eval metrics at every eval boundary: KID
    # (mean+std) and precision/recall/density/coverage (metrics/extra.py),
    # computed from the SAME extraction as FID/IS and logged to
    # metrics.jsonl. They never drive best-metric checkpointing (that set
    # stays the reference's fid/is/intra_fid). Default off — the reference
    # protocol's scalar stream stays drop-in.
    extra_metrics: int = 0

    # populated by main()/trainers, mirrors reference args.save_path
    save_path: str = ""

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["model"] = str(self.model)
        d["mesh_shape"] = list(self.mesh_shape) if self.mesh_shape else None
        d["mesh_axes"] = list(self.mesh_axes)
        return json.dumps(d, indent=2)


_EXPLICIT_SENTINEL = object()


def _explicit_dests(parser: argparse.ArgumentParser, argv: list) -> set:
    """The dest names of options literally present on the command line.

    Used by ``--resume``/``-t`` config inheritance to decide which flags the
    user chose NOW (those win) vs which should come from the run's stored
    ``config.json``. Implemented by RE-PARSING argv with every action's
    default swapped for a sentinel, so argparse itself decides what the
    command line set — a token scan misses attached short-option spellings
    (``-e200``, ``-mCGAN``), which would let the stored config silently
    override an explicitly passed flag, the exact failure class this
    feature exists to prevent.
    """
    saved = [(a, a.default) for a in parser._actions]
    try:
        for a, _ in saved:
            a.default = _EXPLICIT_SENTINEL
        ns = parser.parse_args(argv)
    finally:
        for a, default in saved:
            a.default = default
    return {
        a.dest for a, _ in saved
        if a.dest != "help"
        and getattr(ns, a.dest, _EXPLICIT_SENTINEL) is not _EXPLICIT_SENTINEL
    }


# Control-plane fields a resumed/rescored run must take from ITS OWN command
# line, never from the stored config: mode selectors, run-dir addressing, and
# host-environment knobs that legitimately differ across machines/sessions.
_NO_INHERIT = {
    "test", "model_path", "resume", "save_root", "save_path", "log_file",
    "profile_dir", "multihost", "init_from_torch",
}


def _inherit_run_config(cfg: Config, explicit: set) -> Optional[str]:
    """``--resume``/``-t``: adopt the run's persisted ``config.json`` for
    every flag not explicitly given on this command line.

    Training semantics (lr, ema_decay, dataset size, geometry, seed, ...)
    silently reverting to defaults on resume is how a healthy run gets
    destroyed — observed live: a 100-epoch run resumed without ``-mlr``
    continued at the reference's default Adam lr=0.1 and collapsed within
    200 steps (FID 133 → 1747). The run dir is searched across family dirs
    so a forgotten ``-m`` inherits the right model too. Returns the path
    inherited from, or None when the dir has no config.json (pre-feature
    runs keep the old repeat-your-flags behavior).
    """
    import glob as _glob
    import os

    pattern = os.path.join(cfg.save_root, "*", cfg.model_path, "config.json")
    cand = sorted(_glob.glob(pattern))
    if len(cand) > 1:
        byfam = [c for c in cand
                 if os.path.basename(os.path.dirname(os.path.dirname(c)))
                 == str(cfg.model).lower()]
        if "model" in explicit and len(byfam) == 1:
            cand = byfam
        else:
            raise SystemExit(
                f"--resume/-t: run dir {cfg.model_path!r} exists under "
                f"multiple model families ({[c for c in cand]}); pass -m to "
                f"disambiguate")
    if not cand:
        return None
    path = cand[0]
    with open(path) as f:
        stored = json.load(f)
    stored_model = stored.get("model", str(cfg.model))
    if "model" in explicit and str(cfg.model) != stored_model:
        raise SystemExit(
            f"--resume/-t: {path} records model {stored_model} but "
            f"-m {cfg.model} was passed; drop -m to inherit or point at a "
            f"{cfg.model} run")
    for field in dataclasses.fields(Config):
        name = field.name
        if name in _NO_INHERIT or name in explicit or name not in stored:
            continue
        val = stored[name]
        if name == "model":
            val = ModelEnum(val)
        elif name == "mesh_shape":
            val = tuple(val) if val else None
        elif name == "mesh_axes":
            val = tuple(val)
        setattr(cfg, name, val)
    return path


def get_arg_parse(argv: Optional[list] = None) -> Config:
    """CLI mirroring reference ``main.py:40-61`` plus jckx extensions.

    With ``--resume`` or ``-t`` and an existing run dir that has a
    ``config.json`` (written by every train run), flags NOT given on this
    command line inherit the stored run config — see _inherit_run_config.
    """
    parser = argparse.ArgumentParser(
        description="jckx - TPU-native DCGAN/CGAN", allow_abbrev=False)
    d = Config()

    # reference flags (short/long names preserved)
    parser.add_argument("-t", "--test", type=int, default=d.test, help="test mode")
    parser.add_argument("-pm", "--model_path", type=str, default=d.model_path, help="run-dir name to reuse")
    parser.add_argument("-lf", "--log_file", type=int, default=d.log_file, help="write log file 0/1")
    parser.add_argument("-m", "--model", type=ModelEnum, choices=list(ModelEnum), default=d.model, help="model family")
    parser.add_argument("-w", "--num_worker", type=int, default=d.num_worker, help="loader workers")
    parser.add_argument("-b", "--batch_size", type=int, default=d.batch_size, help="global batch size")
    parser.add_argument("-e", "--epoch", type=int, default=d.epoch, help="epochs")
    parser.add_argument("-mlr", "--max_learning_rate", type=float, default=d.max_learning_rate, help="optimizer max lr")
    parser.add_argument("-milr", "--min_learning_rate", type=float, default=d.min_learning_rate, help="optimizer min lr")
    parser.add_argument("-wd", "--weight_decay", type=float, default=d.weight_decay, help="weight decay")
    parser.add_argument("-snt", "--nesterov", type=int, default=d.nesterov, help="nesterov sgd 0/1")

    # jckx extensions
    parser.add_argument("--dataset", type=str, default=d.dataset,
                        choices=["cifar100", "cifar10", "mnist", "synthetic",
                                 "npz", "folder"])
    parser.add_argument("--data_dir", type=str, default=d.data_dir)
    parser.add_argument("--data_path", type=str, default=d.data_path,
                        help="custom data: the .npz file (--dataset npz) or "
                             "image directory (--dataset folder)")
    parser.add_argument("--synthetic_size", type=int, default=d.synthetic_size)
    parser.add_argument("--seed", type=int, default=d.seed)
    parser.add_argument("--lambda_gp", type=float, default=d.lambda_gp)
    parser.add_argument("--eval_every", type=int, default=d.eval_every)
    parser.add_argument("--log_every", type=int, default=d.log_every)
    parser.add_argument("--sample_count", type=int, default=d.sample_count,
                        help="fixed-noise eval grid size (DCGAN; reference 64)")
    parser.add_argument("--eval_batch_size", type=int, default=d.eval_batch_size,
                        help="metric feature-extraction batch")
    parser.add_argument("--lr_schedule", type=str, default=d.lr_schedule,
                        choices=["constant", "cosine"],
                        help="cosine = decay lr from -mlr to -milr over the run "
                             "(gives the reference's dead -milr flag a meaning; "
                             "constant = faithful)")
    parser.add_argument("--lr_decay_steps", type=int, default=d.lr_decay_steps,
                        help="cosine horizon in steps (0 = auto: epochs x "
                             "steps/epoch AT LAUNCH — resuming with a raised "
                             "epoch budget re-derives a longer horizon, so "
                             "pass the original value explicitly to keep the "
                             "schedule identical across such resumes)")
    parser.add_argument("--compute_dtype", type=str, default=d.compute_dtype, choices=["bfloat16", "float32"])
    parser.add_argument("--gp_in_d_grad", type=int, default=int(d.gp_in_d_grad), help="1=fixed (GP in D grad), 0=faithful DCGAN quirk")
    parser.add_argument("--image_size", type=int, default=d.image_size)
    parser.add_argument("--base_width", type=int, default=d.base_width)
    parser.add_argument("--remat", type=str, default=d.remat, choices=["none", "g", "d", "both"])
    parser.add_argument("--ema_decay", type=float, default=d.ema_decay)
    parser.add_argument("--fused_prop", type=int, default=d.fused_prop,
                        help="1 = FusedProp step: shared fake-side D forward "
                             "(simultaneous G/D update; see configs.py)")
    parser.add_argument("--metric_backbone", type=str, default=d.metric_backbone)
    parser.add_argument("--sanitize", action="store_true", default=d.sanitize)
    parser.add_argument("--nan_guard", type=int, default=int(d.nan_guard),
                        help="1 = abort when step telemetry goes non-finite (free check)")
    parser.add_argument("--preempt_save", type=int, default=int(d.preempt_save),
                        help="1 = on SIGTERM, checkpoint at the next launch boundary and exit cleanly")
    parser.add_argument("--multihost", action="store_true", default=d.multihost)
    parser.add_argument("--profile_dir", type=str, default=d.profile_dir)
    parser.add_argument("--save_root", type=str, default=d.save_root)
    parser.add_argument("--resume", action="store_true", default=d.resume)
    parser.add_argument("--init_from_torch", type=str, default=d.init_from_torch,
                        help="warm-start from a reference torch .pt checkpoint")
    parser.add_argument("--eval_fast_stem", type=int, default=d.eval_fast_stem,
                        help="1 = space-to-depth InceptionV3 stem in the eval "
                             "forward (same function, rounding-level drift)")
    parser.add_argument("--extra_metrics", type=int, default=d.extra_metrics,
                        help="1 = also log KID + precision/recall/density/"
                             "coverage at every eval boundary (metrics.jsonl; "
                             "never drives best-metric checkpoints)")
    parser.add_argument("--mesh_shape", type=str, default="", help="comma ints, e.g. '8' or '4,2'")
    parser.add_argument("--mesh_axes", type=str, default=",".join(d.mesh_axes))
    parser.add_argument("--model_axis_mode", type=str, default=d.model_axis_mode,
                        choices=["tp", "spatial"],
                        help="what the 'model' mesh axis shards: conv output channels (tp) or activation height (spatial)")
    parser.add_argument("--tp_min_dim", type=int, default=d.tp_min_dim)
    parser.add_argument("--spatial_replicate_grads", type=int,
                        default=d.spatial_replicate_grads,
                        help="spatial mode: 1 pins grads replicated (kills "
                             "XLA's f32 sharded-Adam all-gathers, -40%% "
                             "cross-shard bytes at 128 sq); 0 = XLA's choice")
    parser.add_argument("--data_placement", type=str, default=d.data_placement,
                        choices=["auto", "hbm", "stream"])
    parser.add_argument("--hbm_data_budget", type=int, default=d.hbm_data_budget)

    ns = parser.parse_args(argv)
    import sys

    explicit = _explicit_dests(parser, sys.argv[1:] if argv is None else argv)
    cfg = Config(
        **{
            f.name: getattr(ns, f.name)
            for f in dataclasses.fields(Config)
            if hasattr(ns, f.name) and f.name not in ("mesh_shape", "mesh_axes", "gp_in_d_grad", "nan_guard", "preempt_save", "save_path")
        }
    )
    cfg.gp_in_d_grad = bool(ns.gp_in_d_grad)
    cfg.nan_guard = bool(ns.nan_guard)
    cfg.preempt_save = bool(ns.preempt_save)
    from jckx.parallel import parse_mesh_shape

    cfg.mesh_shape = parse_mesh_shape(ns.mesh_shape)
    cfg.mesh_axes = tuple(ns.mesh_axes.split(","))
    # resume/-t: non-explicit flags inherit the run's persisted config
    cfg._inherited_from = None
    if cfg.model_path and (cfg.resume or cfg.test):
        cfg._inherited_from = _inherit_run_config(cfg, explicit)
    # dataset-dependent geometry defaults
    if cfg.dataset == "cifar10":
        cfg.num_classes = 10
    elif cfg.dataset == "mnist":
        cfg.num_classes = 10
        cfg.channels = 1
    return cfg
