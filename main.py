"""jckx entry point — CLI-compatible with reference ``main.py``.

Flow parity (main.py:64-96): parse flags → run dir ``save/<model>/<ts>`` →
singleton logger → preprocessor → models → trainer → ``trainer.train()``.
Seeding: one root PRNGKey(12345) (reference seeds every RNG globally,
main.py:31-37). The always-on anomaly detector (main.py:28) maps to the
opt-in ``--sanitize`` flag (jax_debug_nans), which unlike torch's costs
nothing when off.

Usage examples:
    python main.py -m DCGAN -b 128 -e 100 --dataset cifar100
    python main.py -m CGAN --dataset synthetic -e 1 --eval_every 50
"""

from __future__ import annotations

import os
from datetime import datetime

import jax

from jckx.configs import Config, get_arg_parse
from jckx.data.pipeline import CGANDataPreprocessor, DCGANDataPreprocessor
from jckx.enums import ModelEnum
from jckx.logging.main_logger import MainLogger
from jckx.models import cgan, dcgan
from jckx.models.dcgan import GANGeometry
from jckx.rng import KeyChain, seed_everything
from jckx.train.gan_trainer import CGANTrainer, DCGANTrainer


def run_test_mode(cfg: Config, metrics=None):
    """``-t 1``: score ``save/<model>/<ts>/latest.ckpt`` via jckx.evaluate.

    Needs ``-pm`` (an existing run dir) — a fresh timestamped dir has no
    checkpoint to score. The eval-noise seed IS forwarded (``--seed
    cfg.seed``): the trainers derive their eval z from the same config
    seed, so scoring with the seed the run trained under reproduces its
    logged eval numbers exactly (verified bit-identical on synthetic
    runs). ``metrics`` is a test seam (StubMetrics); None builds the real
    Metrics engine.
    """
    if not cfg.model_path:
        raise SystemExit(
            "-t/--test needs -pm/--model_path (which run to score): "
            "e.g. python main.py -m DCGAN -pm 20260816_073320 -t 1")
    ckpt = os.path.join(cfg.save_path, "latest.ckpt")
    if not os.path.exists(ckpt):
        have = sorted(os.listdir(cfg.save_path)) if os.path.isdir(cfg.save_path) else []
        raise SystemExit(
            f"-t/--test: no latest.ckpt under {cfg.save_path} "
            f"(dir contains: {have or 'nothing'})")
    from jckx.evaluate import evaluate, get_args

    argv = ["--ckpt", ckpt, "--dataset", cfg.dataset,
            "--data_dir", cfg.data_dir,
            "--seed", str(cfg.seed),
            "--compute_dtype", cfg.compute_dtype]
    if cfg.synthetic_size:
        argv += ["--synthetic_size", str(cfg.synthetic_size)]
    if cfg.data_path:
        argv += ["--data_path", cfg.data_path]
    if cfg.eval_fast_stem:
        # a fast-stem run logs FID from the space-to-depth backbone forward;
        # rescoring through the standard stem would drift from its logged
        # numbers (review finding)
        argv += ["--eval_fast_stem", "1"]
    if cfg.extra_metrics:
        argv += ["--kid", "1", "--prdc", "1"]
    result = evaluate(get_args(argv), metrics=metrics)
    import json

    print(json.dumps(result))  # same one-JSON-line contract as jckx.evaluate
    return result


def main(cfg: Config):
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()
    if cfg.multihost:
        # multi-host SPMD bring-up; fails fast when coordinator env is
        # present but init fails, degrades to a warning on a lone host (see
        # jckx.utils.device.init_multihost — exercised by
        # tests/test_multihost.py with 2 real processes)
        from jckx.utils.device import init_multihost

        ok, err = init_multihost()
        if not ok:
            MainLogger(cfg).warning(f"--multihost requested but not in a cluster: {err}")
    if cfg.sanitize:
        jax.config.update("jax_debug_nans", True)

    if cfg.test and not cfg.model_path:
        # fail BEFORE creating a run dir: -t without -pm would otherwise
        # litter save/ with an abandoned timestamped dir per mistake
        raise SystemExit(
            "-t/--test needs -pm/--model_path (which run to score): "
            "e.g. python main.py -m DCGAN -pm 20260816_073320 -t 1")
    datetime_now = cfg.model_path or datetime.now().strftime("%Y%m%d_%H%M%S")
    cfg.save_path = os.path.join(cfg.save_root, str(cfg.model).lower(), datetime_now)
    if cfg.test and not os.path.exists(os.path.join(cfg.save_path, "latest.ckpt")):
        # same fail-BEFORE-creating-a-run-dir rule for a mistyped -pm: the
        # makedirs + logger below would otherwise litter save/ with an
        # empty-but-logged dir per typo before run_test_mode's own check
        have = (sorted(os.listdir(cfg.save_path))
                if os.path.isdir(cfg.save_path) else [])
        raise SystemExit(
            f"-t/--test: no latest.ckpt under {cfg.save_path} "
            f"(dir contains: {have or 'nothing'})")
    os.makedirs(cfg.save_path, exist_ok=True)
    if not cfg.test and jax.process_index() == 0:
        # persist the RESOLVED config so --resume/-t can inherit it
        # (get_arg_parse._inherit_run_config): a resume that repeats only
        # --resume -pm <dir> gets the original lr/ema/dataset/geometry back
        # instead of silently reverting every forgotten flag to its default.
        # Atomic write: a SIGKILL mid-write must not leave a truncated json
        # that poisons the next resume.
        tmp = os.path.join(cfg.save_path, "config.json.tmp")
        with open(tmp, "w") as f:
            f.write(cfg.to_json())
        os.replace(tmp, os.path.join(cfg.save_path, "config.json"))

    logger = MainLogger(cfg)
    if getattr(cfg, "_inherited_from", None):
        logger.debug(f"config inherited from {cfg._inherited_from} "
                     f"(explicitly passed flags override)")
    logger.debug(f"config: {cfg.to_json()}")
    logger.debug(f"devices: {jax.devices()}  backend: {jax.default_backend()}")

    if cfg.test:
        # -t/--test: evaluation-only mode. The reference parses -t but never
        # reads it (main.py:43 — dead flag); jckx gives the opt-in flag its
        # evident meaning: score the run dir's latest checkpoint with the
        # trainers' exact eval protocol (jckx.evaluate) instead of training.
        # Faithful default (-t 0) trains exactly as before.
        return run_test_mode(cfg)

    logger.debug("init data preprocessing")

    keys = KeyChain(seed_everything(cfg.seed))
    geo = GANGeometry(z_dim=cfg.z_dim, image_size=cfg.image_size,
                      channels=cfg.channels, base_width=cfg.base_width)

    if cfg.profile_dir:
        jax.profiler.start_trace(cfg.profile_dir)

    if cfg.model == ModelEnum.DCGAN:
        data_pre = DCGANDataPreprocessor(cfg)
        data_pre.transform_data()
        params_g = dcgan.generator_init(keys.next(), geo)
        params_d = dcgan.discriminator_init(keys.next(), geo)
        trainer = DCGANTrainer(cfg, params_g, params_d, data_pre)
    elif cfg.model == ModelEnum.CGAN:
        data_pre = CGANDataPreprocessor(cfg)
        data_pre.transform_data()
        cfg.num_classes = data_pre.num_classes
        params_g = cgan.cgenerator_init(keys.next(), geo, data_pre.num_classes)
        params_d = cgan.cdiscriminator_init(keys.next(), geo, data_pre.num_classes)
        trainer = CGANTrainer(cfg, params_g, params_d, data_pre)
    else:  # pragma: no cover
        raise ValueError(f"unknown model {cfg.model}")

    result = trainer.train()

    if cfg.profile_dir:
        jax.profiler.stop_trace()
    if trainer.preempted:
        # conventional "terminated by SIGTERM" code so schedulers/wrappers
        # distinguish a preempted (resumable) run from a completed one
        raise SystemExit(143)
    return result


if __name__ == "__main__":
    main(get_arg_parse())
