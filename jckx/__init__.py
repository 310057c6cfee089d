"""jckx — TPU-native adversarial image generation framework.

A from-scratch JAX / XLA / pjit / Pallas rebuild of the capabilities of
``hy-vision-learning/jck-generation`` (DCGAN / CGAN training on CIFAR-class
datasets at 64x64 with Inception-based FID / IS / intra-FID evaluation),
re-designed TPU-first:

- models are pure-functional pytrees (NHWC, bfloat16 compute on the MXU),
- the alternating G/D adversarial update (label smoothing, instance noise,
  WGAN-GP gradient penalty) runs as ONE fused jitted step with zero mid-step
  host syncs,
- data-parallel scaling is a `jax.sharding.Mesh` + sharded-batch jit: XLA
  inserts the gradient/batch-stat collectives over ICI,
- the evaluation stack (InceptionV3 features, FID via on-device Newton-Schulz
  matrix square root, Inception Score, per-superclass intra-FID) runs on
  device,
- hot elementwise chains (BatchNorm + activation, instance-noise blending)
  are fused Pallas TPU kernels.

Public surface mirrors the reference (preprocessors / trainers / metrics /
logger / CLI flags / run-dir layout); see SURVEY.md for the capability map.
"""

__version__ = "0.1.0"

from jckx.enums import ModelEnum  # noqa: F401
from jckx.rng import RANDOMSEED  # noqa: F401
from jckx.utils.cache import enable_compilation_cache as _enable_cache

_enable_cache()  # persistent XLA cache; opt out with JCKX_NO_COMPILE_CACHE=1


def __getattr__(name):
    """Lazy top-level API (keeps `import jckx` light; heavyweight modules —
    trainers, metrics, serving — load on first touch)."""
    lazy = {
        "Config": ("jckx.configs", "Config"),
        "get_arg_parse": ("jckx.configs", "get_arg_parse"),
        "DCGANTrainer": ("jckx.train.gan_trainer", "DCGANTrainer"),
        "CGANTrainer": ("jckx.train.gan_trainer", "CGANTrainer"),
        "DCGANDataPreprocessor": ("jckx.data.pipeline", "DCGANDataPreprocessor"),
        "CGANDataPreprocessor": ("jckx.data.pipeline", "CGANDataPreprocessor"),
        "Metrics": ("jckx.metrics.metrics", "Metrics"),
        "GeneratorService": ("jckx.serve", "GeneratorService"),
        "MainLogger": ("jckx.logging.main_logger", "MainLogger"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'jckx' has no attribute {name!r}")
