"""Training state — one pytree holding both adversaries.

The reference scatters state across two nn.Modules + two torch Adam
optimizers + python loop counters (train/dcgan_trainer.py:46-62,130-148).
Here it is a single immutable pytree: {params_g, params_d, opt_g, opt_d,
step, rng}; the fused train step maps state → state with buffers donated, so
the whole update lives on device with zero host round-trips.

Optimizer: optax.adam(lr, b1=0.5, b2=0.999, eps=1e-8) — identical math to
torch.optim.Adam as configured at dcgan_trainer.py:61-62 (incl. bias
correction); lr comes from ``max_learning_rate`` exactly as the reference
wires it.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct

from jckx.configs import Config
from jckx.models import cgan, dcgan
from jckx.models.dcgan import GANGeometry


@struct.dataclass
class GANTrainState:
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any
    step: jax.Array
    rng: jax.Array
    # exponential moving average of G (jckx extension beyond the reference;
    # enabled with Config.ema_decay > 0 — standard GAN practice that lowers
    # eval FID). None when disabled.
    ema_g: Any = None


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam, optionally under a cosine learning-rate schedule.

    ``cfg.lr_schedule == "constant"`` (default) is the reference behavior:
    Adam at ``max_learning_rate`` for the whole run (dcgan_trainer.py:61-62 —
    the reference parses ``-milr`` but never reads it).

    ``"cosine"`` (opt-in fix of that dead flag, PARITY.md) decays the
    EFFECTIVE lr from ``max_learning_rate`` to ``min_learning_rate`` over
    ``cfg.lr_decay_steps`` steps (the GAN trainers auto-fill it with the
    run's total step count when 0). Implementation scales Adam's update by
    a factor computed from the optimizer state's own step count, so the
    opt-state PYTREE STRUCTURE IS IDENTICAL to the constant case —
    checkpoints stay interchangeable across schedules (a resumed cosine run
    continues its decay from the checkpointed count), and serving/convert
    templates need no schedule awareness.
    """
    base = optax.adam(cfg.max_learning_rate, b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=1e-8)
    schedule = getattr(cfg, "lr_schedule", "constant")
    if schedule == "constant":
        return base
    if schedule != "cosine":
        raise ValueError(f"lr_schedule={schedule!r}: expected 'constant' or 'cosine'")
    if cfg.max_learning_rate <= 0:
        raise ValueError("lr_schedule=cosine needs max_learning_rate > 0")
    total = int(getattr(cfg, "lr_decay_steps", 0))
    if total <= 0:
        raise ValueError(
            "lr_schedule=cosine needs lr_decay_steps > 0 (the trainers "
            "auto-fill it with epochs x steps_per_epoch; set it explicitly "
            "when building the optimizer outside a trainer)")
    # factor(count): 1.0 at step 0 -> alpha at step >= total (optax clamps)
    factor = optax.cosine_decay_schedule(
        init_value=1.0, decay_steps=total,
        alpha=cfg.min_learning_rate / cfg.max_learning_rate)

    def update(grads, state, params=None):
        # pre-increment count == the 0-based index of the step being applied;
        # optax.adam == chain(scale_by_adam, scale_by_learning_rate) so the
        # count lives at state[0] (pinned by tests/test_train_step.py)
        f = factor(state[0].count)
        updates, new_state = base.update(grads, state, params)
        return jax.tree_util.tree_map(lambda u: f * u, updates), new_state

    return optax.GradientTransformation(base.init, update)


def geometry(cfg: Config) -> GANGeometry:
    return GANGeometry(z_dim=cfg.z_dim, image_size=cfg.image_size,
                       channels=cfg.channels, base_width=cfg.base_width)


def create_dcgan_state(cfg: Config, key: jax.Array) -> GANTrainState:
    import jax.numpy as jnp

    geo = geometry(cfg)
    kg, kd, krun = jax.random.split(key, 3)
    params_g = dcgan.generator_init(kg, geo)
    params_d = dcgan.discriminator_init(kd, geo)
    tx = make_optimizer(cfg)
    return GANTrainState(
        params_g=params_g,
        params_d=params_d,
        opt_g=tx.init(params_g),
        opt_d=tx.init(params_d),
        step=jnp.zeros((), jnp.int32),
        rng=krun,
    )


def make_template_state(
    geo: GANGeometry,
    conditional: bool = False,
    num_classes: int = 100,
    with_ema: bool = False,
    lr: float = 2e-4,
) -> GANTrainState:
    """Structure-only state for checkpoint restoration (values are seeded
    inits; flax from_bytes replaces them). Shared by serving and tools so
    the state layout lives in ONE place."""
    import jax.numpy as jnp

    cfg = Config()
    cfg.max_learning_rate = lr
    tx = make_optimizer(cfg)
    if conditional:
        pg = cgan.cgenerator_init(jax.random.PRNGKey(0), geo, num_classes)
        pd = cgan.cdiscriminator_init(jax.random.PRNGKey(1), geo, num_classes)
    else:
        pg = dcgan.generator_init(jax.random.PRNGKey(0), geo)
        pd = dcgan.discriminator_init(jax.random.PRNGKey(1), geo)
    return GANTrainState(
        params_g=pg, params_d=pd, opt_g=tx.init(pg), opt_d=tx.init(pd),
        step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0),
        ema_g=jax.tree_util.tree_map(jnp.copy, pg) if with_ema else None,
    )


def create_cgan_state(cfg: Config, key: jax.Array) -> GANTrainState:
    import jax.numpy as jnp

    geo = geometry(cfg)
    kg, kd, krun = jax.random.split(key, 3)
    params_g = cgan.cgenerator_init(kg, geo, cfg.num_classes)
    params_d = cgan.cdiscriminator_init(kd, geo, cfg.num_classes)
    tx = make_optimizer(cfg)
    return GANTrainState(
        params_g=params_g,
        params_d=params_d,
        opt_g=tx.init(params_g),
        opt_d=tx.init(params_d),
        step=jnp.zeros((), jnp.int32),
        rng=krun,
    )
