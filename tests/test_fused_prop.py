"""FusedProp step (cfg.fused_prop=1, arXiv:2004.03335): the shared fake-side
forward must produce EXACTLY the gradients its semantics promise — D's full
loss at the pre-update params, G's loss through the PRE-update D with the
same noisy blend (and, for CGAN, the same k_df dropout mask). Pinned here by
recomputing both players' updates explicitly and comparing trees."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from jckx.configs import Config
from jckx.models import cgan, dcgan
from jckx.models.dcgan import GANGeometry
from jckx.ops.losses import (bce_from_logits, gradient_penalty,
                             instance_noise_blend)
from jckx.train.state import GANTrainState, make_optimizer
from jckx.train.steps import (jit_train_step, make_cgan_train_step,
                              make_dcgan_train_step)

TINY = dict(image_size=16, compute_dtype="float32", batch_size=8,
            max_learning_rate=2e-4, num_classes=10, fused_prop=1)


def tiny_cfg(**kw):
    cfg = Config()
    for k, v in {**TINY, **kw}.items():
        setattr(cfg, k, v)
    return cfg


def _geo(cfg):
    return GANGeometry(z_dim=cfg.z_dim, image_size=cfg.image_size,
                       channels=cfg.channels, base_width=8)


def _assert_trees_close(a, b, tol=1e-5):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=tol, atol=tol)


def test_dcgan_fused_prop_matches_explicit_semantics():
    cfg = tiny_cfg()
    geo = _geo(cfg)
    tx = make_optimizer(cfg)
    pg = dcgan.generator_init(jax.random.PRNGKey(1), geo)
    pd = dcgan.discriminator_init(jax.random.PRNGKey(2), geo)
    state = GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                          opt_d=tx.init(pd), step=jnp.zeros((), jnp.int32),
                          rng=jax.random.PRNGKey(7))
    real = jax.random.uniform(jax.random.PRNGKey(3), (8, 16, 16, 3),
                              minval=-1, maxval=1)

    step = jit_train_step(make_dcgan_train_step(cfg, geo), donate_state=False)
    new_state, m = step(state, real)

    # ---- explicit reference computation (same key derivation as the step)
    cd = jnp.float32
    f, lam = cfg.instance_noise, cfg.lambda_gp
    k = jax.random.fold_in(state.rng, state.step)
    k_real, k_z, k_fake, k_alpha = jax.random.split(k, 4)
    real_n = instance_noise_blend(k_real, real.astype(cd), f)
    z = jax.random.normal(k_z, (8, geo.z_dim), jnp.float32)
    fake_noise = jax.random.normal(k_fake, real.shape, jnp.float32).astype(cd)

    def G(p, zz):
        return dcgan.generator_apply(p, zz, geo, cd)

    def D(p, x):
        return dcgan.discriminator_apply(p, x, geo, cd)

    fake_n = (1.0 - f) * G(pg, z) + f * fake_noise

    def d_loss(params_d):  # FULL D loss at the PRE-update params
        bce = (bce_from_logits(D(params_d, real_n), cfg.label_real)
               + bce_from_logits(D(params_d, fake_n), cfg.label_fake))
        gp = gradient_penalty(lambda x: jax.nn.sigmoid(D(params_d, x)),
                              k_alpha, real_n, fake_n)
        return bce + (lam * gp if cfg.gp_in_d_grad else 0.0)

    def g_loss(params_g):  # through the PRE-update D
        fk_n = (1.0 - f) * G(params_g, z) + f * fake_noise
        return bce_from_logits(D(pd, fk_n), cfg.label_real)

    grads_d = jax.grad(d_loss)(pd)
    grads_g = jax.grad(g_loss)(pg)
    upd_d, _ = tx.update(grads_d, state.opt_d, pd)
    upd_g, _ = tx.update(grads_g, state.opt_g, pg)
    _assert_trees_close(new_state.params_d, optax.apply_updates(pd, upd_d))
    _assert_trees_close(new_state.params_g, optax.apply_updates(pg, upd_g))
    # one shared forward: the two reported D(G(z)) stats coincide
    assert float(m["d_gz1"]) == float(m["d_gz2"])
    assert np.isfinite(float(m["loss_d"])) and np.isfinite(float(m["loss_g"]))


def test_cgan_fused_prop_matches_explicit_semantics():
    cfg = tiny_cfg()
    geo = _geo(cfg)
    tx = make_optimizer(cfg)
    ncls = cfg.num_classes
    pg = cgan.cgenerator_init(jax.random.PRNGKey(1), geo, ncls)
    pd = cgan.cdiscriminator_init(jax.random.PRNGKey(2), geo, ncls)
    state = GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                          opt_d=tx.init(pd), step=jnp.zeros((), jnp.int32),
                          rng=jax.random.PRNGKey(7))
    real = jax.random.uniform(jax.random.PRNGKey(3), (8, 16, 16, 3),
                              minval=-1, maxval=1)
    labels = jax.nn.one_hot(jnp.arange(8) % ncls, ncls)

    step = jit_train_step(make_cgan_train_step(cfg, geo), donate_state=False)
    new_state, m = step(state, real, labels)

    cd = jnp.float32
    f, lam = cfg.instance_noise, cfg.lambda_gp
    k = jax.random.fold_in(state.rng, state.step)
    k_real, k_z, k_fake, k_alpha, k_dr, k_df, k_di, _ = jax.random.split(k, 8)
    lab = labels.astype(jnp.float32)
    real_n = instance_noise_blend(k_real, real.astype(cd), f)
    z = jax.random.normal(k_z, (8, geo.z_dim), jnp.float32)
    fake_noise = jax.random.normal(k_fake, real.shape, jnp.float32).astype(cd)

    def G(p, zz):
        return cgan.cgenerator_apply(p, zz, lab, geo, cd)

    def D(p, x, dk):
        return cgan.cdiscriminator_apply(p, x, lab, geo, cd, dropout_key=dk)

    fake_n = (1.0 - f) * G(pg, z) + f * fake_noise

    def d_loss(params_d):
        bce = (bce_from_logits(D(params_d, real_n, k_dr), cfg.label_real)
               + bce_from_logits(D(params_d, fake_n, k_df), cfg.label_fake))
        gp = gradient_penalty(
            lambda x: jax.nn.sigmoid(D(params_d, x, k_di)),
            k_alpha, real_n, fake_n)
        return bce + lam * gp  # CGAN backprops GP (cgan_trainer.py:201-203)

    def g_loss(params_g):  # PRE-update D, SAME k_df dropout mask
        fk_n = (1.0 - f) * G(params_g, z) + f * fake_noise
        return bce_from_logits(D(pd, fk_n, k_df), cfg.label_real)

    upd_d, _ = tx.update(jax.grad(d_loss)(pd), state.opt_d, pd)
    upd_g, _ = tx.update(jax.grad(g_loss)(pg), state.opt_g, pg)
    # 3e-4: the fused-vjp composition and the explicit jax.grad reassociate
    # float sums differently, and Adam's eps-rescale amplifies near-zero
    # grads (observed: 1/70656 D elements off by 3e-5 at rtol 1e-5)
    _assert_trees_close(new_state.params_d, optax.apply_updates(pd, upd_d),
                        tol=3e-4)
    _assert_trees_close(new_state.params_g, optax.apply_updates(pg, upd_g),
                        tol=3e-4)
    assert float(m["d_gz1"]) == float(m["d_gz2"])


def test_fused_prop_trainer_smoke_and_sharding(tmp_path):
    """--fused_prop reaches the trainer's step; 8-way data sharding stays
    numerically identical to a single device (the shared-vjp structure must
    not break the global-mean collectives)."""
    cfg = tiny_cfg()
    geo = _geo(cfg)
    tx = make_optimizer(cfg)
    pg = dcgan.generator_init(jax.random.PRNGKey(1), geo)
    pd = dcgan.discriminator_init(jax.random.PRNGKey(2), geo)

    def fresh():
        return GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                             opt_d=tx.init(pd), step=jnp.zeros((), jnp.int32),
                             rng=jax.random.PRNGKey(7))

    real = jax.random.uniform(jax.random.PRNGKey(3), (8, 16, 16, 3),
                              minval=-1, maxval=1)
    from jckx.parallel import make_mesh

    step1 = jit_train_step(make_dcgan_train_step(cfg, geo), donate_state=False)
    s1, m1 = step1(fresh(), real)
    mesh = make_mesh((8,), ("data",))
    step8 = jit_train_step(make_dcgan_train_step(cfg, geo), mesh=mesh,
                           donate_state=False)
    s8, m8 = step8(fresh(), real)
    np.testing.assert_allclose(float(m1["loss_d"]), float(m8["loss_d"]),
                               rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params_g),
                    jax.tree_util.tree_leaves(s8.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_fused_prop_reaches_trainer_via_cli_config(tmp_path):
    """--fused_prop 1 flows get_arg_parse -> Config -> trainer step: a tiny
    end-to-end run trains finite and moves params."""
    from jckx.configs import get_arg_parse
    from jckx.data.pipeline import DCGANDataPreprocessor
    from jckx.logging.main_logger import MainLogger
    from jckx.rng import KeyChain, seed_everything
    from jckx.train.gan_trainer import DCGANTrainer
    from tests.test_trainer import StubMetrics

    MainLogger.reset()
    cfg = get_arg_parse([
        "-m", "DCGAN", "--dataset", "synthetic", "--synthetic_size", "64",
        "-b", "16", "-e", "1", "--image_size", "16", "--base_width", "8",
        "--eval_every", "2", "--log_every", "2", "-mlr", "0.0002",
        "--compute_dtype", "float32", "--fused_prop", "1",
        "--save_root", str(tmp_path),
    ])
    assert cfg.fused_prop == 1
    keys = KeyChain(seed_everything(cfg.seed))
    geo = GANGeometry(z_dim=cfg.z_dim, image_size=16, channels=3, base_width=8)
    pre = DCGANDataPreprocessor(cfg)
    pre.transform_data()
    pg = dcgan.generator_init(keys.next(), geo)
    pd = dcgan.discriminator_init(keys.next(), geo)
    # host copy: the trainer's donated superstep deletes the init buffers
    pg0 = jax.tree_util.tree_map(np.asarray, pg)
    tr = DCGANTrainer(cfg, pg, pd, pre, metrics=StubMetrics())
    last = tr.train()
    assert np.isfinite(last["loss_d"]) and np.isfinite(last["loss_g"])
    assert max(float(np.abs(np.asarray(x) - y).max()) for x, y in
               zip(jax.tree_util.tree_leaves(tr.state.params_g),
                   jax.tree_util.tree_leaves(pg0))) > 0
    MainLogger.reset()


def test_fused_prop_composes_with_remat():
    """remat=both wraps the same G/D the fused-vjp structure reuses — the
    composition must compile and run finite."""
    cfg = tiny_cfg(remat="both")
    geo = _geo(cfg)
    tx = make_optimizer(cfg)
    pg = dcgan.generator_init(jax.random.PRNGKey(1), geo)
    pd = dcgan.discriminator_init(jax.random.PRNGKey(2), geo)
    state = GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                          opt_d=tx.init(pd), step=jnp.zeros((), jnp.int32),
                          rng=jax.random.PRNGKey(7))
    real = jax.random.uniform(jax.random.PRNGKey(3), (8, 16, 16, 3),
                              minval=-1, maxval=1)
    step = jit_train_step(make_dcgan_train_step(cfg, geo), donate_state=False)
    _, m = step(state, real)
    assert np.isfinite(float(m["loss_d"])) and np.isfinite(float(m["loss_g"]))
