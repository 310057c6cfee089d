"""Tensor parallelism: a 2-D (data=4, model=2) mesh with conv kernels
sharded on output channels must train numerically identically to the
replicated layout (GSPMD inserts the layer collectives)."""

import numpy as np
import jax
import jax.numpy as jnp

from jckx.configs import Config
from jckx.models import dcgan
from jckx.models.dcgan import GANGeometry
from jckx.parallel import make_mesh, tp_state_sharding, MODEL_AXIS
from jckx.train.state import GANTrainState, make_optimizer
from jckx.train.steps import jit_train_step, make_dcgan_train_step


def _cfg():
    cfg = Config()
    cfg.image_size = 16
    cfg.base_width = 16  # widths 32/16 → model-axis-2 divisible
    cfg.compute_dtype = "float32"
    cfg.max_learning_rate = 2e-4
    return cfg


def _fresh(cfg, geo):
    tx = make_optimizer(cfg)
    pg = dcgan.generator_init(jax.random.PRNGKey(1), geo)
    pd = dcgan.discriminator_init(jax.random.PRNGKey(2), geo)
    return GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                         opt_d=tx.init(pd), step=jnp.zeros((), jnp.int32),
                         rng=jax.random.PRNGKey(7))


def test_tp_sharding_rules():
    mesh = make_mesh(shape=(4, 2), axes=("data", MODEL_AXIS))
    cfg = _cfg()
    geo = GANGeometry(image_size=16, base_width=128)  # widths 256/128
    st = _fresh(cfg, geo)
    sh = tp_state_sharding(st, mesh, min_dim=128)
    # big conv kernel sharded on Cout over 'model'
    spec = sh.params_g["convt0"].spec
    assert spec == jax.sharding.PartitionSpec(None, None, None, MODEL_AXIS)
    # 3-channel output conv stays replicated
    assert sh.params_g["convt_out"].spec == jax.sharding.PartitionSpec()
    # optimizer moments mirror the param sharding
    assert sh.opt_g[0].mu["convt0"].spec == spec
    # scalars replicated
    assert sh.step.spec == jax.sharding.PartitionSpec()


def test_spatial_sharding_conv_matches_unsharded():
    """H-axis spatial partitioning of a strided conv (GSPMD halo exchange)
    must reproduce the single-device result — the resolution-scaling axis."""
    from jckx.ops.conv import conv2d
    from jckx.parallel import spatial_sharding

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 8, 16)) * 0.1
    ref = np.asarray(conv2d(x, w, stride=2, padding=1))

    mesh = make_mesh(shape=(8,), axes=("data",))
    sh = spatial_sharding(mesh, axis="data")

    @jax.jit
    def f(x, w):
        x = jax.lax.with_sharding_constraint(x, sh)
        return conv2d(x, w, stride=2, padding=1)

    out = np.asarray(f(x, w))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_tp_step_matches_replicated():
    cfg = _cfg()
    geo = GANGeometry(image_size=16, base_width=16)
    real = jax.random.uniform(jax.random.PRNGKey(3), (8, 16, 16, 3), minval=-1, maxval=1)

    # replicated 1-D data-parallel reference
    mesh1 = make_mesh(shape=(8,), axes=("data",))
    step1 = jit_train_step(make_dcgan_train_step(cfg, geo), mesh=mesh1, donate_state=False)
    s1, m1 = step1(_fresh(cfg, geo), real)

    # 2-D mesh, conv kernels sharded over 'model' (min_dim=16 so the tiny
    # test widths actually shard)
    mesh2 = make_mesh(shape=(4, 2), axes=("data", MODEL_AXIS))
    st2 = _fresh(cfg, geo)
    sh = tp_state_sharding(st2, mesh2, min_dim=16)
    step2 = jit_train_step(make_dcgan_train_step(cfg, geo), mesh=mesh2,
                           donate_state=False, state_sharding=sh)
    st2 = jax.device_put(st2, sh)
    s2, m2 = step2(st2, real)

    assert abs(float(m1["loss_d"]) - float(m2["loss_d"])) < 1e-4
    assert abs(float(m1["loss_g"]) - float(m2["loss_g"])) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(s1.params_g),
                    jax.tree_util.tree_leaves(s2.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
