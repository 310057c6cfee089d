"""Integration tests for the fused G+D train steps (SURVEY.md §4: 1-step
train on tiny data, finite losses, params change, sharded == unsharded)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jckx.configs import Config
from jckx.models.dcgan import GANGeometry
from jckx.parallel import make_mesh
from jckx.train.state import create_dcgan_state
from jckx.train.steps import jit_train_step, make_cgan_train_step, make_dcgan_train_step

TINY = dict(image_size=16, compute_dtype="float32", batch_size=8,
            max_learning_rate=2e-4, num_classes=10)


def tiny_cfg(**kw):
    cfg = Config(**{})
    for k, v in {**TINY, **kw}.items():
        setattr(cfg, k, v)
    return cfg


def tiny_geo(cfg):
    return GANGeometry(z_dim=cfg.z_dim, image_size=cfg.image_size,
                       channels=cfg.channels, base_width=8)


def _leaf_delta(a, b):
    return max(
        float(jnp.abs(x - y).max())
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_dcgan_step_updates_and_finite():
    cfg = tiny_cfg()
    geo = tiny_geo(cfg)
    state = create_dcgan_state(cfg, jax.random.PRNGKey(0))
    # geometry override: rebuild params with tiny geo
    from jckx.models import dcgan
    from jckx.train.state import make_optimizer
    tx = make_optimizer(cfg)
    pg = dcgan.generator_init(jax.random.PRNGKey(1), geo)
    pd = dcgan.discriminator_init(jax.random.PRNGKey(2), geo)
    state = state.replace(params_g=pg, params_d=pd, opt_g=tx.init(pg), opt_d=tx.init(pd))

    step = jit_train_step(make_dcgan_train_step(cfg, geo), donate_state=False)
    real = jax.random.uniform(jax.random.PRNGKey(3), (8, 16, 16, 3), minval=-1, maxval=1)
    new_state, m = step(state, real)

    for k in ("loss_d", "loss_g", "gp", "d_x", "d_gz1", "d_gz2"):
        assert np.isfinite(float(m[k])), k
    # probabilities in (0,1)
    for k in ("d_x", "d_gz1", "d_gz2"):
        assert 0.0 < float(m[k]) < 1.0
    # both adversaries moved, step incremented
    assert _leaf_delta(new_state.params_g, pg) > 0
    assert _leaf_delta(new_state.params_d, pd) > 0
    assert int(new_state.step) == 1


def test_dcgan_step_deterministic():
    cfg = tiny_cfg()
    geo = tiny_geo(cfg)
    from jckx.models import dcgan
    from jckx.train.state import make_optimizer, GANTrainState
    tx = make_optimizer(cfg)
    pg = dcgan.generator_init(jax.random.PRNGKey(1), geo)
    pd = dcgan.discriminator_init(jax.random.PRNGKey(2), geo)

    def fresh():
        return GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                             opt_d=tx.init(pd), step=jnp.zeros((), jnp.int32),
                             rng=jax.random.PRNGKey(7))

    step = jit_train_step(make_dcgan_train_step(cfg, geo), donate_state=False)
    real = jax.random.uniform(jax.random.PRNGKey(3), (8, 16, 16, 3), minval=-1, maxval=1)
    s1, m1 = step(fresh(), real)
    s2, m2 = step(fresh(), real)
    assert float(m1["loss_d"]) == float(m2["loss_d"])
    assert _leaf_delta(s1.params_g, s2.params_g) == 0.0


def test_dcgan_gp_quirk_flag_changes_d_grads():
    geo_cfg = tiny_cfg()
    geo = tiny_geo(geo_cfg)
    from jckx.models import dcgan
    from jckx.train.state import make_optimizer, GANTrainState
    tx = make_optimizer(geo_cfg)
    pg = dcgan.generator_init(jax.random.PRNGKey(1), geo)
    pd = dcgan.discriminator_init(jax.random.PRNGKey(2), geo)

    def run(gp_in_grad):
        cfg = tiny_cfg(gp_in_d_grad=gp_in_grad)
        step = jit_train_step(make_dcgan_train_step(cfg, geo), donate_state=False)
        st = GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                           opt_d=tx.init(pd), step=jnp.zeros((), jnp.int32),
                           rng=jax.random.PRNGKey(7))
        s, m = step(st, jax.random.uniform(jax.random.PRNGKey(3), (8, 16, 16, 3)))
        return s, m

    s_fix, m_fix = run(True)
    s_quirk, m_quirk = run(False)
    # same reported loss (error_d always includes the GP term)...
    assert abs(float(m_fix["loss_d"]) - float(m_quirk["loss_d"])) < 1e-5
    # ...different D parameter update (GP only flows in fixed mode)
    assert _leaf_delta(s_fix.params_d, s_quirk.params_d) > 0


def test_ema_tracks_generator():
    cfg = tiny_cfg()
    cfg.ema_decay = 0.9
    geo = tiny_geo(cfg)
    from jckx.models import dcgan
    from jckx.train.state import make_optimizer, GANTrainState
    tx = make_optimizer(cfg)
    pg = dcgan.generator_init(jax.random.PRNGKey(1), geo)
    pd = dcgan.discriminator_init(jax.random.PRNGKey(2), geo)
    st = GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                       opt_d=tx.init(pd), step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(7), ema_g=pg)
    step = jit_train_step(make_dcgan_train_step(cfg, geo), donate_state=False)
    real = jax.random.uniform(jax.random.PRNGKey(3), (8, 16, 16, 3), minval=-1, maxval=1)
    s1, _ = step(st, real)
    # ema = 0.9*old + 0.1*new, verified on one leaf
    expect = 0.9 * np.asarray(pg["convt0"]) + 0.1 * np.asarray(s1.params_g["convt0"])
    np.testing.assert_allclose(np.asarray(s1.ema_g["convt0"]), expect, rtol=1e-5, atol=1e-6)
    # ema lags the live params but moves
    assert _leaf_delta(s1.ema_g, pg) > 0
    assert _leaf_delta(s1.ema_g, s1.params_g) > 0


def test_cgan_step_runs():
    cfg = tiny_cfg(num_classes=10)
    geo = tiny_geo(cfg)
    from jckx.models import cgan
    from jckx.train.state import make_optimizer, GANTrainState
    tx = make_optimizer(cfg)
    pg = cgan.cgenerator_init(jax.random.PRNGKey(1), geo, 10)
    pd = cgan.cdiscriminator_init(jax.random.PRNGKey(2), geo, 10)
    st = GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                       opt_d=tx.init(pd), step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(7))
    step = jit_train_step(make_cgan_train_step(cfg, geo), donate_state=False)
    real = jax.random.uniform(jax.random.PRNGKey(3), (8, 16, 16, 3), minval=-1, maxval=1)
    labels = jax.nn.one_hot(jnp.arange(8) % 10, 10)
    new_state, m = step(st, real, labels)
    assert all(np.isfinite(float(m[k])) for k in m)
    assert _leaf_delta(new_state.params_g, pg) > 0


def test_sharded_step_matches_single_device():
    """8-way data-parallel must be numerically ≡ one big device (sync-BN +
    global loss means via XLA collectives)."""
    cfg = tiny_cfg()
    geo = tiny_geo(cfg)
    from jckx.models import dcgan
    from jckx.train.state import make_optimizer, GANTrainState
    tx = make_optimizer(cfg)
    pg = dcgan.generator_init(jax.random.PRNGKey(1), geo)
    pd = dcgan.discriminator_init(jax.random.PRNGKey(2), geo)

    def fresh():
        return GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                             opt_d=tx.init(pd), step=jnp.zeros((), jnp.int32),
                             rng=jax.random.PRNGKey(7))

    real = jax.random.uniform(jax.random.PRNGKey(3), (8, 16, 16, 3), minval=-1, maxval=1)

    step_1 = jit_train_step(make_dcgan_train_step(cfg, geo), donate_state=False)
    s1, m1 = step_1(fresh(), real)

    mesh = make_mesh()  # all 8 virtual CPU devices on 'data'
    assert mesh.devices.size == 8
    step_8 = jit_train_step(make_dcgan_train_step(cfg, geo), mesh=mesh, donate_state=False)
    s8, m8 = step_8(fresh(), real)

    assert abs(float(m1["loss_d"]) - float(m8["loss_d"])) < 1e-4
    assert abs(float(m1["loss_g"]) - float(m8["loss_g"])) < 1e-4
    assert _leaf_delta(s1.params_g, s8.params_g) < 1e-4
    assert _leaf_delta(s1.params_d, s8.params_d) < 1e-4


@pytest.mark.parametrize("remat", ["g", "d", "both"])
def test_remat_does_not_change_numerics(remat):
    """jax.checkpoint (cfg.remat) trades FLOPs for memory — the training
    trajectory must match remat='none' to float32 fusion-reordering
    tolerance (XLA refuses/reorders the recomputed forward, so last-ulp
    rounding can differ; observed ≤7e-6 on isolated params after 2 Adam
    steps). Pins the knob the 128²/256² geometries rely on."""
    from jckx.models import dcgan
    from jckx.train.state import create_dcgan_state, make_optimizer

    def run(remat_mode):
        cfg = tiny_cfg(remat=remat_mode)
        geo = tiny_geo(cfg)
        tx = make_optimizer(cfg)
        pg = dcgan.generator_init(jax.random.PRNGKey(1), geo)
        pd = dcgan.discriminator_init(jax.random.PRNGKey(2), geo)
        state = create_dcgan_state(cfg, jax.random.PRNGKey(0)).replace(
            params_g=pg, params_d=pd, opt_g=tx.init(pg), opt_d=tx.init(pd))
        step = jit_train_step(make_dcgan_train_step(cfg, geo), donate_state=False)
        real = jax.random.uniform(jax.random.PRNGKey(3), (8, 16, 16, 3),
                                  minval=-1, maxval=1)
        s1, m1 = step(state, real)
        s2, m2 = step(s1, real)
        return s2, m2

    ref_state, ref_m = run("none")
    got_state, got_m = run(remat)
    for k in ref_m:
        np.testing.assert_allclose(float(got_m[k]), float(ref_m[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params_g),
                    jax.tree_util.tree_leaves(got_state.params_g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5)


def test_lr_schedule_cosine_scales_adam_updates():
    """--lr_schedule cosine (the opt-in fix of the reference's dead -milr
    flag, main.py:55): identical opt-state STRUCTURE to the constant case
    (checkpoints stay interchangeable; state.py make_optimizer), factor 1.0
    at count 0, min_lr/max_lr at/after the horizon."""
    from jckx.train.state import make_optimizer

    cfg = tiny_cfg()
    cfg.min_learning_rate = cfg.max_learning_rate / 10.0
    const = make_optimizer(cfg)
    cfg.lr_schedule = "cosine"
    cfg.lr_decay_steps = 8
    cos = make_optimizer(cfg)

    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    grads = {"w": jnp.full((4,), 0.5), "b": jnp.full((2,), -0.25)}
    sc, ss = const.init(params), cos.init(params)
    assert (jax.tree_util.tree_structure(sc)
            == jax.tree_util.tree_structure(ss))
    # the implementation reads the adam count at state[0] — pin the optax
    # layout assumption explicitly so a version bump fails loudly here
    assert int(ss[0].count) == 0

    # step 0: cosine factor is exactly 1 -> identical updates
    uc, sc = const.update(grads, sc, params)
    us, ss = cos.update(grads, ss, params)
    np.testing.assert_allclose(np.asarray(us["w"]), np.asarray(uc["w"]), rtol=1e-7)

    # advance both to the horizon; past it the factor clamps to
    # alpha = min_lr / max_lr
    for _ in range(cfg.lr_decay_steps):
        uc, sc = const.update(grads, sc, params)
        us, ss = cos.update(grads, ss, params)
    np.testing.assert_allclose(
        np.asarray(us["w"]), 0.1 * np.asarray(uc["w"]), rtol=1e-5)

    # misconfiguration fails loudly, never silently-constant
    bad = tiny_cfg()
    bad.lr_schedule = "cosine"  # lr_decay_steps left 0
    with pytest.raises(ValueError, match="lr_decay_steps"):
        make_optimizer(bad)
    bad.lr_schedule = "linear"
    with pytest.raises(ValueError, match="constant.*cosine"):
        make_optimizer(bad)
