"""CLI-reachable parallelism: the trainer must honor cfg.mesh_shape /
cfg.mesh_axes / cfg.model_axis_mode, and every layout must train
numerically ≡ the default replicated data-parallel mesh (8 virtual CPU
devices). This is the trainer-level counterpart of the step-level
equivalences in test_tensor_parallel.py / test_train_step.py."""

import os

import numpy as np
import jax
import pytest

from jckx.configs import Config
from jckx.data.pipeline import CGANDataPreprocessor, DCGANDataPreprocessor
from jckx.logging.main_logger import MainLogger
from jckx.models import cgan, dcgan
from jckx.models.dcgan import GANGeometry
from jckx.parallel import MODEL_AXIS
from jckx.rng import KeyChain, seed_everything


def _cfg(tmpdir, model="DCGAN", run="run"):
    from jckx.enums import ModelEnum

    cfg = Config()
    cfg.model = ModelEnum[model]
    cfg.dataset = "synthetic"
    cfg.batch_size = 16
    cfg.epoch = 1
    cfg.image_size = 16
    cfg.base_width = 16  # widths 32/16 → model-axis-2 divisible
    cfg.tp_min_dim = 16
    cfg.num_classes = 10
    cfg.compute_dtype = "float32"
    cfg.max_learning_rate = 2e-4
    cfg.log_every = 100
    cfg.eval_every = 0
    cfg.log_file = 0
    cfg.save_root = str(tmpdir)
    cfg.save_path = os.path.join(str(tmpdir), model.lower(), run)
    return cfg


def _train(cfg, model="DCGAN", metrics=None):
    """Build + train a tiny run; returns the final params_g as host arrays."""
    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=16)
    keys = KeyChain(seed_everything(11))
    if model == "DCGAN":
        data_pre = DCGANDataPreprocessor(cfg)
        data_pre.images_u8 = data_pre.images_u8[:64]  # 4 steps/epoch
        data_pre.labels_np = data_pre.labels_np[:64]
        pg = dcgan.generator_init(keys.next(), geo)
        pd = dcgan.discriminator_init(keys.next(), geo)
        from jckx.train.gan_trainer import DCGANTrainer as T
    else:
        data_pre = CGANDataPreprocessor(cfg)
        data_pre.images_u8 = data_pre.images_u8[:64]
        data_pre.labels_np = data_pre.labels_np[:64]
        pg = cgan.cgenerator_init(keys.next(), geo, 10)
        pd = cgan.cdiscriminator_init(keys.next(), geo, 10)
        from jckx.train.gan_trainer import CGANTrainer as T

    if metrics is None and cfg.eval_every > 0:
        from tests.test_trainer import StubMetrics

        metrics = StubMetrics()
    tr = T(cfg, pg, pd, data_pre, metrics=metrics)
    last = tr.train()
    assert np.isfinite(last["loss_d"]) and np.isfinite(last["loss_g"])
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(tr.state.params_g))
    MainLogger.reset()
    return tr, params, last


def _assert_close(tree_a, tree_b, rtol=5e-4, atol=5e-5):
    for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                    jax.tree_util.tree_leaves(tree_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)


def test_cli_mesh_shape_reaches_trainer(tmp_path):
    """--mesh_shape/--mesh_axes parsed by the CLI steer the trainer mesh."""
    from jckx.configs import get_arg_parse

    cfg = get_arg_parse(["--mesh_shape", "4,2", "--mesh_axes", "data,model"])
    assert cfg.mesh_shape == (4, 2) and cfg.mesh_axes == ("data", "model")

    tcfg = _cfg(tmp_path)
    tcfg.mesh_shape, tcfg.mesh_axes = cfg.mesh_shape, cfg.mesh_axes
    tr, _, _ = _train(tcfg)
    assert dict(tr.mesh.shape) == {"data": 4, "model": 2}


def test_tp_trainer_matches_replicated_dcgan(tmp_path):
    _, ref, ref_last = _train(_cfg(tmp_path, run="repl"))

    cfg = _cfg(tmp_path, run="tp")
    cfg.mesh_shape, cfg.mesh_axes = (4, 2), ("data", MODEL_AXIS)
    tr, tp, tp_last = _train(cfg)

    # the state really is tensor-sharded (at least one leaf on 'model')
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: s.spec, tr._state_sharding,
                               is_leaf=lambda x: hasattr(x, "spec"))
    )
    assert any(MODEL_AXIS in str(s) for s in specs)
    assert abs(ref_last["loss_d"] - tp_last["loss_d"]) < 1e-3
    _assert_close(ref, tp)


def test_spatial_trainer_matches_replicated(tmp_path):
    _, ref, ref_last = _train(_cfg(tmp_path, run="repl2"))

    cfg = _cfg(tmp_path, run="sp")
    cfg.mesh_shape, cfg.mesh_axes = (4, 2), ("data", MODEL_AXIS)
    cfg.model_axis_mode = "spatial"
    tr, sp, sp_last = _train(cfg)
    assert abs(ref_last["loss_d"] - sp_last["loss_d"]) < 1e-3
    _assert_close(ref, sp)


def test_spatial_replicate_grads_identity_semantics(tmp_path):
    """--spatial_replicate_grads is a GSPMD LAYOUT hint, not an algorithm
    change (r5: it kills XLA's kernel-H-sharded f32 Adam all-gathers —
    −40% cross-shard bytes on the real v5e module): training with the pin
    (default 1) must match training without it (0, XLA's own strategy)
    within layout-reassociation tolerance. The ≡-replicated spatial tests
    above already run the default; this pins the off-path too."""
    cfg1 = _cfg(tmp_path, run="sp_rg1")
    cfg1.mesh_shape, cfg1.mesh_axes = (4, 2), ("data", MODEL_AXIS)
    cfg1.model_axis_mode = "spatial"
    assert cfg1.spatial_replicate_grads == 1  # the default
    _, on, on_last = _train(cfg1)

    cfg0 = _cfg(tmp_path, run="sp_rg0")
    cfg0.mesh_shape, cfg0.mesh_axes = (4, 2), ("data", MODEL_AXIS)
    cfg0.model_axis_mode = "spatial"
    cfg0.spatial_replicate_grads = 0
    _, off, off_last = _train(cfg0)
    assert abs(on_last["loss_d"] - off_last["loss_d"]) < 1e-3
    _assert_close(on, off)


def test_spatial_trainer_matches_replicated_cgan(tmp_path):
    """The conditional family under --model_axis_mode spatial (activation
    height sharded on the model axis) trains ≡ the unsharded layout — the
    one family×mode combination the DCGAN spatial test left uncovered."""
    _, ref, ref_last = _train(_cfg(tmp_path, model="CGAN", run="repl3"),
                              model="CGAN")

    cfg = _cfg(tmp_path, model="CGAN", run="sp2")
    cfg.mesh_shape, cfg.mesh_axes = (4, 2), ("data", MODEL_AXIS)
    cfg.model_axis_mode = "spatial"
    _, sp, sp_last = _train(cfg, model="CGAN")
    assert abs(ref_last["loss_d"] - sp_last["loss_d"]) < 1e-3
    _assert_close(ref, sp)


def test_tp_trainer_matches_replicated_cgan(tmp_path):
    _, ref, ref_last = _train(_cfg(tmp_path, model="CGAN", run="repl"), model="CGAN")

    cfg = _cfg(tmp_path, model="CGAN", run="tp")
    cfg.mesh_shape, cfg.mesh_axes = (4, 2), ("data", MODEL_AXIS)
    _, tp, tp_last = _train(cfg, model="CGAN")
    assert abs(ref_last["loss_d"] - tp_last["loss_d"]) < 1e-3
    _assert_close(ref, tp)


def test_tp_trainer_with_ema(tmp_path):
    """EMA state shards alongside the live generator under TP and matches
    the replicated layout."""
    ref_cfg = _cfg(tmp_path, run="repl3")
    ref_cfg.ema_decay = 0.99
    tr_ref, _, _ = _train(ref_cfg)
    ema_ref = jax.device_get(tr_ref.state.ema_g)

    cfg = _cfg(tmp_path, run="tp3")
    cfg.ema_decay = 0.99
    cfg.mesh_shape, cfg.mesh_axes = (4, 2), ("data", MODEL_AXIS)
    tr_tp, _, _ = _train(cfg)
    _assert_close(ema_ref, jax.device_get(tr_tp.state.ema_g))


def test_tp_trainer_resume(tmp_path):
    """Checkpoint/resume round-trips through the TP-sharded layout: save
    gathers the sharded state, restore re-shards it, training continues
    bit-identically vs an uninterrupted TP run."""
    # uninterrupted: 2 epochs
    cfg_full = _cfg(tmp_path, run="tp_full")
    cfg_full.mesh_shape, cfg_full.mesh_axes = (4, 2), ("data", MODEL_AXIS)
    cfg_full.epoch = 2
    cfg_full.eval_every = 4  # writes latest.ckpt at eval boundaries
    _, full_params, _ = _train(cfg_full)

    # interrupted at epoch 1...
    cfg_a = _cfg(tmp_path, run="tp_resume")
    cfg_a.mesh_shape, cfg_a.mesh_axes = (4, 2), ("data", MODEL_AXIS)
    cfg_a.epoch = 1
    cfg_a.eval_every = 4
    _train(cfg_a)

    # ...then resumed to the same 2-epoch budget
    cfg_b = _cfg(tmp_path, run="tp_resume")
    cfg_b.mesh_shape, cfg_b.mesh_axes = (4, 2), ("data", MODEL_AXIS)
    cfg_b.epoch = 2
    cfg_b.eval_every = 4
    cfg_b.resume = True
    tr_b, resumed_params, _ = _train(cfg_b)
    assert int(tr_b.state.step) == 8
    _assert_close(full_params, resumed_params, rtol=1e-5, atol=1e-6)


def test_streaming_trainer_resume(tmp_path):
    """Resume works on the host-streaming data plane (shuffle stream
    fast-forward + slab gather continue the uninterrupted order)."""
    cfg_full = _cfg(tmp_path, run="st_full")
    cfg_full.data_placement = "stream"
    cfg_full.epoch = 2
    cfg_full.eval_every = 4
    _, full_params, _ = _train(cfg_full)

    cfg_a = _cfg(tmp_path, run="st_resume")
    cfg_a.data_placement = "stream"
    cfg_a.epoch = 1
    cfg_a.eval_every = 4
    _train(cfg_a)

    cfg_b = _cfg(tmp_path, run="st_resume")
    cfg_b.data_placement = "stream"
    cfg_b.epoch = 2
    cfg_b.eval_every = 4
    cfg_b.resume = True
    tr_b, resumed_params, _ = _train(cfg_b)
    assert tr_b._streaming and int(tr_b.state.step) == 8
    _assert_close(full_params, resumed_params, rtol=1e-5, atol=1e-6)


def test_indivisible_batch_raises_clear_error(tmp_path):
    cfg = _cfg(tmp_path, run="bad_bs")
    cfg.batch_size = 12  # not divisible by the 8-way data axis
    with pytest.raises(ValueError, match="not divisible by the\nmesh 'data' axis|not divisible"):
        _train(cfg)
