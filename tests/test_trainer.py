"""End-to-end trainer tests on tiny synthetic data (CPU, 8-dev mesh):
full train() with a stub metrics engine, artifacts, best-metric
checkpoints, and bit-identical resume."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jckx.configs import Config
from jckx.data.pipeline import CGANDataPreprocessor, DCGANDataPreprocessor
from jckx.logging.main_logger import MainLogger
from jckx.models import cgan, dcgan
from jckx.models.dcgan import GANGeometry
from jckx.rng import KeyChain, seed_everything


class StubMetrics:
    """Deterministic fake metric engine (no InceptionV3 on CPU tests)."""

    def __init__(self):
        self.calls = 0
        self.intra_fid_divisor = 100.0
        from jckx.data.datasets import FINE_TO_SUPERCLASS

        fake_targets = np.repeat(np.arange(10), 10)
        fs = FINE_TO_SUPERCLASS[fake_targets % 100]
        self.fake_superclass_idx = {s: np.nonzero(fs == s)[0] for s in range(20)}
        self.active_superclasses = [
            s for s in range(20) if len(self.fake_superclass_idx[s]) > 1
        ]

    def inception_score(self, images=None, splits=10, logits=None):
        self.calls += 1
        return 1.0 + 0.1 * self.calls

    def extract_features(self, images):
        return np.random.RandomState(0).randn(len(images), 8).astype(np.float32)

    def fid(self, images_tanh=None, intra_fid=False, label=0, features=None):
        return 100.0 / self.calls if self.calls else 100.0

    def intra_fid(self, images_tanh=None, features=None):
        return 100.0 / self.calls if self.calls else 100.0


def tiny_cfg(tmpdir, model="DCGAN"):
    from jckx.enums import ModelEnum

    cfg = Config()
    cfg.model = ModelEnum[model]
    cfg.dataset = "synthetic"
    cfg.batch_size = 16
    cfg.epoch = 1
    cfg.image_size = 16
    cfg.base_width = 8
    cfg.num_classes = 10
    cfg.compute_dtype = "float32"
    cfg.max_learning_rate = 2e-4
    cfg.log_every = 8
    cfg.eval_every = 16
    cfg.log_file = 0
    cfg.save_root = str(tmpdir)
    cfg.save_path = os.path.join(str(tmpdir), model.lower(), "run")
    return cfg


def test_dcgan_trainer_end_to_end(tmp_path):
    cfg = tiny_cfg(tmp_path)
    data_pre = DCGANDataPreprocessor(cfg)
    data_pre.images_u8 = data_pre.images_u8[:128]  # 8 steps/epoch
    data_pre.labels_np = data_pre.labels_np[:128]
    data_pre.transform_data()
    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
    keys = KeyChain(seed_everything(1))
    pg = dcgan.generator_init(keys.next(), geo)
    pd = dcgan.discriminator_init(keys.next(), geo)

    from jckx.train.gan_trainer import DCGANTrainer

    stub = StubMetrics()
    tr = DCGANTrainer(cfg, pg, pd, data_pre, metrics=stub)
    last = tr.train()

    assert last is not None and np.isfinite(last["loss_d"])
    assert stub.calls >= 1  # eval ran
    assert os.path.exists(os.path.join(cfg.save_path, "real_image.png"))
    assert os.path.exists(os.path.join(cfg.save_path, "loss.png"))
    assert os.path.exists(os.path.join(cfg.save_path, "latest.ckpt"))
    fid_dir = os.path.join(cfg.save_path, "fid")
    assert any(f.endswith(".ckpt") for f in os.listdir(fid_dir))
    assert any(f.endswith("_fake_image.png") for f in os.listdir(fid_dir))
    MainLogger.reset()


def test_dcgan_trainer_resume_continues_step(tmp_path):
    cfg = tiny_cfg(tmp_path)
    data_pre = DCGANDataPreprocessor(cfg)
    data_pre.images_u8 = data_pre.images_u8[:64]  # 4 steps/epoch
    data_pre.labels_np = data_pre.labels_np[:64]
    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
    keys = KeyChain(seed_everything(2))
    pg = dcgan.generator_init(keys.next(), geo)
    pd = dcgan.discriminator_init(keys.next(), geo)

    from jckx.train.gan_trainer import DCGANTrainer

    tr = DCGANTrainer(cfg, pg, pd, data_pre, metrics=StubMetrics())
    tr.train()
    step_after = int(tr.state.step)
    assert step_after == 4
    MainLogger.reset()

    # resuming a COMPLETED run trains zero further steps (epochs fast-forward)
    # — and says so (the same silent no-op would otherwise mask a config
    # mismatch, e.g. a resume with a different dataset size)
    cfg2 = tiny_cfg(tmp_path)
    cfg2.resume = True
    tr2 = DCGANTrainer(cfg2, pg, pd, data_pre, metrics=StubMetrics())
    assert int(tr2.state.step) == step_after  # restored
    warned = []
    tr2.logger.warning = lambda msg, *a, **k: warned.append(str(msg))
    tr2.train()
    assert int(tr2.state.step) == step_after
    assert any("nothing left to train" in m for m in warned)
    MainLogger.reset()

    # a resume whose dataset shrank (steps/epoch changed) must warn too:
    # the old step count exceeds the new horizon, so the loop is empty
    cfg2b = tiny_cfg(tmp_path)
    cfg2b.resume = True
    data_small = DCGANDataPreprocessor(cfg2b)
    data_small.images_u8 = data_small.images_u8[:16]  # 1 step/epoch
    data_small.labels_np = data_small.labels_np[:16]
    tr2b = DCGANTrainer(cfg2b, pg, pd, data_small, metrics=StubMetrics())
    warned_b = []
    tr2b.logger.warning = lambda msg, *a, **k: warned_b.append(str(msg))
    tr2b.train()
    assert int(tr2b.state.step) == step_after  # trained nothing
    assert any("nothing left to train" in m for m in warned_b)
    MainLogger.reset()

    # raising the epoch budget continues for exactly the remaining epochs
    cfg3 = tiny_cfg(tmp_path)
    cfg3.resume = True
    cfg3.epoch = 2
    tr3 = DCGANTrainer(cfg3, pg, pd, data_pre, metrics=StubMetrics())
    tr3.train()
    assert int(tr3.state.step) == step_after + 4
    MainLogger.reset()


def test_second_train_call_on_same_trainer_continues(tmp_path):
    """Calling train() again on the SAME trainer (no checkpoint round-trip
    — the catch-and-retry / raise-epoch-budget library pattern) continues
    step accounting and data order exactly like one uninterrupted run.
    Regression: _host_step used to stay stale after train(), replaying
    epoch-0 permutations and mislabeling checkpoints on the second call."""
    from jckx.train.gan_trainer import DCGANTrainer

    def run(subdir, epochs_schedule):
        geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
        keys = KeyChain(seed_everything(3))  # fresh identical params per run
        pg = dcgan.generator_init(keys.next(), geo)  # (the donated superstep
        pd = dcgan.discriminator_init(keys.next(), geo)  # consumes them)
        cfg = tiny_cfg(tmp_path / subdir)
        data_pre = DCGANDataPreprocessor(cfg)
        data_pre.images_u8 = data_pre.images_u8[:64]  # 4 steps/epoch
        data_pre.labels_np = data_pre.labels_np[:64]
        tr = DCGANTrainer(cfg, pg, pd, data_pre, metrics=StubMetrics())
        for e in epochs_schedule:
            tr.cfg.epoch = e
            tr.train()
        MainLogger.reset()
        return tr

    straight = run("a", [2])          # 2 epochs, one call
    split = run("b", [1, 2])          # 1 epoch, then raise budget + re-call

    assert int(straight.state.step) == int(split.state.step) == 8
    for la, lb in zip(jax.tree_util.tree_leaves(straight.state.params_g),
                      jax.tree_util.tree_leaves(split.state.params_g)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for la, lb in zip(jax.tree_util.tree_leaves(straight.state.params_d),
                      jax.tree_util.tree_leaves(split.state.params_d)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_mnist_style_grayscale_geometry(tmp_path):
    """BASELINE.json config: DCGAN on MNIST-like 28×28 grayscale → resized
    to a power-of-two geometry, 1-channel G/D."""
    cfg = tiny_cfg(tmp_path)
    cfg.dataset = "mnist"  # falls back to synthetic 28×28×1
    cfg.channels = 1
    cfg.num_classes = 10
    cfg.image_size = 32
    cfg.eval_every = 0  # no metrics engine in this test
    data_pre = DCGANDataPreprocessor(cfg)
    assert data_pre.images_u8.shape[-1] == 1
    data_pre.images_u8 = data_pre.images_u8[:64]
    data_pre.labels_np = data_pre.labels_np[:64]
    geo = GANGeometry(z_dim=100, image_size=32, channels=1, base_width=8)
    keys = KeyChain(seed_everything(4))
    pg = dcgan.generator_init(keys.next(), geo)
    pd = dcgan.discriminator_init(keys.next(), geo)

    from jckx.train.gan_trainer import DCGANTrainer

    cfg.base_width = 8
    tr = DCGANTrainer(cfg, pg, pd, data_pre)
    last = tr.train()
    assert np.isfinite(last["loss_g"])
    # 28×28 uint8 decoded to 32×32 grayscale inside the step
    MainLogger.reset()


def test_trainer_uses_mesh_all_devices(tmp_path):
    """The trainer's superstep is laid out over the full 8-device CPU mesh
    (batch sharded on 'data')."""
    cfg = tiny_cfg(tmp_path)
    cfg.eval_every = 0
    data_pre = DCGANDataPreprocessor(cfg)
    data_pre.images_u8 = data_pre.images_u8[:64]
    data_pre.labels_np = data_pre.labels_np[:64]
    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
    keys = KeyChain(seed_everything(5))
    pg = dcgan.generator_init(keys.next(), geo)
    pd = dcgan.discriminator_init(keys.next(), geo)

    from jckx.train.gan_trainer import DCGANTrainer

    tr = DCGANTrainer(cfg, pg, pd, data_pre)
    assert tr.mesh.devices.size == 8
    last = tr.train()
    assert np.isfinite(last["loss_d"])
    MainLogger.reset()


def test_cgan_trainer_end_to_end(tmp_path):
    cfg = tiny_cfg(tmp_path, model="CGAN")
    data_pre = CGANDataPreprocessor(cfg)
    data_pre.images_u8 = data_pre.images_u8[:64]
    data_pre.labels_np = data_pre.labels_np[:64]
    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
    keys = KeyChain(seed_everything(3))
    pg = cgan.cgenerator_init(keys.next(), geo, 10)
    pd = cgan.cdiscriminator_init(keys.next(), geo, 10)

    from jckx.train.gan_trainer import CGANTrainer

    tr = CGANTrainer(cfg, pg, pd, data_pre, metrics=StubMetrics())
    tr.train()
    # labeled per-class panel
    img_dir = os.path.join(cfg.save_path, "img")
    assert any(f.endswith("_fake_image.png") for f in os.listdir(img_dir))
    # all three best-metric dirs written
    for typ in ("fid", "is", "intra_fid"):
        d = os.path.join(cfg.save_path, typ)
        assert os.path.isdir(d) and any(f.endswith(".ckpt") for f in os.listdir(d))
    MainLogger.reset()


def test_streaming_trainer_matches_resident(tmp_path):
    """--data_placement stream (host slab gather + upload per launch) must
    train numerically ≡ the HBM-resident plane — the slabs carry exactly
    the rows the resident scan would gather on device."""
    cfg_a = tiny_cfg(tmp_path)
    cfg_a.eval_every = 0
    cfg_a.save_path = os.path.join(str(tmp_path), "dcgan", "resident")
    data_a = DCGANDataPreprocessor(cfg_a)
    data_a.images_u8 = data_a.images_u8[:64]
    data_a.labels_np = data_a.labels_np[:64]
    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
    keys = KeyChain(seed_everything(6))
    # host copies: the donated superstep consumes each trainer's device
    # params, so the two trainers need independent buffers
    pg0 = jax.device_get(dcgan.generator_init(keys.next(), geo))
    pd0 = jax.device_get(dcgan.discriminator_init(keys.next(), geo))
    fresh = lambda t: jax.tree_util.tree_map(jnp.asarray, t)

    from jckx.train.gan_trainer import DCGANTrainer

    tr_a = DCGANTrainer(cfg_a, fresh(pg0), fresh(pd0), data_a)
    assert not tr_a._streaming
    last_a = tr_a.train()
    params_a = jax.device_get(tr_a.state.params_g)
    MainLogger.reset()

    cfg_b = tiny_cfg(tmp_path)
    cfg_b.eval_every = 0
    cfg_b.save_path = os.path.join(str(tmp_path), "dcgan", "stream")
    cfg_b.data_placement = "stream"
    cfg_b.num_worker = 2
    data_b = DCGANDataPreprocessor(cfg_b)
    data_b.images_u8 = data_b.images_u8[:64]
    data_b.labels_np = data_b.labels_np[:64]
    tr_b = DCGANTrainer(cfg_b, fresh(pg0), fresh(pd0), data_b)
    assert tr_b._streaming and tr_b.images_dev is None
    last_b = tr_b.train()
    params_b = jax.device_get(tr_b.state.params_g)
    MainLogger.reset()

    assert last_a["loss_d"] == pytest.approx(last_b["loss_d"], abs=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_a),
                    jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_auto_placement_threshold(tmp_path):
    """data_placement=auto streams iff the dataset exceeds hbm_data_budget."""
    cfg = tiny_cfg(tmp_path)
    cfg.eval_every = 0
    cfg.hbm_data_budget = 1  # force streaming
    data_pre = DCGANDataPreprocessor(cfg)
    data_pre.images_u8 = data_pre.images_u8[:32]
    data_pre.labels_np = data_pre.labels_np[:32]
    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
    keys = KeyChain(seed_everything(7))
    pg = dcgan.generator_init(keys.next(), geo)
    pd = dcgan.discriminator_init(keys.next(), geo)

    from jckx.train.gan_trainer import DCGANTrainer

    tr = DCGANTrainer(cfg, pg, pd, data_pre)
    assert tr._streaming
    last = tr.train()
    assert np.isfinite(last["loss_d"])
    MainLogger.reset()


def test_nan_guard_aborts_on_divergence(tmp_path):
    """A diverged run (non-finite step telemetry) aborts loudly instead of
    training on; --nan_guard 0 disables."""
    cfg = tiny_cfg(tmp_path)
    cfg.eval_every = 0
    data_pre = DCGANDataPreprocessor(cfg)
    data_pre.images_u8 = data_pre.images_u8[:32]
    data_pre.labels_np = data_pre.labels_np[:32]
    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
    keys = KeyChain(seed_everything(9))
    pg = dcgan.generator_init(keys.next(), geo)
    pd = dcgan.discriminator_init(keys.next(), geo)

    from jckx.train.gan_trainer import DCGANTrainer

    tr = DCGANTrainer(cfg, pg, pd, data_pre)
    real_superstep = tr._superstep

    def poisoned(*args):
        state, ms = real_superstep(*args)
        ms = {k: np.full_like(np.asarray(v), np.nan) for k, v in ms.items()}
        return state, ms

    tr._superstep = poisoned
    with pytest.raises(FloatingPointError, match="diverged"):
        tr.train()
    MainLogger.reset()

    # guard off → the run completes (logging NaNs, as before the guard)
    cfg2 = tiny_cfg(tmp_path)
    cfg2.eval_every = 0
    cfg2.nan_guard = False
    cfg2.save_path = os.path.join(str(tmp_path), "dcgan", "noguard")
    pg2 = dcgan.generator_init(keys.next(), geo)
    pd2 = dcgan.discriminator_init(keys.next(), geo)
    tr2 = DCGANTrainer(cfg2, pg2, pd2, data_pre)
    real2 = tr2._superstep
    tr2._superstep = lambda *a: (lambda s, m: (s, {k: np.full_like(np.asarray(v), np.nan) for k, v in m.items()}))(*real2(*a))
    last = tr2.train()
    assert np.isnan(last["loss_d"])
    MainLogger.reset()


def _nan_telemetry(superstep):
    """Wrap a superstep so its telemetry is all-NaN (state still advances —
    exactly what a diverged run looks like from the launch boundary)."""
    def poisoned(*args):
        state, ms = superstep(*args)
        return state, {k: np.full_like(np.asarray(v), np.nan) for k, v in ms.items()}

    return poisoned


def test_nan_guard_rollback_with_checkpoint_and_poison_without(tmp_path):
    """The retry contract behind the nan-guard abort: with a latest.ckpt the
    trainer rolls back to it (so catch-and-train()-again continues from good
    state, not the diverged k-steps-ahead state); with no checkpoint the
    trainer refuses a second train() instead of silently training on NaNs."""
    from jckx.train.gan_trainer import DCGANTrainer

    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
    keys = KeyChain(seed_everything(11))

    # --- no checkpoint ever written (eval_every=0) → poisoned on retry
    cfg = tiny_cfg(tmp_path)
    cfg.eval_every = 0
    cfg.save_path = os.path.join(str(tmp_path), "dcgan", "poison")
    data_pre = DCGANDataPreprocessor(cfg)
    data_pre.images_u8 = data_pre.images_u8[:32]
    data_pre.labels_np = data_pre.labels_np[:32]
    tr = DCGANTrainer(cfg, dcgan.generator_init(keys.next(), geo),
                      dcgan.discriminator_init(keys.next(), geo), data_pre,
                      metrics=StubMetrics())
    tr._superstep = _nan_telemetry(tr._superstep)
    with pytest.raises(FloatingPointError, match="diverged"):
        tr.train()
    with pytest.raises(RuntimeError, match="diverged"):
        tr.train()
    MainLogger.reset()

    # --- checkpoint present → rollback, then a clean retrain completes
    cfg2 = tiny_cfg(tmp_path)
    cfg2.save_path = os.path.join(str(tmp_path), "dcgan", "rollback")
    data2 = DCGANDataPreprocessor(cfg2)
    data2.images_u8 = data2.images_u8[:64]  # 4 steps/epoch, K=4 → 1 launch
    data2.labels_np = data2.labels_np[:64]
    tr2 = DCGANTrainer(cfg2, dcgan.generator_init(keys.next(), geo),
                       dcgan.discriminator_init(keys.next(), geo), data2,
                       metrics=StubMetrics())
    tr2.train()  # epoch 0 completes; final eval writes latest.ckpt at step 4
    ckpt_step = tr2._host_step
    assert ckpt_step == 4

    tr2.cfg.epoch = 2  # continue into epoch 1, but diverge immediately
    real2 = tr2._superstep
    tr2._superstep = _nan_telemetry(real2)
    with pytest.raises(FloatingPointError, match="diverged"):
        tr2.train()
    # rolled back: step counter AND device state match the checkpoint (the
    # un-rolled-back state would be k=4 steps ahead of _host_step)
    assert tr2._host_step == ckpt_step
    assert int(tr2.state.step) == ckpt_step

    tr2._superstep = real2  # "fix" the divergence; retry must run epoch 1
    last = tr2.train()
    assert last is not None and np.isfinite(last["loss_d"])
    assert tr2._host_step == 8 and int(tr2.state.step) == 8
    MainLogger.reset()


def test_sigterm_preemption_checkpoints_and_resumes_bit_identical(tmp_path):
    """Graceful preemption: a real SIGTERM mid-run makes train() save
    latest.ckpt at the next launch boundary and return with .preempted set;
    --resume then continues to a final state bit-identical to an
    uninterrupted twin. Also pins that the handler is restored after
    train() (library safety)."""
    import signal as _signal

    from jckx.train.gan_trainer import DCGANTrainer

    def build(subdir, **cfg_over):
        geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
        keys = KeyChain(seed_everything(11))  # identical params every build
        pg = dcgan.generator_init(keys.next(), geo)
        pd = dcgan.discriminator_init(keys.next(), geo)
        cfg = tiny_cfg(tmp_path / subdir)
        cfg.epoch = 2
        cfg.log_every = 2  # K=2 → launch boundaries at it=2,4,6,8
        for k, v in cfg_over.items():
            setattr(cfg, k, v)
        data_pre = DCGANDataPreprocessor(cfg)
        data_pre.images_u8 = data_pre.images_u8[:64]  # 4 steps/epoch
        data_pre.labels_np = data_pre.labels_np[:64]
        return DCGANTrainer(cfg, pg, pd, data_pre, metrics=StubMetrics())

    # uninterrupted twin
    straight = build("a")
    straight.train()
    assert int(straight.state.step) == 8 and not straight.preempted
    MainLogger.reset()

    # preempted run: deliver a REAL SIGTERM during the 2nd superstep launch
    before = _signal.getsignal(_signal.SIGTERM)
    tr = build("b")
    real_superstep = tr._superstep
    calls = {"n": 0}

    def kicking(*args):
        calls["n"] += 1
        out = real_superstep(*args)
        if calls["n"] == 2:
            os.kill(os.getpid(), _signal.SIGTERM)
            # we ARE the main thread: executing bytecodes lets the handler run
            for _ in range(10**7):
                if tr._preempt.is_set():
                    break
            assert tr._preempt.is_set()
        return out

    tr._superstep = kicking
    tr.train()
    assert tr.preempted and int(tr.state.step) == 4
    assert _signal.getsignal(_signal.SIGTERM) is before  # handler restored
    ck = os.path.join(tr.cfg.save_path, "latest.ckpt")
    assert os.path.exists(ck)
    MainLogger.reset()

    # resume in the same run dir → finishes the remaining steps
    resumed = build("b", resume=True)
    assert int(resumed.state.step) == 4
    resumed.train()
    assert int(resumed.state.step) == 8 and not resumed.preempted
    MainLogger.reset()

    for a, b in zip(jax.tree_util.tree_leaves(straight.state.params_g)
                    + jax.tree_util.tree_leaves(straight.state.params_d),
                    jax.tree_util.tree_leaves(resumed.state.params_g)
                    + jax.tree_util.tree_leaves(resumed.state.params_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_cadence_launch_quantized_boundary_set(tmp_path):
    """_evaluate fires exactly at the launch-quantized images of the
    reference's {after step 1, eval_every+1, 2·eval_every+1, …, last}
    schedule (dcgan_trainer.py:198-222) — pinned over a 3-epoch run whose
    eval cadence straddles epoch boundaries (VERDICT r2 weak #5)."""
    cfg = tiny_cfg(tmp_path)
    cfg.epoch = 3
    cfg.eval_every = 50
    cfg.log_every = 10
    data_pre = DCGANDataPreprocessor(cfg)
    data_pre.images_u8 = data_pre.images_u8[:624]  # 39 steps/epoch × 3
    data_pre.labels_np = data_pre.labels_np[:624]
    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
    keys = KeyChain(seed_everything(7))
    pg = dcgan.generator_init(keys.next(), geo)
    pd = dcgan.discriminator_init(keys.next(), geo)

    from jckx.train.gan_trainer import DCGANTrainer

    fired = []

    class Recorder(DCGANTrainer):
        def _evaluate(self, iters, losses_d, losses_g):
            fired.append(iters)

    tr = Recorder(cfg, pg, pd, data_pre, metrics=StubMetrics())
    tr.train()

    # launch boundaries of the superstep loop (K = min(log_every, eval_every,
    # steps_per_epoch), last launch of each epoch truncated)
    steps_per_epoch = 624 // cfg.batch_size
    K = min(cfg.log_every, cfg.eval_every, steps_per_epoch)
    boundaries, it = [], 0
    for _ in range(cfg.epoch):
        done = 0
        while done < steps_per_epoch:
            k = min(K, steps_per_epoch - done)
            done += k
            it += k
            boundaries.append(it)
    total = cfg.epoch * steps_per_epoch
    assert total == 117 and boundaries[-1] == total

    # the reference's boundary set, each point quantized up to the first
    # launch boundary that contains it
    reference = list(range(1, total + 1, cfg.eval_every)) + [total]
    expected = sorted({next(b for b in boundaries if b >= r) for r in reference})
    assert expected == [10, 59, 108, 117]  # sanity: straddles all 3 epochs
    assert fired == expected
    MainLogger.reset()


def test_preempted_trainer_trains_cleanly_on_next_call(tmp_path):
    """The preemption latch must be per-train()-call: after a preempted
    run, calling train() AGAIN on the same trainer (the supported
    retry/continue pattern) must run to completion, not re-preempt after
    one launch on the stale latch."""
    from jckx.train.gan_trainer import DCGANTrainer

    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
    keys = KeyChain(seed_everything(11))
    pg = dcgan.generator_init(keys.next(), geo)
    pd = dcgan.discriminator_init(keys.next(), geo)
    cfg = tiny_cfg(tmp_path)
    cfg.epoch = 2
    cfg.log_every = 2
    data_pre = DCGANDataPreprocessor(cfg)
    data_pre.images_u8 = data_pre.images_u8[:64]  # 4 steps/epoch
    data_pre.labels_np = data_pre.labels_np[:64]
    tr = DCGANTrainer(cfg, pg, pd, data_pre, metrics=StubMetrics())

    real_superstep = tr._superstep
    calls = {"n": 0}

    def kicking(*args):
        calls["n"] += 1
        if calls["n"] == 2:
            tr._preempt.set()  # what the SIGTERM handler does
        return real_superstep(*args)

    tr._superstep = kicking
    tr.train()
    assert tr.preempted and int(tr.state.step) == 4
    MainLogger.reset()

    tr._superstep = real_superstep
    tr.train()  # same trainer object, no new signal
    assert not tr.preempted, "stale preemption latch survived into a new train()"
    assert int(tr.state.step) == 8
    MainLogger.reset()


def test_cosine_lr_resume_bit_identical(tmp_path):
    """--lr_schedule cosine + --resume: the decay factor is a function of
    the CHECKPOINTED optimizer count, so an interrupted run continues the
    schedule exactly — final params bit-identical to an uninterrupted twin
    (fixed --lr_decay_steps; the auto horizon derives from the launch
    epoch budget, so budget-raising resumes must pin it, configs.py)."""
    import jax

    def cosine_cfg(root):
        cfg = tiny_cfg(root)
        cfg.lr_schedule = "cosine"
        cfg.lr_decay_steps = 8  # 2 epochs x 4 steps
        cfg.min_learning_rate = cfg.max_learning_rate / 10.0
        return cfg

    def data(cfg):
        pre = DCGANDataPreprocessor(cfg)
        pre.images_u8 = pre.images_u8[:64]  # 4 steps/epoch
        pre.labels_np = pre.labels_np[:64]
        return pre

    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
    keys = KeyChain(seed_everything(3))
    pg0 = dcgan.generator_init(keys.next(), geo)
    pd0 = dcgan.discriminator_init(keys.next(), geo)

    def fresh():  # per-trainer copies: the donated superstep eats its inputs
        import jax.numpy as jnp

        return (jax.tree_util.tree_map(jnp.copy, pg0),
                jax.tree_util.tree_map(jnp.copy, pd0))

    from jckx.train.gan_trainer import DCGANTrainer

    # uninterrupted twin: 2 epochs in one go
    twin_root = tmp_path / "twin"
    cfg = cosine_cfg(twin_root)
    cfg.epoch = 2
    tr = DCGANTrainer(cfg, *fresh(), data(cfg), metrics=StubMetrics())
    tr.train()
    twin = jax.device_get(tr.state.params_g)
    MainLogger.reset()

    # interrupted run: 1 epoch, then resume to the same 2-epoch budget
    run_root = tmp_path / "run"
    cfg1 = cosine_cfg(run_root)
    cfg1.epoch = 1
    tr1 = DCGANTrainer(cfg1, *fresh(), data(cfg1), metrics=StubMetrics())
    tr1.train()
    MainLogger.reset()
    cfg2 = cosine_cfg(run_root)
    cfg2.epoch = 2
    cfg2.resume = True
    tr2 = DCGANTrainer(cfg2, *fresh(), data(cfg2), metrics=StubMetrics())
    tr2.train()
    assert int(tr2.state.step) == 8
    got = jax.device_get(tr2.state.params_g)
    for k in twin:
        np.testing.assert_array_equal(np.asarray(twin[k]), np.asarray(got[k]),
                                      err_msg=k)
    MainLogger.reset()


def _tiny_trainer(tmp_path, subdir, seed=13, n_rows=64, metrics=None, **cfg_over):
    """Build a small DCGANTrainer in its own run dir (shared by the
    hardening tests below)."""
    from jckx.train.gan_trainer import DCGANTrainer

    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
    keys = KeyChain(seed_everything(seed))
    pg = dcgan.generator_init(keys.next(), geo)
    pd = dcgan.discriminator_init(keys.next(), geo)
    cfg = tiny_cfg(tmp_path / subdir)
    for k, v in cfg_over.items():
        setattr(cfg, k, v)
    data_pre = DCGANDataPreprocessor(cfg)
    data_pre.images_u8 = data_pre.images_u8[:n_rows]
    data_pre.labels_np = data_pre.labels_np[:n_rows]
    return DCGANTrainer(cfg, pg, pd, data_pre,
                        metrics=metrics or StubMetrics())


def test_log_every_zero_disables_console_logs(tmp_path):
    """--log_every 0 silences per-step logs (mirrors --eval_every 0's
    'disable' convention) instead of crashing with ZeroDivisionError on the
    first launch (review finding)."""
    tr = _tiny_trainer(tmp_path, "lz", log_every=0)
    last = tr.train()
    assert last is not None and np.isfinite(last["loss_d"])
    assert int(tr.state.step) == 4  # 64 rows / bs16 = 4 steps x 1 epoch
    MainLogger.reset()


def test_batch_size_larger_than_dataset_fails_fast(tmp_path):
    """bs > dataset rows means 0 steps/epoch; the reference's DataLoader
    would silently yield nothing — jckx raises instead of writing an empty
    run dir with 'train finish 0.0s' (review finding)."""
    tr = _tiny_trainer(tmp_path, "bz", n_rows=8)  # bs=16 > 8 rows
    with pytest.raises(ValueError, match="0 steps/epoch"):
        tr.train()
    MainLogger.reset()


def test_sigterm_on_final_launch_still_runs_final_eval(tmp_path):
    """A SIGTERM landing during the run's FINAL launch must not lose the
    reference-mandated last-step evaluation (dcgan_trainer.py:198-222):
    training is complete, so a --resume would find nothing left to train
    and the final bests would never be computed (review finding)."""
    import signal as _signal

    stub = StubMetrics()
    tr = _tiny_trainer(tmp_path, "ft", metrics=stub, log_every=2, epoch=1)
    real_superstep = tr._superstep
    calls = {"n": 0}

    def kicking(*args):
        calls["n"] += 1
        out = real_superstep(*args)
        if calls["n"] == 2:  # K=2, 4 steps/epoch -> launch 2 is the final one
            os.kill(os.getpid(), _signal.SIGTERM)
            for _ in range(10**7):
                if tr._preempt.is_set():
                    break
            assert tr._preempt.is_set()
        return out

    tr._superstep = kicking
    tr.train()
    assert tr.preempted and int(tr.state.step) == 4
    # evals at it=2 (prev_it==0) AND the final it=4 — without the fix the
    # preempt branch broke out before the final one
    assert stub.calls == 2
    assert os.path.exists(os.path.join(tr.cfg.save_path, "latest.ckpt"))
    MainLogger.reset()


def test_second_train_call_preserves_loss_history(tmp_path):
    """The raise-epoch-budget pattern must carry the first call's loss
    history into the second call's checkpoints/loss.png — _resumed_losses
    is refreshed when train() returns (review finding)."""
    from jckx.checkpoint.checkpoint import restore_checkpoint

    tr = _tiny_trainer(tmp_path, "lh", epoch=1)
    tr.train()
    assert len(tr._resumed_losses) == 4
    tr.cfg.epoch = 2
    tr.train()
    assert len(tr._resumed_losses) == 8  # both segments, not just the last
    # and the persisted checkpoint carries the full history too
    _, extra = restore_checkpoint(
        os.path.join(tr.cfg.save_path, "latest.ckpt"), tr.state)
    assert len(extra["losses"]) == 8
    MainLogger.reset()


def test_rollback_failure_poisons_trainer(tmp_path):
    """If the post-divergence rollback itself fails (e.g. a latched async
    write error re-raised by flush_writes), the trainer must refuse further
    train() calls — its state is non-finite and step accounting is stale
    (review finding)."""
    tr = _tiny_trainer(tmp_path, "rbf", epoch=1)
    tr.train()  # writes latest.ckpt so a rollback WOULD be possible
    tr.cfg.epoch = 2
    tr._superstep = _nan_telemetry(tr._superstep)

    def exploding_rollback(step_hint):
        raise OSError("disk full")

    tr._rollback_after_divergence = exploding_rollback
    with pytest.raises(OSError, match="disk full"):
        tr.train()
    with pytest.raises(RuntimeError, match="rollback failed"):
        tr.train()
    MainLogger.reset()


def test_persist_losses_bounded():
    """Checkpoint sidecars persist at most _LOSS_PERSIST_CAP loss pairs
    (strided sample) so eval-boundary saves stay O(cap) on million-step
    runs; under the cap the history is exact (review finding)."""
    from types import SimpleNamespace

    from jckx.train.gan_trainer import _BaseGANTrainer

    host = SimpleNamespace(_LOSS_PERSIST_CAP=4)
    exact = _BaseGANTrainer._persist_losses(host, [1, 2, 3], [4, 5, 6])
    assert exact == [(1, 4), (2, 5), (3, 6)]
    big_d, big_g = list(range(10)), list(range(10, 20))
    capped = _BaseGANTrainer._persist_losses(host, big_d, big_g)
    assert len(capped) <= 4
    assert capped[0] == (0, 10)  # stride keeps the curve's global shape
    assert all(d + 10 == g for d, g in capped)
    assert capped[-1] == (9, 19)  # last index on the stride grid: no append
    # off-grid tail (n=12, stride 3 keeps 0,3,6,9): the FINAL pair is always
    # persisted so a resume's history ends at the actual last step (ADVICE r3)
    d12, g12 = list(range(12)), list(range(12, 24))
    tail = _BaseGANTrainer._persist_losses(host, d12, g12)
    assert tail[-1] == (11, 23)
    assert len(tail) <= 4 + 1  # at most one extra pair beyond the cap
