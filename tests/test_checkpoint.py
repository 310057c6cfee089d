"""Checkpoint round-trip: bytes → identical pytree, retention policy,
atomicity basics."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from jckx.checkpoint import (
    BestMetricCheckpointer,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from jckx.configs import Config
from jckx.models import dcgan
from jckx.models.dcgan import GANGeometry
from jckx.train.state import GANTrainState, make_optimizer


def _state(seed=0):
    cfg = Config()
    cfg.max_learning_rate = 2e-4
    geo = GANGeometry(image_size=16, base_width=8)
    tx = make_optimizer(cfg)
    pg = dcgan.generator_init(jax.random.PRNGKey(seed), geo)
    pd = dcgan.discriminator_init(jax.random.PRNGKey(seed + 1), geo)
    return GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                         opt_d=tx.init(pd), step=jnp.asarray(7, jnp.int32),
                         rng=jax.random.PRNGKey(9))


def test_roundtrip_bit_exact(tmp_path):
    s = _state()
    p = os.path.join(tmp_path, "x.ckpt")
    save_checkpoint(p, s, {"bests": {"fid": 1.5}})
    restored, extra = restore_checkpoint(p, _state(seed=42))  # different template values
    assert extra["bests"]["fid"] == 1.5
    assert int(restored.step) == 7
    for a, b in zip(jax.tree_util.tree_leaves(s), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_metric_retention(tmp_path):
    ck = BestMetricCheckpointer(str(tmp_path))
    s = _state()
    p1 = ck.save("fid", 100, (12.3456,), s)
    assert os.path.basename(p1) == "100_12.3456.ckpt"
    p2 = ck.save("fid", 200, (10.0,), s)
    files = [f for f in os.listdir(os.path.join(tmp_path, "fid")) if f.endswith(".ckpt")]
    assert files == [os.path.basename(p2)]  # previous deleted


def test_latest_checkpoint_lookup(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    ck = BestMetricCheckpointer(str(tmp_path))
    ck.save_latest(_state())
    assert latest_checkpoint(str(tmp_path)).endswith("latest.ckpt")


def test_async_write_ordering_and_flush(tmp_path):
    """Async mode: queued writes land in order (retention delete+write is
    one job), flush_writes surfaces completion, and restore reads the
    LAST queued state even if called immediately after the saves."""
    from jckx.checkpoint import flush_writes

    ck = BestMetricCheckpointer(str(tmp_path), async_write=True)
    s1, s2 = _state(1), _state(2)
    ck.save_latest(s1)
    ck.save("fid", 100, (1.0,), s1)
    ck.save_latest(s2)          # supersedes s1's latest
    ck.save("fid", 200, (0.5,), s2)  # retention: deletes the 100_ ckpt
    restored, _ = restore_checkpoint(str(tmp_path / "latest.ckpt"), s1)
    np.testing.assert_array_equal(
        np.asarray(restored.params_g["convt0"]),
        np.asarray(s2.params_g["convt0"]))
    flush_writes()
    kept = [f for f in os.listdir(tmp_path / "fid") if f.endswith(".ckpt")]
    assert kept == ["200_0.5000.ckpt"]


def test_submit_write_backpressure_and_pruning():
    """The writer queue prunes finished futures and blocks past 8 queued
    jobs instead of pinning snapshots without bound."""
    import threading
    import time as _time

    from jckx.checkpoint import flush_writes
    from jckx.checkpoint.checkpoint import _pending, submit_write

    gate = threading.Event()
    ran = []
    submit_write(gate.wait)  # blocks the single worker
    for i in range(8):
        submit_write(lambda i=i: ran.append(i))
    assert len(_pending) == 9

    t0 = _time.perf_counter()
    t = threading.Timer(0.3, gate.set)
    t.start()
    submit_write(lambda: ran.append(99))  # must block until the gate opens
    assert _time.perf_counter() - t0 >= 0.25
    flush_writes()
    assert ran[-1] == 99 and len(ran) == 9 and not _pending


def test_async_write_failure_reraised_by_flush():
    """A failing async write surfaces at flush_writes; the writer stays
    usable afterwards (the latched error is raised exactly once)."""
    import threading

    import pytest

    from jckx.checkpoint import flush_writes
    from jckx.checkpoint.checkpoint import submit_write

    gate = threading.Event()

    def boom():
        gate.wait(5)  # can't fail before submit_write returns (determinism:
        raise OSError("disk full")  # the latch must surface at FLUSH here)

    submit_write(boom)
    gate.set()
    with pytest.raises(OSError, match="disk full"):
        flush_writes()
    submit_write(lambda: None)  # no stale error re-raised
    flush_writes()


def test_async_write_failure_survives_prune():
    """A write that fails AND completes before the next enqueue must not be
    silently dropped by the finished-future prune (ADVICE r2, medium): the
    next submit_write re-raises it."""
    import threading
    from concurrent.futures import wait

    import pytest

    from jckx.checkpoint import flush_writes
    from jckx.checkpoint.checkpoint import _pending, submit_write

    gate = threading.Event()

    def boom():
        gate.wait(5)  # can't fail before submit_write returns (determinism:
        raise OSError("enospc")  # the latch must surface at the NEXT submit)

    submit_write(boom)
    gate.set()
    wait(list(_pending))  # job finishes (failed) without anyone .result()ing
    with pytest.raises(OSError, match="enospc"):
        submit_write(lambda: None)
    flush_writes()  # the lambda itself still ran; queue drains clean


def test_device_snapshot_fetch_once():
    """DeviceSnapshot transfers device→host exactly once and releases the
    device reference; all queued saves of one eval share the host copy."""
    from jckx.checkpoint import DeviceSnapshot

    snap = DeviceSnapshot({"a": jnp.arange(3.0)})
    h1 = snap.fetch()
    h2 = snap.fetch()
    assert h1 is h2 and snap._dev is None
    np.testing.assert_array_equal(np.asarray(h1["a"]), [0.0, 1.0, 2.0])


def test_save_latest_with_device_snapshot(tmp_path):
    """save_latest(DeviceSnapshot) round-trips through the async writer."""
    from jckx.checkpoint import DeviceSnapshot, flush_writes

    ck = BestMetricCheckpointer(str(tmp_path), async_fetch=True)
    s = _state(5)
    ck.save_latest(DeviceSnapshot(s))
    flush_writes()
    restored, _ = restore_checkpoint(str(tmp_path / "latest.ckpt"), _state(1))
    np.testing.assert_array_equal(
        np.asarray(restored.params_g["convt0"]), np.asarray(s.params_g["convt0"]))


def test_restore_ema_presence_mismatch_raises(tmp_path):
    """Both EMA-presence mismatch directions must fail loudly. flax raises
    for no-EMA-ckpt -> EMA-template on its own, but silently hands back the
    stored EMA tree as a raw dict in the other direction (observed live:
    a resume without --ema_decay 'succeeded' and then trained carrying a
    stale EMA) - restore_checkpoint now guards it explicitly."""
    import pytest

    from jckx.train.state import make_template_state

    geo = GANGeometry(image_size=16, base_width=8)
    with_ema = make_template_state(geo, with_ema=True)
    no_ema = make_template_state(geo, with_ema=False)

    p = os.path.join(tmp_path, "ema.ckpt")
    save_checkpoint(p, with_ema, {})
    with pytest.raises(ValueError, match="EMA"):
        restore_checkpoint(p, no_ema)

    p2 = os.path.join(tmp_path, "noema.ckpt")
    save_checkpoint(p2, no_ema, {})
    with pytest.raises(ValueError):
        restore_checkpoint(p2, with_ema)

    # matching presence still restores
    restored, _ = restore_checkpoint(p, make_template_state(geo, with_ema=True))
    assert restored.ema_g is not None
