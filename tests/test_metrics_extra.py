"""Beyond-reference metrics (jckx/metrics/extra.py): KID and k-NN manifold
precision/recall/density/coverage.

The reference's engine stops at IS/FID/intra-FID (metrics.py:97-141); these
pin the added metrics against direct-numpy references and their documented
invariances (subset order, row-chunk size, identical/disjoint sets)."""

import jax.numpy as jnp
import numpy as np
import pytest

from jckx.metrics.extra import (
    kid,
    kid_numpy_full,
    manifold_metrics,
    manifold_metrics_numpy,
)


def _feats(n, d, seed, shift=0.0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n, d) + shift).astype(np.float32)


def test_kid_full_subset_matches_numpy():
    """With subset_size = n for BOTH sets every subset is a permutation of
    the full sets, and the unbiased MMD² estimator is row-order invariant —
    so the device mean equals the direct numpy full-set value and the
    across-subset std collapses to ~0."""
    real, fake = _feats(36, 8, 0), _feats(36, 8, 1, shift=0.5)
    mean, std = kid(real, fake, subsets=5, subset_size=1000, seed=3)
    ref = kid_numpy_full(real, fake)
    np.testing.assert_allclose(mean, ref, rtol=1e-5, atol=1e-7)
    assert std < 1e-6 * max(1.0, abs(ref))


def test_kid_same_distribution_near_zero_and_shift_monotone():
    """Two INDEPENDENT draws of one distribution → E[unbiased MMD²] = 0
    (literally identical sets do NOT: the Kxy diagonal then carries k(x,x)
    and the estimator is legitimately negative — not tested as zero)."""
    x = _feats(512, 8, 2)
    same, same_std = kid(x, _feats(512, 8, 3), subsets=8, subset_size=256)
    near, _ = kid(x, _feats(512, 8, 4, shift=0.3), subsets=8, subset_size=256)
    far, _ = kid(x, _feats(512, 8, 5, shift=1.5), subsets=8, subset_size=256)
    assert abs(same) < 0.05 and abs(same) < 4 * same_std + 1e-3
    assert same < near < far


def test_kid_subsampled_determinism_and_spread():
    """subset_size < n exercises the real sampling path: same seed →
    identical (mean, std); the subset spread is a real positive number."""
    real, fake = _feats(80, 8, 5), _feats(50, 8, 6, shift=0.7)
    a = kid(real, fake, subsets=20, subset_size=32, seed=9)
    b = kid(real, fake, subsets=20, subset_size=32, seed=9)
    assert a == b
    assert a[1] > 0.0
    # subsampled estimate agrees with the full-set value within a few stds
    full = kid_numpy_full(real, fake)
    assert abs(a[0] - full) < 5 * a[1]


def test_kid_input_validation():
    with pytest.raises(ValueError, match="equal d"):
        kid(_feats(8, 4, 0), _feats(8, 5, 1))
    with pytest.raises(ValueError, match=">= 2 rows"):
        kid(_feats(1, 4, 0), _feats(8, 4, 1))


def test_manifold_metrics_match_numpy():
    real, fake = _feats(25, 6, 7), _feats(19, 6, 8, shift=0.4)
    got = manifold_metrics(real, fake, k=3)
    ref = manifold_metrics_numpy(real, fake, k=3)
    assert set(got) == {"precision", "recall", "density", "coverage"}
    for key in ref:
        np.testing.assert_allclose(got[key], ref[key], rtol=1e-5, atol=1e-6,
                                   err_msg=key)


def test_manifold_metrics_chunk_invariant_and_device_input():
    """Row-chunked sweeps (incl. the row-padding path: 25 % 4 != 0) must be
    chunk-size invariant, and jax-array features work as-is."""
    real, fake = _feats(25, 6, 9), _feats(19, 6, 10, shift=0.2)
    a = manifold_metrics(real, fake, k=2, row_chunk=4)
    b = manifold_metrics(jnp.asarray(real), jnp.asarray(fake), k=2,
                         row_chunk=2048)
    for key in a:
        np.testing.assert_allclose(a[key], b[key], rtol=1e-6, err_msg=key)


def test_manifold_metrics_identical_and_disjoint():
    x = _feats(30, 5, 11)
    same = manifold_metrics(x, x.copy(), k=3)
    assert same["precision"] == same["recall"] == same["coverage"] == 1.0
    assert same["density"] >= 1.0 / 3.0  # every fake hits its own ball
    far = manifold_metrics(x, _feats(30, 5, 12, shift=50.0), k=3)
    assert far["precision"] == far["recall"] == 0.0
    assert far["density"] == far["coverage"] == 0.0


def test_manifold_metrics_validation():
    with pytest.raises(ValueError, match="> k"):
        manifold_metrics(_feats(3, 4, 0), _feats(10, 4, 1), k=3)


def test_metrics_class_kid_prdc_share_extraction(tmp_path):
    """Metrics.kid / Metrics.prdc run against the engine's real features and
    accept a shared pre-extracted feature matrix like fid()/intra_fid()."""
    from jckx.metrics.metrics import Metrics

    rng = np.random.RandomState(13)
    real_u8 = rng.randint(0, 255, size=(12, 16, 16, 3), dtype=np.uint8)
    labels = rng.randint(0, 100, size=(12,))
    m = Metrics((real_u8, labels), batch_size=6, compute_dtype=jnp.float32,
                cache_dir=str(tmp_path), num_classes=100)
    fake = rng.uniform(-1, 1, size=(10, 32, 32, 3)).astype(np.float32)
    feats = m.extract_features(fake)

    mean, std = m.kid(features=feats, subsets=4, subset_size=10)
    assert np.isfinite(mean) and np.isfinite(std)
    res = m.prdc(features=feats, k=3)
    assert set(res) == {"precision", "recall", "density", "coverage"}
    assert all(np.isfinite(v) for v in res.values())
    # extraction path (images in, no precomputed features) agrees
    mean2, _ = m.kid(images_tanh=fake, subsets=4, subset_size=10)
    np.testing.assert_allclose(mean, mean2, rtol=1e-5, atol=1e-8)


def test_trainer_logs_extra_metrics_opt_in(tmp_path):
    """--extra_metrics 1: every eval boundary's metrics.jsonl row carries
    kid/kid_std/precision/recall/density/coverage next to fid/is, computed
    from the shared extraction; best-metric checkpointing is untouched
    (still only fid/ and is/ dirs for DCGAN)."""
    import json
    import os

    from jckx.data.pipeline import DCGANDataPreprocessor
    from jckx.logging.main_logger import MainLogger
    from jckx.models import dcgan
    from jckx.models.dcgan import GANGeometry
    from jckx.rng import KeyChain, seed_everything
    from jckx.train.gan_trainer import DCGANTrainer
    from tests.test_trainer import StubMetrics, tiny_cfg

    class StubWithExtra(StubMetrics):
        def kid(self, images_tanh=None, features=None, **kw):
            assert features is not None
            return 0.25, 0.03

        def prdc(self, images_tanh=None, features=None, k=3):
            assert features is not None
            return {"precision": 0.9, "recall": 0.8,
                    "density": 1.1, "coverage": 0.7}

    cfg = tiny_cfg(tmp_path)
    cfg.extra_metrics = 1
    cfg.log_file = 1  # metrics.jsonl only attaches with the file logger
    data_pre = DCGANDataPreprocessor(cfg)
    data_pre.images_u8 = data_pre.images_u8[:64]  # 4 steps -> 1 eval + final
    data_pre.labels_np = data_pre.labels_np[:64]
    data_pre.transform_data()
    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
    keys = KeyChain(seed_everything(1))
    tr = DCGANTrainer(cfg, dcgan.generator_init(keys.next(), geo),
                      dcgan.discriminator_init(keys.next(), geo),
                      data_pre, metrics=StubWithExtra())
    tr.train()
    MainLogger.reset()

    with open(os.path.join(cfg.save_path, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    eval_rows = [r for r in rows if "fid" in r]
    assert eval_rows, "no eval boundary logged"
    for r in eval_rows:
        assert r["kid"] == 0.25 and r["kid_std"] == 0.03
        assert r["precision"] == 0.9 and r["coverage"] == 0.7
    assert sorted(
        d for d in os.listdir(cfg.save_path)
        if os.path.isdir(os.path.join(cfg.save_path, d)) and d != "img"
    ) == ["fid", "is"]


def test_evaluate_cli_flags_append_extra_metrics(tmp_path):
    """--kid 1 --prdc 1 extend the evaluate JSON from the same extraction;
    default output is unchanged (drop-in parity)."""
    from jckx.evaluate import evaluate, get_args
    from jckx.models.dcgan import GANGeometry
    from tests.test_evaluate import _dcgan_pt
    from tests.test_trainer import StubMetrics

    class StubWithExtra(StubMetrics):
        def kid(self, images_tanh=None, features=None, **kw):
            assert features is not None  # must reuse the shared extraction
            return 0.125, 0.5

        def prdc(self, images_tanh=None, features=None, k=3):
            assert features is not None
            return {"precision": 1.0, "recall": 0.5,
                    "density": 0.25, "coverage": 0.75}

    geo = GANGeometry(z_dim=16, image_size=16, channels=3, base_width=8)
    path = _dcgan_pt(tmp_path, geo)
    base = ["--ckpt", path, "--dataset", "synthetic",
            "--sample_count", "8", "--compute_dtype", "float32"]
    res = evaluate(get_args(base), metrics=StubWithExtra())
    assert set(res) == {"step", "n", "is", "fid"}
    res = evaluate(get_args(base + ["--kid", "1", "--prdc", "1"]),
                   metrics=StubWithExtra())
    assert res["kid"] == 0.125 and res["kid_std"] == 0.5
    assert res["precision"] == 1.0 and res["coverage"] == 0.75


def test_knn_radii_stays_jitted():
    """_knn_radii must be a jitted callable: a doc-level edit once inserted
    a function between its @jax.jit decorator and the def, silently making
    every prdc fake-set radii computation run eagerly op-by-op (seconds of
    dispatch overhead per eval on a remote runtime, no error raised)."""
    from jckx.metrics import extra

    assert hasattr(extra._knn_radii, "lower"), (
        "_knn_radii lost its jax.jit wrapper")
