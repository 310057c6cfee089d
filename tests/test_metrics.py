"""Metric-stack numeric goldens (SURVEY.md §4): Newton–Schulz sqrtm vs
scipy, Fréchet-distance analytics, IS vs the scipy-entropy formulation,
torch-checkpoint converter roundtrip, and a tiny end-to-end smoke."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.linalg
import scipy.stats

from jckx.metrics.fid import (
    frechet_distance,
    inception_score_from_probs,
    mean_and_cov,
    newton_schulz_sqrtm,
    psd_sqrtm,
)


def test_psd_sqrtm_rank_deficient():
    # covariance of 16 samples in 100-dim (rank ≤ 15) must stay finite
    rng = np.random.RandomState(7)
    f = rng.randn(16, 100).astype(np.float32)
    c = np.cov(f, rowvar=False).astype(np.float32)
    s = np.asarray(psd_sqrtm(jnp.asarray(c)))
    assert np.isfinite(s).all()
    np.testing.assert_allclose(s @ s, c, atol=5e-3)
    # and the full distance between two degenerate sets is finite
    f2 = rng.randn(16, 100).astype(np.float32)
    mu1, s1 = mean_and_cov(jnp.asarray(f))
    mu2, s2 = mean_and_cov(jnp.asarray(f2))
    assert np.isfinite(float(frechet_distance(mu1, s1, mu2, s2)))


def _spd(n, seed, scale=1.0):
    rng = np.random.RandomState(seed)
    a = rng.randn(n, 4 * n).astype(np.float32)
    return (a @ a.T) / (4 * n) * scale + 1e-3 * np.eye(n, dtype=np.float32)


@pytest.mark.parametrize("n,scale", [(16, 1.0), (100, 1.0), (100, 25.0)])
def test_newton_schulz_matches_scipy(n, scale):
    a = _spd(n, seed=n, scale=scale)
    ours = np.asarray(newton_schulz_sqrtm(jnp.asarray(a)))
    ref = scipy.linalg.sqrtm(a.astype(np.float64)).real
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-12)
    assert err < 2e-3, err


def test_frechet_zero_for_identical():
    mu = jnp.asarray(np.random.RandomState(0).randn(64).astype(np.float32))
    sigma = jnp.asarray(_spd(64, 1))
    d = float(frechet_distance(mu, sigma, mu, sigma))
    assert abs(d) < 0.05  # trace ~ 10; tolerance from f32 NS iteration


def test_frechet_diagonal_analytic():
    # diagonal case: d² = Σ(μ1-μ2)² + Σ(√s1 - √s2)²
    rng = np.random.RandomState(2)
    mu1, mu2 = rng.randn(32).astype(np.float32), rng.randn(32).astype(np.float32)
    s1 = np.abs(rng.rand(32)).astype(np.float32) + 0.1
    s2 = np.abs(rng.rand(32)).astype(np.float32) + 0.1
    d = float(
        frechet_distance(jnp.asarray(mu1), jnp.diag(jnp.asarray(s1)),
                         jnp.asarray(mu2), jnp.diag(jnp.asarray(s2)))
    )
    expected = float(((mu1 - mu2) ** 2).sum() + ((np.sqrt(s1) - np.sqrt(s2)) ** 2).sum())
    assert abs(d - expected) < 1e-2 * max(1.0, expected)


def test_frechet_matches_scipy_pipeline():
    # full-stack comparison against the reference's host formulation
    rng = np.random.RandomState(3)
    f1 = rng.randn(500, 40).astype(np.float32)
    f2 = (rng.randn(500, 40) * 1.3 + 0.2).astype(np.float32)
    mu1, s1 = mean_and_cov(jnp.asarray(f1))
    mu2, s2 = mean_and_cov(jnp.asarray(f2))
    ours = float(frechet_distance(mu1, s1, mu2, s2))

    m1, c1 = f1.mean(0), np.cov(f1, rowvar=False)
    m2, c2 = f2.mean(0), np.cov(f2, rowvar=False)
    covmean = scipy.linalg.sqrtm(c1.dot(c2))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    ref = ((m1 - m2) ** 2).sum() + np.trace(c1 + c2 - 2.0 * covmean)
    assert abs(ours - ref) / abs(ref) < 5e-3


def test_inception_score_matches_scipy_formulation():
    rng = np.random.RandomState(4)
    logits = rng.randn(100, 20).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    ours = float(inception_score_from_probs(jnp.asarray(probs), splits=10))

    # reference formulation (metrics.py:97-110)
    n, splits = 100, 10
    split_scores = []
    for k in range(splits):
        part = probs[k * (n // splits): (k + 1) * (n // splits)]
        py = part.mean(axis=0)
        scores = [scipy.stats.entropy(part[i], py) for i in range(part.shape[0])]
        split_scores.append(np.exp(np.mean(scores)))
    ref = float(np.mean(split_scores))
    assert abs(ours - ref) < 1e-3 * ref


def test_inception_uniform_probs_gives_score_one():
    probs = jnp.full((50, 10), 0.1)
    assert abs(float(inception_score_from_probs(probs, splits=10)) - 1.0) < 1e-4


def _torch_style_sd(params) -> dict:
    """Torch-layout flat state_dict of our pytree (inverse of the converter)."""
    sd = {}

    def emit(prefix, p):
        sd[f"{prefix}.conv.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        sd[f"{prefix}.bn.weight"] = np.asarray(p["bn_scale"])
        sd[f"{prefix}.bn.bias"] = np.asarray(p["bn_bias"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(p["bn_mean"])
        sd[f"{prefix}.bn.running_var"] = np.asarray(p["bn_var"])

    for name, block in params.items():
        if name == "fc":
            sd["fc.0.weight"] = np.asarray(block["w"]).T
            sd["fc.0.bias"] = np.asarray(block["b"])
        elif "w" in block:
            emit(name, block)
        else:
            for br, p in block.items():
                emit(f"{name}.{br}", p)
    return sd


def test_convert_torch_state_dict_roundtrip():
    """Build a torch-style flat state_dict from our init (inverse layout) and
    check the converter reconstructs the pytree bit-exactly."""
    from jckx.metrics import inception_v3

    params = inception_v3.init(jax.random.PRNGKey(1), num_classes=7)
    out = inception_v3.convert_torch_state_dict(_torch_style_sd(params))
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(out)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_torch_state_dict_real_artifact_shape():
    """The REAL loss_bset.pt is ``model.state_dict()`` of a torchvision
    ``inception_v3(pretrained=True)`` whose aux head was disabled only as a
    post-hoc attribute (reference inceptionnet.ipynb cells at lines 48, 441,
    1904) — so it still contains ``AuxLogits.*`` parameters, plus every
    BN's ``num_batches_tracked`` buffer. The converter must ignore both and
    land bit-exact on the keys it needs."""
    from jckx.metrics import inception_v3

    params = inception_v3.init(jax.random.PRNGKey(2), num_classes=7)
    sd = _torch_style_sd(params)
    # num_batches_tracked next to every BN, like torch's state_dict
    for k in [k for k in sd if k.endswith(".bn.running_mean")]:
        sd[k.replace(".running_mean", ".num_batches_tracked")] = np.asarray(
            1234, np.int64)
    # the aux classifier head (torchvision InceptionAux layout)
    rng = np.random.RandomState(0)
    for blk, cin, cout in (("conv0", 768, 128), ("conv1", 128, 768)):
        sd[f"AuxLogits.{blk}.conv.weight"] = rng.randn(cout, cin, 1, 1).astype(np.float32)
        for suffix, shape in (("weight", cout), ("bias", cout),
                              ("running_mean", cout), ("running_var", cout)):
            sd[f"AuxLogits.{blk}.bn.{suffix}"] = rng.randn(shape).astype(np.float32)
        sd[f"AuxLogits.{blk}.bn.num_batches_tracked"] = np.asarray(7, np.int64)
    sd["AuxLogits.fc.weight"] = rng.randn(7, 768).astype(np.float32)
    sd["AuxLogits.fc.bias"] = rng.randn(7).astype(np.float32)

    out = inception_v3.convert_torch_state_dict(sd)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(out)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_inception_v3_forward_shape():
    from jckx.metrics import inception_v3

    params = inception_v3.init(jax.random.PRNGKey(0), num_classes=100)
    x = jnp.zeros((2, 299, 299, 3))
    logits = inception_v3.apply(params, x)
    assert logits.shape == (2, 100)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_metrics_end_to_end_smoke():
    """Tiny Metrics run with the seeded random backbone: cache written,
    IS/FID finite, fake-vs-real FID > self-FID sanity."""
    import tempfile

    from jckx.metrics.metrics import Metrics

    rng = np.random.RandomState(0)
    real_u8 = rng.randint(0, 255, size=(16, 32, 32, 3), dtype=np.uint8)
    labels = rng.randint(0, 100, size=(16,))
    with tempfile.TemporaryDirectory() as td:
        m = Metrics((real_u8, labels), batch_size=8, compute_dtype=jnp.float32,
                    cache_dir=td, num_classes=100)
        assert m.real_features.shape == (16, 100)

        fake = rng.uniform(-1, 1, size=(20, 64, 64, 3)).astype(np.float32)
        is_score = m.inception_score(fake)
        fid = m.fid(fake)
        assert np.isfinite(is_score) and is_score >= 1.0 - 1e-3
        assert np.isfinite(fid) and fid >= 0

        # near-real images score a lower FID than uniform noise
        near_real = (real_u8.astype(np.float32) / 127.5 - 1.0)
        fid_real = m.fid(near_real)
        assert fid_real < fid


def test_intra_fid_grouping_logic():
    """intra_fid groups the class-major fake grid by superclass and divides
    by 100 (reference quirk) — tested with injected features, no backbone."""
    from jckx.metrics.metrics import Metrics

    rng = np.random.RandomState(1)
    feats = rng.randn(1000, 16).astype(np.float32)

    m = Metrics.__new__(Metrics)  # bypass backbone init
    from jckx.data.datasets import FINE_TO_SUPERCLASS

    m.real_features = rng.randn(2000, 16).astype(np.float32)
    labels = rng.randint(0, 100, size=(2000,))
    real_super = FINE_TO_SUPERCLASS[labels]
    m.real_superclass_idx = {s: np.nonzero(real_super == s)[0] for s in range(20)}
    fake_targets = np.repeat(np.arange(100), 10)
    fake_super = FINE_TO_SUPERCLASS[fake_targets]
    m.fake_superclass_idx = {s: np.nonzero(fake_super == s)[0] for s in range(20)}
    m.intra_fid_divisor = 100.0
    m._real_mu_sigma = None
    m._real_super_stats = None
    m.active_superclasses = [
        s for s in range(20)
        if len(m.fake_superclass_idx[s]) > 1 and len(m.real_superclass_idx[s]) > 1
    ]
    m.extract_features = lambda imgs: feats  # inject

    val = m.intra_fid(images_tanh=None)
    assert np.isfinite(val)
    # each superclass has 50 fake samples (10 per class × 5 classes)
    assert all(len(v) == 50 for v in m.fake_superclass_idx.values())

    # features= short-circuit is the same computation (trainer path)
    assert m.intra_fid(features=feats) == val

    # the batched single-program path ≡ the per-superclass loop
    loop_total = sum(
        m.fid(features=feats[m.fake_superclass_idx[s]], intra_fid=True, label=s)
        for s in m.active_superclasses
    )
    assert abs(val - loop_total / m.intra_fid_divisor) < 1e-3 * max(1.0, abs(val))


def test_intra_fid_skips_empty_superclasses_small_num_classes():
    """num_classes=10 (cifar10/mnist): most superclass buckets are empty —
    intra_fid must stay finite (ADVICE r1: empty buckets made mean_and_cov
    emit NaN and poisoned best-ckpt tracking)."""
    from jckx.data.datasets import FINE_TO_SUPERCLASS
    from jckx.metrics.metrics import Metrics

    rng = np.random.RandomState(2)
    ncls = 10
    m = Metrics.__new__(Metrics)
    labels = rng.randint(0, ncls, size=(500,))
    real_super = FINE_TO_SUPERCLASS[labels % 100]
    m.real_features = rng.randn(500, 16).astype(np.float32)
    m.real_superclass_idx = {s: np.nonzero(real_super == s)[0] for s in range(20)}
    fake_targets = np.repeat(np.arange(ncls), 10)
    fake_super = FINE_TO_SUPERCLASS[fake_targets % 100]
    m.fake_superclass_idx = {s: np.nonzero(fake_super == s)[0] for s in range(20)}
    m.intra_fid_divisor = 100.0
    m._real_mu_sigma = None
    m._real_super_stats = None
    m.active_superclasses = [
        s for s in range(20)
        if len(m.fake_superclass_idx[s]) > 1 and len(m.real_superclass_idx[s]) > 1
    ]
    assert 0 < len(m.active_superclasses) < 20

    feats = rng.randn(10 * ncls, 16).astype(np.float32)
    val = m.intra_fid(features=feats)
    assert np.isfinite(val)


def test_extract_features_device_array_matches_host():
    """A device-resident image set (trainer eval path) produces the same
    features as the host-array path."""
    import tempfile

    from jckx.metrics.metrics import Metrics

    rng = np.random.RandomState(5)
    real_u8 = rng.randint(0, 255, size=(8, 16, 16, 3), dtype=np.uint8)
    labels = rng.randint(0, 100, size=(8,))
    with tempfile.TemporaryDirectory() as td:
        m = Metrics((real_u8, labels), batch_size=4, compute_dtype=jnp.float32,
                    cache_dir=td, num_classes=100)
        fake = rng.uniform(-1, 1, size=(10, 32, 32, 3)).astype(np.float32)
        host = m.extract_features(fake)
        dev = m.extract_features(jnp.asarray(fake))
        np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-6)


def test_content_sig_cross_mechanism_and_large_leaf_sensitivity():
    """The backbone fingerprint must (a) agree between an in-memory pytree
    and the same weights loaded from an .npz (one extraction cache, not two
    — ADVICE r2), and (b) change when ONLY a large conv kernel moves, since
    fine-tune epochs can leave every small BN vector nearly fixed while the
    deep kernels drift (VERDICT r2 weak #3)."""
    from jckx.metrics import inception_v3
    from jckx.metrics.metrics import Metrics, _flatten_leaves, flatten_params

    params = inception_v3.init(jax.random.PRNGKey(3), num_classes=7)
    sig_pytree = Metrics._content_sig(_flatten_leaves(params))
    assert sig_pytree is not None

    # same weights through the npz path (host numpy, flat "a/b/c" keys)
    flat = flatten_params(jax.device_get(params))
    assert Metrics._content_sig(flat) == sig_pytree

    # perturb ONLY the single largest leaf — the strided sample must see it
    big = max(flat, key=lambda k: flat[k].size)
    bumped = dict(flat)
    bumped[big] = flat[big] + 1e-3
    assert Metrics._content_sig(bumped) != sig_pytree

    # perturbing one small (BN-sized) leaf re-keys too
    small = min((k for k in flat if flat[k].size <= 4096),
                key=lambda k: flat[k].size)
    bumped2 = dict(flat)
    bumped2[small] = flat[small] + 1e-3
    assert Metrics._content_sig(bumped2) != sig_pytree


def test_backbone_cache_tag_changes_across_finetune_epochs(tmp_path):
    """Epoch-1 vs epoch-2 checkpoints of a tiny fine-tune get DIFFERENT
    real-feature cache tags (VERDICT r2 task 6): stale features from an
    earlier backbone are never served to a later one."""
    from jckx.metrics.inception_train import get_args, train
    from jckx.metrics.metrics import Metrics

    def run(save, epochs):
        args = get_args([
            "--dataset", "synthetic", "--synthetic_size", "32",
            "-b", "8", "-e", str(epochs), "--image_size", "75",
            "-mlr", "0.01", "--eval_samples", "8", "--scan_steps", "2",
            "--save_dir", str(save), "--save_path", str(tmp_path),
        ])
        train(args)
        with np.load(save / "last_bset.npz") as z:
            return dict(z)

    flat1 = run(tmp_path / "e1", 1)
    flat2 = run(tmp_path / "e2", 2)
    sig1, sig2 = Metrics._content_sig(flat1), Metrics._content_sig(flat2)
    assert sig1 is not None and sig1 != sig2
    # determinism: hashing the same checkpoint twice gives the same tag
    assert Metrics._content_sig(flat1) == sig1


def test_content_sig_samples_span_whole_leaf():
    """Regression: for leaf sizes in (4096, 8192) a floor-division stride
    hashed only a prefix — a change in the leaf's tail must re-key."""
    from jckx.metrics.metrics import Metrics

    base = {"w": np.zeros(8191, np.float32)}
    s1 = Metrics._content_sig(base)
    bumped = {"w": base["w"].copy()}
    bumped["w"][-1] = 1.0  # last element, outside the old prefix sample
    assert Metrics._content_sig(bumped) != s1


def test_fast_stem_unit_equivalence():
    """_bconv_1a_s2d computes the same function as the strided stem conv:
    every original tap appears once, phantom taps multiply zeros (odd and
    even input sizes both exercise the padding arm)."""
    from jckx.metrics.inception_v3 import (_bconv_1a_s2d, _bconv_apply,
                                           _bconv_init)

    rng = np.random.RandomState(0)
    p = {k: jnp.asarray(v) for k, v in _bconv_init(rng, 3, 3, 3, 8).items()}
    for h in (9, 10, 21):
        x = jnp.asarray(rng.standard_normal((2, h, h, 3)).astype(np.float32))
        ref = _bconv_apply(p, x, stride=2)
        fast = _bconv_1a_s2d(p, x)
        assert fast.shape == ref.shape
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_fast_stem_full_graph_equivalence():
    """apply(fast_stem=True) matches the default graph through all 94 convs
    to accumulated-rounding tolerance, and Metrics honors the flag."""
    from jckx.metrics import inception_v3
    from jckx.metrics.metrics import Metrics

    params = inception_v3.init(0, num_classes=10)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.standard_normal((2, 299, 299, 3)).astype(np.float32))
    ref = np.asarray(inception_v3.apply(params, x))
    fast = np.asarray(inception_v3.apply(params, x, fast_stem=True))
    np.testing.assert_allclose(fast, ref, rtol=3e-3, atol=3e-3)

    real_u8 = rng.randint(0, 255, size=(8, 32, 32, 3), dtype=np.uint8)
    labels = rng.randint(0, 100, size=(8,))
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        m = Metrics((real_u8, labels), batch_size=8,
                    compute_dtype=jnp.float32, cache_dir=td, fast_stem=True)
        assert m.fast_stem
        gen = rng.uniform(-1, 1, size=(8, 32, 32, 3)).astype(np.float32)
        with tempfile.TemporaryDirectory() as td2:
            m0 = Metrics((real_u8, labels), batch_size=8,
                         compute_dtype=jnp.float32, cache_dir=td2)
        f1 = m.extract_features(gen)
        f0 = m0.extract_features(gen)
        np.testing.assert_allclose(f1, f0, rtol=5e-3, atol=5e-3)


def test_fast_stem_rekeys_real_feature_cache(tmp_path):
    """Toggling the stem variant must NOT reuse the other variant's cached
    real features — the A/B would otherwise mix two numerically different
    pipelines under one key."""
    import os

    from jckx.metrics.metrics import Metrics

    rng = np.random.RandomState(3)
    real_u8 = rng.randint(0, 255, size=(8, 32, 32, 3), dtype=np.uint8)
    labels = rng.randint(0, 100, size=(8,))
    Metrics((real_u8, labels), batch_size=8, compute_dtype=jnp.float32,
            cache_dir=str(tmp_path))
    Metrics((real_u8, labels), batch_size=8, compute_dtype=jnp.float32,
            cache_dir=str(tmp_path), fast_stem=True)
    files = sorted(os.listdir(tmp_path))
    assert len(files) == 2 and any(f.endswith("-s2d.npz") for f in files)


def test_explicit_missing_backbone_raises(tmp_path):
    """An explicitly-configured --metric_backbone that does not exist must be
    a hard error — silently falling back to a default/seeded backbone would
    derive every FID/IS absolute from the wrong network."""
    from jckx.metrics.metrics import Metrics

    real_u8 = (np.arange(8 * 16 * 16 * 3) % 255).astype(np.uint8).reshape(8, 16, 16, 3)
    labels = np.zeros(8, np.int32)

    class C:
        metric_backbone = str(tmp_path / "does_not_exist.npz")

    with pytest.raises(FileNotFoundError, match="metric_backbone"):
        Metrics((real_u8, labels), config=C(), batch_size=4,
                compute_dtype=jnp.float32, num_classes=10)


def test_backbone_discovered_under_config_save_root(tmp_path):
    """Metrics searches <save_root>/iception_v3 before the hardcoded
    ./save/iception_v3 — a run with a relocated --save_root must find the
    backbone jckx.doctor --save_root reports, instead of silently falling
    back to the seeded-random one (review finding)."""
    from jckx.metrics import inception_v3
    from jckx.metrics.metrics import Metrics, flatten_params

    params = inception_v3.init(1, num_classes=10)
    bdir = tmp_path / "iception_v3"
    bdir.mkdir()
    flat = {k: np.asarray(v) for k, v in flatten_params(params).items()}
    with open(bdir / "loss_bset.npz", "wb") as f:
        np.savez(f, **flat)

    real_u8 = (np.arange(8 * 16 * 16 * 3) % 255).astype(np.uint8).reshape(8, 16, 16, 3)
    labels = np.zeros(8, np.int32)

    class C:
        metric_backbone = ""
        save_root = str(tmp_path)

    m = Metrics((real_u8, labels), config=C(), batch_size=4,
                compute_dtype=jnp.float32, num_classes=10,
                cache_dir=str(tmp_path / "cache"))
    assert not m._backbone_sig.startswith("seeded-random")


def test_eval_resize_matches_torch_bilinear_upscale():
    """The eval pipeline's bilinear upscale to 299² (metrics.py
    ``_normalize_299``) must equal torch's
    ``F.interpolate(align_corners=False)`` — the tensor-mode Resize the
    reference's eval transform performs (dcgan_trainer.py:203-208;
    antialiasing is a no-op when upscaling). FID/IS absolutes are only
    comparable across the two stacks if the resampling grids agree.
    Verified to float ulp for the CIFAR (64→299, RGB) and MNIST-style
    (28→299, grayscale) geometries."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    for n, s, c in ((2, 64, 3), (2, 28, 1)):
        x = rng.rand(n, s, s, c).astype(np.float32)
        ours = np.asarray(jax.image.resize(
            jnp.asarray(x), (n, 299, 299, c), method="bilinear"))
        ref = F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(299, 299),
            mode="bilinear", align_corners=False, antialias=False,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-5)


def test_extract_features_mesh_sharded_matches_single_device():
    """Multi-chip eval: extraction batches sharded over an 8-way 'data'
    axis (host-array AND device-array inputs, incl. the bs<shards rounding
    path) produce the same features as the single-device path — the
    backbone forward is per-sample, so batch parallelism must not change
    values beyond conv ulps."""
    import tempfile

    from jckx.metrics.metrics import Metrics
    from jckx.parallel import make_mesh

    rng = np.random.RandomState(6)
    real_u8 = rng.randint(0, 255, size=(8, 16, 16, 3), dtype=np.uint8)
    labels = rng.randint(0, 100, size=(8,))
    fake = rng.uniform(-1, 1, size=(10, 32, 32, 3)).astype(np.float32)

    with tempfile.TemporaryDirectory() as td:
        m1 = Metrics((real_u8, labels), batch_size=4, compute_dtype=jnp.float32,
                     cache_dir=td, num_classes=100)
        f1 = m1.extract_features(fake)
        real1 = m1.real_features
    with tempfile.TemporaryDirectory() as td:
        m8 = Metrics((real_u8, labels), batch_size=4, compute_dtype=jnp.float32,
                     cache_dir=td, num_classes=100, mesh=make_mesh())
        assert m8._batch_sharding is not None and m8._round_bs(4) == 8
        f8 = m8.extract_features(fake)
        f8_dev = m8.extract_features(jnp.asarray(fake))
        real8 = m8.real_features

    np.testing.assert_allclose(f1, f8, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(f8, f8_dev, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(real1, real8, rtol=1e-5, atol=1e-6)


def test_multi_slab_double_buffered_extraction_matches_single_slab(monkeypatch):
    """Host-array sets above _SLAB_BYTES stream in ≤256 MB slabs with the
    next slab's upload prefetched while the device chews the current one
    (double-buffered, r4). Shrink the slab budget so a small set spans
    several slabs — incl. a tail that the shared-executable padding rounds
    up — and pin feature equality against the one-slab path."""
    import tempfile

    from jckx.metrics.metrics import Metrics

    rng = np.random.RandomState(7)
    real_u8 = rng.randint(0, 255, size=(8, 16, 16, 3), dtype=np.uint8)
    labels = rng.randint(0, 100, size=(8,))
    # 18 images / bs 4 → 5 padded batches; slab budget of 2 batches → 3
    # slabs with a padded tail (nb=5 → nb_padded=6)
    fake = rng.uniform(-1, 1, size=(18, 16, 16, 3)).astype(np.float32)

    with tempfile.TemporaryDirectory() as td:
        m = Metrics((real_u8, labels), batch_size=4,
                    compute_dtype=jnp.float32, cache_dir=td, num_classes=100)
        one_slab = m.extract_features(fake)
        row = fake[:1].nbytes
        monkeypatch.setattr(Metrics, "_SLAB_BYTES", row * 4 * 2)
        multi_slab = m.extract_features(fake)

    assert one_slab.shape == multi_slab.shape == (18, 100)
    np.testing.assert_allclose(one_slab, multi_slab, rtol=1e-6, atol=1e-7)
