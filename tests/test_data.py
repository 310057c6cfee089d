"""Data layer tests: synthetic determinism, loader mechanics, decode
golden (normalize to [-1,1], resize), superclass map vs reference indices."""

import numpy as np
import jax.numpy as jnp

from jckx.configs import Config
from jckx.data.datasets import (
    CIFAR100_CLASSES,
    FINE_TO_SUPERCLASS,
    superclass_of,
    synthetic_dataset,
)
from jckx.data.pipeline import (
    CGANDataPreprocessor,
    DCGANDataPreprocessor,
    DeviceDataLoader,
    decode_batch,
)


def test_superclass_map_matches_reference_samples():
    # spot-check against the reference's numeric dict (metrics.py:23-44):
    # {4,30,55,72,95}→0, {1,32,67,73,91}→1, {41,69,81,85,89}→19
    for idx in (4, 30, 55, 72, 95):
        assert superclass_of(idx) == 0
    for idx in (1, 32, 67, 73, 91):
        assert superclass_of(idx) == 1
    for idx in (41, 69, 81, 85, 89):
        assert superclass_of(idx) == 19
    # every superclass has exactly 5 members
    counts = np.bincount(FINE_TO_SUPERCLASS, minlength=20)
    assert (counts == 5).all()
    assert len(CIFAR100_CLASSES) == 100
    assert CIFAR100_CLASSES == sorted(CIFAR100_CLASSES)  # alphabetical index order


def test_synthetic_deterministic_and_classful():
    x1, y1 = synthetic_dataset(128, 32, 3, 100, seed=5)
    x2, y2 = synthetic_dataset(128, 32, 3, 100, seed=5)
    assert (x1 == x2).all() and (y1 == y2).all()
    assert x1.dtype == np.uint8 and x1.shape == (128, 32, 32, 3)
    # different classes → different images (signal for the conditional model)
    a = x1[y1 == y1[0]][0].astype(int)
    other = x1[y1 != y1[0]][0].astype(int)
    assert np.abs(a - other).mean() > 2


def test_decode_batch_range_and_resize():
    u8 = jnp.asarray((np.arange(2 * 32 * 32 * 3) % 256).reshape(2, 32, 32, 3).astype(np.uint8))
    out = decode_batch(u8, 64)
    assert out.shape == (2, 64, 64, 3)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
    # identity path when already at size
    u8s = jnp.zeros((2, 64, 64, 3), jnp.uint8)
    out2 = decode_batch(u8s, 64)
    assert float(out2.min()) == -1.0  # 0 → -1


def test_decode_resize_matches_pil_bilinear():
    """The reference upscales 32→64 with PIL bilinear (tt.Resize(64));
    jax.image.resize bilinear must agree within interpolation tolerance."""
    from PIL import Image

    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, size=(1, 32, 32, 3), dtype=np.uint8)
    ours = np.asarray(decode_batch(jnp.asarray(u8), 64))  # [-1,1]
    ours01 = (ours[0] + 1.0) / 2.0

    pil = Image.fromarray(u8[0]).resize((64, 64), Image.BILINEAR)
    ref01 = np.asarray(pil, np.float32) / 255.0
    # PIL aligns sample grids slightly differently (half-pixel centers);
    # interiors agree closely
    diff = np.abs(ours01[2:-2, 2:-2] - ref01[2:-2, 2:-2])
    assert diff.mean() < 0.02 and diff.max() < 0.2


def test_device_loader_epoch_mechanics():
    x, y = synthetic_dataset(100, 16, 3, 10, seed=1)
    dl = DeviceDataLoader(x, y, batch_size=32, seed=0)
    assert len(dl) == 3  # drops remainder
    seen = []
    for bx, by in dl:
        assert bx.shape == (32, 16, 16, 3) and by.shape == (32,)
        seen.append(np.asarray(by))
    # second epoch reshuffles
    second = [np.asarray(by) for _, by in dl]
    assert not all((a == b).all() for a, b in zip(seen, second))


def test_preprocessor_api_parity():
    cfg = Config()
    cfg.dataset = "synthetic"
    cfg.batch_size = 16
    cfg.log_file = 0
    pre = DCGANDataPreprocessor(cfg)
    assert len(pre.data_mean) == 3 and len(pre.data_std) == 3
    pre.transform_data()
    train_loader, metric_source = pre.get_data_loader()
    bx, by = next(iter(train_loader))
    assert bx.shape[0] == 16
    imgs, labels = metric_source
    assert imgs.dtype == np.uint8

    cpre = CGANDataPreprocessor(cfg)
    assert cpre.idx_to_labels[0] == CIFAR100_CLASSES[0]
    oh = cpre.one_hot(np.array([1, 2]))
    assert oh.shape == (2, cpre.num_classes)


def test_load_dataset_falls_back_on_unreadable_archive(tmp_path, monkeypatch):
    """A read-only data_dir makes extraction raise PermissionError (an OSError
    that is NOT FileNotFoundError) — the documented synthetic fallback must
    still engage instead of crashing the run."""
    from jckx.data import datasets as ds

    (tmp_path / "train-images-idx3-ubyte.gz").write_bytes(b"x")
    (tmp_path / "train-labels-idx1-ubyte.gz").write_bytes(b"x")

    def deny(*a, **k):
        raise PermissionError("read-only mount")

    monkeypatch.setattr(ds.gzip, "open", deny)
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        x, y, ncls, names, synth = ds.load_dataset(
            "mnist", str(tmp_path), synthetic_n=64)
    assert synth and x.shape[0] == 64 and ncls == 10
    # the substitution must be LOUD: a non-absence I/O failure swapping real
    # data for synthetic names the exception in a RuntimeWarning
    msgs = [str(w.message) for w in caught if w.category is RuntimeWarning]
    assert any("PermissionError" in m and "SYNTHETIC" in m for m in msgs), msgs


def test_load_dataset_absent_archive_falls_back_silently(tmp_path):
    """Plain absence (FileNotFoundError) keeps the quiet documented
    fallback — no RuntimeWarning spam for the common no-archives case."""
    from jckx.data import datasets as ds
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        x, y, ncls, names, synth = ds.load_dataset(
            "mnist", str(tmp_path / "empty"), synthetic_n=64)
    assert synth and x.shape[0] == 64
    assert not [w for w in caught if w.category is RuntimeWarning]


def test_preprocessor_stats_match_float_copy_formula():
    """data_mean/std are computed by f64 reductions straight off the uint8
    slab (no full-tensor float copy) — must equal the definitional
    mean/std of x/255 computed in f64."""
    cfg = Config()
    cfg.dataset = "synthetic"
    cfg.batch_size = 16
    cfg.log_file = 0
    pre = DCGANDataPreprocessor(cfg)
    xf = pre.images_u8.astype(np.float64) / 255.0
    np.testing.assert_allclose(pre.data_mean, xf.mean(axis=(0, 1, 2)), atol=1e-9)
    np.testing.assert_allclose(pre.data_std, xf.std(axis=(0, 1, 2)), atol=1e-9)


# ----------------------------------------------------- custom-data planes

def _npz(tmp_path, name="d.npz", **arrays):
    import os

    p = str(tmp_path / name)
    with open(p, "wb") as f:
        np.savez(f, **arrays)
    return p


def test_npz_dataset_labeled(tmp_path):
    """--dataset npz: x/y/names round-trip through the preprocessor; the
    pipeline treats it exactly like a named archive (no synthetic flag)."""
    from jckx.data.datasets import load_dataset

    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (40, 24, 24, 3)).astype(np.uint8)
    y = rng.randint(0, 4, 40)
    p = _npz(tmp_path, x=x, y=y, names=np.asarray(["a", "b", "c", "d"]))
    xx, yy, ncls, names, synth = load_dataset("npz", str(tmp_path), data_path=p)
    assert xx.shape == (40, 24, 24, 3) and xx.dtype == np.uint8
    np.testing.assert_array_equal(yy, y.astype(np.int32))
    assert ncls == 4 and names == ["a", "b", "c", "d"] and synth is False

    cfg = Config()
    cfg.dataset, cfg.data_path = "npz", p
    cfg.batch_size = 8
    cfg.image_size = 16
    pre = CGANDataPreprocessor(cfg)
    pre.transform_data()
    assert pre.num_classes == 4 and pre.idx_to_labels[1] == "b"
    loader, metric_src = pre.get_data_loader()
    b, lab = next(iter(loader))
    assert b.shape == (8, 24, 24, 3)  # source res; decode resizes on device
    dec = decode_batch(b, cfg.image_size)
    assert dec.shape == (8, 16, 16, 3)
    assert float(jnp.max(dec)) <= 1.0 and float(jnp.min(dec)) >= -1.0


def test_npz_dataset_unlabeled_and_errors(tmp_path):
    """No y -> one unlabeled class; NHW -> one channel; loud errors for a
    float x, a missing x, a label/row mismatch, and a missing --data_path
    (custom data never falls back to synthetic)."""
    import pytest

    from jckx.data.datasets import load_dataset, load_npz_dataset

    x = np.zeros((10, 8, 8), np.uint8)
    xx, yy, ncls, names = load_npz_dataset(_npz(tmp_path, "u.npz", x=x))
    assert xx.shape == (10, 8, 8, 1) and ncls == 1
    np.testing.assert_array_equal(yy, np.zeros(10, np.int32))

    with pytest.raises(ValueError, match="uint8"):
        load_npz_dataset(_npz(tmp_path, "f.npz", x=np.zeros((2, 8, 8, 3), np.float32)))
    with pytest.raises(ValueError, match="'x'"):
        load_npz_dataset(_npz(tmp_path, "nx.npz", images=np.zeros((2, 8, 8, 3), np.uint8)))
    with pytest.raises(ValueError, match="labels"):
        load_npz_dataset(_npz(tmp_path, "m.npz",
                              x=np.zeros((4, 8, 8, 3), np.uint8), y=np.zeros(3)))
    with pytest.raises(ValueError, match="data_path"):
        load_dataset("npz", str(tmp_path))
    with pytest.raises(ValueError, match="names"):
        load_npz_dataset(_npz(tmp_path, "n.npz",
                              x=np.zeros((4, 8, 8, 3), np.uint8),
                              y=np.asarray([0, 1, 2, 3]),
                              names=np.asarray(["only", "two"])))


def test_image_folder_dataset(tmp_path):
    """--dataset folder: class subdirs -> sorted labels; aspect-preserving
    short-side resize + center crop to the requested source size; a flat dir
    is one unlabeled class; an empty dir is a loud error."""
    import pytest
    from PIL import Image

    from jckx.data.datasets import load_dataset, load_image_folder

    root = tmp_path / "imgs"
    for cls, color in (("cat", (255, 0, 0)), ("dog", (0, 0, 255))):
        d = root / cls
        d.mkdir(parents=True)
        # varied sizes + aspect ratios, one non-RGB mode
        Image.new("RGB", (40, 20), color).save(d / "a.png")
        Image.new("L", (17, 33), 128).save(d / "b.jpg")
    x, y, ncls, names, synth = load_dataset(
        "folder", str(tmp_path), data_path=str(root), image_size=16)
    assert x.shape == (4, 16, 16, 3) and x.dtype == np.uint8
    assert names == ["cat", "dog"] and ncls == 2 and synth is False
    np.testing.assert_array_equal(y, [0, 0, 1, 1])
    # the wide red image center-crops to pure red after RGB convert
    assert (x[0, :, :, 0] > 200).all() and (x[0, :, :, 2] < 50).all()

    flat = tmp_path / "flat"
    flat.mkdir()
    Image.new("RGB", (16, 16), (1, 2, 3)).save(flat / "only.png")
    x, y, ncls, names = load_image_folder(str(flat), src_size=8)
    assert x.shape == (1, 8, 8, 3) and ncls == 1 and y[0] == 0

    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no images"):
        load_image_folder(str(empty))


def test_streaming_plane_on_custom_npz(tmp_path):
    """The host-streaming data plane (C++ gather + per-launch upload) is
    format-agnostic: an npz dataset at a non-archive geometry (24x24)
    trains numerically == the HBM-resident plane."""
    import os

    import jax
    import pytest

    from jckx.logging.main_logger import MainLogger
    from jckx.models import dcgan
    from jckx.models.dcgan import GANGeometry
    from jckx.rng import KeyChain, seed_everything
    from jckx.train.gan_trainer import DCGANTrainer

    rng = np.random.RandomState(8)
    p = str(tmp_path / "d.npz")
    with open(p, "wb") as f:
        np.savez(f, x=rng.randint(0, 256, (64, 24, 24, 3)).astype(np.uint8),
                 y=rng.randint(0, 4, 64))

    def cfg_for(place, sub):
        cfg = Config()
        cfg.dataset, cfg.data_path = "npz", p
        cfg.batch_size = 16
        cfg.epoch = 1
        cfg.image_size = 16
        cfg.base_width = 8
        cfg.compute_dtype = "float32"
        cfg.max_learning_rate = 2e-4
        cfg.eval_every = 0
        cfg.log_every = 8
        cfg.log_file = 0
        cfg.data_placement = place
        cfg.num_worker = 2 if place == "stream" else 0
        cfg.save_root = str(tmp_path)
        cfg.save_path = os.path.join(str(tmp_path), "dcgan", sub)
        return cfg

    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
    keys = KeyChain(seed_everything(9))
    pg0 = jax.device_get(dcgan.generator_init(keys.next(), geo))
    pd0 = jax.device_get(dcgan.discriminator_init(keys.next(), geo))
    fresh = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731

    cfg_a = cfg_for("hbm", "resident")
    pre_a = DCGANDataPreprocessor(cfg_a)
    tr_a = DCGANTrainer(cfg_a, fresh(pg0), fresh(pd0), pre_a)
    assert not tr_a._streaming
    last_a = tr_a.train()
    MainLogger.reset()

    cfg_b = cfg_for("stream", "stream")
    pre_b = DCGANDataPreprocessor(cfg_b)
    tr_b = DCGANTrainer(cfg_b, fresh(pg0), fresh(pd0), pre_b)
    assert tr_b._streaming
    last_b = tr_b.train()
    MainLogger.reset()

    assert last_a["loss_d"] == pytest.approx(last_b["loss_d"], abs=1e-5)
    a = jax.device_get(tr_a.state.params_g)
    b = jax.device_get(tr_b.state.params_g)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   atol=1e-6, err_msg=k)


def test_npz_channel_mismatch_is_loud(tmp_path):
    """A grayscale npz against the default --channels 3 must fail at load
    with guidance, not as an opaque conv trace error (review finding)."""
    import pytest

    from jckx.data.datasets import load_dataset

    p = str(tmp_path / "g.npz")
    with open(p, "wb") as f:
        np.savez(f, x=np.zeros((6, 8, 8), np.uint8))
    with pytest.raises(ValueError, match="--channels 1"):
        load_dataset("npz", str(tmp_path), data_path=p, channels=3)
    x, y, ncls, names, _ = load_dataset("npz", str(tmp_path), data_path=p,
                                        channels=1)
    assert x.shape == (6, 8, 8, 1)


def test_config_seed_reaches_dataset_and_shuffle():
    """``--seed`` must resample everything a seed panel varies — the
    synthetic dataset content AND the loader's shuffle stream — and the
    same seed must reproduce both bit-exactly. This pins the cfg.seed
    wiring (pipeline.py passes seed=cfg.seed at both construction sites)
    that the README's cross-seed variance evidence relies on (reference
    analog: one global RANDOMSEED, change_randomseed.py:1)."""
    def build(seed):
        cfg = Config()
        cfg.dataset = "synthetic"
        cfg.synthetic_size = 128
        cfg.batch_size = 16
        cfg.log_file = 0
        cfg.seed = seed
        pre = DCGANDataPreprocessor(cfg)
        loader, _ = pre.get_data_loader()
        bx, _ = next(iter(loader))
        return pre.images_u8, np.asarray(bx)

    xa, ba = build(1)
    xb, _ = build(2)
    xa2, ba2 = build(1)
    assert not (xa == xb).all()  # different seed -> different dataset
    assert (xa == xa2).all()     # same seed -> bit-identical dataset
    assert (ba == ba2).all()     # ...and bit-identical first shuffled batch
