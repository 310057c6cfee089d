"""Archive parsers against real miniature archives built in-test: the
torchvision-layout CIFAR pickles (+ the tar.gz extraction path) and the
MNIST idx(.gz) format. These are the exact on-disk formats a user drops
into ./data when migrating from the reference (which torchvision-downloads
them, dcgan_data_preprocessor.py:20-21)."""

import gzip
import os
import pickle
import struct
import tarfile

import numpy as np

from jckx.data.datasets import load_dataset


def _make_cifar100(data_dir, n_train=20, n_test=8, seed=0):
    rng = np.random.RandomState(seed)
    d = os.path.join(data_dir, "cifar-100-python")
    os.makedirs(d, exist_ok=True)
    out = {}
    for split, n in (("train", n_train), ("test", n_test)):
        data = rng.randint(0, 255, size=(n, 3072), dtype=np.uint8)
        labels = rng.randint(0, 100, size=(n,)).tolist()
        with open(os.path.join(d, split), "wb") as f:
            pickle.dump({b"data": data, b"fine_labels": labels}, f)
        out[split] = (data, labels)
    return out


def test_cifar100_pickle_parse_and_cache(tmp_path):
    data_dir = str(tmp_path)
    made = _make_cifar100(data_dir)

    x, y, ncls, names, synthetic = load_dataset("cifar100", data_dir, train=True)
    assert not synthetic and ncls == 100 and len(names) == 100
    assert x.shape == (20, 32, 32, 3) and x.dtype == np.uint8
    # NCHW→NHWC transpose golden: first pixel of channel 0
    ref = made["train"][0].reshape(20, 3, 32, 32).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(x, ref)
    np.testing.assert_array_equal(y, np.asarray(made["train"][1], np.int32))

    # the native cache was written; a second load serves it (mmap path) —
    # corrupt the pickle to prove the pickle parser is NOT re-entered
    assert os.path.exists(os.path.join(data_dir, "jckx_cache_cifar100_train.bin"))
    with open(os.path.join(data_dir, "cifar-100-python", "train"), "wb") as f:
        f.write(b"garbage")
    x2, y2, _, _, synthetic2 = load_dataset("cifar100", data_dir, train=True)
    assert not synthetic2
    np.testing.assert_array_equal(np.asarray(x2), x)
    np.testing.assert_array_equal(np.asarray(y2), y)


def test_cifar100_targz_autoextract(tmp_path):
    # build the archive in a staging dir, pack ONLY the tar.gz into data_dir
    stage = tmp_path / "stage"
    stage.mkdir()
    _make_cifar100(str(stage), n_train=6, n_test=4, seed=1)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with tarfile.open(data_dir / "cifar-100-python.tar.gz", "w:gz") as t:
        t.add(stage / "cifar-100-python", arcname="cifar-100-python")

    x, y, _, _, synthetic = load_dataset("cifar100", str(data_dir), train=False)
    assert not synthetic and x.shape == (4, 32, 32, 3)


def test_cifar10_batches_parse(tmp_path):
    rng = np.random.RandomState(2)
    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    per = 4
    all_labels = []
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        data = rng.randint(0, 255, size=(per, 3072), dtype=np.uint8)
        labels = rng.randint(0, 10, size=(per,)).tolist()
        all_labels.append(labels)
        with open(d / name, "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)

    x, y, ncls, names, synthetic = load_dataset("cifar10", str(tmp_path), train=True)
    assert not synthetic and ncls == 10 and names[0] == "airplane"
    assert x.shape == (5 * per, 32, 32, 3)  # five train batches concatenated
    np.testing.assert_array_equal(y, np.concatenate(
        [np.asarray(l, np.int32) for l in all_labels[:5]]))


def _write_idx(path, arr):
    with open(path, "wb") as f:
        if arr.ndim == 3:
            f.write(struct.pack(">IIII", 2051, *arr.shape))
        else:
            f.write(struct.pack(">II", 2049, arr.shape[0]))
        f.write(arr.tobytes())


def test_mnist_idx_gz_parse(tmp_path):
    rng = np.random.RandomState(3)
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    imgs = rng.randint(0, 255, size=(10, 28, 28), dtype=np.uint8)
    labels = rng.randint(0, 10, size=(10,)).astype(np.uint8)
    # write gzipped only — the loader must decompress
    for name, arr in (("train-images-idx3-ubyte", imgs),
                      ("train-labels-idx1-ubyte", labels)):
        plain = raw / name
        _write_idx(plain, arr)
        with open(plain, "rb") as fin, gzip.open(str(plain) + ".gz", "wb") as fout:
            fout.write(fin.read())
        plain.unlink()

    x, y, ncls, _, synthetic = load_dataset("mnist", str(tmp_path), train=True)
    assert not synthetic and ncls == 10
    assert x.shape == (10, 28, 28, 1) and x.dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(x)[..., 0], imgs)
    np.testing.assert_array_equal(y, labels.astype(np.int32))
