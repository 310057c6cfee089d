"""Native IO core: build, cache roundtrip (native + fallback layout
compatibility), shuffle determinism, gather correctness."""

import os

import numpy as np
import pytest

from jckx.data import native_io


def test_native_library_builds():
    assert native_io.available(), "g++ toolchain present — .so must build"


def test_cache_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, size=(37, 8, 8, 3), dtype=np.uint8)
    labels = rng.randint(0, 100, size=(37,)).astype(np.int32)
    p = str(tmp_path / "c.bin")
    native_io.cache_write(p, imgs, labels)
    got = native_io.cache_open(p)
    assert got is not None
    gi, gl = got
    np.testing.assert_array_equal(gi, imgs)
    np.testing.assert_array_equal(gl, labels)


def test_cache_python_layout_compatible(tmp_path):
    """The pure-python writer and the native reader share one format."""
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 255, size=(5, 4, 4, 1), dtype=np.uint8)
    labels = np.arange(5, dtype=np.int32)
    p = str(tmp_path / "py.bin")
    # force the python writer
    lib, native_io._lib = native_io._lib, None
    tried = native_io._tried
    native_io._tried = True
    try:
        native_io.cache_write(p, imgs, labels)
    finally:
        native_io._lib, native_io._tried = lib, tried
    got = native_io.cache_open(p)  # native reader
    assert got is not None
    np.testing.assert_array_equal(got[0], imgs)
    np.testing.assert_array_equal(got[1], labels)


def test_cache_open_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.bin")
    with open(p, "wb") as f:
        f.write(b"not a cache file at all, definitely too short?" * 2)
    assert native_io.cache_open(p) is None
    assert native_io.cache_open(str(tmp_path / "missing.bin")) is None


def test_shuffle_deterministic_permutation():
    a = native_io.shuffle_indices(1000, seed=7)
    b = native_io.shuffle_indices(1000, seed=7)
    c = native_io.shuffle_indices(1000, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    np.testing.assert_array_equal(np.sort(a), np.arange(1000))  # a permutation


def test_gather_rows_matches_numpy():
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 255, size=(50, 6, 6, 3), dtype=np.uint8)
    idx = rng.randint(0, 50, size=(17,)).astype(np.int32)
    np.testing.assert_array_equal(native_io.gather_rows(imgs, idx), imgs[idx])


def test_dataset_cache_integration(tmp_path):
    """load_dataset writes + reuses the cache for archive-backed sets; we
    simulate by planting a cifar100 cache and checking it is served."""
    from jckx.data.datasets import load_dataset

    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 255, size=(64, 32, 32, 3), dtype=np.uint8)
    labels = rng.randint(0, 100, size=(64,)).astype(np.int32)
    native_io.cache_write(str(tmp_path / "jckx_cache_cifar100_train.bin"), imgs, labels)
    x, y, ncls, names, synthetic = load_dataset("cifar100", str(tmp_path), train=True)
    assert not synthetic and ncls == 100
    np.testing.assert_array_equal(x, imgs)
    np.testing.assert_array_equal(y, labels)


def test_gather_rows_mt_matches_numpy():
    """Threaded slab assembly (num_worker product role) ≡ numpy fancy-index."""
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 255, size=(200, 8, 8, 3), dtype=np.uint8)
    idx = rng.randint(0, 200, size=(133,)).astype(np.int32)
    with ThreadPoolExecutor(4) as pool:
        out = native_io.gather_rows_mt(imgs, idx, workers=4, pool=pool)
    np.testing.assert_array_equal(out, imgs[idx])
    # serial path too
    np.testing.assert_array_equal(
        native_io.gather_rows_mt(imgs, idx, workers=1), imgs[idx]
    )


def test_host_stream_loader_prime_take():
    from jckx.data.pipeline import HostStreamLoader

    rng = np.random.RandomState(4)
    imgs = rng.randint(0, 255, size=(100, 4, 4, 3), dtype=np.uint8)
    labels = rng.randint(0, 10, size=(100,))
    loader = HostStreamLoader(imgs, labels, workers=2)
    rows = rng.randint(0, 100, size=(24,))
    loader.prime(rows)
    slab, labs = loader.take(rows)
    np.testing.assert_array_equal(slab, imgs[rows])
    np.testing.assert_array_equal(labs, labels[rows].astype(np.int32))
    # mismatched take falls back to a synchronous gather
    other = rng.randint(0, 100, size=(24,))
    loader.prime(rows)
    slab2, _ = loader.take(other)
    np.testing.assert_array_equal(slab2, imgs[other])
