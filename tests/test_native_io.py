"""Native IO core: build, cache roundtrip (native + fallback layout
compatibility), shuffle determinism, gather correctness."""

import os

import numpy as np

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


def test_cache_open_rejects_corrupt_header_dims(tmp_path):
    """Intact magic but insane header dims (bit-flip, torn rewrite, foreign
    writer) must be rejected: a huge/negative n*h*w*c would overflow the
    size_t bounds math and hand out-of-mapping pointers to the numpy views."""
    import struct

    rng = np.random.RandomState(5)
    imgs = rng.randint(0, 255, size=(8, 4, 4, 3), dtype=np.uint8)
    labels = np.arange(8, dtype=np.int32)
    good = str(tmp_path / "good.bin")
    native_io.cache_write(good, imgs, labels)
    raw = bytearray(open(good, "rb").read())

    def check_engine(engine):
        # header: magic u64 | n i64 | h i32 | w i32 | c i32 | reserved i32
        for n_bad in (-1, 0, 1 << 62, (1 << 64) - 8):  # negative, zero, overflow
            bad = bytearray(raw)
            bad[8:16] = struct.pack(
                "<q", n_bad if n_bad < (1 << 63) else n_bad - (1 << 64))
            p = str(tmp_path / "bad_n.bin")
            open(p, "wb").write(bytes(bad))
            assert native_io.cache_open(p) is None, f"{engine}: n={n_bad} accepted"
        for off, dim_bad in ((16, -4), (20, 1 << 30), (24, 0)):  # h/w/c abuse
            bad = bytearray(raw)
            bad[off:off + 4] = struct.pack("<i", dim_bad)
            p = str(tmp_path / "bad_dim.bin")
            open(p, "wb").write(bytes(bad))
            assert native_io.cache_open(p) is None, \
                f"{engine}: dim@{off}={dim_bad} accepted"
        # the untouched original still opens (the guards are not over-eager)
        assert native_io.cache_open(good) is not None

    check_engine("native")
    # same contract from the pure-python fallback reader
    lib, native_io._lib = native_io._lib, None
    tried, native_io._tried = native_io._tried, True
    try:
        check_engine("fallback")
    finally:
        native_io._lib, native_io._tried = lib, tried


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
