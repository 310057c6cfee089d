"""ctypes binding for the native IO core (native/jckx_io.cpp).

Provides the dataset cache (mmap'd zero-copy startup), seeded shuffling,
and contiguous batch gather. Builds the .so on first use if a compiler is
available; otherwise falls back to pure numpy (same semantics for the
cache, numpy RNG for shuffle — both paths are deterministic but produce
different permutations; the loader records which engine it used).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libjckx_io.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:  # noqa: BLE001 — no toolchain → python fallback
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.jckx_cache_write.restype = ctypes.c_int
        lib.jckx_cache_write.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.jckx_cache_open.restype = ctypes.c_void_p
        lib.jckx_cache_open.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.jckx_cache_images.restype = ctypes.c_void_p
        lib.jckx_cache_images.argtypes = [ctypes.c_void_p]
        lib.jckx_cache_labels.restype = ctypes.c_void_p
        lib.jckx_cache_labels.argtypes = [ctypes.c_void_p]
        lib.jckx_cache_close.argtypes = [ctypes.c_void_p]
        lib.jckx_shuffle.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64]
        lib.jckx_gather.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def cache_write(path: str, images: np.ndarray, labels: np.ndarray) -> None:
    images = np.ascontiguousarray(images, np.uint8)
    labels = np.ascontiguousarray(labels, np.int32)
    n, h, w, c = images.shape
    lib = _load()
    if lib is not None:
        rc = lib.jckx_cache_write(
            path.encode(), images.ctypes.data, n, h, w, c, labels.ctypes.data
        )
        if rc != 0:
            raise OSError(f"jckx_cache_write failed rc={rc}")
        return
    # python fallback: same binary layout
    with open(path, "wb") as f:
        f.write(np.uint64(0x4A434B58494F3031).tobytes())
        f.write(np.int64(n).tobytes())
        f.write(np.int32(h).tobytes())
        f.write(np.int32(w).tobytes())
        f.write(np.int32(c).tobytes())
        f.write(np.int32(0).tobytes())
        f.write(images.tobytes())
        f.write(labels.tobytes())


def cache_open(path: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """→ (images uint8 NHWC view, labels int32 view) or None.

    Native path: zero-copy views into the mmap (the handle is retained for
    process lifetime). Fallback: np.memmap views.
    """
    if not os.path.exists(path):
        return None
    lib = _load()
    if lib is not None:
        n = ctypes.c_int64()
        h = ctypes.c_int32()
        w = ctypes.c_int32()
        c = ctypes.c_int32()
        handle = lib.jckx_cache_open(path.encode(), ctypes.byref(n),
                                     ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
        if not handle:
            return None
        _open_handles.append(handle)  # keep mapping alive
        nv, hv, wv, cv = n.value, h.value, w.value, c.value
        img_ptr = lib.jckx_cache_images(handle)
        lab_ptr = lib.jckx_cache_labels(handle)
        images = np.ctypeslib.as_array(
            ctypes.cast(img_ptr, ctypes.POINTER(ctypes.c_uint8)), (nv, hv, wv, cv)
        )
        labels = np.ctypeslib.as_array(
            ctypes.cast(lab_ptr, ctypes.POINTER(ctypes.c_int32)), (nv,)
        )
        return images, labels
    # fallback: parse the header with numpy and memmap
    with open(path, "rb") as f:
        head = f.read(28)
    if len(head) < 28:
        return None
    magic = np.frombuffer(head[:8], np.uint64)[0]
    if magic != np.uint64(0x4A434B58494F3031):
        return None
    n = int(np.frombuffer(head[8:16], np.int64)[0])
    h, w, c = (int(x) for x in np.frombuffer(head[16:28], np.int32)[:3])
    off = 32
    # same header validation as the native reader: a corrupted header must
    # yield None (bad cache), not an exception or an out-of-bounds view
    if n <= 0 or h <= 0 or w <= 0 or c <= 0:
        return None
    if os.path.getsize(path) < off + n * (h * w * c + 4):  # python ints: no overflow
        return None
    images = np.memmap(path, np.uint8, "r", offset=off, shape=(n, h, w, c))
    labels = np.memmap(path, np.int32, "r",
                       offset=off + n * h * w * c, shape=(n,))
    return np.asarray(images), np.asarray(labels)


_open_handles: list = []


def shuffle_indices(n: int, seed: int) -> np.ndarray:
    idx = np.arange(n, dtype=np.int32)
    lib = _load()
    if lib is not None:
        lib.jckx_shuffle(idx.ctypes.data, n, ctypes.c_uint64(seed))
        return idx
    return np.random.RandomState(seed).permutation(n).astype(np.int32)


def gather_rows(images: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Contiguous batch assembly: images[idx] via the native memcpy loop."""
    out = np.empty((len(idx),) + images.shape[1:], images.dtype)
    gather_rows_into(images, idx, out)
    return out


def gather_rows_into(images: np.ndarray, idx: np.ndarray, out: np.ndarray) -> None:
    """Gather images[idx] into a preallocated contiguous slab (or a
    contiguous slice of one — thread workers each fill a disjoint slice;
    the ctypes call releases the GIL so gathers run truly parallel)."""
    images = np.ascontiguousarray(images)
    idx = np.ascontiguousarray(idx, np.int32)
    assert out.flags["C_CONTIGUOUS"] and out.shape[0] == len(idx)
    lib = _load()
    if lib is None:
        out[:] = images[idx]
        return
    lib.jckx_gather(images.ctypes.data, images.strides[0], idx.ctypes.data,
                    len(idx), out.ctypes.data)


def gather_rows_mt(images: np.ndarray, idx: np.ndarray, workers: int,
                   pool=None) -> np.ndarray:
    """Parallel gather: split the index range over ``workers`` threads, each
    memcpy-ing its slice of the output slab (the product role of the
    reference's DataLoader ``num_worker``, dcgan_data_preprocessor.py:69-75)."""
    n = len(idx)
    out = np.empty((n,) + images.shape[1:], images.dtype)
    workers = max(1, int(workers))
    if workers == 1 or n < 2 * workers or pool is None:
        gather_rows_into(images, idx, out)
        return out
    chunk = (n + workers - 1) // workers
    futs = [
        pool.submit(gather_rows_into, images, idx[a:a + chunk], out[a:a + chunk])
        for a in range(0, n, chunk)
    ]
    for f in futs:
        f.result()
    return out
