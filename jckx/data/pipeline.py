"""Device-resident input pipeline.

The reference's pipeline (preprocess/dcgan_data_preprocessor.py:11-75) is a
host-side torchvision DataLoader: per-item PIL resize 32→64, ToTensor,
normalize to [-1,1], pinned-memory copies every step — all on CPU workers.

The TPU-native design inverts this: the raw uint8 dataset (CIFAR:
50000×32×32×3 ≈ 150 MB) lives in HBM once; per step the trainer gathers a
shuffled index batch and the resize + normalize run INSIDE the fused jitted
train step (``decode_batch``), fused by XLA with the D/G compute. Host work
per step is one tiny int32 index upload; there is no per-image Python, no
pinned-memory staging, no worker processes.

API parity: ``DCGANDataPreprocessor`` / ``CGANDataPreprocessor`` keep the
reference's construction & method surface (ctor(args) → ``transform_data()``
→ ``get_data_loader()`` → (train loader, metric source), incl. the
``data_mean``/``data_std`` attributes the reference computes at
dcgan_data_preprocessor.py:25-35 and the CGAN ``idx_to_labels`` map,
cgan_data_preprocessor.py:31-33).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jckx.data.datasets import load_dataset
from jckx.logging.main_logger import MainLogger


def decode_batch(
    u8: jax.Array, image_size: int, compute_dtype=jnp.float32
) -> jax.Array:
    """uint8 NHWC → resized, [-1,1]-normalized images, on device.

    Matches the reference transform chain Resize(image_size) + ToTensor +
    Normalize(0.5, 0.5) (dcgan_data_preprocessor.py:38-43); bilinear resize
    like PIL's default for upscales.
    """
    x = u8.astype(jnp.float32) / 255.0
    if u8.shape[1] != image_size or u8.shape[2] != image_size:
        x = jax.image.resize(
            x, (x.shape[0], image_size, image_size, x.shape[3]), method="bilinear"
        )
    return ((x - 0.5) / 0.5).astype(compute_dtype)


class DeviceDataLoader:
    """Epoch iterator over a device-resident uint8 dataset.

    Yields ``(batch_u8, labels)`` device arrays per step; shuffling is a
    host-side permutation from a seeded PRNG (one permutation per epoch,
    reference shuffle=True semantics, dcgan_data_preprocessor.py:70).
    Incomplete trailing batches are dropped (static shapes for jit).

    When ``sharding`` is given, batches are placed sharded on the mesh's
    data axis as they are gathered.
    """

    def __init__(
        self,
        images_u8: np.ndarray,
        labels: np.ndarray,
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        sharding=None,
    ):
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self._rng = np.random.RandomState(seed)
        self._sharding = sharding
        # HBM upload is LAZY (first use): the GAN trainer manages its own
        # device-resident copy, so an eager upload here would double the
        # dataset's HBM footprint for API-parity users who never iterate
        self._images_u8 = images_u8
        self.labels_np = np.asarray(labels)
        self._images_dev = None
        self._labels_dev = None
        self.n = images_u8.shape[0]

    @property
    def images(self):
        if self._images_dev is None:
            self._images_dev = jax.device_put(self._images_u8, self._sharding)
        return self._images_dev

    @property
    def labels(self):
        if self._labels_dev is None:
            self._labels_dev = jax.device_put(self.labels_np)
        return self._labels_dev

    def __len__(self) -> int:
        return self.n // self.batch_size

    def __iter__(self) -> Iterator[Tuple[jax.Array, jax.Array]]:
        order = (
            self._rng.permutation(self.n) if self.shuffle else np.arange(self.n)
        )
        bs = self.batch_size
        for i in range(len(self)):
            idx = jnp.asarray(order[i * bs : (i + 1) * bs])
            yield self.images[idx], self.labels[idx]


class HostStreamLoader:
    """Host-streaming data plane for datasets that exceed the HBM budget.

    The dataset stays on host (ideally as the native cache's zero-copy mmap
    view); per superstep the requested rows are assembled into ONE
    contiguous uint8 slab by the C++ gather running across ``workers``
    threads (the product role of the reference DataLoader's ``num_worker``,
    dcgan_data_preprocessor.py:69-75 — there: per-item PIL decode workers;
    here: parallel memcpy into the transfer slab), then uploaded as a
    single host→device transfer. The trainer double-buffers the WHOLE
    gather+upload on its own uploader thread and calls ``take`` directly
    (gan_trainer.train); standalone consumers without such a thread can use
    ``prime``/``take`` for gather-only one-block lookahead.
    """

    def __init__(self, images_u8: np.ndarray, labels: np.ndarray, workers: int = 0):
        from jckx.data import native_io

        self._gather_mt = native_io.gather_rows_mt
        self.images = images_u8
        self.labels_np = np.asarray(labels)
        self.workers = max(1, int(workers))
        self._pool = None  # lazy; see _ensure_pool / close
        self._primed = None  # (key, future)

    def _ensure_pool(self):
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            # +1 slot runs the lookahead block itself while its chunks fan out
            self._pool = ThreadPoolExecutor(self.workers + 1)
        return self._pool

    def close(self) -> None:
        """Release the gather threads (the loader stays usable — the pool
        re-creates lazily on the next prime/take)."""
        self._primed = None
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def _assemble(self, rows: np.ndarray):
        rows = np.ascontiguousarray(rows, np.int32)
        slab = self._gather_mt(self.images, rows, self.workers, pool=self._ensure_pool())
        return slab, self.labels_np[rows].astype(np.int32)

    def prime(self, rows: np.ndarray) -> None:
        """Start gathering ``rows`` in the background (next superstep)."""
        rows = np.ascontiguousarray(rows, np.int32)
        self._primed = (rows.tobytes(), self._ensure_pool().submit(self._assemble, rows))

    def take(self, rows: np.ndarray):
        """→ (slab_u8, labels) for ``rows``; uses the primed result when it
        matches, else gathers synchronously."""
        if self._primed is not None:
            key, fut = self._primed
            self._primed = None
            if key == np.ascontiguousarray(rows, np.int32).tobytes():
                return fut.result()
        return self._assemble(rows)


def _one_hot(labels: np.ndarray, n: int) -> np.ndarray:
    return np.eye(n, dtype=np.float32)[labels]


class DCGANDataPreprocessor:
    """Unconditional pipeline (reference dcgan_data_preprocessor.py:11-75)."""

    def __init__(self, cfg):
        self._logger = MainLogger(cfg)
        self.cfg = cfg
        self.batch_size = cfg.batch_size
        x, y, ncls, names, synthetic = load_dataset(
            cfg.dataset, cfg.data_dir, train=True, seed=cfg.seed,
            num_classes=cfg.num_classes,
            synthetic_n=getattr(cfg, "synthetic_size", 0),
            data_path=getattr(cfg, "data_path", ""),
            image_size=cfg.image_size, channels=cfg.channels,
        )
        if synthetic and cfg.dataset != "synthetic":
            self._logger.warning(
                f"dataset '{cfg.dataset}' not found under {cfg.data_dir}; "
                f"using deterministic synthetic data ({x.shape[0]} samples)"
            )
        self.images_u8, self.labels_np = x, y
        self.num_classes, self.class_names = ncls, names
        # reference computes per-channel mean/std of the raw data and logs it
        # (then normalizes with 0.5/0.5 anyway — preserved behavior); computed
        # as f64 reductions straight off the uint8 slab: a float32 copy of a
        # 50k 64² set would be 2.4 GB of pure scratch on this host
        self.data_mean = (x.mean(axis=(0, 1, 2), dtype=np.float64) / 255.0).tolist()
        ex2 = np.square(x, dtype=np.uint16).mean(  # 255² fits uint16: 2B temp
            axis=(0, 1, 2), dtype=np.float64) / 255.0**2
        var = ex2 - np.square(np.asarray(self.data_mean))
        self.data_std = np.sqrt(np.maximum(var, 0.0)).tolist()
        self._logger.debug(f"data mean: {self.data_mean}\tdata std: {self.data_std}")
        self._transformed = False
        self._logger.debug("data preprocessor init")

    def transform_data(self):
        """Parity no-op: transforms are fused into the jitted step
        (``decode_batch``); this just records intent like the reference's
        post-hoc transform assignment (dcgan_data_preprocessor.py:37-49)."""
        self._transformed = True
        self._logger.debug("data transform")

    def get_data_loader(self, sharding=None):
        """→ (train DeviceDataLoader, metric source).

        The metric source is the raw (images_u8, labels) pair the Metrics
        engine feeds through its own on-device Inception transform — the
        analog of the reference's second 299×299 'inception view' loader
        (dcgan_data_preprocessor.py:44-47,69-75).
        """
        train_loader = DeviceDataLoader(
            self.images_u8,
            self.labels_np,
            self.batch_size,
            seed=self.cfg.seed,
            shuffle=True,
            sharding=sharding,
        )
        self.trainloader = train_loader
        self.metric_source = (self.images_u8, self.labels_np)
        return self.trainloader, self.metric_source


class CGANDataPreprocessor(DCGANDataPreprocessor):
    """Conditional pipeline: adds one-hot labels + idx→name map
    (reference cgan_data_preprocessor.py:11-94)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.idx_to_labels = {i: n for i, n in enumerate(self.class_names)}

    def one_hot(self, labels) -> jnp.ndarray:
        return jax.nn.one_hot(labels, self.num_classes)
