"""Metrics engine: Inception features → FID / IS / intra-FID, on device.

Reference behavior (metrics.py:19-141) reproduced with a TPU-native data
path:
- backbone = InceptionV3 with a 100-class head, fine-tuned on CIFAR-100
  (loaded from the notebook-produced checkpoint when available; otherwise a
  seeded random backbone with a loud warning — metrics stay self-consistent
  for best-metric tracking, just not comparable to reference absolutes),
- real-feature cache for the 50k-image training set (reference pickles to
  ./data/metric_data.pikl, metrics.py:54,70-77; jckx saves an .npz next to
  it),
- IS: 10-split exp(mean KL) (metrics.py:97-110),
- FID: Fréchet distance — here fully on device with a Newton–Schulz matrix
  square root instead of host scipy sqrtm (metrics.py:113-129),
- intra-FID: per-superclass FID over the 20 CIFAR-100 superclasses, summed
  and divided by 100 — the reference divides by 100 although there are 20
  superclasses (metrics.py:132-141); replicated for metric comparability
  via ``intra_fid_divisor`` (default 100).

The eval image path runs entirely on device: GAN output in [-1,1] →
denormalize → bilinear resize to 299 → ImageNet normalize → InceptionV3,
in one jit per batch (the reference does host-side torchvision resizes,
dcgan_trainer.py:201-207).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jckx.data.datasets import FINE_TO_SUPERCLASS
from jckx.logging.main_logger import MainLogger
from jckx.metrics import inception_v3
from jckx.metrics.fid import (frechet_distance, inception_score_from_probs,
                              intra_fid_sum, mean_and_cov)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class Metrics:
    """API parity with reference ``Metrics`` (ctor from a real-image source;
    ``inception_score`` / ``fid`` / ``intra_fid`` methods)."""

    def __init__(
        self,
        metric_source,
        config=None,
        backbone_params=None,
        batch_size: int = 256,
        compute_dtype=jnp.bfloat16,
        cache_dir: str = "./data",
        num_classes: int = 100,
        fast_stem: Optional[bool] = None,
        mesh=None,
    ):
        self._logger = MainLogger(config)
        self.batch_size = batch_size
        self.compute_dtype = compute_dtype
        self.num_classes = num_classes
        # multi-chip eval: with a mesh whose 'data' axis is >1, every
        # extraction batch is sharded over that axis (P(None, 'data') on a
        # (k, bs, ...) slab) so the backbone forward runs data-parallel over
        # the same devices that train. The forward is per-sample (inference-
        # mode BN, no cross-batch ops), so batch parallelism is exact; the
        # (bs, num_classes) logits gather on the host read as before.
        n_data = int(mesh.shape.get("data", 1)) if mesh is not None else 1
        self._eval_data_shards = max(1, n_data)
        self._multiprocess = jax.process_count() > 1
        if mesh is not None and n_data > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._batch_sharding = NamedSharding(mesh, P(None, "data"))
            # multi-host extraction: features come back fully-replicated so
            # the host-side metric math (IS/FID/intra) reads them on every
            # process (a non-addressable-sharded output could not be fetched)
            self._out_sharding = (NamedSharding(mesh, P())
                                  if self._multiprocess else None)
        else:
            self._batch_sharding = None
            self._out_sharding = None
        # opt-in space-to-depth stem for the backbone forward (exact same
        # function, rounding-level drift — inception_v3._bconv_1a_s2d);
        # OFF by default so metric absolutes never shift silently
        self.fast_stem = (bool(getattr(config, "eval_fast_stem", 0) or 0)
                          if fast_stem is None else bool(fast_stem))

        real_images_u8, real_labels = metric_source
        real_labels = np.asarray(real_labels)

        # ---- backbone -----------------------------------------------------
        if backbone_params is not None:
            self.params = backbone_params
            # explicit params: hash whatever leaves are host-readable (numpy,
            # or jax.Arrays on a CPU backend — non-CPU device leaves are
            # skipped: reading them back can block for minutes through the
            # tunnel); shapes still enter the fingerprint. When NOTHING is
            # host-readable the signature degrades to a per-run unique tag:
            # re-extracting features is correct-but-slow, a silent cache
            # collision between two same-shape backbones is not.
            self._backbone_sig = self._sig_or_per_run(
                self._content_sig(_flatten_leaves(backbone_params)),
                "backbone_params are device-resident (pass host numpy "
                "params to enable reuse)")
        else:
            self.params = self._load_backbone(config)
        if self._multiprocess and self._batch_sharding is not None:
            # backbone leaves loaded/inited locally are process-local arrays;
            # the mesh-parallel extraction jit needs them on the GLOBAL mesh
            # (values are identical on every process: same file / same seed)
            from jckx.parallel.mesh import put_global_tree, replicated_sharding

            self.params = put_global_tree(
                jax.tree_util.tree_map(np.asarray, self.params),
                replicated_sharding(self._batch_sharding.mesh))

        # jitted extraction pipelines. Batches are dispatched ASYNC (no host
        # sync between launches) and drained once at the end — a per-batch
        # np.asarray costs ~18 s of remote-runtime round-trip each; wrapping
        # the loop in lax.map instead makes the remote compile pathological.
        self._features_from_u8 = jax.jit(self._make_u8_pipeline())
        self._features_from_tanh = jax.jit(self._make_tanh_pipeline())
        self._fn_at_cache: dict = {}

        # ---- superclass index maps (reference metrics.py:56-68) ------------
        real_super = FINE_TO_SUPERCLASS[real_labels % 100]
        self.real_superclass_idx = {
            s: np.nonzero(real_super == s)[0] for s in range(20)
        }
        # fake eval grid is class-major: 10 samples per class × num_classes
        fake_targets = np.repeat(np.arange(num_classes), 10)
        fake_super = FINE_TO_SUPERCLASS[fake_targets % 100]
        self.fake_superclass_idx = {
            s: np.nonzero(fake_super == s)[0] for s in range(20)
        }
        # FINE_TO_SUPERCLASS is the CIFAR-100 mapping; with num_classes<100
        # (cifar10/mnist) some superclass buckets are empty on the fake or
        # real side — those are skipped (an empty bucket would make
        # mean_and_cov emit NaN and poison best-ckpt tracking)
        self.active_superclasses = [
            s for s in range(20)
            if len(self.fake_superclass_idx[s]) > 1 and len(self.real_superclass_idx[s]) > 1
        ]
        if len(self.active_superclasses) < 20:
            self._logger.warning(
                f"num_classes={num_classes}: only {len(self.active_superclasses)}/20 "
                "CIFAR-100 superclasses populated — intra-FID sums over those only "
                "(divisor stays 100 for reference comparability)"
            )

        # ---- real-feature cache (reference metrics.py:70-77) ---------------
        # The reference caches to one fixed pickle (it only ever runs one
        # dataset + one backbone). jckx keys the cache by dataset + backbone
        # identity — a stale cross-run cache (e.g. 100-dim features loaded
        # into a 10-class run) would crash or silently corrupt FID.
        os.makedirs(cache_dir, exist_ok=True)
        tag = self._cache_fingerprint(real_images_u8, real_labels)
        if self.fast_stem:
            # stem variant is part of the extraction pipeline's identity:
            # features from the two stems differ at rounding level, and an
            # A/B must never mix real features from one with fakes from the
            # other under the same cache key
            tag += "-s2d"
        cache = os.path.join(cache_dir, f"metric_data_jckx_{tag}.npz")
        if os.path.exists(cache):
            with np.load(cache) as z:
                self.real_features = z["features"]
            self._logger.debug(f"loaded cached real features {self.real_features.shape}")
        else:
            self._logger.debug(f"extracting real features for {len(real_labels)} images")
            self.real_features = self._extract_u8(real_images_u8)
            if jax.process_index() == 0:  # lead-only file write (multi-host)
                np.savez_compressed(cache, features=self.real_features)
        self._real_mu_sigma = None
        self._real_super_stats = None
        self._real_knn_radii = {}  # k → radii of the (fixed) real set
        self.intra_fid_divisor = 100.0  # reference quirk (metrics.py:141)

    def _cache_fingerprint(self, images_u8, labels) -> str:
        """Short identity hash over (dataset sample, backbone weights) so the
        real-feature cache invalidates when either changes."""
        import hashlib

        h = hashlib.sha1()
        images_u8 = np.asarray(images_u8)
        n = images_u8.shape[0]
        h.update(np.int64(n).tobytes())
        # strided sample ACROSS the whole set (a prefix-only sample would
        # collide for datasets that differ past the first rows)
        stride = max(1, n // 64)
        h.update(np.ascontiguousarray(images_u8[::stride][:64]).tobytes())
        h.update(np.ascontiguousarray(np.asarray(labels)).tobytes())
        h.update(np.int32(self.num_classes).tobytes())
        # backbone identity: every leaf SHAPE (tells class counts / geometries
        # apart) + a content signature computed from the HOST-side arrays at
        # load time (_backbone_sig). Reading leaf contents back from the
        # device here would hang: a cold device→host read through the TPU
        # tunnel can block for MINUTES (measured: the fingerprint was the
        # 3-17 min setup stall between backbone load and feature extraction).
        for leaf in jax.tree_util.tree_leaves(self.params):
            h.update(repr(tuple(getattr(leaf, "shape", ()))).encode())
        h.update(self._backbone_sig.encode())
        return h.hexdigest()[:12]

    def _sig_or_per_run(self, sig: Optional[str], why: str) -> str:
        """Degrade a None content signature to a per-run unique tag.

        Re-extracting features is correct-but-slow; a silent cache collision
        between two same-shape backbones is not — so an unhashable backbone
        keys the real-feature cache per-run instead of colliding."""
        if sig is not None:
            return sig
        import uuid

        self._logger.warning(f"{why}; real-feature cache keyed per-run")
        return f"unhashed-{uuid.uuid4().hex[:12]}"

    @staticmethod
    def _content_sig(flat: dict) -> Optional[str]:
        """Content fingerprint over a flat ``name → array`` backbone view.

        Hashed in sorted-key order so the same weights produce the same tag
        whether they arrive as an in-memory pytree, an .npz load, or a torch
        state_dict (different iteration orders must not re-key the cache).
        Covers the leaf count plus a ≤4096-element strided sample of EVERY
        host-readable leaf — small BN vectors enter whole, large conv
        kernels through a stride that still moves when the kernel does, so
        any fine-tune epoch re-keys (a few MB of SHA1, milliseconds). Only
        host-readable leaves enter (numpy, or jax.Arrays on a CPU backend —
        a device read through the TPU tunnel can block for minutes).
        Returns None when nothing is hashable."""
        import hashlib

        arrs = {}
        for k in sorted(flat):
            a = _host_readable(flat[k])
            if a is not None and a.size > 0:
                arrs[str(k)] = a
        if not arrs:
            return None
        h = hashlib.sha1()
        h.update(np.int64(len(flat)).tobytes())
        for k, a in arrs.items():
            flat_a = np.asarray(a).ravel()  # view when contiguous
            # ceil-division stride: the sample SPANS the whole leaf (a floor
            # stride would hash only a prefix for sizes in (4096, 8192));
            # stride FIRST, then cast only the ≤4096-element sample to f32
            # (casting whole leaves would copy ~100 MB for an InceptionV3)
            stride = -(-flat_a.size // 4096)
            h.update(k.encode())
            h.update(np.ascontiguousarray(flat_a[::stride],
                                          dtype=np.float32).tobytes())
        return h.hexdigest()[:12]

    # ------------------------------------------------------------ backbone

    def _load_backbone(self, config):
        path = getattr(config, "metric_backbone", "") if config else ""
        if path and not os.path.exists(path):
            # An EXPLICIT backbone that is missing must be an error: silently
            # falling through to a default (or seeded-random) backbone would
            # make every FID/IS absolute and best-ckpt pick derive from the
            # wrong network with nothing in the log but a DEBUG line.
            raise FileNotFoundError(
                f"--metric_backbone {path!r} does not exist; refusing to fall "
                "back to a default backbone for explicitly-requested metrics"
            )
        candidates = [path] if path else []
        # jckx-native fine-tune output first, then the reference's torch
        # ckpt; the run's --save_root is searched before the reference's
        # hardcoded ./save (metrics.py:54) so a relocated save tree finds
        # the backbone the same way jckx.doctor --save_root reports it
        roots = []
        save_root = getattr(config, "save_root", "") if config else ""
        if save_root:
            roots.append(os.path.join(save_root, "iception_v3"))  # (sic)
        if os.path.normpath("./save/iception_v3") not in {
                os.path.normpath(r) for r in roots}:
            roots.append("./save/iception_v3")
        candidates += [os.path.join(r, f) for r in roots
                       for f in ("loss_bset.npz", "loss_bset.pt")]
        for c in candidates:
            if c and os.path.exists(c):
                if c.endswith(".npz"):
                    with np.load(c) as zf:
                        flat = dict(zf)
                    # same flat "a/b/c" keys as _flatten_leaves of the pytree,
                    # so explicit-params and npz-loaded backbones agree on the
                    # signature (one extraction cache, not two)
                    self._backbone_sig = self._sig_or_per_run(
                        self._content_sig(flat), f"npz backbone {c} has no "
                        "hashable leaves")
                    params = _unflatten(flat)
                    self._logger.debug(f"metric backbone loaded from {c}")
                    self._log_backbone_provenance(os.path.dirname(c))
                    return params
                try:
                    import torch

                    sd = torch.load(c, map_location="cpu")
                    self._backbone_sig = self._sig_or_per_run(
                        self._content_sig(
                            {k: np.asarray(v) for k, v in sd.items()}),
                        f"torch backbone {c} has no hashable leaves")
                    params = inception_v3.convert_torch_state_dict(sd)
                    self._logger.debug(f"metric backbone converted from torch ckpt {c}")
                    return params
                except Exception as e:  # noqa: BLE001
                    self._logger.warning(f"failed to load backbone {c}: {e}")
        self._logger.warning(
            "no fine-tuned InceptionV3 checkpoint found — using a seeded random "
            "backbone; FID/IS are self-consistent but NOT comparable to the "
            "reference's absolute values"
        )
        self._backbone_sig = f"seeded-random-0-{self.num_classes}"
        return inception_v3.init(0, num_classes=self.num_classes)

    def _log_backbone_provenance(self, ckpt_dir: str) -> None:
        """Surface the fine-tune summary sidecar (inception_train writes it)
        so a weak/throwaway backbone can't silently define FID absolutes."""
        import json

        path = os.path.join(ckpt_dir, "summary.json")
        if not os.path.exists(path):
            return
        try:
            s = json.load(open(path))
        except Exception:  # noqa: BLE001 — provenance is best-effort
            return
        self._logger.debug(
            f"backbone provenance: {s.get('dataset')} {s.get('epochs_run')} epochs, "
            f"best top1 {s.get('best_top1', 0):.4f}"
        )
        if s.get("best_top1", 1.0) < 0.5:
            self._logger.warning(
                "metric backbone's best top-1 is below 0.5 — FID/IS absolutes "
                "from this backbone are weak; re-run jckx.metrics.inception_train"
            )

    # ----------------------------------------------------------- pipelines

    def _normalize_299(self, x01):
        x299 = jax.image.resize(
            x01, (x01.shape[0], 299, 299, x01.shape[-1]), method="bilinear"
        )
        if x299.shape[-1] == 1:  # grayscale → 3-channel for the backbone
            x299 = jnp.repeat(x299, 3, axis=-1)
        mean = jnp.asarray(IMAGENET_MEAN, x299.dtype)
        std = jnp.asarray(IMAGENET_STD, x299.dtype)
        return (x299 - mean) / std

    def _make_u8_pipeline(self):
        def fn(u8):
            x01 = u8.astype(self.compute_dtype) / 255.0
            x = self._normalize_299(x01)
            return inception_v3.apply(self.params, x, self.compute_dtype,
                                      fast_stem=self.fast_stem)

        return fn

    def _make_tanh_pipeline(self):
        def fn(img):
            x01 = 0.5 * img.astype(self.compute_dtype) + 0.5  # denormalize
            x = self._normalize_299(x01)
            return inception_v3.apply(self.params, x, self.compute_dtype,
                                      fast_stem=self.fast_stem)

        return fn

    # upload granularity: big enough to amortize the ~0.4 s/transfer tunnel
    # cost, small enough that a high-res 50k set never exceeds HBM headroom
    _SLAB_BYTES = 256 * 1024 * 1024

    def _batched(self, fn, images) -> np.ndarray:
        """Feature extraction over arbitrary-size image sets.

        Host arrays are uploaded in ≤256 MB slabs (one transfer each, sliced
        into batches on device); batch dispatches are async with a single
        drain at the end. Per-batch uploads or syncs cost ~0.4 s each through
        the remote TPU runtime, while slab-at-a-time bounds device memory so
        a 50k high-resolution set cannot OOM the chip.

        DEVICE arrays skip the host round-trip entirely (trainers keep the
        sampler output on-chip and feed it straight in)."""
        if isinstance(images, jax.Array):
            return self._batched_device(fn, images)
        images = np.asarray(images)
        n = images.shape[0]
        if n == 0:
            return np.zeros((0, self.num_classes), np.float32)
        bs = self._round_bs(min(self.batch_size, n))
        nb = (n + bs - 1) // bs
        pad = nb * bs - n
        if pad:
            images = np.concatenate([images, images[-1:].repeat(pad, axis=0)])
        row_bytes = max(1, int(images[:1].nbytes))
        batches_per_slab = max(1, self._SLAB_BYTES // (row_bytes * bs))
        fn_at = self._fn_at(fn, bs)

        # multi-slab sets: pad the tail so every slab shares ONE executable
        # (a second static shape costs a 10-300 s remote compile)
        if nb > batches_per_slab and nb % batches_per_slab:
            extra = batches_per_slab - nb % batches_per_slab
            images = np.concatenate([images, images[-1:].repeat(extra * bs, axis=0)])
            nb_padded = nb + extra
        else:
            nb_padded = nb

        def _make_slab(s):
            k = min(batches_per_slab, nb_padded - s)
            chunk = images[s * bs : (s + k) * bs].reshape(k, bs, *images.shape[1:])
            # one transfer (per device when sharded: each chip receives only
            # its bs/n_data rows of every batch; multi-process each host
            # uploads only its addressable shards via put_global)
            if self._batch_sharding is not None:
                from jckx.parallel.mesh import put_global

                return put_global(chunk, self._batch_sharding), k
            return jax.device_put(chunk), k

        # double-buffered: device_put is async, so initiating slab s+1's
        # host gather + transfer WHILE the device chews slab s hides the
        # upload behind compute (same discipline as the trainer's streaming
        # plane). The block on slab s's last batch then bounds residency at
        # two ≤256 MB slabs + outputs — still nowhere near HBM.
        outs = []
        starts = list(range(0, nb_padded, batches_per_slab))
        slab, k = _make_slab(starts[0])
        for si in range(len(starts)):
            slab_outs = [fn_at(slab, i) for i in range(k)]
            nxt = (_make_slab(starts[si + 1])
                   if si + 1 < len(starts) else None)
            if len(starts) > 1:
                jax.block_until_ready(slab_outs[-1])
            outs.extend(slab_outs)
            del slab  # release before swapping in the prefetched one
            if nxt is not None:
                slab, k = nxt
        out = np.asarray(jnp.concatenate(outs), np.float32)
        return out.reshape(nb_padded * bs, -1)[: nb * bs][:n]

    def _batched_device(self, fn, images_dev) -> np.ndarray:
        """Feature extraction over an already-device-resident image set:
        no upload, batches sliced on device, one drain at the end. Sized
        for eval sets (≤ a few thousand images) that fit HBM alongside the
        models — the trainer's per-eval fake grids."""
        n = int(images_dev.shape[0])
        if n == 0:
            return np.zeros((0, self.num_classes), np.float32)
        bs = self._round_bs(min(self.batch_size, n))
        nb = (n + bs - 1) // bs
        pad = nb * bs - n
        if pad:
            images_dev = jnp.concatenate(
                [images_dev, jnp.repeat(images_dev[-1:], pad, axis=0)]
            )
        if self._batch_sharding is not None:
            # on-device reshard (the trainer's sampler output arrives in the
            # train step's layout) — ICI collective, no host round-trip. Only
            # the sharded path pays the eager reshape dispatch; unsharded
            # slabs stay flat so the whole extraction stays at nb launches.
            from jckx.parallel.mesh import reshard

            images_dev = reshard(
                images_dev.reshape(nb, bs, *images_dev.shape[1:]),
                self._batch_sharding)
            fn_at = self._fn_at(fn, bs)
        else:
            fn_at = self._fn_at(fn, bs, flat=True)
        outs = [fn_at(images_dev, i) for i in range(nb)]
        return np.asarray(jnp.concatenate(outs), np.float32)[:n]

    def _round_bs(self, bs: int) -> int:
        """Extraction batch rounded up to a multiple of the mesh's data
        shards (batches shard evenly; the row padding that already exists
        for the tail covers the extra)."""
        nd = self._eval_data_shards
        return ((bs + nd - 1) // nd) * nd

    def _fn_at(self, fn, bs: int, flat: bool = False):
        """Jitted batch-i-of-slab executable, cached per (pipeline, batch,
        layout).

        Slabs are laid out (k, bs, ...) so batch i is a leading-axis index;
        under a mesh the bs axis carries the 'data' sharding and the index
        never crosses it. ``flat=True`` is the unsharded device-resident
        form: the slab stays (k·bs, ...) as the caller handed it over and
        batch i is a dynamic_slice — no eager reshape dispatch. Slice-on-
        device fused into the feature call either way: an eager device-array
        slice is its own ~0.4 s dispatch on the remote runtime, doubling the
        launch count; dynamic indexing inside the jit keeps it at one."""
        cache_key = (id(fn), bs, flat)
        fn_at = self._fn_at_cache.get(cache_key)
        if fn_at is None:
            # multi-process: replicate the (small) feature output so the
            # host metric math can fetch it on every process
            jit_kw = ({"out_shardings": self._out_sharding}
                      if self._out_sharding is not None else {})
            if flat:
                fn_at = jax.jit(
                    lambda slab, i: fn(
                        jax.lax.dynamic_slice_in_dim(slab, i * bs, bs, axis=0)),
                    **jit_kw,
                )
            else:
                fn_at = jax.jit(
                    lambda slab, i: fn(
                        jax.lax.dynamic_index_in_dim(
                            slab, i, axis=0, keepdims=False)),
                    **jit_kw,
                )
            self._fn_at_cache[cache_key] = fn_at
        return fn_at

    def _extract_u8(self, u8_images) -> np.ndarray:
        return self._batched(self._features_from_u8, u8_images)

    def extract_features(self, images_tanh) -> np.ndarray:
        """GAN output in [-1,1] (any spatial size) → backbone logits."""
        return self._batched(self._features_from_tanh, images_tanh)

    # -------------------------------------------------------------- metrics

    def inception_score(self, images_tanh=None, splits: int = 10,
                        logits: Optional[np.ndarray] = None) -> float:
        """IS over generated images in [-1,1] (reference metrics.py:97-110).

        ``logits`` short-circuits extraction (the backbone's class logits ARE
        the feature vectors — trainers extract once and feed IS/FID/intra)."""
        if logits is None:
            logits = self.extract_features(images_tanh)
        probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        return float(inception_score_from_probs(probs, splits=splits))

    def _real_stats(self):
        if self._real_mu_sigma is None:
            mu, sigma = mean_and_cov(jnp.asarray(self.real_features))
            self._real_mu_sigma = (mu, sigma)
        return self._real_mu_sigma

    def fid(
        self,
        images_tanh=None,
        intra_fid: bool = False,
        label: int = 0,
        features: Optional[np.ndarray] = None,
    ) -> float:
        """FID(real set ‖ generated) — reference metrics.py:113-129.

        ``features`` short-circuits extraction (used by intra_fid to avoid
        re-running the backbone per superclass)."""
        gen = features if features is not None else self.extract_features(images_tanh)
        if intra_fid:
            real = jnp.asarray(self.real_features[self.real_superclass_idx[label]])
            mu1, s1 = mean_and_cov(real)
        else:
            mu1, s1 = self._real_stats()
        mu2, s2 = mean_and_cov(jnp.asarray(gen))
        return float(frechet_distance(mu1, s1, mu2, s2))

    def intra_fid(self, images_tanh=None,
                  features: Optional[np.ndarray] = None) -> float:
        """Σ_superclass FID / 100 (reference metrics.py:132-141, incl. the
        ÷100-for-20-superclasses quirk). Features extracted ONCE; pass
        ``features`` to reuse an extraction shared with fid()/IS. Empty
        superclass buckets (num_classes<100) are skipped — see ctor.

        Uniform fake buckets (num_classes=100 → 50 fakes/superclass) take
        the batched path: all superclass FIDs in one device program + one
        host read (the per-superclass loop costs a ~0.4 s scalar read EACH
        through the remote runtime)."""
        feats = features if features is not None else self.extract_features(images_tanh)
        active = self.active_superclasses
        sizes = {len(self.fake_superclass_idx[s]) for s in active}
        if len(sizes) == 1 and active:
            mu_r, sigma_r = self._real_superclass_stats()
            idx = np.stack([self.fake_superclass_idx[s] for s in active])
            total = float(intra_fid_sum(jnp.asarray(feats), jnp.asarray(idx),
                                        mu_r, sigma_r))
        else:  # ragged buckets (num_classes<100): per-superclass loop
            total = 0.0
            for s in active:
                idx = self.fake_superclass_idx[s]
                total += self.fid(features=feats[idx], intra_fid=True, label=s)
        return total / self.intra_fid_divisor

    def kid(self, images_tanh=None, features: Optional[np.ndarray] = None,
            subsets: int = 100, subset_size: int = 1000,
            seed: int = 0) -> tuple:
        """Kernel Inception Distance (real set ‖ generated) → (mean, std).

        Beyond-reference metric (metrics/extra.py): unbiased at the small
        sample counts where FID's covariance estimate biases high. Same
        feature space and extraction as fid(); ``features`` reuses a shared
        extraction like fid()/intra_fid() do."""
        from jckx.metrics.extra import kid as _kid

        gen = features if features is not None else self.extract_features(images_tanh)
        return _kid(self.real_features, gen,
                    subsets=subsets, subset_size=subset_size, seed=seed)

    def prdc(self, images_tanh=None, features: Optional[np.ndarray] = None,
             k: int = 3) -> dict:
        """Precision / recall / density / coverage of generated vs real
        (metrics/extra.py k-NN manifolds) — separates fidelity from mode
        coverage, the axes FID conflates. Same feature space as fid().

        The real set's k-NN radii (an n_real×n_real sweep — half the
        metric's device work at 50k reals) are computed once per k and
        reused by every eval, like _real_superclass_stats for intra-FID."""
        from jckx.metrics.extra import manifold_metrics, real_knn_radii

        gen = features if features is not None else self.extract_features(images_tanh)
        if k not in self._real_knn_radii:
            self._real_knn_radii[k] = real_knn_radii(self.real_features, k)
        return manifold_metrics(self.real_features, gen, k=k,
                                real_radii=self._real_knn_radii[k])

    def _real_superclass_stats(self):
        """(S, d) means + (S, d, d) covariances of the real features per
        ACTIVE superclass — computed once, reused by every intra-FID eval."""
        if self._real_super_stats is None:
            mus, sigmas = [], []
            for s in self.active_superclasses:
                mu, sig = mean_and_cov(
                    jnp.asarray(self.real_features[self.real_superclass_idx[s]])
                )
                mus.append(mu)
                sigmas.append(sig)
            self._real_super_stats = (jnp.stack(mus), jnp.stack(sigmas))
        return self._real_super_stats


def _host_readable(leaf) -> Optional[np.ndarray]:
    """numpy view of a leaf iff reading it cannot touch an accelerator:
    np.ndarray passes through; a jax.Array qualifies only when every one of
    its shards lives on a CPU device (host memory). Returns None otherwise."""
    if isinstance(leaf, np.ndarray):
        return leaf
    if isinstance(leaf, jax.Array):
        try:
            if all(d.platform == "cpu" for d in leaf.devices()):
                return np.asarray(leaf)
        except Exception:  # noqa: BLE001 — e.g. deleted/donated buffer
            return None
    return None


def _flatten_leaves(params, prefix: str = "") -> dict:
    """Flatten a nested-dict pytree to ``a/b/c → leaf`` WITHOUT converting
    leaves (flatten_params calls np.asarray, which would block on device
    arrays). Key format matches flatten_params / the .npz layout, so
    signatures agree across load mechanisms."""
    if not isinstance(params, dict):
        from jax.tree_util import keystr, tree_flatten_with_path

        return {keystr(kp): leaf
                for kp, leaf in tree_flatten_with_path(params)[0]}
    flat = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(_flatten_leaves(v, key))
        else:
            flat[key] = v
    return flat


def _unflatten(flat: dict) -> dict:
    from jckx.utils.transfer import bulk_device_put

    out: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = np.asarray(v)
    return bulk_device_put(out)


def flatten_params(params: dict, prefix: str = "") -> dict:
    flat = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(flatten_params(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat
