"""InceptionV3 fine-tuning on CIFAR-100 — the metric-backbone trainer.

JAX analog of the reference's offline notebook (inceptionnet.ipynb,
SURVEY.md §2 #18): torchvision-architecture InceptionV3 with a 100-class
head, trained with SGD(lr=0.1, momentum=0.9, nesterov, weight_decay=5e-4)
at batch 128 on CIFAR-100 with RandomResizedCrop(299)+HFlip augmentation;
per-epoch top-1 / top-5 / superclass accuracy on train and test splits;
early stopping with a patience counter; best-acc / best-loss / last
checkpoints (``acc_bset`` / ``loss_bset`` / ``last_bset`` — the reference's
filenames, cell 14).

Checkpoints are flat ``.npz`` pytrees that ``Metrics`` loads directly as
the FID/IS backbone (``--metric_backbone path/loss_bset.npz``). A
torch-trained ``loss_bset.pt`` remains loadable via the converter.

TPU execution: augmentation + forward + backward + SGD in ONE jitted step;
steps dispatched async (no per-step host sync); eval via the async-batched
extraction pattern. BN runs in train mode with running-stat updates carried
in the param tree (see inception_v3.apply_train).

Usage: python -m jckx.metrics.inception_train --dataset cifar100 -e 300
"""

from __future__ import annotations

import argparse
import functools
import os
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jckx.data.augment import random_resized_crop_flip
from jckx.data.datasets import FINE_TO_SUPERCLASS, load_dataset
from jckx.logging.main_logger import MainLogger
from jckx.logging.utils import time_to_str
from jckx.metrics import inception_v3
from jckx.metrics.metrics import IMAGENET_MEAN, IMAGENET_STD, flatten_params

IMAGENET_MEAN_ARR = np.asarray(IMAGENET_MEAN, np.float32)
IMAGENET_STD_ARR = np.asarray(IMAGENET_STD, np.float32)


def _is_bn_stat(path: Tuple, _) -> bool:
    return any(getattr(p, "key", None) in ("bn_mean", "bn_var") for p in path)


def make_optimizer(lr: float, weight_decay: float = 5e-4, momentum: float = 0.9,
                   nesterov: bool = True):
    """torch SGD semantics: wd on parameters (not BN buffers), nesterov
    momentum. torch couples wd into the gradient before momentum — matched
    by optax.add_decayed_weights BEFORE trace."""
    decay_mask = lambda params: jax.tree_util.tree_map_with_path(
        lambda path, x: not _is_bn_stat(path, x), params
    )
    return optax.chain(
        optax.masked(optax.add_decayed_weights(weight_decay), decay_mask),
        optax.trace(decay=momentum, nesterov=nesterov),
        optax.scale(-lr),
    )


def make_train_step(lr: float, weight_decay: float, compute_dtype=jnp.bfloat16,
                    image_size: int = 299, nesterov: bool = True):
    """Step gathers its batch from the DEVICE-RESIDENT dataset by index:
    uploading a batch per step costs ~0.4 s of tunnel round-trip; uploading
    the epoch's int32 index matrix once costs ~nothing.

    ``image_size``: network input side (299 = notebook parity; smaller
    values keep CPU equivalence tests tractable — the graph is
    size-agnostic down to ~75). ``nesterov``: the reference's ``-snt`` flag
    given its evident meaning HERE (the SGD trainer it names) — the
    reference parses it and never reads it (main.py:57)."""
    tx = make_optimizer(lr, weight_decay, nesterov=nesterov)

    def step(params, opt_state, data_u8, labels_all, idx, key):
        u8 = jnp.take(data_u8, idx, axis=0)
        labels = jnp.take(labels_all, idx)
        k_aug, k_drop = jax.random.split(key)
        x01 = u8.astype(jnp.float32) / 255.0
        x = random_resized_crop_flip(k_aug, x01, image_size)
        x = (x - IMAGENET_MEAN_ARR) / IMAGENET_STD_ARR

        def loss_fn(p):
            logits, new_p = inception_v3.apply_train(
                p, x.astype(compute_dtype), dropout_key=k_drop,
                compute_dtype=compute_dtype,
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            return jnp.mean(ce), (new_p, acc)

        (loss, (new_params_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(new_params_stats, updates)
        return params, opt_state, loss, acc

    return jax.jit(step, donate_argnums=(0, 1)), tx, step


def make_superstep(raw_step, mesh=None):
    """K train steps per device launch (lax.scan). One-time compile is
    heavy through the remote compiler but cached persistently; amortizes
    the ~0.4 s/launch dispatch RPC.

    ``mesh``: optional jax Mesh for data-parallel fine-tuning — the batch
    index matrix shards on the 'data' axis, params/opt replicate, and XLA
    inserts the ICI all-reduces for the global BN batch statistics and
    gradient means (sync-BN semantics ≡ one big device, same recipe as
    the GAN trainers; tested equivalent in tests/test_inception_train)."""

    def sstep(params, opt_state, data_u8, labels_all, idx, key):  # idx (K,B)
        def body(carry, ib):
            p, o, k = carry
            k2 = jax.random.fold_in(k, 1)
            p, o, loss, acc = raw_step(p, o, data_u8, labels_all, ib, k2)
            return (p, o, k2), (loss, acc)

        (params, opt_state, _), (losses, accs) = jax.lax.scan(
            body, (params, opt_state, key), idx
        )
        return params, opt_state, losses, accs

    if mesh is None:
        return jax.jit(sstep, donate_argnums=(0, 1))

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        sstep,
        in_shardings=(repl, repl, repl, repl, idx_sh, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1),
    )


def make_eval_fn(compute_dtype=jnp.bfloat16, image_size: int = 299):
    """299 = notebook parity (Resize(299,299) eval transform); smaller
    values exist for the CPU end-to-end test, mirroring make_train_step's
    image_size hook."""
    @jax.jit
    def logits_fn(params, u8):
        x01 = u8.astype(jnp.float32) / 255.0
        x = jax.image.resize(
            x01, (x01.shape[0], image_size, image_size, x01.shape[3]),
            "bilinear")
        x = (x - IMAGENET_MEAN_ARR) / IMAGENET_STD_ARR
        return inception_v3.apply(params, x.astype(compute_dtype), compute_dtype)

    return logits_fn


@functools.lru_cache(maxsize=None)
def _batched_logits_fn(logits_fn, bs: int, batched_layout: bool = False,
                       out_sharding=None):
    """jit wrapper that fuses the batch slice into the forward dispatch.
    Cached on its full signature so per-epoch evaluate() calls reuse one
    compiled executable instead of re-tracing. ``batched_layout``: the
    device set arrives (nb, bs, ...) with bs sharded on the mesh's 'data'
    axis (eval_device_set(mesh=...)) — batch i is a leading-axis index that
    never crosses the sharding. ``out_sharding``: replicate the (small)
    logits so multi-process hosts can fetch them."""
    jit_kw = {"out_shardings": out_sharding} if out_sharding is not None else {}
    if batched_layout:
        @functools.partial(jax.jit, **jit_kw)
        def at(params, dev, i):
            return logits_fn(params, jax.lax.dynamic_index_in_dim(
                dev, i, axis=0, keepdims=False))
    else:
        @functools.partial(jax.jit, **jit_kw)
        def at(params, dev, i):
            batch = jax.lax.dynamic_slice_in_dim(dev, i * bs, bs, axis=0)
            return logits_fn(params, batch)

    return at


def evaluate(params, logits_fn, images_u8, labels, batch_size=256,
             device_images=None, mesh=None):
    """top-1 / top-5 / superclass accuracy + mean CE (notebook get_eval).

    ``device_images``: optional pre-padded device copy of ``images_u8`` (see
    eval_device_set) — callers evaluating every epoch pass it to avoid
    re-uploading the eval split each time (~0.4 s/transfer on the tunnel).
    ``mesh``: data-parallel eval over the fine-tune mesh — the set is laid
    out (nb, bs, ...) with bs sharded on 'data' (multi-host: every process
    holds the same host split and uploads only its addressable shards)."""
    n = len(labels)
    bs = min(batch_size, n)
    if device_images is None:
        device_images = eval_device_set(images_u8, bs, mesh=mesh)
    dev = device_images
    batched_layout = dev.ndim == np.asarray(images_u8).ndim + 1
    if batched_layout:
        nb, bs = int(dev.shape[0]), int(dev.shape[1])
    else:
        nb = (n + bs - 1) // bs
    out_sh = None
    if mesh is not None and jax.process_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        out_sh = NamedSharding(mesh, P())
    # slice INSIDE the jit (index is a traced scalar): one dispatch per batch
    # instead of two — an eager dev[i*bs:...] costs its own ~0.4 s dispatch
    # on the tunnel, every batch, every epoch (same pattern as Metrics._fn_at)
    at = _batched_logits_fn(logits_fn, bs, batched_layout, out_sh)
    outs = [at(params, dev, i) for i in range(nb)]
    logits = np.asarray(jnp.concatenate(outs), np.float32)[:n]
    top1 = (logits.argmax(-1) == labels).mean()
    # vectorized top-5; a <5-class head (custom npz/folder data) caps k —
    # top5 is then trivially the in-top-k rate, never an argpartition crash
    k = min(5, logits.shape[1])
    top5_idx = np.argpartition(logits, -k, axis=1)[:, -k:]
    top5 = (top5_idx == labels[:, None]).any(axis=1).mean()
    sup_pred = FINE_TO_SUPERCLASS[logits.argmax(-1) % 100]
    sup_true = FINE_TO_SUPERCLASS[labels % 100]
    sup = (sup_pred == sup_true).mean()
    lse = logits - logits.max(-1, keepdims=True)
    logp = lse - np.log(np.exp(lse).sum(-1, keepdims=True))
    ce = -logp[np.arange(n), labels].mean()
    return dict(top1=float(top1), top5=float(top5), superclass=float(sup), loss=float(ce))


def eval_device_set(images_u8, batch_size: int = 256, mesh=None):
    """Pad the eval split to a batch multiple and upload it ONCE.

    ``mesh``: shard the eval batches data-parallel over the fine-tune mesh —
    the set is laid out (nb, bs, ...) with bs rounded up to a shard multiple
    and sharded P(None, 'data'); multi-host each process uploads only its
    addressable shards (put_global)."""
    n = images_u8.shape[0]
    bs = min(batch_size, n)
    if mesh is None:
        pad = (bs - n % bs) % bs
        imgs = (np.concatenate([images_u8, images_u8[-1:].repeat(pad, axis=0)])
                if pad else images_u8)
        return jax.device_put(jnp.asarray(imgs))
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jckx.parallel import put_global

    shards = int(mesh.shape.get("data", 1))
    bs = ((bs + shards - 1) // shards) * shards
    pad = (bs - n % bs) % bs
    imgs = (np.concatenate([images_u8, images_u8[-1:].repeat(pad, axis=0)])
            if pad else np.asarray(images_u8))
    nb = imgs.shape[0] // bs
    return put_global(imgs.reshape(nb, bs, *imgs.shape[1:]),
                      NamedSharding(mesh, P(None, "data")))


def save_npz(path: str, params, async_write: bool = False) -> None:
    """``async_write``: fetch synchronously (one batched device→host copy),
    then hand the zlib compression + disk write to the checkpoint module's
    background writer (~seconds/file for the 95 MB backbone on one core)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = flatten_params(jax.device_get(params))

    def job():
        tmp = path + ".tmp.npz"
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **flat)
        os.replace(tmp, path)

    if async_write:
        from jckx.checkpoint.checkpoint import submit_write

        submit_write(job)
    else:
        job()


def _save_train_state(path, params, opt_state, epoch, best_acc, best_loss,
                      patience, key):
    """Epoch-boundary resume state in ONE atomic file: params, optimizer
    leaves (momentum traces), loop counters/bests, and the PRNG key —
    splitting params into a second file would open a crash window pairing
    epoch-N params with epoch-N-1 optimizer state. The epoch shuffle
    stream is reconstructed by fast-forwarding the seeded RandomState
    (same recipe as the GAN trainer's resume)."""
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(jax.device_get(opt_state))]
    flat_params = flatten_params(jax.device_get(params))
    arrays = dict(
        meta=np.array([epoch, patience], np.int64),
        bests=np.array([best_acc, best_loss], np.float64),
        key=np.asarray(key),
        **{f"opt_{i:04d}": l for i, l in enumerate(leaves)},
        **{f"p::{k}": v for k, v in flat_params.items()},
    )

    def job():
        tmp = path + ".tmp.npz"
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.replace(tmp, path)

    from jckx.checkpoint.checkpoint import submit_write

    submit_write(job)


def _load_train_state(path, opt_state_template):
    from jckx.metrics.metrics import _unflatten

    with np.load(path) as z:
        flat, treedef = jax.tree_util.tree_flatten(opt_state_template)
        names = sorted(k for k in z.files if k.startswith("opt_"))
        if len(names) != len(flat):
            raise ValueError(
                f"resume state {path} has {len(names)} optimizer leaves, "
                f"expected {len(flat)} — optimizer or model shape changed"
            )
        leaves = [jnp.asarray(z[n]) for n in names]
        opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
        epoch, patience = (int(v) for v in z["meta"])
        best_acc, best_loss = (float(v) for v in z["bests"])
        pflat = {k[len("p::"):]: z[k] for k in z.files if k.startswith("p::")}
        params = (jax.tree_util.tree_map(jnp.asarray, _unflatten(pflat))
                  if pflat else None)
        return (params, opt_state, epoch, best_acc, best_loss, patience,
                jnp.asarray(z["key"]))


def train(args):
    if getattr(args, "log_file", 0) == 1 and not getattr(args, "save_path", ""):
        # file logging with no explicit run dir → log next to the checkpoints
        # (MainLogger defers attaching until save_path is non-empty)
        args.save_path = args.save_dir
    # multi-host bring-up BEFORE any jax backend touch (the logger's rank
    # gate calls jax.process_index(), which would initialize a solo backend
    # and make a later distributed init fail) — same semantics as main.py
    _mh_err = None
    if getattr(args, "multihost", 0):
        from jckx.utils.device import init_multihost

        ok, _mh_err = init_multihost()
    logger = MainLogger(args)
    if _mh_err is not None:
        logger.warning(f"--multihost requested but not in a cluster: {_mh_err}")
    # lead-only file writes (checkpoints/sidecars) in a multi-process run;
    # the logger gates itself on the same predicate
    lead = jax.process_index() == 0
    # synthetic_size: CIFAR proportions (train N, test N/5) so a 50k run
    # reproduces the reference data scale (inceptionnet.ipynb cell 14's
    # "391it" loop; drop-last batching makes it 390 full batches here,
    # 10k eval) without archives.
    syn_n = getattr(args, "synthetic_size", 0)
    if args.dataset in ("npz", "folder"):
        # custom planes have no train/test split convention: use
        # --valid_data_path when given, else carve a seeded 10% holdout
        # (deterministic in --seed, so --resume sees the same split)
        x, y, ncls, _, _ = load_dataset(
            args.dataset, args.data_dir, data_path=args.data_path,
            image_size=args.image_size, channels=3)
        vp = getattr(args, "valid_data_path", "")
        if vp:
            xt, yt, ncls_v, _, _ = load_dataset(
                args.dataset, args.data_dir, data_path=vp,
                image_size=args.image_size, channels=3)
            if ncls_v > ncls:
                raise ValueError(
                    f"valid split has {ncls_v} classes, train has {ncls}")
        else:
            import numpy as _np

            perm = _np.random.RandomState(args.seed).permutation(len(x))
            nv = max(1, len(x) // 10)
            xt, yt = x[perm[:nv]], y[perm[:nv]]
            x, y = x[perm[nv:]], y[perm[nv:]]
            logger.info(f"custom data: seeded 10% holdout as the valid "
                        f"split ({nv} of {nv + len(x)} images)")
        synthetic = False
    else:
        x, y, ncls, _, synthetic = load_dataset(args.dataset, args.data_dir, train=True,
                                                seed=args.seed, synthetic_n=syn_n)
        xt, yt, _, _, _ = load_dataset(args.dataset, args.data_dir, train=False,
                                       seed=args.seed + 1, synthetic_n=syn_n // 5)
    if synthetic:
        logger.warning("archive not found — fine-tuning on synthetic data")
    if x.shape[-1] == 1:
        x, xt = x.repeat(3, axis=-1), xt.repeat(3, axis=-1)

    mesh = None
    if getattr(args, "mesh_shape", "") or jax.process_count() > 1:
        # a multi-process run ALWAYS trains over the global mesh (default:
        # all devices on 'data') — a solo local jit would train N divergent
        # duplicate runs
        from jckx.parallel import make_mesh, parse_mesh_shape

        mesh = make_mesh(parse_mesh_shape(getattr(args, "mesh_shape", "")),
                         ("data",))
        if args.batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {args.batch_size} not divisible by data axis "
                f"({mesh.shape['data']})"
            )
        logger.debug(f"fine-tune mesh: {dict(mesh.shape)} (data-parallel, sync-BN)")
        if args.scan_steps <= 0:
            args.scan_steps = 1  # the sharded path is the superstep jit

    params = inception_v3.init(args.seed, num_classes=ncls)
    step, tx, raw_step = make_train_step(
        args.max_learning_rate, args.weight_decay,
        image_size=getattr(args, "image_size", 299),
        nesterov=bool(getattr(args, "nesterov", 1)),
    )
    sstep = make_superstep(raw_step, mesh=mesh) if args.scan_steps > 0 else None
    opt_state = tx.init(params)
    logits_fn = make_eval_fn(image_size=getattr(args, "image_size", 299))

    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)
    bs = args.batch_size
    steps_per_epoch = len(y) // bs
    cap = getattr(args, "max_steps_per_epoch", 0)
    if cap:
        steps_per_epoch = min(steps_per_epoch, cap)

    # one-time HBM upload of the raw dataset; per-step host work is an index.
    # Over a mesh the set replicates explicitly (multi-host: per-process
    # addressable shards via put_global — every host has the same files)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from jckx.parallel import put_global, put_global_tree

        _repl = NamedSharding(mesh, P())
        _idx_sh = NamedSharding(mesh, P(None, "data"))
        data_dev = put_global(np.asarray(x), _repl)
        labels_dev = put_global(np.asarray(y, np.int32), _repl)
    else:
        data_dev = jax.device_put(jnp.asarray(x))
        labels_dev = jax.device_put(jnp.asarray(y.astype(np.int32)))

    xt_eval = xt[: args.eval_samples]
    yt_eval = yt[: args.eval_samples]
    xt_dev = eval_device_set(xt_eval, mesh=mesh)  # one upload for all epochs
    # optional train-split eval each epoch (the notebook runs get_eval on
    # BOTH splits, cell 14; off by default — train loss/acc already stream
    # from the fused step and the extra fwd pass is pure cost)
    x_eval = y_eval = x_dev = None
    if getattr(args, "eval_train", 0):
        x_eval, y_eval = x[: args.eval_samples], y[: args.eval_samples]
        x_dev = eval_device_set(x_eval, mesh=mesh)

    best_acc, best_loss, patience = 0.0, 1e10, 0
    epoch = -1  # sidecar-safe when the epoch budget is 0
    start_epoch = 0
    state_path = os.path.join(args.save_dir, "train_state.npz")
    last_path = os.path.join(args.save_dir, "last_bset.npz")
    if getattr(args, "resume", 0) and os.path.exists(state_path):
        from jckx.checkpoint.checkpoint import flush_writes
        from jckx.metrics.metrics import _unflatten

        flush_writes()  # an in-process prior train() may still be writing

        (rparams, opt_state, done_epoch, best_acc, best_loss, patience,
         key) = _load_train_state(state_path, opt_state)
        if rparams is not None:
            params = rparams
        else:  # legacy state file (pre params-in-state): params from last_bset
            with np.load(last_path) as z:
                params = jax.tree_util.tree_map(
                    jnp.asarray, _unflatten({k: z[k] for k in z.files}))
        start_epoch = done_epoch + 1
        epoch = done_epoch
        for _ in range(start_epoch):  # fast-forward the shuffle stream
            rng.permutation(len(y))
        logger.debug(f"resumed at epoch {start_epoch} "
                     f"(best top1 {best_acc:.4f}, best loss {best_loss:.4f})")
    if mesh is not None:
        # place params/opt on the (global) mesh once — covers fresh init AND
        # the host-numpy leaves a resume just loaded; multi-process this is
        # per-process addressable shards (identical values on every host)
        params = put_global_tree(params, _repl)
        opt_state = put_global_tree(opt_state, _repl)
    multiproc = jax.process_count() > 1
    if multiproc and sstep is not None:
        # AOT-compile the superstep BEFORE any dispatch, then rendezvous:
        # the first dispatch initializes the cross-process communicators,
        # whose peer wait (~30 s) is far shorter than this program's compile
        # on a slow host. The AOT compile also warms the persistent XLA
        # cache, so the dispatch-path compile right after is a fast reload.
        from jckx.utils.device import multihost_barrier

        # shapes-only placeholders: .lower() needs no materialized arrays,
        # so skip the zero alloc + put_global upload (ADVICE r4)
        k0 = min(args.scan_steps, steps_per_epoch)
        idx0 = jax.ShapeDtypeStruct((k0, bs), np.int32, sharding=_idx_sh)
        key0 = jax.ShapeDtypeStruct(np.asarray(key).shape,
                                    np.asarray(key).dtype, sharding=_repl)
        sstep.lower(params, opt_state, data_dev, labels_dev, idx0,
                    key0).compile()
        multihost_barrier("jckx_finetune_compiled")
    start = time.time()
    for epoch in range(start_epoch, args.epoch):
        order = rng.permutation(len(y))[: steps_per_epoch * bs].reshape(steps_per_epoch, bs)
        # ONE put/epoch; sharded on 'data' over the mesh. Multi-process the
        # per-launch index windows are placed from host instead (each process
        # uploads only its addressable shards of the SAME seeded permutation)
        order_dev = None
        if not multiproc:
            order_dev = (put_global(order.astype(np.int32), _idx_sh)
                         if mesh is not None
                         else jax.device_put(jnp.asarray(order.astype(np.int32))))
        losses, accs = [], []
        if sstep is not None:
            K = args.scan_steps
            done = 0
            while done < steps_per_epoch:
                k = min(K, steps_per_epoch - done)
                key = jax.random.fold_in(key, done + 7)
                if multiproc:
                    idx_in = put_global(
                        np.ascontiguousarray(order[done : done + k], np.int32),
                        _idx_sh)
                    key_in = put_global(np.asarray(key), _repl)
                else:
                    idx_in, key_in = order_dev[done : done + k], key
                params, opt_state, ls, as_ = sstep(
                    params, opt_state, data_dev, labels_dev,
                    idx_in, key_in,
                )
                losses.append(jnp.mean(ls))
                accs.append(jnp.mean(as_))
                done += k
        else:
            for i in range(steps_per_epoch):
                key = jax.random.fold_in(key, 1)
                params, opt_state, loss, acc = step(
                    params, opt_state, data_dev, labels_dev, order_dev[i], key,
                )
                losses.append(loss)  # device arrays — no sync inside the epoch
                accs.append(acc)
        tr_loss = float(jnp.mean(jnp.stack(losses)))
        tr_acc = float(jnp.mean(jnp.stack(accs)))
        # failure detection (free: the epoch mean is already a host sync):
        # abort a diverged run loudly; train_state.npz + last_bset.npz from
        # the previous epoch remain valid for --resume.
        if getattr(args, "nan_guard", 1) and not np.isfinite(tr_loss):
            logger.error(
                f"non-finite train loss at epoch {epoch} — aborting. "
                f"--resume 1 restarts from the last finished epoch but "
                f"replays it bit-identically: lower -mlr (or change --seed) "
                f"when resuming, or --nan_guard 0 to continue anyway")
            raise FloatingPointError(f"training diverged: loss={tr_loss} at epoch {epoch}")

        ev = evaluate(params, logits_fn, xt_eval, yt_eval, device_images=xt_dev,
                      mesh=mesh)
        tr_ev = {}
        if x_dev is not None:
            t = evaluate(params, logits_fn, x_eval, y_eval, device_images=x_dev,
                         mesh=mesh)
            tr_ev = {f"train_eval_{k}": v for k, v in t.items()}
            logger.debug(
                f"Epoch: {epoch}  train-eval top1 {t['top1']:.4f} "
                f"top5 {t['top5']:.4f} super {t['superclass']:.4f} loss {t['loss']:.4f}"
            )
        logger.debug(
            f"Epoch: {epoch}  train loss {tr_loss:.4f} acc {tr_acc:.4f}  "
            f"valid top1 {ev['top1']:.4f} top5 {ev['top5']:.4f} "
            f"super {ev['superclass']:.4f} loss {ev['loss']:.4f}"
        )
        logger.scalars({"epoch": epoch, "train_loss": tr_loss, "train_acc": tr_acc,
                        **tr_ev, **ev})

        improved = False
        if ev["top1"] > best_acc:
            best_acc = ev["top1"]; improved = True
            if lead:
                save_npz(os.path.join(args.save_dir, "acc_bset.npz"), params,
                         async_write=True)
        if ev["loss"] < best_loss:
            best_loss = ev["loss"]; improved = True
            if lead:
                save_npz(os.path.join(args.save_dir, "loss_bset.npz"), params,
                         async_write=True)
        if lead:
            save_npz(os.path.join(args.save_dir, "last_bset.npz"), params,
                     async_write=True)
        patience = 0 if improved else patience + 1
        if lead:
            _save_train_state(state_path, params, opt_state, epoch, best_acc,
                              best_loss, patience, key)
        if patience >= args.early_stop:
            logger.debug(f"early stopping at epoch {epoch} (patience {args.early_stop})")
            break

    from jckx.checkpoint.checkpoint import flush_writes

    flush_writes()  # surface async save failures before declaring success

    # provenance sidecar: records what produced the checkpoints in this dir
    # (guards against silently consuming a backbone from a throwaway run —
    # Metrics quality is only as good as the backbone that made it)
    import json

    if lead:
        with open(os.path.join(args.save_dir, "summary.json"), "w") as f:
            json.dump({"dataset": args.dataset,
                       "synthetic_fallback": bool(synthetic),
                       "epochs_run": epoch + 1, "epoch_budget": args.epoch,
                       "batch_size": bs, "best_top1": best_acc,
                       "best_loss": best_loss,
                       "wall_s": round(time.time() - start, 1)}, f, indent=2)
    logger.debug(f"fine-tune finish\ttime: {time_to_str(time.time() - start)}  "
                 f"best top1 {best_acc:.4f} best loss {best_loss:.4f}")
    return best_acc, best_loss


def get_args(argv=None):
    p = argparse.ArgumentParser(description="InceptionV3 fine-tune (metric backbone)")
    p.add_argument("--dataset", default="cifar100")
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--data_path", default="",
                   help="custom data (--dataset npz/folder): the .npz file "
                        "or image directory")
    p.add_argument("--valid_data_path", default="",
                   help="custom valid split; absent = seeded 10%% holdout "
                        "from --data_path")
    p.add_argument("-b", "--batch_size", type=int, default=128)
    p.add_argument("-e", "--epoch", type=int, default=300)
    p.add_argument("-mlr", "--max_learning_rate", type=float, default=0.1)
    p.add_argument("-wd", "--weight_decay", type=float, default=5e-4)
    p.add_argument("-snt", "--nesterov", type=int, default=1,
                   help="nesterov SGD 0/1 (the reference parses -snt and "
                        "never reads it; here it steers the SGD it names)")
    p.add_argument("--early_stop", type=int, default=10)
    p.add_argument("--resume", type=int, default=0,
                   help="1 = continue from save_dir's train_state.npz/last_bset.npz")
    p.add_argument("--nan_guard", type=int, default=1,
                   help="abort on non-finite epoch loss (0 = continue)")
    p.add_argument("--scan_steps", type=int, default=0,
                   help="steps per device launch via lax.scan (0 = per-step dispatch)")
    p.add_argument("--eval_samples", type=int, default=10000)
    p.add_argument("--eval_train", type=int, default=0,
                   help="1 = also run the eval pass on the train split each epoch (notebook get_eval parity)")
    p.add_argument("--mesh_shape", type=str, default="",
                   help="data-parallel mesh, e.g. '8' — batch shards over chips, sync-BN via XLA collectives")
    p.add_argument("--multihost", type=int, default=0,
                   help="jax.distributed bring-up before training (pod runs; "
                        "same degrade/fail-fast semantics as main.py). "
                        "Multi-process runs always train over the GLOBAL "
                        "mesh; checkpoints/sidecars are written by process "
                        "0 only (use a shared --save_dir on pods)")
    p.add_argument("--image_size", type=int, default=299,
                   help="network input side (299 = notebook parity; ≥75; smaller for smoke runs)")
    p.add_argument("--max_steps_per_epoch", type=int, default=0,
                   help="cap steps per epoch (0 = full epoch; smoke runs)")
    p.add_argument("--synthetic_size", type=int, default=0,
                   help="synthetic-fallback train-set size (0=4096; 50000 = "
                        "reference protocol, test split sized N/5)")
    p.add_argument("--seed", type=int, default=12345)
    p.add_argument("--save_dir", default="./save/iception_v3")  # reference's (sic) dirname
    p.add_argument("--save_path", default="")  # logger compat
    p.add_argument("--log_file", type=int, default=0)
    return p.parse_args(argv)


if __name__ == "__main__":
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()
    train(get_args())
