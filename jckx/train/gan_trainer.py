"""DCGAN / CGAN trainers — the L4 orchestration layer.

Reference counterparts: train/dcgan_trainer.py:34-239 and
train/cgan_trainer.py:34-270. Public surface preserved: construction
``Trainer(cfg, params_g, params_d, data_pre)``, ``.train()``, best-metric
checkpointing into ``save/<model>/<ts>/{fid,is,intra_fid}/``, sample-grid +
loss-curve artifacts, per-100-iter scalar logs, eval every 500 iters.

TPU-native execution model (NOT the reference's per-iteration Python loop):
the trainer launches K train steps per device call via ``lax.scan`` over the
HBM-resident uint8 dataset ("superstep"). One launch = one host round-trip;
the stacked per-step telemetry (6 scalars × K) comes back at launch
boundaries. On this machine's TPU tunnel the per-step dispatch overhead is
~40 ms while the step itself is ~4 ms — supersteps are the difference
between 10× slower than the chip and full speed.

Evaluation cadence: the reference evaluates when ``iters % 500 == 0``
checked at the END of an iteration with iters starting at 0, i.e. after
steps 1, 501, 1001, … and once more at the very last step
(dcgan_trainer.py:198-222). Reproduced exactly via launch-boundary checks.

Adds the resume the reference stubbed out (dcgan_trainer.py:102-107):
``latest.ckpt`` is refreshed at every eval; ``--resume`` continues
bit-identically (rng/step live in the checkpointed state).
"""

from __future__ import annotations

import os
import signal
import threading
import time
from datetime import datetime


import jax
import jax.numpy as jnp
import numpy as np

from jckx.checkpoint import (BestMetricCheckpointer, DeviceSnapshot,
                             flush_writes, latest_checkpoint,
                             restore_checkpoint)
from jckx.configs import Config
from jckx.data.pipeline import decode_batch
from jckx.logging.artifacts import save_image_grid, save_labeled_grid, save_loss_curve
from jckx.logging.main_logger import MainLogger
from jckx.logging.utils import time_to_str
from jckx.models import cgan, dcgan
from jckx.models.dcgan import GANGeometry, param_count, summary
from jckx.parallel import make_mesh, put_global, put_global_tree, reshard
from jckx.train.state import GANTrainState, make_optimizer
from jckx.train.steps import make_cgan_train_step, make_dcgan_train_step
from jckx.train.trainer import Trainer


class _BaseGANTrainer(Trainer):
    conditional = False

    def __init__(self, cfg: Config, params_g, params_d, data_pre, mesh=None,
                 metrics=None):
        # run dir BEFORE the singleton logger: a library-constructed trainer
        # with log_file=1 and no save_path must log into the run dir, not CWD
        # (reference: main.py sets save_path first, main.py:64-71)
        if not cfg.save_path:
            ts = cfg.model_path or datetime.now().strftime("%Y%m%d_%H%M%S")
            cfg.save_path = os.path.join(cfg.save_root, self._model_name(), ts)
        os.makedirs(cfg.save_path, exist_ok=True)
        self.logger = MainLogger(cfg)
        self.cfg = cfg
        self.geo = GANGeometry(z_dim=cfg.z_dim, image_size=cfg.image_size,
                               channels=cfg.channels, base_width=cfg.base_width)
        self.cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        # CLI-steered mesh: --mesh_shape 4,2 --mesh_axes data,model gives
        # combined data×model parallelism (the reference's analog is the
        # single-device pick, utils.py:4-8); default = all devices on 'data'
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh_shape, cfg.mesh_axes)
        # multi-host: every process runs this same trainer over the GLOBAL
        # mesh; host-global values (dataset, permutations, init) are identical
        # on all processes by construction, device placement goes through
        # put_global (per-process addressable shards), and only the lead
        # process writes files (checkpoints, grids, logs — the logger gates
        # itself; metrics.jsonl and console both land on process 0 only)
        self._lead = jax.process_index() == 0
        from jax.sharding import NamedSharding, PartitionSpec as _P

        self._repl_sharding = NamedSharding(self.mesh, _P())
        n_data_shards = self.mesh.shape.get("data", 1)
        if cfg.batch_size % n_data_shards:
            raise ValueError(
                f"global batch_size {cfg.batch_size} is not divisible by the "
                f"mesh 'data' axis ({n_data_shards} shards) — XLA cannot "
                f"shard the batch evenly; pick a multiple of {n_data_shards}"
            )
        self.data_pre = data_pre
        self.num_classes = getattr(data_pre, "num_classes", cfg.num_classes)

        # model summaries at init (reference torchinfo.summary, :51-53)
        self.logger.debug(summary(params_g, "Generator"))
        self.logger.debug(summary(params_d, "Discriminator"))
        self.logger.debug(
            f"G params: {param_count(params_g):,}  D params: {param_count(params_d):,}  "
            f"mesh: {dict(self.mesh.shape)}  compute: {cfg.compute_dtype}"
        )

        # data plane: HBM-resident (one-time upload, zero host work/step) or
        # host-streaming (per-superstep slab gather+upload) per cfg
        self.train_loader, self.metric_source = data_pre.get_data_loader()
        self.n_data = data_pre.images_u8.shape[0]
        nbytes = data_pre.images_u8.nbytes
        self._streaming = cfg.data_placement == "stream" or (
            cfg.data_placement == "auto" and nbytes > cfg.hbm_data_budget
        )
        if self._streaming:
            from jckx.data.pipeline import HostStreamLoader

            self.images_dev = self.labels_dev = None
            self._stream = HostStreamLoader(
                data_pre.images_u8, data_pre.labels_np, workers=cfg.num_worker
            )
            self.logger.debug(
                f"data plane: host-streaming ({nbytes / 2**30:.2f} GiB, "
                f"{self._stream.workers} gather workers)"
            )
        else:
            # replicated across the (global) mesh — one transfer per local
            # device's worth; multi-process each host uploads its own copies
            self.images_dev = put_global(data_pre.images_u8, self._repl_sharding)
            self.labels_dev = put_global(
                data_pre.labels_np.astype(np.int32), self._repl_sharding)
            if cfg.num_worker:
                self.logger.debug(
                    "data plane: HBM-resident — -w/--num_worker has no role "
                    "(no host loader; use --data_placement stream to engage it)"
                )

        # metrics engine (eagerly, like reference dcgan_trainer.py:59) unless
        # evaluation is disabled
        self.metric = metrics
        if self.metric is None and cfg.eval_every > 0:
            from jckx.metrics import Metrics

            self.metric = Metrics(
                self.metric_source,
                cfg,
                batch_size=cfg.eval_batch_size,
                compute_dtype=self.cd,
                cache_dir=cfg.data_dir,
                num_classes=self.num_classes,
                # eval extraction runs data-parallel over the same mesh that
                # trains (single-device meshes: no-op)
                mesh=self.mesh,
            )

        if cfg.lr_schedule != "constant" and cfg.lr_decay_steps <= 0:
            # cosine horizon = the run's total step count (resume keeps
            # decaying from the checkpointed optimizer count, so the horizon
            # must describe the RUN, not the remaining steps)
            cfg.lr_decay_steps = max(1, (self.n_data // cfg.batch_size) * cfg.epoch)
            self.logger.debug(
                f"lr_schedule={cfg.lr_schedule}: decay horizon auto-set to "
                f"{cfg.lr_decay_steps} steps ({cfg.epoch} epochs)")
        tx = make_optimizer(cfg)
        self.state = GANTrainState(
            params_g=params_g, params_d=params_d,
            opt_g=tx.init(params_g), opt_d=tx.init(params_d),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 1),
            # independent buffers: ema_g aliasing params_g would make the
            # donated superstep donate the same buffer twice (runtime error)
            ema_g=jax.tree_util.tree_map(jnp.copy, params_g)
            if cfg.ema_decay > 0 else None,
        )

        # run dir (reference: save/<model>/<ts>; created above, before logger)
        self.save_path = cfg.save_path
        # async_fetch: the whole save — device→host transfer included —
        # runs on a background writer thread. Safe because _evaluate hands
        # the checkpointer an UN-DONATED on-device snapshot (one fused XLA
        # copy), so the next superstep's buffer donation can't invalidate
        # it. Flushed at train end and before any restore.
        self.ckpt = BestMetricCheckpointer(self.save_path, async_fetch=True)
        self.logger.debug(f"save path: {self.save_path}")

        self.bests = {"fid": 1e10, "is": 0.0, "intra_fid": 1e10}
        self._resumed_losses: list = []
        # host-side mirror of state.step at train start. Reading the device
        # scalar (`int(self.state.step)`) instead would be the process's
        # FIRST device→host read on eval-less runs, and the tunneled runtime
        # can block such a cold read for minutes (see CLAUDE.md landmines);
        # the value is statically known anyway: 0 fresh, ckpt step on resume.
        self._host_step = 0
        # graceful-preemption latch: the SIGTERM handler (installed for the
        # duration of train() only) sets this; the train loop checkpoints at
        # the next launch boundary and returns. `preempted` tells callers the
        # run was cut short (main.py exits 143, the conventional SIGTERM code).
        self._preempt = threading.Event()
        self.preempted = False
        if cfg.init_from_torch:
            self._init_from_torch(cfg.init_from_torch)
        if cfg.resume:
            # a jckx latest.ckpt in the run dir wins over --init_from_torch:
            # the torch import warm-starts a NEW run; resume continues it
            self._try_resume()

        self._build_jits()

    # ----------------------------------------------------------- jit builds

    def _model_name(self):
        return "cgan" if self.conditional else "dcgan"

    def _make_base_step(self):
        from jckx.parallel import MODEL_AXIS

        # spatial mode: pin the G/D grad pytrees replicated. Without the
        # constraint XLA lets the filter-grad convs produce kernel-H-sharded
        # f32 grads and runs a sharded Adam update whose params+moments
        # all-gather back to replicated — measured (r5, real v5e AOT module,
        # 128² bs64 2-way): 852 → 509 MB cross-shard per chip per step
        # (−40%), tools/profiling/spatial_halo_cost.py --replicate_grads.
        # Identity semantics (a layout hint, not an algorithm change);
        # --spatial_replicate_grads 0 restores XLA's own choice.
        gc = None
        if (MODEL_AXIS in self.mesh.axis_names
                and self.mesh.shape[MODEL_AXIS] > 1
                and self.cfg.model_axis_mode == "spatial"
                and getattr(self.cfg, "spatial_replicate_grads", 1)):
            repl = self._repl_sharding

            def gc(tree):
                return jax.tree_util.tree_map(
                    lambda g: jax.lax.with_sharding_constraint(g, repl), tree)

        if self.conditional:
            return make_cgan_train_step(self.cfg, self.geo,
                                        grad_constraint=gc)
        return make_dcgan_train_step(self.cfg, self.geo, grad_constraint=gc)

    def _build_jits(self):
        base = self._make_base_step()
        size, cd = self.cfg.image_size, self.cd
        ncls = self.num_classes
        conditional = self.conditional

        from jax.sharding import NamedSharding, PartitionSpec as P

        from jckx.parallel import MODEL_AXIS, tp_state_sharding

        repl = self._repl_sharding
        idx_sh = NamedSharding(self.mesh, P(None, "data"))
        self._idx_sharding = idx_sh

        # 'model' axis role (cfg.model_axis_mode): TP shards params/moments on
        # output channels; spatial shards activation height (GSPMD halo
        # exchanges handle the convs). Without a model axis both are no-ops.
        self._state_sharding = repl
        spatial_spec = None
        if MODEL_AXIS in self.mesh.axis_names and self.mesh.shape[MODEL_AXIS] > 1:
            if self.cfg.model_axis_mode == "tp":
                self._state_sharding = tp_state_sharding(
                    self.state, self.mesh, min_dim=self.cfg.tp_min_dim
                )
            else:  # "spatial"
                spatial_spec = NamedSharding(
                    self.mesh, P("data", MODEL_AXIS, None, None)
                )
        # place the state on the (global) mesh once — host leaves are
        # identical on every process (same init keys / same checkpoint file),
        # so multi-process placement is per-process addressable shards
        self.state = put_global_tree(self.state, self._state_sharding)

        # eval/checkpoint snapshot: one fused on-device copy, UN-DONATED.
        # Multi-process the checkpoint writer (process 0) must be able to
        # fetch every leaf to host, so the snapshot program also gathers to
        # fully-replicated (an ICI all-gather when the state is TP-sharded;
        # every process runs it, only the lead writes the file).
        _copy = lambda st: jax.tree_util.tree_map(jnp.copy, st)  # noqa: E731
        if jax.process_count() > 1:
            self._snapshot_fn = jax.jit(_copy, out_shardings=repl)
        else:
            self._snapshot_fn = jax.jit(_copy)

        def _one_step(s, u8, lab):
            real = decode_batch(u8, size, cd)
            if spatial_spec is not None:
                real = jax.lax.with_sharding_constraint(real, spatial_spec)
            if conditional:
                return base(s, real, jax.nn.one_hot(lab, ncls))
            return base(s, real)

        if self._streaming:
            # slab variant: the (K·bs) rows arrive pre-gathered from host as
            # one contiguous upload; scan consumes them positionally
            def superstep(state, slab_u8, labels):
                def body(s, xs):
                    return _one_step(s, xs[0], xs[1])

                return jax.lax.scan(body, state, (slab_u8, labels))

            slab_sh = NamedSharding(self.mesh, P(None, "data"))
            self._superstep = jax.jit(
                superstep,
                in_shardings=(self._state_sharding, slab_sh, slab_sh),
                out_shardings=(self._state_sharding, repl),
                donate_argnums=(0,),
            )
            self._slab_sharding = slab_sh
        else:
            # resident variant: scan gathers each batch from the
            # device-resident set by index (host sends K·bs int32 only)
            def superstep(state, data_u8, labels, idx):
                def body(s, ib):
                    return _one_step(s, jnp.take(data_u8, ib, axis=0),
                                     jnp.take(labels, ib))

                return jax.lax.scan(body, state, idx)

            self._superstep = jax.jit(
                superstep,
                in_shardings=(self._state_sharding, repl, repl, idx_sh),
                out_shardings=(self._state_sharding, repl),
                donate_argnums=(0,),
            )

        if self.conditional:
            def sample(params_g, z, onehot):
                return cgan.cgenerator_apply(params_g, z, onehot, self.geo, cd)
        else:
            def sample(params_g, z, onehot=None):
                return dcgan.generator_apply(params_g, z, self.geo, cd)

        # inference-only path → Pallas fused BN+act (see kernels.fused_bn_act:
        # the XLA composition hits a pathological conv-transpose lowering in
        # forward-only programs). The flag matters only at trace time.
        from jckx.kernels.fused_bn_act import pallas_inference

        jitted_sample = jax.jit(sample)
        gather_params = self._state_sharding is not repl

        def sample_wrapped(params_g, *args):
            if gather_params:
                # safety net for direct callers with TP-sharded params:
                # sampling is one forward at eval cadence, so gathering the
                # generator once beats re-partitioning the whole forward
                # (the fused-BN kernel itself now carries a
                # custom_partitioning rule, but TP shards CHANNELS, which
                # the row-partitioned kernel replicates anyway). The
                # trainer's own eval path gathers once in _eval_params_g,
                # making this a no-op there.
                params_g = jax.device_put(params_g, repl)
            with pallas_inference():
                return jitted_sample(params_g, *args)

        self._sample = sample_wrapped

    # -------------------------------------------------------------- resume

    def _init_from_torch(self, path: str) -> None:
        """Warm-start from a reference torch checkpoint (--init_from_torch).

        The import (checkpoint/torch_convert.py) replaces params, Adam
        moments, AND the step counter, so the optimizer's bias correction
        and the eval/epoch cadence continue exactly where the reference's
        run stopped — the resume the reference never implemented
        (dcgan_trainer.py:103-111) applied to ITS OWN checkpoints.
        Geometry/conditionality inferred from the weights must match this
        trainer's config (a mismatch is a user error, not a fallback case).
        """
        from jckx.checkpoint import import_torch_gan_checkpoint

        state, info = import_torch_gan_checkpoint(
            path, lr=self.cfg.max_learning_rate,
            with_ema=self.cfg.ema_decay > 0, seed=self.cfg.seed)
        if info["conditional"] != self.conditional:
            raise ValueError(
                f"{path} is a {'CGAN' if info['conditional'] else 'DCGAN'} "
                f"checkpoint but the trainer is {self._model_name()}")
        if info["geo"] != self.geo:
            raise ValueError(
                f"{path} geometry {info['geo']} != configured {self.geo}")
        if info["conditional"] and info["num_classes"] != self.num_classes:
            raise ValueError(
                f"{path} has {info['num_classes']} classes, dataset has "
                f"{self.num_classes}")
        self.state = state
        self._host_step = info["step"]
        self.logger.info(
            f"warm-started from torch checkpoint {path} at step {info['step']}")

    def _try_resume(self):
        path = latest_checkpoint(self.save_path)
        if path is None:
            self.logger.debug("resume requested but no latest.ckpt found")
            return
        self.state, extra = restore_checkpoint(path, self.state)
        self.bests.update(extra.get("bests", {}))
        self._resumed_losses = extra.get("losses", [])
        # restored leaves are host numpy (flax from_bytes) — int() is free
        self._host_step = int(self.state.step)
        self.logger.debug(f"resumed from {path} at step {self._host_step}")

    def _rollback_after_divergence(self, step_hint: int) -> None:
        """Restore the last checkpoint after a nan-guard abort so a caller
        that catches FloatingPointError and calls train() again really does
        continue from good state. The pre-launch state is unrecoverable (the
        superstep donated it and returned non-finite params with step+=k), so
        without this the retry contract would replay data at the old
        _host_step against a diverged, k-steps-ahead state. No checkpoint →
        the trainer is poisoned and train() refuses to run again."""
        # Drain the async writer first: the nan-guard can fire one launch
        # (~0.4 s) after an eval boundary whose save_latest is still queued,
        # and restoring a checkpoint the writer is concurrently (re)writing
        # races file content against _host_step. flush may re-raise a latched
        # write failure — that error outranks the rollback.
        flush_writes()
        path = latest_checkpoint(self.save_path)
        if path is None:
            self._poisoned = (
                f"training diverged by step {step_hint} with no latest.ckpt "
                "to roll back to — rebuild the trainer (fresh params) instead "
                "of calling train() again"
            )
            return
        self.state, extra = restore_checkpoint(path, self.state)
        self.bests.update(extra.get("bests", {}))
        self._resumed_losses = extra.get("losses", [])
        # restored leaves are host numpy (flax from_bytes) — int() is free;
        # read BEFORE re-placing the state on the (global) mesh, the same
        # placement _build_jits did for the initial state
        self._host_step = int(self.state.step)
        self.state = put_global_tree(self.state, self._state_sharding)
        self.logger.warning(
            f"rolled back to {path} (step {self._host_step}) after divergence"
        )

    def _serve_config(self) -> dict:
        """Geometry/conditioning sidecar so jckx.serve can self-configure."""
        return {
            "conditional": self.conditional,
            "num_classes": self.num_classes,
            "z_dim": self.geo.z_dim,
            "image_size": self.geo.image_size,
            "channels": self.geo.channels,
            "base_width": self.geo.base_width,
            "ema": self.cfg.ema_decay > 0,
        }

    # ----------------------------------------------------------------- eval

    def _eval_params_g(self):
        """EMA generator for eval when enabled (jckx extension), else live G.

        Under TP the sharded params are all-gathered HERE, once per eval —
        the CGAN path samples in chunks and would otherwise re-gather per
        chunk (device_put on the already-replicated result is a no-op)."""
        pg = (self.state.ema_g
              if self.cfg.ema_decay > 0 and self.state.ema_g is not None
              else self.state.params_g)
        if self._state_sharding is not self._repl_sharding:
            pg = reshard(pg, self._repl_sharding)
        return pg

    def _fixed_eval_inputs(self):
        key = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed), 999)
        if self.conditional:
            # 10 z per class, class-major (cgan_trainer.py:144-153)
            z = jax.random.normal(key, (10 * self.num_classes, self.geo.z_dim))
            labels = jnp.repeat(jnp.arange(self.num_classes), 10)
            onehot = jax.nn.one_hot(labels, self.num_classes)
        else:
            z = jax.random.normal(key, (self.cfg.sample_count, self.geo.z_dim))
            onehot = None
        if jax.process_count() > 1:
            # threefry is device-independent, so every process computed the
            # same values locally; lift them onto the global mesh so the
            # sampler and the mesh-parallel extraction see global arrays
            z = put_global(np.asarray(z), self._repl_sharding)
            if onehot is not None:
                onehot = put_global(np.asarray(onehot), self._repl_sharding)
        return z, onehot

    def _evaluate(self, iters: int, losses_d, losses_g):
        raise NotImplementedError

    def _extra_metrics(self, feats) -> dict:
        """Opt-in KID + precision/recall/density/coverage at the eval
        boundary (``--extra_metrics 1``; metrics/extra.py), computed from
        the SAME extraction FID/IS just used. Logged scalars only — the
        best-metric checkpoint set stays the reference's fid/is/intra_fid.
        Default off so the reference protocol's scalar stream is drop-in."""
        if not getattr(self.cfg, "extra_metrics", 0):
            return {}
        kid_mean, kid_std = self.metric.kid(features=feats)
        out = {"kid": kid_mean, "kid_std": kid_std}
        out.update(self.metric.prdc(features=feats))
        return out

    # ---------------------------------------------------------------- train

    def train(self):
        if getattr(self, "_poisoned", None):
            raise RuntimeError(self._poisoned)
        rolled_back = False  # set by the nan-guard abort path below
        cfg = self.cfg
        bs = cfg.batch_size
        steps_per_epoch = self.n_data // bs
        if steps_per_epoch == 0:
            # the reference's DataLoader(drop_last) would silently yield zero
            # batches here; fail fast instead of writing an empty run dir
            raise ValueError(
                f"batch_size {bs} exceeds the dataset ({self.n_data} rows): "
                f"0 steps/epoch — nothing would train")
        rng = np.random.RandomState(cfg.seed)
        # log_every<=0 disables per-step console logs (mirrors eval_every<=0)
        log_k = cfg.log_every if cfg.log_every > 0 else steps_per_epoch
        K = max(1, min(log_k, cfg.eval_every if cfg.eval_every > 0 else log_k,
                       steps_per_epoch))

        losses_d = [l[0] for l in self._resumed_losses]
        losses_g = [l[1] for l in self._resumed_losses]

        # real-image grid artifact (dcgan_trainer.py:144-148); lead-only like
        # every file write in a multi-process run
        if self._lead:
            first = self.data_pre.images_u8[:64]
            save_image_grid(os.path.join(self.save_path, "real_image.png"),
                            first, ncol=8, padding=5)

        start = time.time()
        self.logger.debug("train start")
        # session marker: every process (re)launch re-pays the XLA compile
        # on its first device launch; panel.collect() uses these markers to
        # drop the compile-inflated first telemetry record of EVERY session
        # (not just the file's first), so resumed runs aggregate fairly.
        # Once per TRAINER INSTANCE: a second train() on the same trainer
        # reuses this instance's jits, so its first launch is compile-free
        # and must not cost the panel another dropped sample (ADVICE r3).
        # A new trainer instance re-jits (fresh closures) → fresh marker.
        it = self._host_step
        if not getattr(self, "_session_marked", False):
            self._session_marked = True
            self.logger.scalars({"event": "session_start", "step": it})
        last_metrics = None

        # Resume: fast-forward to the checkpointed position. The epoch loop
        # restarts at the completed-epoch count, the shuffle stream is
        # advanced by the same number of draws (so the data order continues
        # exactly as the uninterrupted run), and a mid-epoch checkpoint
        # resumes inside its epoch.
        start_epoch = min(it // steps_per_epoch, cfg.epoch) if steps_per_epoch else 0
        resume_offset = it - start_epoch * steps_per_epoch
        # A resumed step at/after this config's total step count makes the
        # epoch loop empty — correct when the run simply finished, but the
        # same silent no-op also hides a config mismatch (e.g. resuming with
        # a different dataset size changes steps_per_epoch, so the old step
        # count can exceed the new horizon). Warn so "train finish 0.0s"
        # is never a mystery.
        if it > 0 and it >= cfg.epoch * steps_per_epoch:
            self.logger.warning(
                f"resumed step {it} >= total steps for this config "
                f"({cfg.epoch} epochs x {steps_per_epoch} steps/epoch = "
                f"{cfg.epoch * steps_per_epoch}) - nothing left to train; "
                f"if the run is not actually complete, check that --epoch "
                f"and the dataset size match the original run")
        for _ in range(start_epoch):
            rng.permutation(self.n_data)

        # Streaming: double-buffered host→device upload. A dedicated
        # single-thread uploader runs gather+device_put of slab N+1 WHILE the
        # device executes superstep N (the train thread blocks in np.asarray
        # on superstep N's metrics, so issuing the next upload inline would
        # serialize transfer behind compute — VERDICT r2 weak #2). One job in
        # flight by construction → at most two slabs device-resident. Row
        # order and superstep sequence are unchanged, so the streaming run
        # stays bit-identical to the resident plane. The gather fan-out keeps
        # using the stream's own pool (the uploader thread is never one of
        # its workers, so the fan-out cannot starve).
        # Graceful preemption (cfg.preempt_save): catch SIGTERM — what Cloud
        # TPU maintenance events and cluster schedulers send before the hard
        # kill — for the duration of train() only. The handler just sets a
        # latch; the loop below checkpoints latest.ckpt at the next launch
        # boundary (state is consistent there: the scan has retired, telemetry
        # is host-side) and returns. Multi-host: the scheduler must deliver
        # SIGTERM to EVERY worker (maintenance events do) — a worker
        # signaled alone stops launching while its peers block at the next
        # collective until the coordination-service heartbeat expires.
        # --resume then continues bit-identically,
        # same as the kill-and-resume soak but without losing the steps since
        # the last eval. Handler installation is main-thread-only (signal
        # module restriction); library callers on worker threads keep their
        # process-level handlers untouched.
        # fresh latch per call: a run that was preempted (or a handler that
        # fired after the loop exited) must not make a LATER train() on the
        # same trainer re-preempt after a single launch — the retry/continue
        # pattern is supported (test_second_train_call_on_same_trainer_continues)
        # Multi-process: AOT-compile the superstep BEFORE the first dispatch,
        # then rendezvous at a coordination-service barrier. The first
        # dispatch initializes the cross-process communicators, whose peer
        # wait (~30 s) can be far shorter than a big program's compile on a
        # slow host — the fast process would time out waiting for one still
        # compiling. The AOT compile also warms the persistent XLA cache.
        if jax.process_count() > 1:
            from jckx.utils.device import multihost_barrier

            # .lower() only needs SHAPES: ShapeDtypeStruct placeholders with
            # the real shardings, not materialized zero arrays — a real slab
            # would cost a (k0, bs, H, W, C) host alloc + put_global upload
            # (tens-to-hundreds of MB at ~0.4 s/transfer, transiently doubling
            # slab residency) just to compile (ADVICE r4).
            k0 = min(K, steps_per_epoch)
            if self._streaming:
                shape = (k0, bs) + self.data_pre.images_u8.shape[1:]
                slab0 = jax.ShapeDtypeStruct(shape, np.uint8,
                                             sharding=self._slab_sharding)
                labs0 = jax.ShapeDtypeStruct(
                    (k0, bs), self.data_pre.labels_np.dtype,
                    sharding=self._slab_sharding)
                self._superstep.lower(self.state, slab0, labs0).compile()
            else:
                idx0 = jax.ShapeDtypeStruct((k0, bs), np.int32,
                                            sharding=self._idx_sharding)
                self._superstep.lower(self.state, self.images_dev,
                                      self.labels_dev, idx0).compile()
            multihost_barrier("jckx_gan_superstep_compiled")

        self._preempt.clear()
        self.preempted = False
        prev_term = None
        own_handler = (cfg.preempt_save
                       and threading.current_thread() is threading.main_thread())
        uploader = upload_next = None
        try:
            # handler installation INSIDE the try: if anything below raises
            # (e.g. uploader thread creation), the finally still restores the
            # caller's process-level SIGTERM handler.
            if own_handler:
                def _on_term(signum, frame):
                    self._preempt.set()

                try:
                    prev_term = signal.signal(signal.SIGTERM, _on_term)
                except (ValueError, OSError):
                    own_handler = False

            if self._streaming:
                from concurrent.futures import ThreadPoolExecutor

                uploader = ThreadPoolExecutor(1, thread_name_prefix="jckx-upload")

                def _upload(rows: np.ndarray, k: int):
                    slab, labs = self._stream.take(rows)
                    slab = put_global(
                        slab.reshape((k, bs) + slab.shape[1:]), self._slab_sharding
                    )
                    labs = put_global(labs.reshape(k, bs), self._slab_sharding)
                    return slab, labs

            for epoch in range(start_epoch, cfg.epoch):
                order = rng.permutation(self.n_data)[: steps_per_epoch * bs].reshape(
                    steps_per_epoch, bs
                )
                done = resume_offset
                resume_offset = 0
                if self._streaming and done < steps_per_epoch:
                    k0 = min(K, steps_per_epoch - done)
                    upload_next = uploader.submit(
                        _upload, order[done : done + k0].reshape(-1), k0
                    )
                while done < steps_per_epoch:
                    k = min(K, steps_per_epoch - done)
                    t_launch = time.time()
                    if self._streaming:
                        slab, labs = upload_next.result()
                        upload_next = None
                        nxt = done + k
                        if nxt < steps_per_epoch:  # gather+upload next while device trains
                            k1 = min(K, steps_per_epoch - nxt)
                            upload_next = uploader.submit(
                                _upload, order[nxt : nxt + k1].reshape(-1), k1
                            )
                        self.state, ms = self._superstep(self.state, slab, labs)
                        del slab, labs  # release this slab's HBM before the next swap
                    else:
                        # every process computes the SAME order (same seeded
                        # rng); each uploads only its addressable idx shards
                        idx = put_global(
                            np.ascontiguousarray(order[done : done + k], np.int32),
                            self._idx_sharding)
                        self.state, ms = self._superstep(
                            self.state, self.images_dev, self.labels_dev, idx
                        )
                    ms_np = {key: np.asarray(v) for key, v in ms.items()}  # (k,) + syncs
                    launch_dt = time.time() - t_launch
                    # failure detection (free: telemetry is already host-side at
                    # launch boundaries): a diverged run aborts loudly instead of
                    # training on garbage for hours. latest.ckpt still holds the
                    # last evaluated state for --resume; --sanitize additionally
                    # pinpoints the op that produced the first NaN.
                    if cfg.nan_guard:
                        bad = [m for m, v in ms_np.items() if not np.isfinite(v).all()]
                        if bad:
                            self.logger.error(
                                f"non-finite training metrics {bad} in steps "
                                f"{it}..{it + k} — aborting (resume from "
                                f"latest.ckpt; rerun with --sanitize to locate "
                                f"the op; --nan_guard 0 to continue anyway)"
                            )
                            rolled_back = True  # never clobber _host_step below
                            try:
                                self._rollback_after_divergence(it + k)
                            except BaseException as rb_err:
                                # rollback itself failed (e.g. flush_writes
                                # re-raised a latched ENOSPC): the state is
                                # still non-finite and step accounting is
                                # stale — poison so a caller that catches and
                                # retries (or re-runs with --nan_guard 0)
                                # cannot train on garbage.
                                self._poisoned = (
                                    f"training diverged by step {it + k} AND "
                                    f"the checkpoint rollback failed "
                                    f"({rb_err!r}) — rebuild the trainer "
                                    f"(fresh params or an explicit restore) "
                                    f"before training again")
                                raise
                            raise FloatingPointError(
                                f"training diverged: non-finite {bad} by step {it + k}"
                            )
                    last_metrics = {key: float(v[-1]) for key, v in ms_np.items()}
                    losses_d += ms_np["loss_d"].tolist()
                    losses_g += ms_np["loss_g"].tolist()

                    # per-100-iteration console log (dcgan_trainer.py:191-193)
                    for s_off in range(k):
                        step_i = done + s_off
                        if cfg.log_every > 0 and step_i % cfg.log_every == 0:
                            self.logger.debug(
                                f"[{epoch}/{cfg.epoch}][{step_i}/{steps_per_epoch}]\t"
                                f"loss_d: {ms_np['loss_d'][s_off]:.4f}\t"
                                f"loss_g: {ms_np['loss_g'][s_off]:.4f}\t"
                                f"D(x): {ms_np['d_x'][s_off]:.4f}\t"
                                f"D(G(z)): {ms_np['d_gz1'][s_off]:.4f} / {ms_np['d_gz2'][s_off]:.4f}"
                            )
                    img_per_sec = bs * k / max(launch_dt, 1e-9)
                    self.logger.scalars(
                        {"step": it + k, "epoch": epoch,
                         "images_per_sec": round(img_per_sec, 1),
                         "step_ms": round(1e3 * launch_dt / k, 3),
                         **{m: float(v[-1]) for m, v in ms_np.items()}}
                    )

                    prev_it = it
                    it += k
                    done += k
                    last_step_of_run = (epoch == cfg.epoch - 1) and (done >= steps_per_epoch)
                    if self._preempt.is_set():
                        # checkpoint NOW and (usually) skip the possibly
                        # minutes-long eval: the preemption deadline is short
                        self.preempted = True
                        self.logger.warning(
                            f"SIGTERM received — saving latest.ckpt at step {it} "
                            f"and exiting (continue with --resume)"
                        )
                        snap = DeviceSnapshot(self._snapshot_fn(self.state))
                        if self._lead:
                            self.ckpt.save_latest(
                                snap,
                                {"bests": dict(self.bests),
                                 "losses": self._persist_losses(losses_d, losses_g),
                                 "serve_config": self._serve_config()},
                            )
                        if not last_step_of_run:
                            break
                        # the signal landed during the run's FINAL launch:
                        # training is complete, and a --resume would find
                        # nothing left to train — exiting here would lose the
                        # reference-mandated last-step evaluation forever
                        # (dcgan_trainer.py:198-222). latest.ckpt is already
                        # safe above, so fall through and run it.
                    if cfg.eval_every > 0 and (
                        prev_it // cfg.eval_every != it // cfg.eval_every or prev_it == 0
                        or last_step_of_run
                    ):
                        self._evaluate(it, losses_d, losses_g)
                if self.preempted:
                    break
        finally:
            if own_handler:
                signal.signal(signal.SIGTERM,
                              prev_term if prev_term is not None else signal.SIG_DFL)
            # runs on the nan-guard abort / any mid-epoch exception too:
            # a library caller that catches and retries train() must not
            # accumulate leaked uploader/gather threads or a pinned slab.
            # cancel_futures + wait=True: a queued-but-unstarted upload is
            # dropped, a running one is joined BEFORE _stream.close() — else
            # its take() would race the close and re-create the gather pool
            # with nothing left to shut it down.
            if self._streaming and uploader is not None:
                uploader.shutdown(wait=True, cancel_futures=True)
                self._stream.close()  # release gather threads (pool re-creates on reuse)
            # keep host-side step accounting correct for a caller that
            # catches a mid-epoch exception and calls train() again: resume
            # fast-forward, eval cadence, and checkpoint labels all derive
            # from _host_step. The nan-guard abort already restored a
            # checkpoint-consistent _host_step (see _rollback_after_divergence)
            # — don't clobber it with the pre-launch position.
            if not rolled_back:
                self._host_step = it
                # a second train() on the same trainer (raise-epoch-budget
                # pattern, test_second_train_call_on_same_trainer_continues)
                # rebuilds its loss history from _resumed_losses — keep it
                # current so loss.png / checkpoint 'losses' never truncate
                # to the last call's segment.
                self._resumed_losses = list(zip(losses_d, losses_g))

        flush_writes()  # surface async checkpoint-write failures before exit
        end = time.time()
        self.logger.debug(f"train finish\ttime: {time_to_str(end - start)}")
        if self._lead:
            save_loss_curve(os.path.join(self.save_path, "loss.png"),
                            losses_d, losses_g)
        return last_metrics

    # ---------------------------------------------------- checkpoint helper

    # persisted loss-history bound: every eval's save_latest re-serializes
    # the whole history into the checkpoint sidecar, which is O(total steps)
    # work and bytes per save. 100k pairs comfortably covers the reference
    # protocol (100 epochs x 391 steps = 39,100) untouched; million-step
    # runs persist a strided sample (the in-session loss.png still plots the
    # full in-memory history; only a later --resume's prefix is decimated).
    _LOSS_PERSIST_CAP = 100_000

    def _persist_losses(self, losses_d, losses_g):
        n = len(losses_d)
        if n <= self._LOSS_PERSIST_CAP:
            return list(zip(losses_d, losses_g))
        stride = -(-n // self._LOSS_PERSIST_CAP)  # ceil div
        out = list(zip(losses_d[::stride], losses_g[::stride]))
        # the strided sample can drop the tail (n=12, stride 3 keeps
        # 0,3,6,9) — always keep the final pair so a resume's plot/history
        # ends at the actual last step
        if (n - 1) % stride:
            out.append((losses_d[-1], losses_g[-1]))
        return out

    def _save_best(self, typ: str, iters: int, values, images_denorm,
                   state_snap=None):
        if not self._lead:
            # multi-process: best-tracking state (self.bests) is updated on
            # every process identically by the caller; files come from one
            return
        # snapshot bests: the writer json.dumps later; the live dict keeps
        # mutating and would stamp future bests onto this state's sidecar
        extra = {"bests": dict(self.bests), "iters": iters,
                 "serve_config": self._serve_config()}
        self.ckpt.save(typ, iters, values,
                       self.state if state_snap is None else state_snap, extra)
        path = os.path.join(self.save_path, typ, f"{iters}_fake_image.png")
        from jckx.checkpoint.checkpoint import submit_write

        submit_write(lambda: save_image_grid(path, images_denorm, ncol=8))
        self.logger.debug(f"{iters} model save ({typ})")


class DCGANTrainer(_BaseGANTrainer):
    """Unconditional trainer (reference train/dcgan_trainer.py)."""

    conditional = False

    def _evaluate(self, iters: int, losses_d, losses_g):
        z, _ = self._fixed_eval_inputs()
        # sampler output stays ON DEVICE through feature extraction — the
        # only host reads are the final metric scalars and the small grid
        fake = self._sample(self._eval_params_g(), z)

        # one backbone pass feeds both metrics (logits == feature vectors)
        feats = self.metric.extract_features(fake)
        is_score = self.metric.inception_score(logits=feats)
        fid = self.metric.fid(features=feats)
        self.logger.debug(f"inception score: {is_score}\tfid: {fid}")
        self.logger.scalars({"step": iters, "fid": fid, "is": is_score,
                             **self._extra_metrics(feats)})

        # denormalize host-side: the replicated fake grid fetches cleanly on
        # every process, and host f32 math is bit-identical to the device op
        denorm = 0.5 * np.asarray(fake, np.float32) + 0.5
        # ONE un-donated snapshot per eval; the writer fetches it to host
        # once and every save of this boundary shares that copy
        snap = DeviceSnapshot(self._snapshot_fn(self.state))
        if fid < self.bests["fid"]:
            self.bests["fid"] = fid
            self.logger.debug(f"{iters} lowest fid")
            self._save_best("fid", iters, (fid,), denorm, snap)
        if is_score > self.bests["is"]:
            self.bests["is"] = is_score
            self.logger.debug(f"{iters} highest is")
            self._save_best("is", iters, (is_score,), denorm, snap)
        if self._lead:
            self.ckpt.save_latest(
                snap,
                {"bests": dict(self.bests),
                 "losses": self._persist_losses(losses_d, losses_g),
                 "serve_config": self._serve_config()},
            )


class CGANTrainer(_BaseGANTrainer):
    """Conditional trainer (reference train/cgan_trainer.py): adds intra-FID
    tracking and the per-class labeled sample panel."""

    conditional = True

    def _evaluate(self, iters: int, losses_d, losses_g):
        z, onehot = self._fixed_eval_inputs()
        # 10·num_classes samples; generate in chunks to bound peak memory.
        # Chunks stay ON DEVICE — concatenated there and fed straight into
        # the backbone (no fake-image host round-trip per eval).
        chunks = []
        cb = 500
        pg = self._eval_params_g()
        for i in range(0, z.shape[0], cb):
            chunks.append(self._sample(pg, z[i:i + cb], onehot[i:i + cb]))
        fake = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)

        feats = self.metric.extract_features(fake)
        is_score = self.metric.inception_score(logits=feats)
        fid = self.metric.fid(features=feats)
        intra = self.metric.intra_fid(features=feats)
        self.logger.debug(
            f"inception score: {is_score}\tfid: {fid}\tintra fid: {intra}"
        )
        self.logger.scalars({"step": iters, "fid": fid, "is": is_score,
                             "intra_fid": intra,
                             **self._extra_metrics(feats)})

        # one sample per class (cgan_trainer.py:243); single small host read,
        # denormalized host-side (replicated arrays fetch on every process)
        per_class = 0.5 * np.asarray(fake[::10], np.float32) + 0.5
        names = [self.data_pre.idx_to_labels[i] for i in range(self.num_classes)]
        values = (is_score, fid, intra)
        # ONE un-donated snapshot per eval; the writer fetches it to host
        # once and every save of this boundary shares that copy
        snap = DeviceSnapshot(self._snapshot_fn(self.state))
        if fid < self.bests["fid"]:
            self.bests["fid"] = fid
            self.logger.debug(f"{iters} lowest fid")
            self._save_best("fid", iters, values, per_class, snap)
        if intra < self.bests["intra_fid"]:
            self.bests["intra_fid"] = intra
            self.logger.debug(f"{iters} lowest intra fid")
            self._save_best("intra_fid", iters, values, per_class, snap)
        if is_score > self.bests["is"]:
            self.bests["is"] = is_score
            self.logger.debug(f"{iters} highest is")
            self._save_best("is", iters, values, per_class, snap)

        if self._lead:
            img_dir = os.path.join(self.save_path, "img")
            from jckx.checkpoint.checkpoint import submit_write

            _panel_path = os.path.join(img_dir, f"{iters}_fake_image.png")
            _panel_imgs = per_class[: min(100, len(per_class))]
            _panel_names = names[: min(100, len(names))]
            submit_write(lambda: save_labeled_grid(_panel_path, _panel_imgs,
                                                   _panel_names))
            self.ckpt.save_latest(
                snap,
                {"bests": dict(self.bests),
                 "losses": self._persist_losses(losses_d, losses_g),
                 "serve_config": self._serve_config()},
            )
