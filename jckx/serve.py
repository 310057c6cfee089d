"""Inference / serving: load a training checkpoint and generate images.

The reference has no inference path at all — generation exists only inside
the training eval loop. jckx exposes the trained generator as a standalone,
deployment-ready API:

- ``GeneratorService``: loads any jckx checkpoint (best-metric or latest) —
  or a REFERENCE torch ``.pt`` (checkpoint/torch_convert.py imports it and
  infers geometry/conditionality from the weight shapes) —
  jit-compiles the sampler once (Pallas fused BN+act inference path), and
  serves batched ``sample()`` calls entirely on device — including the
  tanh→uint8 pixel conversion, so the device→host fetch is the final uint8
  payload (4× fewer bytes than fetching float32 and converting on host).
  Fixed batch shapes keep one executable; requests are padded to the
  compiled batch.
- Multi-chip: pass ``mesh=`` (or ``--mesh_shape`` on the CLI) and the
  request batch is sharded over the mesh's 'data' axis with replicated
  params — each chip renders its slice, XLA gathers on fetch. The Pallas
  fused-BN stage carries a ``custom_partitioning`` rule so the SPMD
  partitioner shards it on rows like everything else (an earlier revision
  saw GSPMD replicate it — all-gather in, slice out — because the custom
  call was opaque; tests/test_kernels.py now pins "no all-gather" on the
  8-device virtual mesh). Only functional multi-chip validation is
  possible on this 1-chip machine.
- CLI: ``python -m jckx.serve --ckpt save/dcgan/<ts>/latest.ckpt -n 64
  -o samples.png`` (add ``--labels 3,17,42`` for CGAN class control).
- ``--quant int8``: W8A8 post-training-quantized sampler (ops/quant.py) —
  int8×int8→int32 convs on the integer MXU path (2× bf16 peak, half the
  HBM bytes on v5e), calibrated from a few float probe batches at load.

Throughput: ``bench_serve.py`` measures the production sampler (generator
forward + on-device uint8 conversion) with the tunnel-safe differential
clock; see README's perf table for the recorded numbers.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jckx.checkpoint import restore_checkpoint
from jckx.kernels.fused_bn_act import pallas_inference
from jckx.models.dcgan import GANGeometry
from jckx.train.state import make_template_state


def validate_sample_args(n: int, labels, conditional: bool):
    """Shared request validation for GeneratorService / ArtifactService:
    → normalized labels (empty selection means random classes)."""
    if n < 1:
        raise ValueError(f"sample(n={n}): n must be >= 1")
    # len(), not truthiness: a numpy label array raises on bool()
    if labels is not None and len(labels) == 0:
        labels = None
    if labels is not None and not conditional:
        # same contract as the HTTP 400: silently returning random
        # unconditional samples would let the caller believe class control
        # worked
        raise ValueError(
            "labels were given but this checkpoint is unconditional "
            "(DCGAN) — class-conditional sampling needs a CGAN checkpoint")
    return labels


def pipelined_sample(n: int, bs: int, render, window: int = 8) -> np.ndarray:
    """Async-dispatch / ordered-drain request loop shared by both serving
    backends: ``render(batch_i, made)`` returns one device batch; the device
    renders batch N+1 while the host receives batch N (a serial
    dispatch→fetch loop would pay compute+transfer per batch). The window
    bounds HBM held by undrained payloads."""
    out, made, batch_i = [], 0, 0
    inflight = []  # (device_imgs, take)

    def drain_one():
        imgs, take = inflight.pop(0)
        out.append(np.asarray(imgs)[:take])  # uint8 payload fetch

    while made < n:
        imgs = render(batch_i, made)
        inflight.append((imgs, min(bs, n - made)))
        made += inflight[-1][1]
        batch_i += 1
        if len(inflight) >= window:
            drain_one()
    while inflight:
        drain_one()
    return np.concatenate(out)


def tanh_to_u8(imgs):
    """Device-side pixel conversion for serving: tanh output in [-1, 1] →
    uint8. floor (not round) keeps this bit-identical to numpy's
    ``astype(uint8)`` truncation on the same f32 values, so on- and
    off-device conversion agree. The single definition the service ships —
    bench_serve.py and the profiling tools import it so the recorded
    numbers always measure the production conversion."""
    x = imgs.astype(jnp.float32) * 0.5 + 0.5
    return jnp.floor(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)


class GeneratorService:
    """Checkpoint-backed image generator.

    ``conditional`` + geometry must match the checkpoint (they are plain
    constructor args because the reference's checkpoints carry no config;
    jckx's .json sidecar is consulted when present).
    """

    def __init__(
        self,
        ckpt_path: str,
        conditional: Optional[bool] = None,
        num_classes: Optional[int] = None,
        geo: Optional[GANGeometry] = None,
        batch_size: int = 512,
        compute_dtype=jnp.bfloat16,
        seed: int = 0,
        use_ema: Optional[bool] = None,
        geo_overrides: Optional[dict] = None,
        mesh=None,
        subpixel: bool = False,
        quant: Optional[str] = None,
        quant_calib_batches: int = 4,
        truncation: float = 0.0,
    ):
        # self-configure from the trainer's sidecar when present (explicit
        # args win — for a jckx checkpoint, whose sidecar is advisory). A
        # reference torch checkpoint (.pt) is imported directly — its
        # "sidecar" is inferred from the weight shapes
        # (checkpoint/torch_convert.py), so a reference user can point the
        # server at the .pt their old stack produced and nothing else.
        # Explicit args that CONTRADICT the .pt's weights are rejected here
        # with a clear error (the weights are ground truth; letting an
        # override "win" would surface as an opaque XLA shape error at
        # trace time instead).
        sidecar = {}
        torch_state = None
        if ckpt_path.endswith(".pt"):
            from jckx.checkpoint import import_torch_gan_checkpoint

            torch_state, tinfo = import_torch_gan_checkpoint(
                ckpt_path, with_optimizer=False)  # serving never reads opt_*
            tg = tinfo["geo"]
            sidecar = {
                "conditional": tinfo["conditional"],
                "num_classes": tinfo["num_classes"],
                "z_dim": tg.z_dim, "image_size": tg.image_size,
                "channels": tg.channels, "base_width": tg.base_width,
            }
            explicit = dict(geo_overrides or {})
            if conditional is not None:
                explicit["conditional"] = conditional
            if num_classes is not None:
                explicit["num_classes"] = num_classes
            if geo is not None:
                explicit.update({f: getattr(geo, f) for f in (
                    "z_dim", "image_size", "channels", "base_width")})
            clashes = {k: (v, sidecar[k]) for k, v in explicit.items()
                       if k in sidecar and v != sidecar[k]}
            if clashes:
                raise ValueError(
                    f"{ckpt_path}: explicit args contradict the checkpoint's "
                    f"weights (given vs inferred): {clashes}")
        else:
            from jckx.checkpoint import load_serve_sidecar

            sidecar = load_serve_sidecar(ckpt_path)
        if conditional is None:
            conditional = bool(sidecar.get("conditional", False))
        if geo is None:
            fields = ("z_dim", "image_size", "channels", "base_width")
            defaults = GANGeometry()
            merged = {f: sidecar.get(f, getattr(defaults, f)) for f in fields}
            merged.update(geo_overrides or {})  # explicit flags win per-field
            geo = GANGeometry(**merged)
        if num_classes is None:
            num_classes = sidecar.get("num_classes", 100)
        # structure truth vs serving choice: the restore TEMPLATE must match
        # what the run stored (sidecar 'ema'); use_ema only selects which
        # generator serves — use_ema=False on an EMA checkpoint must not
        # produce a template-structure mismatch
        stored_ema = bool(sidecar.get("ema", False))
        if use_ema is None:
            use_ema = stored_ema

        self.geo = geo or GANGeometry()
        self.conditional = conditional
        self.num_classes = num_classes
        self.batch_size = batch_size
        self._key = jax.random.PRNGKey(seed)
        self._count = 0
        # opt-in kernel-segregated ConvTranspose form for the sampler's
        # trace (ops/conv.py subpixel_inference; bit-comparable output,
        # perf A/B via bench_serve.py --subpixel 1)
        import contextlib

        from jckx.ops.conv import subpixel_inference

        self._conv_scope = subpixel_inference if subpixel else contextlib.nullcontext

        if torch_state is not None:
            if use_ema:
                # same contract as the geometry clashes above: the operator
                # explicitly asked for EMA weights, but reference .pt
                # checkpoints carry none (the reference has no EMA at all) —
                # silently serving the live generator would ship the wrong
                # weights with only an info-line hint
                raise ValueError(
                    f"{ckpt_path}: use_ema=True was requested but reference "
                    f"torch checkpoints carry no EMA weights; drop use_ema "
                    f"or serve a jckx checkpoint from an --ema_decay run")
            state = torch_state
            self.step = tinfo["step"]  # host-side: int(state.step) would be
            # a cold-channel device read on some backends (CLAUDE.md landmine)
        else:
            template = make_template_state(
                self.geo, conditional=conditional, num_classes=num_classes,
                with_ema=stored_ema or use_ema,
            )
            state, _ = restore_checkpoint(ckpt_path, template)
            self.step = int(state.step)  # flax from_bytes leaves are host numpy
        self.used_ema = bool(use_ema and state.ema_g is not None)
        self.params_g = state.ema_g if self.used_ema else state.params_g

        if batch_size < 1:
            raise ValueError(
                f"batch_size {batch_size} must be >= 1 (a zero batch would "
                f"make sample() spin forever)")
        if truncation < 0:
            raise ValueError(f"truncation {truncation} must be >= 0 (0 = off)")
        self.truncation = float(truncation)
        cd = compute_dtype
        bs = batch_size
        ncls = num_classes

        # --quant int8: W8A8 post-training quantization of the sampler
        # (ops/quant.py) — int8×int8→int32 ConvTranspose contractions (2×
        # MXU peak + half the HBM bytes of bf16 on v5e), BN/tanh in f32.
        # Calibration runs a few FLOAT probe batches of the same z (and
        # label) distribution the render draws, then the float generator
        # params are replaced by the int8 pytree for the service lifetime.
        # make_sampler (ops/quant.py) is the single home of the quant-vs-
        # float dispatch AND the calibration-key derivation, shared with
        # jckx.evaluate --quant (so the scored pytree is the served one),
        # jckx.export and bench_serve.py.
        from jckx.ops.quant import make_sampler

        self.quant = quant
        # calibration batch size stays the make_sampler default (64),
        # NOT min(bs, 64): scales must depend only on (seed, calib_batches)
        # so the pytree `evaluate --quant` scores is the served one for
        # EVERY serving batch_size, not just bs >= 64
        self.params_g, self.sampler_apply = make_sampler(
            self.params_g, self.geo, quant=quant, conditional=conditional,
            num_classes=ncls, compute_dtype=cd, seed=seed,
            calib_batches=quant_calib_batches)

        # The whole request batch is ONE compiled program: fold the batch
        # offset into the key, draw z (and random labels for conditional
        # serving) on device, render, convert to uint8. Host-side eager
        # per-batch device ops (fold_in/normal/one_hot) would each cost a
        # dispatch (~0.4 s through this machine's tunnel) that the async
        # drain in sample() cannot hide.
        sampler_apply = self.sampler_apply

        def apply_g(params, z, lab):
            """One generator forward — float (the default trace) or the int8
            serving replica. ``lab`` None ⇒ unconditional; else class ids."""
            onehot = (jax.nn.one_hot(lab, ncls, dtype=z.dtype)
                      if lab is not None else None)
            return sampler_apply(params, z, onehot)

        # truncation trick (BigGAN-style quality/diversity knob, opt-in):
        # z ~ N(0,1) truncated to [-t, t]. Compiled into the render, so the
        # knob costs nothing per request. Quality effect is measurable via
        # jckx.evaluate --truncation on the same checkpoint.
        trunc = self.truncation

        def draw_z(k, shape):
            if trunc > 0:
                return jax.random.truncated_normal(k, -trunc, trunc, shape)
            return jax.random.normal(k, shape)

        def render_rand(params, key, offset):
            k = jax.random.fold_in(key, offset)
            z = draw_z(k, (bs, self.geo.z_dim))
            lab = (jax.random.randint(jax.random.fold_in(k, 1), (bs,), 0, ncls)
                   if conditional else None)
            return tanh_to_u8(apply_g(params, z, lab))

        def render_labeled(params, key, offset, lab):
            k = jax.random.fold_in(key, offset)
            z = draw_z(k, (bs, self.geo.z_dim))
            return tanh_to_u8(apply_g(params, z, lab))

        def render_interp(params, ka, kb, t, oh_a, oh_b, kind):
            """Latent interpolation row: endpoints drawn on device from the
            two seeds (same distribution the sampler draws, incl. the
            truncation knob), path = slerp (the right geodesic for Gaussian
            latents) or lerp over ``t`` (steps,). Conditional morph:
            the one-hots lerp alongside. One dispatch, no host reads
            before the render (cold-channel landmine, CLAUDE.md)."""
            za = draw_z(ka, (self.geo.z_dim,))
            zb = draw_z(kb, (self.geo.z_dim,))
            tt = t[:, None]
            if kind == "slerp":
                na = za / jnp.linalg.norm(za)
                nb = zb / jnp.linalg.norm(zb)
                omega = jnp.arccos(jnp.clip(jnp.dot(na, nb), -1.0, 1.0))
                so = jnp.sin(omega)
                # degenerate (za ∥ zb, e.g. seed_a == seed_b): fall back to
                # lerp — slerp's sin ratio is 0/0 there
                safe = so > 1e-6
                wa = jnp.where(safe, jnp.sin((1.0 - tt) * omega) / jnp.where(safe, so, 1.0), 1.0 - tt)
                wb = jnp.where(safe, jnp.sin(tt * omega) / jnp.where(safe, so, 1.0), tt)
            else:  # lerp
                wa, wb = 1.0 - tt, tt
            z = wa * za[None, :] + wb * zb[None, :]
            oh = (None if oh_a is None
                  else (1.0 - tt) * oh_a[None, :] + tt * oh_b[None, :])
            return tanh_to_u8(sampler_apply(params, z, oh))

        self.mesh = mesh
        if mesh is not None:
            # multi-chip serving: replicated params, request batch sharded on
            # 'data' — each chip renders batch/n_data images, the final uint8
            # fetch gathers. Same collectives-free layout as DP training's
            # forward, so scaling is linear in chips.
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape.get("data", 1)
            if batch_size % n_data:
                raise ValueError(
                    f"serving batch_size {batch_size} is not divisible by the "
                    f"mesh 'data' axis ({n_data} shards)")
            repl = NamedSharding(mesh, P())
            batch_sh = NamedSharding(mesh, P("data"))
            self.params_g = jax.device_put(self.params_g, repl)
            self._jit_rand = jax.jit(
                render_rand, in_shardings=(repl, repl, repl),
                out_shardings=batch_sh)
            self._jit_labeled = jax.jit(
                render_labeled, in_shardings=(repl, repl, repl, batch_sh),
                out_shardings=batch_sh)
        else:
            self._jit_rand = jax.jit(render_rand)
            self._jit_labeled = jax.jit(render_labeled)
        # interpolation rows are small one-shots (CLI grids / HTTP
        # /interpolate); plain jit — with a mesh the replicated params serve
        # it unsharded, which is the right trade for a ≤256-image render
        self._jit_interp = jax.jit(render_interp, static_argnames=("kind",))

    def _next_key(self):
        self._count += 1
        return jax.random.fold_in(self._key, self._count)

    def sample(
        self,
        n: int,
        labels: Optional[Sequence[int]] = None,
        key: Optional[jax.Array] = None,
    ) -> np.ndarray:
        """→ uint8 images (n, S, S, C). Requests pad to the compiled batch.

        ``key``: a PRNGKey, or a plain int seed (used as PRNGKey(seed) —
        the HTTP front passes the request's int so no device work happens
        before the first render dispatch)."""
        labels = validate_sample_args(n, labels, self.conditional)
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        key = key if key is not None else self._next_key()
        bs = self.batch_size

        # each batch is exactly ONE dispatch (the compiled render draws
        # z/labels from key+offset on device); pipelined_sample drains async
        def render(batch_i, made):
            with pallas_inference(), self._conv_scope():
                if self.conditional and labels is not None:
                    lab = np.asarray(
                        [labels[(made + i) % len(labels)] for i in range(bs)],
                        np.int32)
                    return self._jit_labeled(self.params_g, key, made, lab)
                return self._jit_rand(self.params_g, key, made)

        return pipelined_sample(n, bs, render)

    def interpolate(
        self,
        seed_a: int,
        seed_b: int,
        steps: int = 10,
        label_a: Optional[int] = None,
        label_b: Optional[int] = None,
        kind: str = "slerp",
    ) -> np.ndarray:
        """Latent interpolation: → uint8 images (steps, S, S, C).

        Endpoint latents are drawn from ``PRNGKey(seed_a)/PRNGKey(seed_b)``
        (deterministic: same seeds → byte-identical row). ``kind``: "slerp"
        (default — the geodesic for Gaussian latents) or "lerp". Conditional
        checkpoints need ``label_a`` (``label_b`` defaults to it; differing
        labels morph the class one-hot alongside the latent). The whole row
        renders as ONE batch — under batch-stat BN the batch is part of the
        function, so frames are a function of (seeds, labels, steps, kind)
        only. Each distinct ``steps`` value compiles once.
        """
        if not 2 <= steps <= 4096:
            raise ValueError(f"steps {steps} must be in [2, 4096]")
        if kind not in ("slerp", "lerp"):
            raise ValueError(f"kind {kind!r} must be 'slerp' or 'lerp'")
        if self.conditional:
            if label_a is None:
                raise ValueError(
                    "conditional checkpoint: interpolate needs label_a "
                    "(label_b defaults to label_a)")
            if label_b is None:
                label_b = label_a
            for lab in (label_a, label_b):
                if not 0 <= lab < self.num_classes:
                    raise ValueError(
                        f"label {lab} out of [0, {self.num_classes})")
            oh_a = np.zeros(self.num_classes, np.float32)
            oh_b = np.zeros(self.num_classes, np.float32)
            oh_a[label_a] = 1.0
            oh_b[label_b] = 1.0
        else:
            if label_a is not None or label_b is not None:
                raise ValueError(
                    "labels given but the checkpoint is unconditional")
            oh_a = oh_b = None
        t = np.linspace(0.0, 1.0, steps, dtype=np.float32)
        with pallas_inference(), self._conv_scope():
            u8 = self._jit_interp(
                self.params_g, jax.random.PRNGKey(seed_a),
                jax.random.PRNGKey(seed_b), t, oh_a, oh_b, kind=kind)
        return np.asarray(u8)


# ----------------------------------------------------------------- HTTP mode

def make_http_server(svc: "GeneratorService", host: str = "0.0.0.0",
                     port: int = 8000):
    """Production HTTP front for a ``GeneratorService`` (stdlib-only).

    - ``GET /healthz`` → JSON {status, step, conditional, num_classes,
      image_size, channels, batch_size} (readiness probe: it only answers
      once the service is constructed).
    - ``POST /generate`` with JSON {"n": int, "labels": [ints]?,
      "seed": int?, "format": "png"|"npy"?} → a PNG sample grid (default) or
      a raw ``.npy`` uint8 array (N,S,S,C). ``seed`` makes the response
      deterministic (same seed → byte-identical images); without it each
      request draws fresh noise. ``labels`` selects CGAN classes (rejected
      for unconditional checkpoints).
    - ``GET /metrics`` → Prometheus text exposition (requests/images/errors
      counters, request-latency sum+count, checkpoint step) — the
      observability surface a production scrape expects; stdlib-only like
      the rest of the daemon.

    Requests are handled on threads but SAMPLING IS SERIALIZED under one
    lock: there is one device pipeline, and GeneratorService's async
    dispatch window is the batching layer — interleaving two sample() calls
    would interleave their key counters, not add throughput.

    Returns the (not yet running) ``ThreadingHTTPServer``; callers run
    ``serve_forever()`` (the CLI does, with SIGTERM → clean ``shutdown()``).
    The returned server carries ``swap_service(new_svc)``: an atomic hot
    swap under the sampling lock (in-flight requests finish on the old
    service; /metrics counters persist) — the mechanism behind the CLI's
    ``--watch`` checkpoint-reload mode.
    """
    import io
    import json as _json
    import threading
    import time as _time
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    lock = threading.Lock()
    current = {"svc": svc}

    def cur():
        return current["svc"]
    # /metrics counters; one lock, touched only at request boundaries
    stats_lock = threading.Lock()
    stats = {"requests": 0, "images": 0, "errors": 0, "latency_sum": 0.0}

    def _count(images: int = 0, error: bool = False, seconds: float = 0.0):
        with stats_lock:
            stats["requests"] += 1
            stats["images"] += images
            stats["errors"] += int(error)
            stats["latency_sum"] += seconds

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet: jckx logging owns stdout
            pass

        def _reply(self, code: int, ctype: str, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _error(self, code: int, msg: str):
            self._reply(code, "application/json",
                        _json.dumps({"error": msg}).encode())

        def do_GET(self):
            if self.path == "/metrics":
                with stats_lock:
                    snap = dict(stats)
                body = "".join(
                    f"# TYPE {k} {t}\n{k} {v}\n" for k, t, v in (
                        ("jckx_generate_requests_total", "counter", snap["requests"]),
                        ("jckx_generate_images_total", "counter", snap["images"]),
                        ("jckx_generate_errors_total", "counter", snap["errors"]),
                        ("jckx_generate_seconds_sum", "counter",
                         round(snap["latency_sum"], 6)),
                        ("jckx_checkpoint_step", "gauge", cur().step),
                        ("jckx_serving_batch_size", "gauge", cur().batch_size),
                    ))
                return self._reply(
                    200, "text/plain; version=0.0.4", body.encode())
            if self.path != "/healthz":
                return self._error(404, "unknown path (GET /healthz or /metrics)")
            s = cur()
            self._reply(200, "application/json", _json.dumps({
                "status": "ok", "step": s.step,
                "conditional": s.conditional,
                "num_classes": s.num_classes,
                "image_size": s.geo.image_size,
                "channels": s.geo.channels,
                "batch_size": s.batch_size,
                "truncation": getattr(s, "truncation", 0.0),
            }).encode())

        def do_POST(self):
            if self.path == "/generate":
                handler = self._generate
            elif self.path == "/interpolate":
                handler = self._interpolate
            else:
                return self._error(
                    404, "unknown path (POST /generate or /interpolate)")
            t0 = _time.perf_counter()
            try:
                n = handler()  # image count on success, None on any error
            except Exception:  # noqa: BLE001 — e.g. client hung up mid-write:
                # the socket is gone, but the request must still be counted
                n = None
            _count(images=n or 0, error=n is None,
                   seconds=_time.perf_counter() - t0)

        def _read_json(self):
            try:
                length = int(self.headers.get("Content-Length") or 0)
                req = _json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(req, dict):
                    raise ValueError("body must be a JSON object")
                return req
            except ValueError as e:
                self._error(400, f"bad JSON body: {e}")
                return None

        @staticmethod
        def _is_int(v):  # JSON true/false are ints to isinstance
            return isinstance(v, int) and not isinstance(v, bool)

        def _send_images(self, imgs, fmt, ncol):
            buf = io.BytesIO()
            if fmt == "npy":
                np.save(buf, imgs)
                self._reply(200, "application/octet-stream", buf.getvalue())
                return
            from PIL import Image

            from jckx.logging.artifacts import make_grid

            grid = make_grid(imgs, ncol=ncol)
            if grid.shape[-1] == 1:
                grid = grid[..., 0]
            Image.fromarray(grid).save(buf, format="PNG")
            self._reply(200, "image/png", buf.getvalue())

        def _interpolate(self):
            """POST /interpolate {"seed_a", "seed_b", "steps"?, "label_a"?,
            "label_b"?, "kind"?, "format"?} → one row of the latent walk
            (PNG strip, or npy (steps,S,S,C))."""
            s = cur()
            if not hasattr(s, "interpolate"):
                return self._error(
                    400, "this serving artifact has no interpolation path "
                         "(serve a .ckpt/.pt, not a sealed *.jaxexp)")
            req = self._read_json()
            if req is None:
                return None
            is_int = self._is_int
            for field in ("seed_a", "seed_b"):
                if not is_int(req.get(field)):
                    return self._error(400, f"'{field}' must be an int")
            # steps capped at 64 over HTTP: each distinct (steps, kind) pair
            # compiles its own render once, serialized under the sampling
            # lock — an unbounded knob would let one client queue hundreds of
            # multi-second compiles in front of /generate (review finding).
            # ≤126 bounded programs; the CLI (operator-controlled) has no cap.
            steps = req.get("steps", 10)
            if not is_int(steps) or not 2 <= steps <= 64:
                return self._error(400, "'steps' must be an int in [2, 64]")
            fmt = req.get("format", "png")
            if fmt not in ("png", "npy"):
                return self._error(400, "'format' must be 'png' or 'npy'")
            kind = req.get("kind", "slerp")
            labs = {}
            for field in ("label_a", "label_b"):
                if field in req:
                    if not is_int(req[field]):
                        return self._error(400, f"'{field}' must be an int")
                    labs[field] = req[field]
            try:
                try:
                    with lock:
                        imgs = s.interpolate(req["seed_a"], req["seed_b"],
                                             steps=steps, kind=kind, **labs)
                except ValueError as e:  # service-level validation → clear 400
                    return self._error(400, str(e))
                self._send_images(imgs, fmt, ncol=steps)
                return steps
            except Exception as e:  # noqa: BLE001 — boundary: report, don't die
                self._error(500, f"generation failed: {type(e).__name__}: {e}")
                return None

        def _generate(self):
            s = cur()  # one consistent service per request, even mid-swap
            req = self._read_json()
            if req is None:
                return None

            is_int = self._is_int
            n = req.get("n", 1)
            if not is_int(n) or not 1 <= n <= 4096:
                return self._error(400, "'n' must be an int in [1, 4096]")
            labels = req.get("labels")
            if labels is not None:
                if not s.conditional:
                    return self._error(
                        400, "'labels' given but the checkpoint is "
                             "unconditional (DCGAN)")
                if (not isinstance(labels, list) or not labels or
                        not all(is_int(x) and
                                0 <= x < s.num_classes for x in labels)):
                    return self._error(
                        400, f"'labels' must be a non-empty list of ints in "
                             f"[0, {s.num_classes})")
            fmt = req.get("format", "png")
            if fmt not in ("png", "npy"):
                return self._error(400, "'format' must be 'png' or 'npy'")
            key = None
            if "seed" in req:
                if not is_int(req["seed"]):
                    return self._error(400, "'seed' must be an int")
                # pass the raw int: both services seed from it at dispatch
                # time, so no device work happens before the first render
                # (the cold-channel first-read landmine, CLAUDE.md)
                key = req["seed"]

            # a render/encode failure must come back as a JSON 500, not a
            # dropped connection (BaseHTTPRequestHandler's default)
            try:
                with lock:
                    imgs = s.sample(n, labels=labels, key=key)
                self._send_images(imgs, fmt,
                                  ncol=max(1, int(np.ceil(np.sqrt(n)))))
                return n
            except Exception as e:  # noqa: BLE001 — boundary: report, don't die
                self._error(500, f"generation failed: {type(e).__name__}: {e}")
                return None

    srv = ThreadingHTTPServer((host, port), Handler)

    def swap_service(new_svc):
        """Atomic hot swap: taken under the sampling lock so no request is
        mid-sample across the switch; requests that already captured the
        old service finish on it. Counters persist across swaps."""
        with lock:
            current["svc"] = new_svc

    srv.swap_service = swap_service
    return srv


class CheckpointWatcher:
    """Poll a checkpoint file and hot-swap the serving service on change —
    the CLI's ``--watch`` mode: a daemon pointed at a training run's
    ``latest.ckpt`` follows the run (the trainer's writes are atomic
    ``os.replace``, checkpoint.py, so a poll never sees a torn file).

    ``rebuild()`` constructs the replacement service; a failed rebuild
    (e.g. the sidecar landing an instant after the blob) keeps the old
    service and retries on the next poll — the signature is only advanced
    on a successful swap.
    """

    def __init__(self, srv, ckpt_path: str, rebuild, logger=None):
        self.srv, self.path, self.rebuild = srv, ckpt_path, rebuild
        self._logger = logger
        self._sig = self._stat()

    def _stat(self):
        st = os.stat(self.path)
        return (st.st_mtime_ns, st.st_size)

    def _log(self, msg):
        if self._logger is not None:
            self._logger(msg)

    def poll_once(self) -> bool:
        """→ True when a new checkpoint was swapped in."""
        try:
            sig = self._stat()
        except OSError:
            return False  # mid-replace or deleted; next poll decides
        if sig == self._sig:
            return False
        try:
            new_svc = self.rebuild()
        except Exception as e:  # noqa: BLE001 — keep serving the old ckpt
            self._log(f"--watch: reload of {self.path} failed "
                      f"({type(e).__name__}: {e}) — still serving the "
                      f"previous checkpoint; will retry")
            return False
        self.srv.swap_service(new_svc)
        self._sig = sig
        self._log(f"--watch: now serving step-{new_svc.step} checkpoint")
        return True

    def run(self, interval_s: float, stop_event):
        while not stop_event.wait(interval_s):
            self.poll_once()


def get_args(argv=None):
    p = argparse.ArgumentParser(description="jckx generator serving")
    p.add_argument("--ckpt", required=True,
                   help="checkpoint path (.ckpt, or a reference torch .pt — "
                        "imported in place, geometry inferred)")
    p.add_argument("-n", "--num", type=int, default=64)
    p.add_argument("-o", "--out", default="samples.png")
    p.add_argument("--conditional", action="store_true", default=None)
    p.add_argument("--labels", default="", help="comma class ids (CGAN)")
    # geometry flags default to None = "take from the checkpoint sidecar";
    # each explicitly-passed flag overrides only that field
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--channels", type=int, default=None)
    p.add_argument("--base_width", type=int, default=None)
    p.add_argument("--z_dim", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None,
                   help="compiled request batch (default 512; fixed at "
                        "export time for *.jaxexp artifacts)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh_shape", default="",
                   help="comma ints (e.g. '8') — shard the request batch over "
                        "a 'data' mesh of that shape; '' = single device")
    p.add_argument("--listen", default="",
                   help="run as an HTTP server instead of writing a grid: "
                        "'8000' or 'host:8000' (GET /healthz, POST /generate)")
    p.add_argument("--subpixel", type=int, default=0,
                   help="1 = kernel-segregated ConvTranspose sampler trace "
                        "(ops/conv.py; same math, A/B via bench_serve.py)")
    p.add_argument("--watch", type=float, default=0.0,
                   help="with --listen: poll the checkpoint file every N "
                        "seconds and hot-swap the service when it changes "
                        "(follow a training run's latest.ckpt); 0 = off")
    p.add_argument("--quant", default="", choices=["", "int8"],
                   help="int8 = W8A8 post-training-quantized sampler "
                        "(ops/quant.py; calibrated at load, A/B via "
                        "bench_serve.py --quant int8)")
    p.add_argument("--truncation", type=float, default=0.0,
                   help="truncation trick: draw z ~ N(0,1) truncated to "
                        "[-t, t] (BigGAN-style quality/diversity knob; "
                        "0 = off; quality effect measurable via "
                        "jckx.evaluate --truncation)")
    p.add_argument("--interpolate", default="",
                   help="SEEDA,SEEDB — write a latent-interpolation strip "
                        "between the two seeds to -o instead of a sample "
                        "grid (conditional: --labels A[,B] picks the "
                        "endpoint classes; the HTTP daemon serves the same "
                        "walk at POST /interpolate)")
    p.add_argument("--steps", type=int, default=10,
                   help="frames in the --interpolate strip")
    p.add_argument("--kind", default="slerp", choices=["slerp", "lerp"],
                   help="--interpolate path: slerp (Gaussian geodesic) or "
                        "lerp")
    return p.parse_args(argv)


def main(args):
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()  # JAX_PLATFORMS=cpu smokes: the axon plugin
    # pins jax_platforms at import, before the env var is consulted
    # validate cheap inputs BEFORE the (slow) checkpoint load + jit setup
    listen_host, listen_port = "", 0
    if args.listen:
        listen_host, _, port_s = args.listen.rpartition(":")
        if not (port_s.isascii() and port_s.isdigit()
                and 1 <= int(port_s) <= 65535):
            raise SystemExit(
                f"--listen expects PORT or HOST:PORT with a port in "
                f"[1, 65535], got {args.listen!r}")
        listen_port = int(port_s)
    if not args.listen and args.num < 1:
        raise SystemExit(f"-n/--num must be >= 1, got {args.num}")
    if args.interpolate and args.listen:
        # the daemon serves the same walk at POST /interpolate; silently
        # ignoring the one-shot flag would leave the user waiting for a
        # file that never appears (review finding)
        raise SystemExit("--interpolate is the one-shot strip writer; with "
                         "--listen use POST /interpolate on the daemon")
    if args.watch > 0 and not args.listen:
        # the watcher thread only exists inside the daemon; silently
        # rendering a one-shot grid would ignore the operator's intent
        raise SystemExit("--watch needs --listen (it reloads a running "
                         "daemon's checkpoint; a one-shot render has "
                         "nothing to reload)")
    overrides = {k: getattr(args, k)
                 for k in ("z_dim", "image_size", "channels", "base_width")
                 if getattr(args, k) is not None}
    mesh = None
    if args.mesh_shape:
        from jckx.parallel import make_mesh, parse_mesh_shape

        shape = parse_mesh_shape(args.mesh_shape)
        if len(shape) != 1:
            # serving shards the request batch over ONE 'data' axis; a 2-D
            # shape would crash opaquely inside the Mesh ctor
            raise SystemExit(
                f"--mesh_shape for serving is 1-D (the request batch shards "
                f"over a single 'data' axis); got {args.mesh_shape!r} — pass "
                f"the total chip count (e.g. '8')")
        mesh = make_mesh(shape, ("data",))
    if args.ckpt.endswith(".jaxexp"):
        # exported StableHLO artifact (jckx.export): self-contained sampler,
        # geometry/batch fixed at export time — reject contradicting flags
        from jckx.export import ArtifactService

        if (overrides or args.conditional is not None or mesh is not None
                or args.subpixel or args.quant or args.num_classes is not None
                or args.batch_size is not None or args.truncation
                or args.interpolate):
            raise SystemExit(
                "--ckpt *.jaxexp is a sealed artifact: geometry/conditioning/"
                "batch/mesh/subpixel/quant/truncation were fixed at export "
                "time (and interpolation needs the live sampler) — "
                "re-export or serve the .ckpt instead")
        def build_svc():
            return ArtifactService(args.ckpt, seed=args.seed)
    else:
        def build_svc():
            return GeneratorService(
                args.ckpt, conditional=args.conditional,
                num_classes=args.num_classes,
                geo_overrides=overrides or None,
                batch_size=512 if args.batch_size is None else args.batch_size,
                seed=args.seed, mesh=mesh, subpixel=bool(args.subpixel),
                quant=args.quant or None, truncation=args.truncation,
            )
    svc = build_svc()
    if args.listen:
        import signal
        import threading

        srv = make_http_server(svc, listen_host or "0.0.0.0", listen_port)
        # SIGTERM/SIGINT → clean shutdown (what schedulers send; mirrors the
        # trainer's graceful preemption)
        def _stop(signum, frame):
            threading.Thread(target=srv.shutdown, daemon=True).start()

        signal.signal(signal.SIGTERM, _stop)
        signal.signal(signal.SIGINT, _stop)
        stop_watch = threading.Event()
        if args.watch > 0:
            watcher = CheckpointWatcher(
                srv, args.ckpt, build_svc,
                logger=lambda m: print(m, flush=True))
            threading.Thread(target=watcher.run,
                             args=(args.watch, stop_watch),
                             daemon=True, name="jckx-ckpt-watch").start()
        print(f"serving step-{svc.step} checkpoint on "
              f"http://{srv.server_address[0]}:{srv.server_address[1]} "
              f"(GET /healthz, POST /generate"
              + (f"; --watch {args.watch:g}s" if args.watch > 0 else "")
              + ")", flush=True)
        srv.serve_forever()
        stop_watch.set()
        srv.server_close()
        return
    labels = [int(x) for x in args.labels.split(",") if x] or None
    if args.interpolate:
        try:
            seed_a, seed_b = (int(x) for x in args.interpolate.split(","))
        except ValueError:
            raise SystemExit(
                f"--interpolate expects SEEDA,SEEDB (two ints), got "
                f"{args.interpolate!r}")
        lab_a = labels[0] if labels else None
        lab_b = labels[1] if labels and len(labels) > 1 else lab_a
        imgs = svc.interpolate(seed_a, seed_b, steps=args.steps,
                               label_a=lab_a, label_b=lab_b, kind=args.kind)
        from jckx.logging.artifacts import save_image_grid

        save_image_grid(args.out, imgs, ncol=args.steps)
        print(f"wrote a {args.steps}-frame {args.kind} walk "
              f"({seed_a}->{seed_b}, step {svc.step} checkpoint) to {args.out}")
        return
    imgs = svc.sample(args.num, labels=labels)
    from jckx.logging.artifacts import save_image_grid

    save_image_grid(args.out, imgs)
    print(f"wrote {args.num} samples (step {svc.step} checkpoint) to {args.out}")


if __name__ == "__main__":
    main(get_args())
