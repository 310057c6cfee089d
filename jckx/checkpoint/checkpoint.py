"""Checkpoint / resume.

Reference behavior (train/dcgan_trainer.py:76-99): on each new-best metric,
delete the previous ``.pt`` in ``save/<model>/<ts>/<metric>/`` and write
``{model_g, model_d, optimizer_g, optimizer_d}`` as ``<iters>_<value>.pt``
plus a fake-image grid PNG. Restore was stubbed out, never implemented
(dcgan_trainer.py:102-107).

jckx keeps the retention policy and dir layout, serializes the ONE train
state pytree (params_g/d + opt_g/d + step + rng) with flax msgpack, and
implements the missing resume: ``latest.ckpt`` is refreshed at every eval
boundary and ``restore_checkpoint`` rebuilds the exact state (bit-identical
continuation is tested in tests/test_checkpoint.py).
"""

from __future__ import annotations

import json
import os
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Callable, List, Optional, Tuple

import jax
from flax import serialization

# Single background writer: serialization + disk IO happen off the training
# thread (async checkpointing). ONE worker keeps writes ordered, so the
# reference retention policy (delete-previous-then-write) stays race-free.
# A failed write is never silently dropped: its exception is latched in
# ``_first_error`` by a done-callback and re-raised at the next
# submit_write/flush_writes — training cannot "succeed" past a checkpoint
# that never landed (ENOSPC, serialization error, …).
_writer: Optional[ThreadPoolExecutor] = None
_writer_lock = threading.Lock()
_pending: List[Future] = []
_first_error: Optional[BaseException] = None
_error_lock = threading.Lock()  # latch/clear must be atomic: a writer-thread
# failure landing while _raise_first_error is mid-clear must not be dropped


def _note_done(fut: Future) -> None:
    global _first_error
    e = fut.exception()
    if e is not None:
        with _error_lock:
            if _first_error is None:
                _first_error = e


def _raise_first_error() -> None:
    """Re-raise (once) the earliest failed async write."""
    global _first_error
    with _error_lock:
        e, _first_error = _first_error, None
    if e is not None:
        raise e


def submit_write(job: Callable[[], None]) -> None:
    """Public enqueue onto the ordered background writer (checkpoints,
    artifact renders). Bounded: if the queue backs up past 8 jobs, the
    caller blocks on the oldest (natural backpressure — an unbounded queue
    would pin state snapshots in memory for every lagging eval/epoch).
    The backpressure wait happens OUTSIDE ``_writer_lock`` so another
    thread's enqueue is never stalled behind it."""
    global _writer
    with _writer_lock:
        if _writer is None:
            _writer = ThreadPoolExecutor(max_workers=1,
                                         thread_name_prefix="jckx-ckpt")
        # drop finished futures; failures were latched by _note_done
        _pending[:] = [f for f in _pending if not f.done()]
        overflow = _pending[: max(0, len(_pending) - 8)]
        del _pending[: len(overflow)]
        fut = _writer.submit(job)
        fut.add_done_callback(_note_done)
        _pending.append(fut)
    for f in overflow:  # backpressure, lock released
        # Future.exception() waits without raising the JOB's error (it was
        # latched by _note_done) but still propagates a wait-side
        # KeyboardInterrupt — a try/except-pass here would make the
        # backpressure wait uninterruptible
        f.exception()
    _raise_first_error()


_submit = submit_write  # internal alias


def flush_writes() -> None:
    """Block until queued async checkpoint writes finish; re-raise the
    first failure (including failures that completed — and would otherwise
    have been pruned — before this call). Called at train end and before
    any restore."""
    while True:
        with _writer_lock:
            if not _pending:
                break
            fut = _pending.pop(0)
        # exception() waits without raising the job's (latched) error but
        # keeps the flush interruptible — see the overflow wait above
        fut.exception()
    _raise_first_error()


class DeviceSnapshot:
    """Un-donated on-device state snapshot handed to the async writer.

    The device→host transfer runs ONCE, on the writer thread, at the first
    queued job that needs it; the device reference is dropped immediately
    after, so the several saves of one eval boundary (best-fid + best-is +
    latest) share a single host copy instead of each re-fetching a full
    state through the tunnel — and at most one eval's snapshot stays pinned
    in HBM while its jobs are queued."""

    def __init__(self, dev_state: Any):
        self._dev = dev_state
        self._host = None
        self._lock = threading.Lock()

    def fetch(self) -> Any:
        with self._lock:
            if self._dev is not None:
                self._host = jax.device_get(self._dev)
                self._dev = None
            return self._host


def _host_of(state: Any) -> Any:
    return state.fetch() if isinstance(state, DeviceSnapshot) else jax.device_get(state)


def _write_checkpoint(path: str, host_state: Any, extra: Optional[dict]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host_state))
    os.replace(tmp, path)  # atomic — a crash mid-write can't corrupt latest
    if extra is not None:
        # The sidecar must be atomic too: restore_checkpoint (and the
        # divergence rollback) may read it while the async writer is mid-
        # rewrite, and a truncated json would turn the restore into a
        # JSONDecodeError.
        jtmp = path + ".json.tmp"
        with open(jtmp, "w") as f:
            json.dump(extra, f)
        os.replace(jtmp, path + ".json")


def save_checkpoint(path: str, state: Any, extra: Optional[dict] = None,
                    async_write: bool = False, async_fetch: bool = False) -> None:
    """``async_fetch``: run even the device→host transfer on the writer
    thread — the CALLER must guarantee the state's buffers are not donated
    to a later launch (the trainers pass an un-donated on-device snapshot).
    Implies async_write."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if async_fetch:
        _submit(lambda: _write_checkpoint(path, _host_of(state), extra))
        return
    # ONE batched device→host transfer up front: flax's to_bytes walks the
    # tree calling np.asarray per leaf, which over the tunneled TPU runtime
    # costs a ~0.4 s round-trip PER LEAF (measured: 13 s per checkpoint at
    # every eval boundary vs 0.4 s once the host copies are cached).
    # jax.device_get fetches the whole pytree in a single batched copy.
    state = _host_of(state)
    if async_write:
        _submit(lambda: _write_checkpoint(path, state, extra))
    else:
        _write_checkpoint(path, state, extra)


def restore_checkpoint(path: str, template_state: Any) -> Tuple[Any, dict]:
    flush_writes()  # a queued async write may target this very file
    with open(path, "rb") as f:
        data = f.read()
    try:
        state = serialization.from_bytes(template_state, data)
    except (ValueError, KeyError, AttributeError, TypeError) as e:
        # AttributeError is what flax raises for the no-EMA-checkpoint ->
        # EMA-template mismatch
        raise ValueError(
            f"checkpoint {path} does not match the expected state structure "
            f"(wrong model family / geometry / EMA setting?): {e}"
        ) from e
    # The OTHER EMA direction flax accepts silently: restoring an
    # EMA-carrying checkpoint into a template built with ema_g=None hands
    # back the stored tree as a raw dict (None is a leaf to from_state_dict,
    # so the stored subtree replaces it wholesale). Training would then carry
    # a stale, never-updated EMA and save it onward. Fail loudly instead —
    # with main.py's --resume config inheritance this only fires for library
    # callers who build their template by hand.
    t_ema = getattr(template_state, "ema_g", None) is not None
    r_ema = getattr(state, "ema_g", None) is not None
    if t_ema != r_ema:
        raise ValueError(
            f"checkpoint {path} {'carries' if r_ema else 'lacks'} an EMA "
            f"tree but the template was built {'without' if r_ema else 'with'} "
            f"one - ema_decay does not match the run that wrote the "
            f"checkpoint (make_template_state(with_ema=...) / Config.ema_decay)"
        )
    extra = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            extra = json.load(f)
    return state, extra


def latest_checkpoint(run_dir: str) -> Optional[str]:
    p = os.path.join(run_dir, "latest.ckpt")
    return p if os.path.exists(p) else None


def load_serve_sidecar(ckpt_path: str) -> dict:
    """Read the ``serve_config`` sidecar the trainers write next to every
    ``.ckpt`` (geometry/conditioning so serving and conversion
    self-configure). → {} when absent or unparseable. The single reader for
    jckx.serve and jckx.convert — one consumer implementation per schema."""
    try:
        with open(ckpt_path + ".json") as f:
            return json.load(f).get("serve_config", {})
    except (OSError, ValueError):
        return {}


class BestMetricCheckpointer:
    """One retained checkpoint per metric subdir, reference retention policy
    (delete previous, filename encodes iters + metric values)."""

    def __init__(self, run_dir: str, async_write: bool = False,
                 async_fetch: bool = False):
        self.run_dir = run_dir
        self.async_write = async_write or async_fetch
        self.async_fetch = async_fetch

    def save(self, typ: str, iters: int, values: Tuple[float, ...], state: Any,
             extra: Optional[dict] = None) -> str:
        sub = os.path.join(self.run_dir, typ)
        os.makedirs(sub, exist_ok=True)
        tag = "_".join(f"{v:.04f}" for v in values)
        path = os.path.join(sub, f"{iters}_{tag}.ckpt")
        host = state if self.async_fetch else _host_of(state)

        def job():
            payload = _host_of(host)  # no-op when already fetched
            for fn in os.listdir(sub):
                if fn.endswith(".ckpt") or fn.endswith(".ckpt.json"):
                    os.remove(os.path.join(sub, fn))
            _write_checkpoint(path, payload, extra)

        if self.async_write:
            _submit(job)  # delete+(fetch+)write as ONE ordered job
        else:
            job()
        return path

    def save_latest(self, state: Any, extra: Optional[dict] = None) -> str:
        path = os.path.join(self.run_dir, "latest.ckpt")
        save_checkpoint(path, state, extra, async_write=self.async_write,
                        async_fetch=self.async_fetch)
        return path
