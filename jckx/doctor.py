"""Environment readiness check: ``python -m jckx.doctor``.

One command that answers "can this machine train/serve, and how healthy is
the accelerator link right now?" — the operational questions every other
jckx entry point assumes are already settled. The reference has no analog
(it crashes at whatever layer first touches the missing piece); jckx's
remote-TPU deployments in particular need the LINK check, because a
degraded tunnel makes every timing/metric read garbage without any error
being raised (see CLAUDE.md's landmine list).

Checks (each independent; failures are reported, never raised):
- backend: which JAX platform resolved, device count/kind.
- link: device put + blocked scalar read round-trip seconds — the probe
  recommended before trusting any measurement. Healthy tunnel ≲ 1 s;
  sick episodes have measured 40 s – 5 min+.
- compile: jit of a tiny matmul end to end (exercises the XLA toolchain
  and, on a remote runtime, the compile channel).
- native: the C++ IO library (mmap dataset cache / multithreaded gather)
  — 'fallback' means the pure-python path will be used, which is correct
  but slower for host-streaming datasets.
- datasets: which real archives are present under --data_dir (else the
  synthetic fallback trains/evals deterministically).
- backbone: whether a fine-tuned metric backbone exists (Metrics falls
  back to seeded-random init — FID/IS still run, absolutes not comparable).

Exit code 0 when backend+compile pass (the framework can run), 1 otherwise.
JSON on stdout — scrape-friendly for fleet preflight.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

# Device-touching checks run thread-boxed with a timeout: a blocked device
# read (and on a sick tunnel even compile/block_until_ready) can hang for
# minutes, and a doctor that itself hangs is useless. A timed-out probe
# thread stays blocked inside the accelerator plugin's C++ call forever —
# it cannot be cancelled, only abandoned.
_PROBE_THREAD_NAME = "jckx-doctor-probe"


def _boxed(fn, timeout_s: float):
    """→ fn()'s dict, or {'error': ...} on raise/timeout."""
    box: dict = {}

    def _run():
        try:
            box.update(fn())
        except Exception as e:  # noqa: BLE001 — the report IS the channel
            box["error"] = f"{type(e).__name__}: {e}"

    th = threading.Thread(target=_run, daemon=True,
                          name=_PROBE_THREAD_NAME)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        return {"error": f"still blocked after {timeout_s:.0f}s — treat "
                         f"the link as sick; do not trust timings"}
    return box


def _hard_exit_needed() -> bool:
    """True when a timed-out probe thread is still blocked in native code.

    Normal interpreter teardown kills daemon threads while they sit inside
    the plugin's C++ read; the unwinding C++ frame then calls
    std::terminate ("FATAL: exception not rethrown" + abort) AFTER the
    report has printed. The caller should os._exit() instead — the report
    is already flushed, and there is nothing left worth tearing down."""
    return any(t.name == _PROBE_THREAD_NAME and t.is_alive()
               for t in threading.enumerate())


def run_checks(data_dir: str = "./data", probe_timeout_s: float = 60.0,
               save_root: str = "./save", link_only: bool = False) -> dict:
    """→ report dict; never raises. Import-heavy work stays inside so a
    broken piece is reported as its check's failure, not a CLI crash.
    ``link_only`` stops after backend+link (the cheap preflight other tools
    shell out to — tools/bench_all.py's tunnel probe)."""
    report: dict = {"ok": False}

    # backend --------------------------------------------------------------
    try:
        import jax

        devs = jax.devices()
        report["backend"] = {
            "platform": jax.default_backend(),
            "device_count": len(devs),
            "device_kind": devs[0].device_kind if devs else None,
            "jax_version": jax.__version__,
        }
    except Exception as e:  # noqa: BLE001 — the report IS the error channel
        report["backend"] = {"error": f"{type(e).__name__}: {e}"}
        return report

    import numpy as np

    # link probe ------------------------------------------------------------
    # two reads: the process's FIRST device→host read rides a cold channel
    # and can block for minutes even when the link is otherwise fine
    # (documented landmine), so it is reported separately (cold_read_s) and
    # the health verdict comes from the SECOND, steady-state read — the one
    # that predicts what actual work will see
    def _probe():
        a = jax.device_put(np.ones((8, 8), np.float32))
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        float(a[0, 0])
        cold = round(time.perf_counter() - t0, 3)
        b = jax.device_put(np.full((8, 8), 2.0, np.float32))
        jax.block_until_ready(b)
        t0 = time.perf_counter()
        float(b[0, 0])
        return {"cold_read_s": cold,
                "read_s": round(time.perf_counter() - t0, 3)}

    link = _boxed(_probe, probe_timeout_s)
    if "read_s" in link:
        link["healthy"] = bool(link["read_s"] < 2.0)
    report["link"] = link

    if link_only:
        report["ok"] = bool(report["backend"].get("device_count")
                            and "read_s" in report["link"])
        return report

    # compile ---------------------------------------------------------------
    def _compile_check():
        import jax.numpy as jnp

        t0 = time.perf_counter()
        y = jax.jit(lambda x: (x @ x).sum())(jnp.eye(128))
        jax.block_until_ready(y)
        return {"ok": bool(np.isfinite(float(y))),
                "wall_s": round(time.perf_counter() - t0, 2)}

    # compile budget: its own window on top of whatever the link showed
    # (first remote compiles are legitimately 10-40 s)
    comp = _boxed(_compile_check, max(probe_timeout_s, 90.0))
    if "error" in comp:
        comp["ok"] = False
    report["compile"] = comp

    # native IO ------------------------------------------------------------
    try:
        from jckx.data import native_io

        report["native_io"] = {"available": native_io.available(),
                               "note": None if native_io.available() else
                               "python fallback active (no compiler or "
                               "build failed) — correct but slower for "
                               "host-streaming datasets"}
    except Exception as e:  # noqa: BLE001
        report["native_io"] = {"available": False,
                               "note": f"{type(e).__name__}: {e}"}

    # datasets -------------------------------------------------------------
    archives = {
        "cifar100": ("cifar-100-python.tar.gz", "cifar-100-python"),
        "cifar10": ("cifar-10-python.tar.gz", "cifar-10-batches-py"),
        "mnist": ("train-images-idx3-ubyte.gz", "train-images-idx3-ubyte"),
    }
    present = {
        name: any(os.path.exists(os.path.join(data_dir, p)) for p in paths)
        for name, paths in archives.items()
    }
    report["datasets"] = {**present,
                          "synthetic_fallback": True,
                          "data_dir": os.path.abspath(data_dir)}

    # multi-host posture ---------------------------------------------------
    # what a --multihost launch would do HERE: join a cluster (env present),
    # or degrade with a warning (lone host). Reported, never attempted —
    # jax.distributed.initialize is one-shot per process.
    try:
        import jax as _jax

        from jckx.utils.device import cluster_env_present

        report["multihost"] = {
            "cluster_env_present": cluster_env_present(),
            "process_index": _jax.process_index(),
            "process_count": _jax.process_count(),
            "note": ("--multihost would JOIN this cluster (fail-fast if "
                     "init fails)" if cluster_env_present() else
                     "--multihost would degrade to single-host (no cluster "
                     "env: coordinator address / JAX_NUM_PROCESSES / "
                     "multi-worker TPU_WORKER_HOSTNAMES all absent)"),
            "runbook": "MIGRATION.md § Multi-host training runbook "
                       "(per-process env, degrade/fail-fast matrix, "
                       "compile barrier, lead-only writes)",
        }
    except Exception as e:  # noqa: BLE001
        report["multihost"] = {"error": f"{type(e).__name__}: {e}"}

    # metric backbone ------------------------------------------------------
    bdir = os.path.join(save_root, "iception_v3")  # (sic) reference dropin
    found = [f for f in ("loss_bset.npz", "loss_bset.pt")
             if os.path.exists(os.path.join(bdir, f))]
    report["metric_backbone"] = {
        "found": found,
        "note": None if found else
        "no fine-tuned backbone — Metrics uses seeded-random init "
        "(FID/IS run; absolutes not comparable across stacks). Produce one "
        "with: python -m jckx.metrics.inception_train",
    }

    # ready = backend resolved + compile works + the link produced a
    # reading (a timed-out/errored probe means nothing downstream can be
    # trusted, even if compile eventually succeeded; a slow-but-completed
    # read keeps ok=True — link.healthy carries that verdict)
    report["ok"] = bool(report["backend"].get("device_count")
                        and report["compile"].get("ok")
                        and "read_s" in report["link"])
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="jckx environment readiness check (JSON on stdout)")
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--save_root", default="./save")
    p.add_argument("--probe_timeout", type=float, default=60.0,
                   help="seconds before declaring the device link sick")
    p.add_argument("--link_only", action="store_true",
                   help="backend + link probe only (fast preflight)")
    args = p.parse_args(argv)
    report = run_checks(args.data_dir, args.probe_timeout, args.save_root,
                        link_only=args.link_only)
    # exit 0 = framework can run; in --link_only mode that means a
    # resolvable backend + a completed link read (sick-but-alive is still
    # 0 — read_s is the health verdict, thresholded by the caller)
    print(json.dumps(report, indent=2))
    code = 0 if report["ok"] else 1
    if _hard_exit_needed():
        # a probe thread is permanently blocked in the plugin's C++ read;
        # skip interpreter teardown (it would abort with "FATAL: exception
        # not rethrown" after the report) and exit with the same code
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(code)
    return code


if __name__ == "__main__":
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()
    raise SystemExit(main())
