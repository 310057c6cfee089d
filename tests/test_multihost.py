"""Multi-host bring-up tests — the CPU-only analog of a pod job.

``jax.distributed.initialize`` cannot run twice in one process, so every
variant spawns REAL subprocesses of ``tests/_multihost_child.py``:
2-process coordinator bring-up with a cross-process collective, the
lone-host degrade, and the cluster-env fail-fast branch
(VERDICT r2 weak #4 / task 5).
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_multihost_child.py")

# env vars that would make the child think it is in (or not in) a cluster
_CLUSTER_VARS = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                 "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                 "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")


def _child_env(devices_per_proc: int = 4, **extra) -> dict:
    env = {k: v for k, v in os.environ.items() if k not in _CLUSTER_VARS}
    env.pop("PYTHONPATH", None)  # PYTHONPATH breaks the axon plugin (landmines)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices_per_proc}"
    env.update({k: str(v) for k, v in extra.items()})
    return env


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(env, timeout=240):
    return subprocess.run([sys.executable, CHILD], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_two_process_bringup_and_global_collective():
    """2 processes × 4 virtual CPU devices: jax.distributed.initialize via
    the coordinator, both agree on process_index/count, the GLOBAL 8-device
    mesh builds, and a cross-process sum over a process-local-sharded array
    returns the right total on both hosts."""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD], cwd=REPO,
            env=_child_env(4, JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                           JAX_NUM_PROCESSES=2, JAX_PROCESS_ID=i),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    recs = []
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        recs.append(json.loads(out.strip().splitlines()[-1]))

    assert sorted(r["process_index"] for r in recs) == [0, 1]
    for r in recs:
        assert r["outcome"] == "up"
        assert r["process_count"] == 2
        assert r["global_devices"] == 8 and r["local_devices"] == 4
        assert r["psum"] == float(sum(range(8)))  # crossed the process boundary


def test_multihost_lone_host_degrades():
    """No cluster env at all: init_multihost returns (False, err) — the
    --multihost flag is safe on a lone dev box."""
    r = _run(_child_env(2))
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["outcome"] == "degraded"


def test_multihost_fail_fast_with_cluster_env():
    """Coordinator env present but init unconfigurable (no process count
    detectable): init_multihost RE-RAISES instead of silently training a
    divergent solo run."""
    r = _run(_child_env(2, JAX_COORDINATOR_ADDRESS="127.0.0.1:9"))
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["outcome"] == "reraised"


def test_multihost_single_worker_hostnames_degrades():
    """TPU_WORKER_HOSTNAMES with ONE worker (e.g. the tunneled single-chip
    runtime exports 'localhost') is not a cluster — degrade, don't raise."""
    r = _run(_child_env(2, TPU_WORKER_HOSTNAMES="localhost"))
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["outcome"] == "degraded"


def test_multihost_multi_worker_hostnames_fail_fast():
    """TPU_WORKER_HOSTNAMES listing several workers IS pod evidence: an
    unconfigurable init must re-raise."""
    r = _run(_child_env(2, TPU_WORKER_HOSTNAMES="host-a,host-b"))
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["outcome"] == "reraised"


def test_multihost_explicit_process_count_fail_fast():
    """Explicit JAX_NUM_PROCESSES=2 (half-configured: no coordinator
    address) is cluster evidence — a failed init must re-raise, not train a
    divergent solo run."""
    r = _run(_child_env(2, JAX_NUM_PROCESSES=2, JAX_PROCESS_ID=0))
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["outcome"] == "reraised"
