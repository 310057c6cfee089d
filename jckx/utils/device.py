"""Device selection (reference ``utils.py:4-8`` picks cuda-else-cpu).

In JAX the runtime picks the best backend automatically; these helpers exist
for API parity and for code that wants an explicit placement target.
"""

from __future__ import annotations

import jax


def get_default_device() -> jax.Device:
    """First device of the default backend (TPU if present, else CPU)."""
    return jax.devices()[0]


def default_backend() -> str:
    return jax.default_backend()


_CLUSTER_ENV_VARS = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                     "MEGASCALE_COORDINATOR_ADDRESS")


def cluster_env_present() -> bool:
    """True when the environment says this host is part of a MULTI-process
    job: a coordinator address, an explicit process count >1
    (``JAX_NUM_PROCESSES``, Slurm, OpenMPI), or TPU_WORKER_HOSTNAMES
    listing >1 worker. Single-process values do NOT count — some
    single-chip runtimes (e.g. the tunneled axon plugin) export
    TPU_WORKER_HOSTNAMES as a lone 'localhost', which is not a cluster."""
    import os

    if any(os.environ.get(v) for v in _CLUSTER_ENV_VARS):
        return True
    for v in ("JAX_NUM_PROCESSES", "SLURM_NTASKS", "SLURM_NPROCS",
              "OMPI_COMM_WORLD_SIZE"):
        try:
            if int(os.environ.get(v, "")) > 1:
                return True
        except ValueError:
            pass
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([w for w in workers.split(",") if w.strip()]) > 1


def init_multihost():
    """Multi-host SPMD bring-up (``--multihost``): every host runs the same
    program; after this the mesh is built over the GLOBAL device set and the
    sharded-batch jit needs no further changes (collectives ride ICI within
    a slice, DCN across slices).

    Configuration comes from the standard cluster env (TPU metadata, Slurm,
    or ``JAX_COORDINATOR_ADDRESS``); jckx additionally honors explicit
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` so a plain N-process job
    (including the CPU-only bring-up test) needs no cluster scheduler.

    Returns ``(ok, err)``: ``(True, None)`` when the distributed runtime is
    up. On failure with NO cluster env present (the flag passed on a lone
    dev box) degrades to ``(False, err)`` for the caller to warn about. If
    cluster env IS present the failure re-raises — this host is part of a
    real pod job, and proceeding solo would train N divergent duplicate
    runs."""
    import os

    kwargs = {}
    n, i = os.environ.get("JAX_NUM_PROCESSES"), os.environ.get("JAX_PROCESS_ID")
    if n is not None and i is not None:
        kwargs = {"num_processes": int(n), "process_id": int(i)}
    try:
        jax.distributed.initialize(**kwargs)
        return True, None
    except Exception as e:  # noqa: BLE001 — classified below
        if cluster_env_present():
            raise
        return False, e


def multihost_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Rendezvous all processes at a COORDINATION-SERVICE barrier (plain
    RPC — no device collective, so it works while executables are still
    compiling). Used between AOT-compile and first dispatch: XLA's CPU Gloo
    communicator init waits only ~30 s for peers, while a big program can
    take minutes to compile on a slow host — the process that finishes
    first would otherwise time out waiting for one still compiling.
    No-op single-process or if the distributed client is unavailable.
    Best-effort, but never SILENT (ADVICE r4): a swallowed barrier timeout
    means a peer died during compile and the survivor would otherwise fail
    minutes later with an opaque communicator error — so every failure
    (including a jax._src.distributed API break on upgrade) logs a warning
    naming the barrier before proceeding."""
    if jax.process_count() <= 1:
        return
    try:
        from jax._src import distributed

        client = getattr(distributed.global_state, "client", None)
        if client is not None:
            client.wait_at_barrier(name, timeout_ms)
    except Exception as e:  # noqa: BLE001 — barrier is best-effort insurance
        from jckx.logging.main_logger import MainLogger

        MainLogger().warning(
            f"multihost barrier {name!r} failed ({type(e).__name__}: {e}) — "
            "proceeding, but if a peer died during compile the next "
            "collective will fail; check peer logs")


def honor_jax_platforms_env() -> None:
    """Re-assert JAX_PLATFORMS in-process.

    Some deployments force-register a TPU plugin from sitecustomize before
    env vars are consulted; backends resolve lazily, so pinning the config
    here (before any jax.devices() call) makes the env var effective —
    e.g. JAX_PLATFORMS=cpu with
    XLA_FLAGS=--xla_force_host_platform_device_count=8 runs any jckx CLI on
    a virtual 8-device mesh for sharding validation without chips."""
    import os

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
