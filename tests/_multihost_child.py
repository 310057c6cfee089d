"""Child program for tests/test_multihost.py — one process of an N-process
CPU bring-up (the lone-host / fail-fast variants run it with different env).

Prints ONE JSON line describing what happened so the parent test can assert
on it; exits non-zero on unexpected states.
"""

import json
import os
import sys

# python <script> puts the script's dir (tests/) on sys.path, not the repo;
# fix in-process — the PYTHONPATH env var must stay unset (axon landmine)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    from jckx.utils.device import honor_jax_platforms_env, init_multihost

    honor_jax_platforms_env()
    try:
        ok, err = init_multihost()
    except Exception as e:  # noqa: BLE001 — the fail-fast branch under test
        print(json.dumps({"outcome": "reraised", "error": type(e).__name__}))
        return 0
    if not ok:
        print(json.dumps({"outcome": "degraded", "error": type(err).__name__}))
        return 0

    # distributed runtime is up: prove the GLOBAL mesh works end-to-end with
    # a cross-process collective (the CPU analog of a pod's ICI all-reduce)
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    n_local = len(jax.local_devices())
    per_proc = n_local  # one element per local device
    local = (np.arange(per_proc, dtype=np.float32)
             + per_proc * jax.process_index())
    glob = jax.make_array_from_process_local_data(
        sh, local, global_shape=(per_proc * jax.process_count(),))
    total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(glob)
    print(json.dumps({
        "outcome": "up",
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": n_local,
        "psum": float(total),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
