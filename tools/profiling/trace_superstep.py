"""Capture a perfetto trace of one fine-tune superstep launch and print the
top device ops by total duration."""
import glob
import gzip
import json
import sys
from collections import defaultdict

import jax
import numpy as np

from jckx.metrics import inception_v3
from jckx.metrics.inception_train import make_train_step, make_superstep

BS, K = 128, 8


def main():
    rng = np.random.RandomState(0)
    data = jax.device_put(rng.randint(0, 255, (4096, 32, 32, 3), dtype=np.uint8))
    labels = jax.device_put(rng.randint(0, 100, (4096,)).astype(np.int32))
    idx = jax.device_put(rng.randint(0, 4096, (K, BS)).astype(np.int32))
    key = jax.random.PRNGKey(0)
    params = inception_v3.init(0, num_classes=100)
    step, tx, raw_step = make_train_step(lr=0.1, weight_decay=5e-4)
    sstep = make_superstep(raw_step)
    opt_state = tx.init(params)

    p, o, losses, _ = sstep(params, opt_state, data, labels, idx, key)
    float(losses[-1])  # compile + drain

    with jax.profiler.trace("/tmp/jckx_trace", create_perfetto_trace=True):
        p, o, losses, _ = sstep(p, o, data, labels, idx, key)
        float(losses[-1])

    traces = sorted(glob.glob("/tmp/jckx_trace/**/*.json.gz", recursive=True))
    print("trace files:", traces, file=sys.stderr)
    if not traces:
        print("NO PERFETTO TRACE EMITTED")
        return
    with gzip.open(traces[-1], "rt") as f:
        t = json.load(f)
    events = t["traceEvents"] if isinstance(t, dict) else t
    dur = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        d = e.get("dur", 0) / 1e3  # us -> ms
        # keep only device lanes (XLA ops); heuristics: args has 'long_name' or
        # tid lane naming — fall back to aggregating everything and eyeball
        dur[name] += d
        cnt[name] += 1
        total += d
    top = sorted(dur.items(), key=lambda kv: -kv[1])[:60]
    for name, d in top:
        print(f"{d:10.2f} ms  x{cnt[name]:<5d} {name[:110]}")
    print(f"{'TOTAL (all lanes)':>10s} {total:.1f} ms")
    # aggregate XLA device ops by category prefix
    import re
    cat = defaultdict(float)
    for name, d in dur.items():
        if name.startswith(("$", "jit_", "PjitFunction", "np.", "0")):
            continue
        base = re.sub(r"[.\d]+$", "", name)
        cat[base] += d
    print("\n--- by op category ---")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v:10.2f} ms  {k}")


if __name__ == "__main__":
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must stick despite the
    # axon plugin's import-time platform pin (CLAUDE.md landmine)
    main()
