"""Per-op trace of the eval feature-extraction forward (real TPU).

The eval path (tanh→features: denorm + resize-to-299 + ImageNet normalize +
InceptionV3 eval forward) measures ~2.3× its XLA-cost-model HBM floor
(bench_eval.py detail) — unlike the train paths, which ride the roofline.
This harness shows WHERE that slack lives: it builds the same executable
Metrics jits, captures a perfetto trace of one bs-sized launch, and prints
the top device ops by total duration plus a coarse stage attribution
(resize/stem vs inception branches vs pool/fc).

Usage (repo root): python tools/profiling/eval_forward_trace.py [--batch 2048]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))  # repo root

from jckx.metrics import inception_v3  # noqa: E402
from jckx.metrics.metrics import IMAGENET_MEAN, IMAGENET_STD  # noqa: E402


def build_forward(params, compute_dtype=jnp.bfloat16):
    """Same graph as Metrics._make_tanh_pipeline (metrics.py:302-308)."""

    def fn(img):
        x01 = 0.5 * img.astype(compute_dtype) + 0.5
        x299 = jax.image.resize(
            x01, (x01.shape[0], 299, 299, x01.shape[-1]), method="bilinear")
        mean = jnp.asarray(IMAGENET_MEAN, x299.dtype)
        std = jnp.asarray(IMAGENET_STD, x299.dtype)
        return inception_v3.apply(params, (x299 - mean) / std, compute_dtype)

    return jax.jit(fn)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--repeats", type=int, default=4)
    a = p.parse_args()

    params = inception_v3.init(0, num_classes=100)
    fn = build_forward(params)
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.uniform(-1, 1, (a.batch, 32, 32, 3)).astype(np.float32))

    out = fn(x)
    jax.block_until_ready(out)
    float(out[0, 0])  # warm + flush

    t0 = time.perf_counter()
    for _ in range(a.repeats):
        out = fn(x)
    jax.block_until_ready(out)
    float(out[0, 0])
    dt = time.perf_counter() - t0
    print(f"bs{a.batch}: {1e6 * dt / (a.repeats * a.batch):.1f} us/img "
          f"({a.repeats * a.batch / dt:,.0f} img/s)", flush=True)

    trace_dir = "/tmp/jckx_eval_fwd"
    with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
        out = fn(x)
        jax.block_until_ready(out)
        float(out[0, 0])

    import glob
    import gzip
    import json
    from collections import defaultdict

    traces = sorted(glob.glob(f"{trace_dir}/**/*.json.gz", recursive=True))
    if not traces:
        print("(no perfetto trace emitted)")
        return
    with gzip.open(traces[-1], "rt") as f:
        t = json.load(f)
    events = t["traceEvents"] if isinstance(t, dict) else t
    dur = defaultdict(float)
    for e in events:
        if e.get("ph") == "X":
            dur[e.get("name", "")] += e.get("dur", 0) / 1e3
    total = 0.0
    print("top device ops (ms, one launch):")
    for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {d:9.2f}  {name[:110]}")
        total += d
    print(f"  (top-30 sum {total:.1f} ms)")


if __name__ == "__main__":
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must stick despite the
    # axon plugin's import-time platform pin (CLAUDE.md landmine)
    main()
