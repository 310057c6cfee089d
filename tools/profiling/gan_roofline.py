"""Roofline verdicts for the fused GAN step across geometries (real TPU).

For each (image_size, batch_size, remat) config: build the production fused
DCGAN G+D superstep (same program bench.py times), pull XLA's own cost
model for the compiled executable (``compile().cost_analysis()`` — flops
and bytes-accessed, the authoritative per-program budget), time it with the
tunnel-safe methodology (chained launches from a blocked start, closed with
a scalar read), and print which bound — MXU flops or HBM bytes — binds at
that geometry and how close the measured step is to it.

This closes the 128²/256² roofline question the same way the README's 64²
note was closed (VERDICT r2 weak #6 / task 4). ``--trace`` additionally
captures a perfetto trace per config and prints the top device ops.

Usage (repo root):  python tools/profiling/gan_roofline.py
                    python tools/profiling/gan_roofline.py --trace
v5e peaks used: 197 TFLOP/s bf16, 819 GB/s HBM.
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))  # repo root (bench import)

from jckx.configs import (V5E_BF16_PEAK_FLOPS as PEAK_FLOPS,  # noqa: E402
                          V5E_HBM_BYTES_PER_S as PEAK_BYTES)

# (image_size, batch_size, remat) — README perf-table geometries. 256² uses
# remat=none: measured FASTER than remat=both (37.1 vs 49.3 ms/step — both
# at 1.00× their own byte floor; remat adds ~10 GB/step recompute traffic
# while nothing spills at bs32)
CONFIGS = [(64, 128, "none"), (128, 64, "none"), (256, 32, "none")]


def one_config(image_size, batch_size, remat, K, supersteps, trace,
               model="DCGAN", fused_prop=0):
    # the SAME construction bench.py times (and its timing methodology) —
    # cost-analysis and throughput always describe one program
    from bench import build_superstep, differential_time

    sstep, state, cfg = build_superstep(image_size, batch_size, remat, model,
                                        fused_prop)
    rng = np.random.RandomState(0)
    data = jax.device_put(
        rng.randint(0, 255, (4096, 32, 32, 3), dtype=np.uint8))
    labels = jax.device_put(
        rng.randint(0, cfg.num_classes, (4096,)).astype(np.int32))

    def idxs(k=K):
        return jnp.asarray(rng.randint(0, 4096, (k, batch_size)), jnp.int32)

    # per-step budget from a K=1 program: backend-independent (the TPU cost
    # model counts a scan body ONCE regardless of trip count — verified
    # K=10 vs K=20 report identical totals — while CPU multiplies by K)
    ca = (sstep.lower(state, data, labels, idxs(1)).compile()
          .cost_analysis()) or {}
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))

    compiled = sstep.lower(state, data, labels, idxs()).compile()
    state, ms = compiled(state, data, labels, idxs())        # warm launch 1
    state, ms = compiled(state, data, labels, idxs())        # flush early-completion
    jax.block_until_ready(state)
    float(ms["loss_d"])

    # launch args pre-materialized on device, OFF the clock (an in-region
    # idx upload is a per-launch dispatch the 2S−S differential cannot
    # cancel — same fix as bench.py)
    idx_pool = iter(jax.block_until_ready(
        [jax.device_put(idxs()) for _ in range(2 * 3 * supersteps)]))
    box = {"state": state}

    def run_region(n):
        t0 = time.perf_counter()
        s = box["state"]
        for _ in range(n):
            s, ms = compiled(s, data, labels, next(idx_pool))
        jax.block_until_ready(s)
        box["loss"] = float(ms["loss_d"])  # read closes the region
        box["state"] = s
        return time.perf_counter() - t0

    # tunnel-safe differential timing, single-sourced with the bench
    # (2 repeats: per-size minima shed one-off dispatch jitter)
    dt = differential_time(run_region, supersteps, repeats=2)
    state, loss_d = box["state"], box["loss"]
    assert np.isfinite(loss_d)

    step_ms = 1e3 * dt / (K * supersteps)
    img_s = batch_size * K * supersteps / dt
    comp_floor = 1e3 * flops / PEAK_FLOPS
    byte_floor = 1e3 * byts / PEAK_BYTES
    bound = "HBM" if byte_floor > comp_floor else "MXU"
    floor = max(comp_floor, byte_floor)
    if floor <= 0.0:  # cost model unavailable on this backend/runtime
        bound, floor = "unknown", float("nan")
    fp_tag = ", fused_prop" if fused_prop else ""
    print(f"{model} {image_size}², bs{batch_size}, remat={remat}{fp_tag}: "
          f"{step_ms:.2f} ms/step ({img_s:,.0f} img/s) | "
          f"XLA cost: {flops/1e9:.0f} GFLOP, {byts/1e9:.2f} GB accessed | "
          f"floors: compute {comp_floor:.2f} ms, bytes {byte_floor:.2f} ms "
          f"→ {bound}-bound, measured = {step_ms/floor:.2f}× the "
          f"{bound} floor", flush=True)

    if trace:
        with jax.profiler.trace(f"/tmp/jckx_gan_{image_size}",
                                create_perfetto_trace=True):
            state, ms = compiled(state, data, labels, idxs())
            float(ms["loss_d"])
        _print_top_ops(f"/tmp/jckx_gan_{image_size}")
    return {"image_size": image_size, "batch": batch_size, "remat": remat,
            "fused_prop": int(bool(fused_prop)),
            "step_ms": step_ms, "img_s": img_s, "gflop": flops / 1e9,
            "gb": byts / 1e9, "bound": bound,
            "x_floor": step_ms / floor}


def _print_top_ops(trace_dir, top_n=25):
    import glob
    import gzip
    import json
    from collections import defaultdict

    traces = sorted(glob.glob(f"{trace_dir}/**/*.json.gz", recursive=True))
    if not traces:
        print("  (no perfetto trace emitted)")
        return
    with gzip.open(traces[-1], "rt") as f:
        t = json.load(f)
    events = t["traceEvents"] if isinstance(t, dict) else t
    dur = defaultdict(float)
    for e in events:
        if e.get("ph") == "X":
            dur[e.get("name", "")] += e.get("dur", 0) / 1e3
    for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"  {d:9.2f} ms  {name[:100]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scan_steps", type=int, default=20)
    p.add_argument("--supersteps", type=int, default=3)
    p.add_argument("--trace", action="store_true")
    p.add_argument("--only", type=int, default=0,
                   help="run a single image_size from CONFIGS")
    p.add_argument("-m", "--model", default="DCGAN", choices=["DCGAN", "CGAN"])
    p.add_argument("--fused_prop", type=int, default=0,
                   help="1 = cost-analyze the FusedProp step (configs.py)")
    a = p.parse_args()
    for size, bs, remat in CONFIGS:
        if a.only and size != a.only:
            continue
        one_config(size, bs, remat, a.scan_steps, a.supersteps, a.trace,
                   a.model, a.fused_prop)


if __name__ == "__main__":
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must stick despite the
    # axon plugin's import-time platform pin (CLAUDE.md landmine)
    main()
