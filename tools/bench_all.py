"""Run every benchmark and collect their one-line JSONs into one report.

Usage (from the repo root, real TPU):
    python tools/bench_all.py [-o BENCH_ALL.json] [--skip finetune,eval]

Each bench is run as a subprocess (fresh backend; the remote TPU runtime
does not share compiled programs across processes, so wall-clocks include
one-time compiles — the JSON "value"s themselves are steady-state
measurements by construction). A tunnel-health probe runs first and is
recorded: numbers taken through a sick tunnel are garbage (CLAUDE.md), and
the probe read time lets a reader judge trust.
"""

import argparse
import json
import subprocess
import sys
import time

BENCHES = {
    "gan_step": [sys.executable, "bench.py"],
    "gan_step_cgan": [sys.executable, "bench.py", "-m", "CGAN"],
    "serve": [sys.executable, "bench_serve.py"],
    "serve_cgan": [sys.executable, "bench_serve.py", "-m", "CGAN"],
    "eval_fid50k": [sys.executable, "bench_eval.py"],
    "finetune": [sys.executable, "bench_finetune.py"],
}


def probe_tunnel(timeout_s: int = 120):
    """→ (ok, read_seconds|None): put+blocked read of a scalar."""
    code = (
        "import numpy as np, jax, time;"
        "a = jax.device_put(np.ones((8, 8), np.float32));"
        "jax.block_until_ready(a);"
        "t = time.perf_counter(); float(a[0, 0]);"
        "print('PROBE_S', round(time.perf_counter() - t, 2))"
    )
    try:
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=timeout_s)
        for line in out.stdout.splitlines():
            if line.startswith("PROBE_S"):
                return True, float(line.split()[1])
    except subprocess.TimeoutExpired:
        pass
    return False, None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--out", default="BENCH_ALL.json")
    p.add_argument("--skip", default="", help="comma-separated bench names")
    p.add_argument("--timeout", type=int, default=900, help="per-bench seconds")
    args = p.parse_args()
    skip = {s for s in args.skip.split(",") if s}

    ok, probe_s = probe_tunnel()
    report = {"tunnel_probe_read_s": probe_s, "benches": {}}
    print(f"tunnel probe: {'%.2fs' % probe_s if ok else 'TIMED OUT'}"
          f"{' — SICK, numbers will be unreliable' if not ok or probe_s > 5 else ''}",
          flush=True)

    for name, cmd in BENCHES.items():
        if name in skip:
            report["benches"][name] = {"skipped": True}
            continue
        t0 = time.perf_counter()
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=args.timeout)
            wall = round(time.perf_counter() - t0, 1)
            line = next((ln for ln in reversed(out.stdout.splitlines())
                         if ln.startswith("{")), None)
            entry = json.loads(line) if line else {
                "error": f"no JSON line (exit {out.returncode})",
                "stderr_tail": out.stderr[-500:]}
        except subprocess.TimeoutExpired:
            wall = round(time.perf_counter() - t0, 1)
            entry = {"error": f"timeout after {args.timeout}s"}
        entry["wall_s_incl_compile"] = wall
        report["benches"][name] = entry
        val = entry.get("value")
        print(f"{name:14s} {val if val is not None else entry.get('error')}",
              flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
