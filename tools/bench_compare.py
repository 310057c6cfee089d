"""Round-over-round benchmark regression gate.

Compares two benchmark records and fails (exit 1) when any shared bench
regressed beyond a threshold — the missing piece between "we record sweeps"
(tools/bench_all.py → BENCH_ALL_rNN.json, the driver's BENCH_rNN.json) and
"we NOTICE when a change costs throughput". The reference has no benchmarks
at all (SURVEY.md §6); for a production framework the gate is part of the
perf story: numbers that can silently rot are not numbers.

    python tools/bench_compare.py BENCH_ALL_r02.json BENCH_ALL_r03.json
    python tools/bench_compare.py BENCH_r01.json BENCH_r02.json --threshold 3

Accepted formats (auto-detected):
- bench_all sweeps: {"benches": {name: {"value", "unit", ...}, ...}}
- the driver's single-line records: {"parsed": {"metric", "value", "unit"}}

Direction is unit-aware: "seconds" (wall-clock) regresses UP, throughput
units regress DOWN. Benches present in only one file are listed, never
failed — sweeps legitimately grow. Tunnel-health caveat (CLAUDE.md): only
compare sweeps taken through healthy links; the differential timing keeps
values chip-true, but a sick-link sweep can still abort partway.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> dict:
    """→ {bench name: {"value": float, "unit": str}}."""
    with open(path) as f:
        rec = json.load(f)
    if "benches" in rec:
        return {k: {"value": float(v["value"]), "unit": v.get("unit", "")}
                for k, v in rec["benches"].items() if "value" in v}
    if "parsed" in rec and rec["parsed"]:
        p = rec["parsed"]
        return {"headline": {"value": float(p["value"]),
                             "unit": p.get("unit", "")}}
    raise ValueError(f"{path}: neither a bench_all sweep ('benches') nor a "
                     f"driver record ('parsed')")


def lower_is_better(unit: str) -> bool:
    return "second" in unit.lower() or unit.lower() in ("s", "ms", "us")


def compare(old: dict, new: dict, threshold_pct: float) -> tuple:
    """→ (rows, regressions) where each row is
    (name, old_value, new_value, change_pct_toward_better, verdict)."""
    rows, regressions = [], []
    for name in sorted(set(old) | set(new)):
        if name not in old:
            rows.append((name, None, new[name]["value"], None, "new"))
            continue
        if name not in new:
            rows.append((name, old[name]["value"], None, None, "dropped"))
            continue
        o, n = old[name]["value"], new[name]["value"]
        unit = new[name]["unit"] or old[name]["unit"]
        if o == 0:
            rows.append((name, o, n, None, "old=0"))
            continue
        better_pct = (o - n) / o * 100 if lower_is_better(unit) else (n - o) / o * 100
        verdict = "ok" if better_pct >= -threshold_pct else "REGRESSED"
        if verdict == "REGRESSED":
            regressions.append(name)
        rows.append((name, o, n, better_pct, verdict))
    return rows, regressions


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="benchmark regression gate")
    p.add_argument("old", help="earlier record (bench_all sweep or driver BENCH_rNN.json)")
    p.add_argument("new", help="later record")
    p.add_argument("--threshold", type=float, default=5.0,
                   help="max tolerated regression, percent (default 5)")
    args = p.parse_args(argv)
    rows, regressions = compare(_load(args.old), _load(args.new), args.threshold)
    w = max((len(r[0]) for r in rows), default=4)
    for name, o, n, pct, verdict in rows:
        pct_s = f"{pct:+7.2f}%" if pct is not None else "       -"
        o_s = f"{o:14,.1f}" if o is not None else "             -"
        n_s = f"{n:14,.1f}" if n is not None else "             -"
        print(f"{name:<{w}}  {o_s} -> {n_s}  {pct_s}  {verdict}")
    if regressions:
        print(f"FAIL: {len(regressions)} bench(es) regressed beyond "
              f"{args.threshold}%: {', '.join(regressions)}")
        return 1
    print(f"OK: no regression beyond {args.threshold}% "
          f"({len(rows)} benches compared)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
