#!/bin/bash
# Round-5 real-chip work queue (run from /root/repo). Same discipline as
# r4: the tunnel FLAPS (healthy minutes between sick hours), so every
# stage first waits for 2 consecutive healthy probes. Logs to save/r5_logs/.
#
# The one r5 stage that matters: ONE clean, COMPLETE bench sweep at HEAD
# on an idle host (VERDICT r4 weak #2 — the r4 record was split across a
# contaminated full sweep and a clean partial one), gated against r04b
# by the regression comparator.
set -u
cd /root/repo
mkdir -p save/r5_logs
log() { echo "$(date +%H:%M:%S) $*" | tee -a save/r5_logs/queue.log; }

probe_once() {
  timeout 120 python -m jckx.doctor --link_only --probe_timeout 60 2>/dev/null \
    | python -c "import json,sys
try:
  r=json.load(sys.stdin)['link'].get('read_s')
  sys.exit(0 if r is not None and float(r)<3 else 1)
except Exception: sys.exit(1)"
}

wait_healthy() {
  local ok=0
  for i in $(seq 1 200); do
    if probe_once; then
      ok=$((ok+1))
      [ $ok -ge 2 ] && { log "tunnel healthy x2"; return 0; }
      sleep 90
    else
      ok=0
      log "tunnel sick - waiting"
      sleep 240
    fi
  done
  return 1
}

stage() {  # stage <name> <timeout> <logfile> <cmd...>
  local name="$1" to="$2" lf="$3"; shift 3
  if [ -e "save/r5_logs/.done_$name" ]; then log "$name: already done, skip"; return 0; fi
  wait_healthy || { log "$name: tunnel never recovered"; return 1; }
  log "$name: start"
  timeout "$to" "$@" > "save/r5_logs/$lf" 2>&1
  local rc=$?
  log "$name: done (exit $rc)"
  [ $rc -eq 0 ] && touch "save/r5_logs/.done_$name"
  return 0
}

stage bench_all_r05 10800 bench_all_r05.log \
  python tools/bench_all.py -o BENCH_ALL_r05.json \
    --compare BENCH_ALL_r04b.json --compare_threshold 10

log "queue finished"
