#!/bin/bash
# Round-4 real-chip work queue (run from /root/repo). The tunnel FLAPS
# (healthy minutes between sick hours), so every stage first waits for 2
# consecutive healthy probes instead of aborting. Logs to save/r4_logs/.
set -u
cd /root/repo
mkdir -p save/r4_logs
log() { echo "$(date +%H:%M:%S) $*" | tee -a save/r4_logs/queue.log; }

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
  if [ -e "save/r4_logs/.done_$name" ]; then log "$name: already done, skip"; return 0; fi
  wait_healthy || { log "$name: tunnel never recovered"; return 1; }
  log "$name: start"
  timeout "$to" "$@" > "save/r4_logs/$lf" 2>&1
  local rc=$?
  log "$name: done (exit $rc)"
  [ $rc -eq 0 ] && touch "save/r4_logs/.done_$name"
  return 0
}

stage bench_all 7200 bench_all.log \
  python tools/bench_all.py -o BENCH_ALL_r04.json

stage finetune_backbone 3600 finetune_backbone.log \
  python -m jckx.metrics.inception_train --dataset synthetic \
    --synthetic_size 50000 -e 56 --early_stop 10

stage fusedprop_ab 10800 fusedprop_ab.log \
  python -m jckx.panel --seeds 12345,777 --model DCGAN \
    --panel_name r4_fusedprop_ab --sweep fused_prop=0,1 \
    --dataset synthetic --synthetic_size 50000 -e 20 -b 128 \
    -mlr 2e-4 --ema_decay 0.999

stage witness_128 10800 witness_128.log \
  python main.py -m DCGAN --dataset synthetic --synthetic_size 50000 \
    -e 20 -b 64 --image_size 128 -mlr 2e-4 --ema_decay 0.999 \
    --seed 12345 -pm r4_128sq

CKPT=$(ls save/dcgan/r4_128sq/fid/*.ckpt 2>/dev/null | sort -V | tail -1)
if [ -n "$CKPT" ] && [ ! -e save/r4_logs/.done_serve128 ]; then
  wait_healthy && {
    log "serve_128: start ($CKPT)"
    timeout 900 python -m jckx.serve --ckpt "$CKPT" -n 16 \
      -o save/r4_logs/serve_128.png > save/r4_logs/serve_128.log 2>&1
    log "serve_128: done (exit $?)"; touch save/r4_logs/.done_serve128
  }
fi

log "compare gate vs r03"
timeout 600 python tools/bench_compare.py BENCH_ALL_r03.json BENCH_ALL_r04.json \
  --threshold 5 > save/r4_logs/bench_compare.log 2>&1
log "compare done (exit $?)"
log "QUEUE COMPLETE"
