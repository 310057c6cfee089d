#!/bin/bash
# Round-4 real-chip work queue (run from /root/repo when the tunnel is
# healthy). Stages are ordered cheap->long; each logs to save/r4_logs/.
set -u
cd /root/repo
mkdir -p save/r4_logs
log() { echo "$(date +%H:%M:%S) $*" | tee -a save/r4_logs/queue.log; }

probe() {
  timeout 120 python -m jckx.doctor --link_only --probe_timeout 60 2>/dev/null \
    | python -c "import json,sys
try:
  r=json.load(sys.stdin)['link'].get('read_s')
  sys.exit(0 if r is not None and float(r)<3 else 1)
except Exception: sys.exit(1)"
}

log "stage 0: tunnel probe"
probe || { log "tunnel sick - aborting queue"; exit 1; }

log "stage 1: bench_all sweep -> BENCH_ALL_r04.json (incl fused_prop + fast_stem)"
timeout 7200 python tools/bench_all.py -o BENCH_ALL_r04.json \
  > save/r4_logs/bench_all.log 2>&1
log "stage 1 done (exit $?)"

log "stage 2: fine-tune metric backbone (50k synthetic protocol)"
timeout 3600 python -m jckx.metrics.inception_train --dataset synthetic \
  --synthetic_size 50000 -e 56 --early_stop 10 \
  > save/r4_logs/finetune_backbone.log 2>&1
log "stage 2 done (exit $?)"

log "stage 3: FusedProp quality A/B panel (2 seeds x 2 arms, 20-epoch 50k protocol)"
timeout 7200 python -m jckx.panel --seeds 12345,777 --model DCGAN \
  --panel_name r4_fusedprop_ab --sweep fused_prop=0,1 \
  --dataset synthetic --synthetic_size 50000 -e 20 -b 128 \
  -mlr 2e-4 --ema_decay 0.999 \
  > save/r4_logs/fusedprop_ab.log 2>&1
log "stage 3 done (exit $?)"

log "stage 4: 128x128 training-quality witness (20-epoch, bs64, EMA)"
timeout 7200 python main.py -m DCGAN --dataset synthetic --synthetic_size 50000 \
  -e 20 -b 64 --image_size 128 -mlr 2e-4 --ema_decay 0.999 \
  --seed 12345 -pm r4_128sq \
  > save/r4_logs/witness_128.log 2>&1
log "stage 4 done (exit $?)"

log "stage 5: serve the 128 run's best checkpoint once (witness artifact)"
CKPT=$(ls save/dcgan/r4_128sq/fid/*.ckpt 2>/dev/null | sort -V | tail -1)
if [ -n "$CKPT" ]; then
  timeout 900 python -m jckx.serve --ckpt "$CKPT" -n 16 -o save/r4_logs/serve_128.png \
    > save/r4_logs/serve_128.log 2>&1
  log "stage 5 done (exit $?, ckpt $CKPT)"
else
  log "stage 5 skipped: no fid checkpoint found"
fi

log "stage 6: regression gate vs r03"
timeout 600 python tools/bench_compare.py BENCH_ALL_r03.json BENCH_ALL_r04.json --threshold 5 \
  > save/r4_logs/bench_compare.log 2>&1
log "stage 6 done (exit $?)"
log "QUEUE COMPLETE"
