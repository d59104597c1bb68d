#!/bin/bash
# Round-4 session-3 chip queue. Session-2 postmortem:
#  - refproto attempt 2 ran 55/61 epochs with NO checkpoints: the running
#    bash had parsed run_r04_suite.sh BEFORE the --save-freq 10 edit was
#    saved (editing a script while bash executes it). Committed script is
#    correct; re-run from scratch, now checkpointing every 10 epochs.
#  - megakernel whole-step measurement produced no output with stderr
#    discarded (tools/exp_variants.py megakernel); interpret-mode tests
#    pass, so run the compile-only probe first, then the measurement with
#    stderr kept.
# One TPU client at a time:
#  1. run_r04_suite.sh (idempotent) -> refproto complete + INT8_EVAL_r04.json
#  2. megakernel probe + measurement -> MEGAKERNEL_BENCH_r04.txt
#  3. margin_mean from-scratch validation -> E2E_MEANM_r04.json
#  4. bench.py warm (repopulate the remote compile cache for the driver)
#
# Usage: bash tools/run_r04_post3.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

echo "=== r04 suite (refproto + int8 legs) ($(date)) ==="
bash tools/run_r04_suite.sh

if ! grep -q '^megakernel' MEGAKERNEL_BENCH_r04.txt 2>/dev/null; then
  echo "=== megakernel compile probe ($(date)) ==="
  timeout 3600 python tools/megakernel_probe.py 128 > /tmp/mega_probe.log 2>&1
  echo "probe rc=$? -> /tmp/mega_probe.log"
  tail -30 /tmp/mega_probe.log
  echo "=== megakernel whole-step measurement ($(date)) ==="
  timeout 2400 python tools/exp_variants.py megakernel 128 \
    > /tmp/mega_step.log 2>&1
  echo "measurement rc=$? -> /tmp/mega_step.log"
  grep -E 'ms/step' /tmp/mega_step.log | sed 's/^/megakernel /' \
    >> MEGAKERNEL_BENCH_r04.txt || true
  tail -5 /tmp/mega_step.log
fi

echo "=== margin_mean from-scratch run ($(date)) ==="
vlog=/tmp/e2e_meanm_run.log
if ! grep -q '"complete": true' E2E_MEANM_r04.json 2>/dev/null; then
  setsid timeout 10800 python tools/train_e2e.py --variant full --margin-mean \
    --optim amsgrad --lr 3e-4 --stepsize "75,112" \
    --pids 48 --imgs-per-pid 32 --epochs 150 --eval-freq 25 --save-freq 25 \
    --decode-cache --device-cache --resume --heldout-test \
    --out E2E_MEANM_r04.json --save-dir /tmp/e2e_meanm \
    > "$vlog" 2>&1 &
  pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$vlog" 2>/dev/null || echo 0) ))
    if [ "$age" -gt 1200 ]; then
      echo "meanm STALLED (${age}s log silence)"
      kill -- -"$pid" 2>/dev/null; sleep 10; kill -9 -- -"$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" || true
  tail -12 "$vlog"
fi

echo "=== bench warm ($(date)) ==="
timeout 2400 python bench.py > /tmp/bench_warm3.log 2>&1
echo "bench rc=$? $(tail -1 /tmp/bench_warm3.log)"
echo "=== r04 post3 done ($(date)) ==="
