#!/bin/bash
# Round-4 session-2 chip queue. The previous session ended mid-refproto
# (the suite's re-run was killed with the session, leaving a 19-epoch
# partial that was then restored to the committed 57-epoch one), and
# tools/run_r04_post.sh never started. This runs everything still pending,
# one TPU client at a time:
#
#  1. Megakernel whole-step measurement (VERDICT r3 item 4)
#     -> MEGAKERNEL_BENCH_r04.txt
#  2. tools/run_r04_suite.sh — idempotent: skips the complete warm-start
#     artifacts, re-runs refproto to complete:true, then the int8
#     whole-pipeline eval (VERDICT r3 item 6) -> INT8_EVAL_r04.json
#  3. margin_mean_over_ids from-scratch validation -> E2E_MEANM_r04.json
#  4. bench.py warm run (repopulate the remote-compile cache for the
#     driver's end-of-round bench)
#
# Usage: bash tools/run_r04_post2.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

if [ ! -s MEGAKERNEL_BENCH_r04.txt ] || ! grep -q 'ms/step' MEGAKERNEL_BENCH_r04.txt; then
  echo "=== megakernel whole-step measurement ($(date)) ==="
  {
    echo "# Whole-step protocol (tools/exp_variants.py, batch 128, 20 steps,"
    echo "# 3 warmup), real v5e chip, $(date -u +%Y-%m-%dT%H:%MZ)."
    echo "# baseline reference: BENCH_r03.json 978.8 trip/s (131 ms/step)"
    timeout 2400 python tools/exp_variants.py base 128 2>/dev/null | grep -E 'ms/step'
    timeout 2400 python tools/exp_variants.py megakernel 128 2>/dev/null | grep -E 'ms/step'
  } | tee MEGAKERNEL_BENCH_r04.txt
fi

# Keep a safety copy of the committed refproto partial: the suite rm -f's
# an incomplete artifact before retrying, and a failed retry must not leave
# us with nothing (git also has it, but belt and braces).
cp -f E2E_CONTROL_refproto_r04.json /tmp/refproto_committed_backup.json 2>/dev/null || true

echo "=== r04 suite (refproto + int8 legs) ($(date)) ==="
bash tools/run_r04_suite.sh
if ! grep -q '"complete"' E2E_CONTROL_refproto_r04.json 2>/dev/null; then
  echo "refproto attempts all failed; restoring committed partial"
  cp -f /tmp/refproto_committed_backup.json E2E_CONTROL_refproto_r04.json
fi

echo "=== margin_mean from-scratch run ($(date)) ==="
vlog=/tmp/e2e_meanm_run.log
if ! grep -q '"complete": true' E2E_MEANM_r04.json 2>/dev/null; then
  setsid timeout 7200 python tools/train_e2e.py --variant full --margin-mean \
    --optim amsgrad --lr 3e-4 --stepsize "75,112" \
    --pids 48 --imgs-per-pid 32 --epochs 150 --eval-freq 25 \
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
timeout 2400 python bench.py > /tmp/bench_warm2.log 2>&1
echo "bench rc=$? $(tail -1 /tmp/bench_warm2.log)"
echo "=== r04 post2 done ($(date)) ==="
