#!/bin/bash
# Round-4 post-suite chip queue (run AFTER tools/run_r04_suite.sh releases
# the chip; one TPU client at a time):
#
#  1. Megakernel whole-step measurement (VERDICT r3 item 4): the Pallas
#     bottleneck block-backward megakernel (ops/pallas/block_bwd.py,
#     cfg.tpu.block_megakernel) vs the XLA baseline, both timed by the
#     whole-step protocol (tools/exp_variants.py, 20 steps, scalar-pull
#     sync). Output: MEGAKERNEL_BENCH_r04.txt.
#  2. margin_mean_over_ids end-to-end validation: full variant FROM SCRATCH
#     at batch 128 with the batch-size-invariant 3M loss (the opt-in knob,
#     losses/margin.py). The sum-over-ids run under this exact protocol is
#     E2E_TRAIN_r03.json (CE flat at chance for 600 epochs, mAP 0.112);
#     CE descending here validates the knob's purpose at 150 epochs.
#     Output: E2E_MEANM_r04.json.
#  3. bench.py warm run: repopulates the remote-compile cache so the
#     driver's end-of-round bench doesn't pay (or stall in) a cold compile.
#
# Usage: bash tools/run_r04_post.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

echo "=== megakernel whole-step measurement ($(date)) ==="
{
  echo "# Whole-step protocol (tools/exp_variants.py, batch 128, 20 steps,"
  echo "# 3 warmup), real v5e chip, $(date -u +%Y-%m-%dT%H:%MZ)."
  echo "# baseline reference: BENCH_r03.json 978.8 trip/s (131 ms/step)"
  timeout 2400 python tools/exp_variants.py base 128 2>/dev/null | grep -E 'ms/step'
  timeout 2400 python tools/exp_variants.py megakernel 128 2>/dev/null | grep -E 'ms/step'
} | tee MEGAKERNEL_BENCH_r04.txt

echo "=== margin_mean from-scratch run ($(date)) ==="
vlog=/tmp/e2e_meanm_run.log
if ! grep -q '"complete": true' E2E_MEANM_r04.json 2>/dev/null; then
  rm -f E2E_MEANM_r04.json
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
echo "=== r04 post done ($(date)) ==="
