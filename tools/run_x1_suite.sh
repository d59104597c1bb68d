#!/bin/bash
# Round-5 discriminative-benchmark suite (VERDICT r4 item 1): paper
# Table-3 ablation on synthetic-x1 under the REFERENCE'S OWN protocol
# (configs/RGBNT_ieee_part_margin.yaml via BASELINE.md): batch 8 with
# num_instances 4 => P=2 ids/batch, sgd lr 1e-3 wd 5e-4, multi_step
# [20,40], 61 epochs, reference-exact sum-form 3M, FROM SCRATCH (no warm
# start — round-4's refproto control proved 3M trains from scratch at
# this scale). 128 train pids x 8 imgs (the few-shot regime), 64 heldout
# pids, open-set eval.
#
# A batch-32/amsgrad screening pair (E2E_X1_SCREEN_{base,full}_r05.json)
# documents the large-batch protocol separately: there the sum-form 3M
# drags from-scratch learning (full mAP 0.09 @ ep40 vs base 0.21) — the
# round-4 batch-size-non-invariance finding reproduced at P=8.
#
# Queue: all 4 variants at seed 0 first (the ordering), then replicate
# seeds while round time remains. One chip client at a time; resumable;
# stall watchdog 2400 s (full-variant compiles measured >20 min under
# host load).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

# wait for the screening queue to release the chip
while ! grep -q "=== screen done ===" /tmp/screen_x1_driver.log 2>/dev/null; do
  sleep 60
done

run() { # run <variant> <seed>
  local v="$1" seed="$2"; shift 2
  local out="E2E_X1_${v}_s${seed}_r05.json"
  local vlog="/tmp/x1_${v}_s${seed}.log" attempt rc age pid
  if grep -q '"complete": true' "$out" 2>/dev/null; then
    echo "=== $v s$seed already complete, skipping ==="; return 0
  fi
  for attempt in 1 2; do
    echo "=== $v s$seed attempt $attempt ($(date)) ==="
    setsid timeout 10800 python tools/train_e2e.py --variant "$v" \
      --cross-modal --heldout-test --seed "$seed" \
      --pids 128 --imgs-per-pid 8 --batch 8 \
      --optim sgd --lr 0.001 --stepsize 20,40 \
      --epochs 61 --eval-freq 10 --decode-cache --resume \
      --out "$out" --save-dir "/tmp/x1_${v}_s${seed}" "$@" > "$vlog" 2>&1 &
    pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      age=$(( $(date +%s) - $(stat -c %Y "$vlog" 2>/dev/null || echo 0) ))
      if [ "$age" -gt 2400 ]; then
        echo "$v s$seed attempt $attempt STALLED (${age}s log silence)"
        kill -- -"$pid" 2>/dev/null; sleep 10; kill -9 -- -"$pid" 2>/dev/null
        break
      fi
    done
    wait "$pid"; rc=$?
    tail -3 "$vlog"
    if grep -q '"complete": true' "$out" 2>/dev/null; then
      echo "$v s$seed OK"; return 0
    fi
    echo "$v s$seed attempt $attempt FAILED rc=$rc"
  done
  return 1
}

# seed-0 four-variant ordering first, then replicates
run base 0
run cim 0
run cim3m 0
run full 0
run base 1
run full 1
run cim 1
run cim3m 1
run base 2
run full 2
run cim 2
run cim3m 2
echo "=== x1 suite done ==="
