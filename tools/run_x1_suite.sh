#!/bin/bash
# Round-5 discriminative-benchmark suite (VERDICT r4 item 1): paper
# Table-3 ablation on synthetic-x1, all variants FROM SCRATCH under ONE
# protocol (no warm start, reference-exact sum-form 3M at P=8).
#
#   base / cim / cim3m / full x seeds 0,1,2 (seed = init + sampler +
#   per-image nuisance draws; identity codes fixed), 192x8 train pids,
#   96 heldout pids, batch 32, amsgrad 3e-4, multi_step [30,50], 60 ep.
#
# Seed-0 base/full come from tools/run_x1_screen.sh (identical protocol);
# this script copies their artifacts and runs the rest. Queue order puts
# the 4-variant seed-0 ordering first, then replicate seeds.
# One chip client at a time; resumable; stall watchdog 2400 s (full-
# variant compiles measured >20 min through the tunnel under host load).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

# wait for the screening queue to release the chip
while ! grep -q "=== screen done ===" /tmp/screen_x1_driver.log 2>/dev/null; do
  sleep 60
done

for v in base full; do
  src="/tmp/SCREEN_x1_${v}.json"; dst="E2E_X1_${v}_s0_r05.json"
  if [ ! -f "$dst" ] && grep -q '"complete": true' "$src" 2>/dev/null; then
    cp "$src" "$dst"; echo "adopted screening artifact $src -> $dst"
  fi
done

run() { # run <variant> <seed>
  local v="$1" seed="$2"
  local out="E2E_X1_${v}_s${seed}_r05.json"
  local vlog="/tmp/x1_${v}_s${seed}.log" attempt rc age pid
  if grep -q '"complete": true' "$out" 2>/dev/null; then
    echo "=== $v s$seed already complete, skipping ==="; return 0
  fi
  for attempt in 1 2; do
    echo "=== $v s$seed attempt $attempt ($(date)) ==="
    setsid timeout 10800 python tools/train_e2e.py --variant "$v" \
      --cross-modal --heldout-test --seed "$seed" \
      --pids 192 --imgs-per-pid 8 --batch 32 \
      --optim amsgrad --lr 3e-4 --stepsize 30,50 \
      --epochs 60 --eval-freq 10 --decode-cache --resume \
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
run cim 0
run cim3m 0
run base 1
run full 1
run base 2
run full 2
run cim 1
run cim3m 1
run cim 2
run cim3m 2
echo "=== x1 suite done ==="
