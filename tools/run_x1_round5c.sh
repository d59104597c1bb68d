#!/bin/bash
# Round-5 session-2 sequencer (c): wait for cim3m s1 (launched by the
# 5b sequencer, setsid child), then the warm-start leg in
# information-priority order: base (continued-training control) first,
# then cim3m and full (the margin-path variants whose from-scratch rows
# are high-variance / inverted), then cim.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

wait_for() { # wait_for <artifact> <log> — 0 = complete, 1 = stalled
  local out="$1" vlog="$2" age
  while :; do
    grep -q '"complete": true' "$out" 2>/dev/null && return 0
    age=$(( $(date +%s) - $(stat -c %Y "$vlog" 2>/dev/null || echo 0) ))
    if [ "$age" -gt 2400 ]; then return 1; fi
    sleep 60
  done
}

run() { # run <variant> <seed> <out> <save-dir> [extra train_e2e args...]
  local v="$1" seed="$2" out="$3" sdir="$4"; shift 4
  local vlog="/tmp/$(basename "$sdir").log" attempt rc age pid
  if grep -q '"complete": true' "$out" 2>/dev/null; then
    echo "=== $out already complete, skipping ==="; return 0
  fi
  for attempt in 1 2; do
    echo "=== $out attempt $attempt ($(date)) ==="
    setsid timeout 10800 python tools/train_e2e.py --variant "$v" \
      --cross-modal --heldout-test --seed "$seed" \
      --pids 128 --imgs-per-pid 8 --batch 8 \
      --optim sgd --lr 0.001 \
      --eval-freq 10 --decode-cache --resume \
      --out "$out" --save-dir "$sdir" "$@" > "$vlog" 2>&1 &
    pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      age=$(( $(date +%s) - $(stat -c %Y "$vlog" 2>/dev/null || echo 0) ))
      if [ "$age" -gt 2400 ]; then
        echo "$out attempt $attempt STALLED (${age}s log silence)"
        kill -- -"$pid" 2>/dev/null; sleep 10; kill -9 -- -"$pid" 2>/dev/null
        break
      fi
    done
    wait "$pid"; rc=$?
    tail -3 "$vlog"
    if grep -q '"complete": true' "$out" 2>/dev/null; then
      echo "$out OK"; return 0
    fi
    echo "$out attempt $attempt FAILED rc=$rc"
  done
  return 1
}

wait_for E2E_X1_cim3m_s1_r05.json /tmp/x1_cim3m_s1.log \
  || run cim3m 1 E2E_X1_cim3m_s1_r05.json /tmp/x1_cim3m_s1 --stepsize 20,40 --epochs 61
echo "=== seed-1 done ==="

W=".ckpts/x1_base_s0/model.msgpack-61"
run base  0 E2E_X1W_base_s0_r05.json  /tmp/x1w_base_s0  --stepsize 20,30 --epochs 40 --init-from "$W"
run cim3m 0 E2E_X1W_cim3m_s0_r05.json /tmp/x1w_cim3m_s0 --stepsize 20,30 --epochs 40 --init-from "$W"
run full  0 E2E_X1W_full_s0_r05.json  /tmp/x1w_full_s0  --stepsize 20,30 --epochs 40 --init-from "$W"
run cim   0 E2E_X1W_cim_s0_r05.json   /tmp/x1w_cim_s0   --stepsize 20,30 --epochs 40 --init-from "$W"
echo "=== x1 round5c done ==="
