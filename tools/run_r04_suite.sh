#!/bin/bash
# Round-4 chip queue (VERDICT r3 items 1-3): the warm-start protocol that
# mirrors the reference's ImageNet-init precondition for the 3M margin loss
# (reference torchreid/models/resnet.py:1248-1262 hardwires pretrained
# partial-load; configs/RGBNT_ieee_part_margin.yaml sets pretrained: True).
#
#  1. base retrain, 150 epochs from scratch -> E2E_ABLATION_base_r04.json
#     + a trained trunk checkpoint (the "ImageNet analog" for this synthetic
#     protocol; kept under /root/repo/.ckpts so container restarts don't
#     lose it — /tmp does not survive them).
#  2. FULL variant warm-started from it  -> E2E_TRAIN_full_warmstart_r04.json
#     (the headline: CE must descend with weight_m=1 and heldout mAP must be
#     comparable-or-better than base's 0.998).
#  3. cim / cim3m warm-started           -> E2E_ABLATION_{cim,cim3m}_warmstart_r04.json
#     (Table-3 row ordering under one protocol).
#  4. reference-faithful-scale control   -> E2E_CONTROL_refproto_r04.json:
#     full variant FROM SCRATCH at the reference's own training scale
#     (batch 8, num_instances 4 => P=2 ids/batch, sgd lr 1e-3, multi_step
#     [20,40], 61 epochs — RGBNT_ieee_part_margin.yaml:17-38). Isolates the
#     r3 collapse diagnosis: if CE still flatlines here, cold-start alone
#     explains it; if CE descends, the batch-128 P=32 margin-gradient
#     amplification (16x the reference's P=2) was a co-factor.
#
# One chip client at a time (1 CPU core, 1 TPU). Each run idempotent across
# restarts: a complete committed artifact is skipped; incomplete runs resume
# from their newest checkpoint. Stall watchdog: the axon tunnel can wedge
# mid-run — long log silence kills the run and retries (fresh compiles
# through the tunnel were measured at 5-7 min, today's tunnel slower still,
# so the threshold is 1200 s).
#
# Usage: bash tools/run_r04_suite.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

EPOCHS=150
S1=$((EPOCHS / 2)); S2=$((EPOCHS * 3 / 4))
CKPTS=/root/repo/.ckpts
mkdir -p "$CKPTS"

run() { # run <tag> <out> [train_e2e args...]
  local tag="$1" out="$2"; shift 2
  local attempt rc age pid vlog="/tmp/e2e_${tag}_run.log"
  if grep -q '"complete": true' "$out" 2>/dev/null; then
    echo "=== $tag -> $out already complete, skipping ==="
    return 0
  fi
  rm -f "$out"  # a stale partial must not mask a failed attempt
  for attempt in 1 2 3; do
    echo "=== $tag -> $out attempt $attempt ($(date)) ==="
    setsid timeout 10800 python tools/train_e2e.py \
      --pids 48 --imgs-per-pid 32 --eval-freq 25 \
      --decode-cache --device-cache --resume --heldout-test \
      --out "$out" "$@" > "$vlog" 2>&1 &
    pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      age=$(( $(date +%s) - $(stat -c %Y "$vlog" 2>/dev/null || echo 0) ))
      if [ "$age" -gt 1200 ]; then
        echo "$tag attempt $attempt STALLED (${age}s log silence)"
        kill -- -"$pid" 2>/dev/null; sleep 10; kill -9 -- -"$pid" 2>/dev/null
        break
      fi
    done
    wait "$pid"; rc=$?
    tail -15 "$vlog"
    if grep -q '"complete": true' "$out" 2>/dev/null; then
      echo "$tag OK (attempt $attempt)"; return 0
    fi
    echo "$tag attempt $attempt FAILED rc=$rc"
  done
  return 1
}

base_ckpt() {
  ls -t "$CKPTS"/base/model/model.msgpack-* 2>/dev/null \
    | grep -v '\.json$' | head -1
}

# --- 1. base trunk (also the Table-3 base row) ------------------------------
# NOT skipped on artifact-complete alone: the warm starts need the checkpoint
if [ -z "$(base_ckpt)" ]; then
  rm -f E2E_ABLATION_base_r04.json   # ckpt gone => the row must re-run too
  run base E2E_ABLATION_base_r04.json \
    --variant base --optim amsgrad --lr 3e-4 --stepsize "$S1,$S2" \
    --epochs "$EPOCHS" --save-freq 25 --save-dir "$CKPTS/base"
fi
CKPT=$(base_ckpt)
if [ -z "$CKPT" ]; then
  echo "no base checkpoint produced; aborting warm-start chain"
else
  echo "warm-start init: $CKPT"
  # --- 2-3. warm-started variants (fresh optimizer, trained trunk) ---------
  run full_ws E2E_TRAIN_full_warmstart_r04.json \
    --variant full --optim amsgrad --lr 3e-4 --stepsize "$S1,$S2" \
    --epochs "$EPOCHS" --init-from "$CKPT" --save-dir /tmp/e2e_full_ws
  run cim_ws E2E_ABLATION_cim_warmstart_r04.json \
    --variant cim --optim amsgrad --lr 3e-4 --stepsize "$S1,$S2" \
    --epochs "$EPOCHS" --init-from "$CKPT" --save-dir /tmp/e2e_cim_ws
  run cim3m_ws E2E_ABLATION_cim3m_warmstart_r04.json \
    --variant cim3m --optim amsgrad --lr 3e-4 --stepsize "$S1,$S2" \
    --epochs "$EPOCHS" --init-from "$CKPT" --save-dir /tmp/e2e_cim3m_ws
fi

# --- 4. reference-faithful-scale control (from scratch) ---------------------
run refproto E2E_CONTROL_refproto_r04.json \
  --variant full --optim sgd --lr 0.001 --stepsize "20,40" \
  --batch 8 --epochs 61 --eval-freq 20 --save-freq 10 \
  --save-dir /tmp/e2e_refproto

# --- 5. int8 whole-pipeline eval number (VERDICT r3 item 6) ------------------
CKPT=$(base_ckpt)
if [ -n "$CKPT" ] && ! grep -q '"trained_weights": true' INT8_EVAL_r04.json 2>/dev/null; then
  echo "=== int8 e2e eval from $CKPT ($(date)) ==="
  setsid timeout 3600 python tools/int8_e2e_eval.py --variant base \
    --init-from "$CKPT" --out INT8_EVAL_r04.json \
    > /tmp/int8_e2e.log 2>&1
  tail -5 /tmp/int8_e2e.log
fi

echo "=== r04 suite done ($(date)) ==="
