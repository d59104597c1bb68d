#!/bin/bash
# End-to-end convergence suite on the real TPU: the full IEEE stack plus the
# paper Table-3 ablation variants (reference *.pdf Table 3; variants defined
# in tools/train_e2e.py / tools/ablation_sweep.py), each trained from scratch
# through Engine.run on the learnable correlated synthetic 3-modal protocol.
#
# Protocol: 48 pids x 32 imgs, full depth (3,4,6,3), amsgrad 3e-4 wd 5e-4,
# multi_step x0.1 at [epochs/2, epochs*3/4], decode cache on. From-scratch
# full-depth needs ~600 epochs (a 150-epoch probe left CE at chance while
# the margin loss fell — MIGRATION.md "Trying the stack without licensed
# data"). One run at a time (1 CPU core).
#
# Two test protocols (tools/train_e2e.py --heldout-test):
#   * heldout (open-set, like the real re-ID splits): query/gallery ids
#     DISJOINT from train — the headline artifacts.
#   * seen-id (closed-set): held-out IMAGES of train ids — measures learned
#     camera-effect invariance; kept as one extra full run for comparison.
#
# Usage: bash tools/run_e2e_suite.sh [epochs]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
EPOCHS="${1:-600}"
S1=$((EPOCHS / 2)); S2=$((EPOCHS * 3 / 4))
run() { # run <variant> <out> [extra args...]
  local v="$1" out="$2"; shift 2
  echo "=== variant $v -> $out ($(date)) ==="
  rm -rf "/tmp/e2e_$v"
  timeout 7200 python tools/train_e2e.py --variant "$v" \
    --optim amsgrad --lr 3e-4 --stepsize "$S1,$S2" \
    --pids 48 --imgs-per-pid 32 --epochs "$EPOCHS" --eval-freq 25 \
    --decode-cache --out "$out" --save-dir "/tmp/e2e_$v" "$@" \
    || echo "variant $v FAILED rc=$?"
}
run full E2E_TRAIN_r03.json --heldout-test
run base E2E_ABLATION_base_r03.json --heldout-test
run cim E2E_ABLATION_cim_r03.json --heldout-test
run cim3m E2E_ABLATION_cim3m_r03.json --heldout-test
run full E2E_TRAIN_seen_r03.json
echo "=== suite done ($(date)) ==="
