#!/bin/bash
# Round-4 session-4 chip queue. Runs AFTER the post3 queue (meanm e2e run +
# bench warm) releases the chip — one TPU client at a time.
#  1. megakernel compile probe (per-stage, with the f32-compare /
#     out-ref-accumulation / adaptive-tile fixes)
#  2. if every stage's full vjp compiles: whole-step measurement
#     (tools/exp_variants.py megakernel 128) -> MEGAKERNEL_BENCH_r04.txt
#  3. int8 eval batch sweep (the batch-100 number was a net loss; find the
#     crossover, if any) -> INT8_EVAL_r04.json gains a batch-sweep section
#
# Usage: nohup bash tools/run_r04_post4.sh > /tmp/post4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

prev=$(cat /tmp/post3.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  echo "=== waiting for post3 queue (pid $prev) ($(date)) ==="
  while kill -0 "$prev" 2>/dev/null; do sleep 60; done
fi
# belt-and-braces: the pid file may be stale/absent — also wait until no
# other TPU client (trainer/bench/variant harness) is alive (read-only
# pgrep; never kill by pattern)
while pgrep -f 'tools/train_e2e.py|bench.py|tools/exp_variants.py|tools/int8_e2e_eval.py' \
    > /dev/null 2>&1; do
  echo "other TPU client still running ($(date)); waiting"
  sleep 60
done
echo "=== chip free ($(date)) ==="

echo "=== megakernel probe ($(date)) ==="
timeout 3600 python tools/megakernel_probe.py 128 > /tmp/mega_probe4.log 2>&1
rc=$?
cat /tmp/mega_probe4.log
fails=$(grep -c 'FAIL' /tmp/mega_probe4.log || true)
echo "probe rc=$rc fails=$fails"

if [ "$fails" = "0" ] && [ "$rc" = "0" ]; then
  echo "=== megakernel whole-step measurement ($(date)) ==="
  timeout 3600 python tools/exp_variants.py megakernel 128 \
    > /tmp/mega_step4.log 2>&1
  echo "measurement rc=$? -> /tmp/mega_step4.log"
  # exp_variants already labels its line "megakernel: X ms/step"
  grep -E 'ms/step' /tmp/mega_step4.log >> MEGAKERNEL_BENCH_r04.txt || true
  tail -5 /tmp/mega_step4.log
else
  echo "probe still failing; skipping whole-step measurement"
fi

echo "=== int8 eval batch sweep ($(date)) ==="
for b in 256 512; do
  timeout 2400 python tools/int8_e2e_eval.py --batch "$b" \
    --init-from /root/repo/.ckpts/base/model/model.msgpack-150 \
    --out "/tmp/int8_eval_b${b}.json" > "/tmp/int8_b${b}.log" 2>&1 \
    && tail -3 "/tmp/int8_b${b}.log" \
    || echo "int8 b=$b rc=$? (see /tmp/int8_b${b}.log)"
done
# merge the sweep into the committed artifact (batch_sweep section)
python - <<'EOF'
import json, os
path = "INT8_EVAL_r04.json"
art = json.load(open(path))
sweep = art.setdefault("batch_sweep", {})
for b in (256, 512):
    p = f"/tmp/int8_eval_b{b}.json"
    if os.path.exists(p):
        d = json.load(open(p))
        sweep[str(b)] = {k: d[k] for k in
                         ("bf16", "int8", "fwd_speedup", "pipeline_speedup",
                          "mAP_delta") if k in d}
with open(path, "w") as f:
    json.dump(art, f, indent=1)
print("merged batch_sweep:", list(sweep))
EOF

echo "=== r04 post4 done ($(date)) ==="
