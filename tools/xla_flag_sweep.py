"""Sweep XLA:TPU compiler options over the full IEEE train step.

Round-2 perf study follow-up (CLAUDE.md): the six *structural* variants all
lost to the XLA baseline; the untried lever is per-jit ``compiler_options``.
The trace shows ~52% of step time in loop fusions producing per-channel [C]
vectors (BN stat + grad reductions) running at 150-220 GB/s vs ~350
achievable, so the shortlist below targets fusion tiling / scoped-VMEM /
scheduling knobs mined from ``strings libtpu.so``.

Usage:
    python tools/xla_flag_sweep.py [--batch 128] [--steps 15]
        [--results /tmp/xla_sweep.jsonl] [--only name1,name2] [--list]

Resumable: combos already present in the results file are skipped, so the
sweep can be re-invoked after a timeout. One JSON line per combo:
    {"name", "options", "ms_per_step", "triplets_per_sec", "compile_s"}
or {"name", "error": "..."} when the compiler rejects the options.
"""

from __future__ import annotations

import argparse
import json
import os
import time

# Each entry: (name, {xla flag: value}).  Values are strings/ints/bools as
# jax compiler_options accepts.  Baseline (empty dict) is measured first so
# every run has an in-process control number.
COMBOS = [
    ("baseline", {}),
    # scoped-VMEM budget: bigger fusion tiles -> fewer HBM round trips for
    # the BN-reduce loop fusions (default on this libtpu is unknown; v5e has
    # 128 MiB VMEM total)
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    # reduce-writeback fusion toggle (BN stat pattern)
    ("rwb_off", {"xla_tpu_rwb_fusion": "false"}),
    # let reduces fuse their producers
    ("reduce_input_fusion",
     {"xla_tpu_allow_input_fusion_in_certain_reduce_ops": "true"}),
    ("aggressive_loop_layout",
     {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
    ("experimental_cost_model",
     {"xla_tpu_enable_experimental_fusion_cost_model": "true"}),
    ("scavenge_vmem", {"xla_tpu_scavenge_vmem_for_fusions": "true"}),
    ("nested_loop_fusion",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"}),
    ("pincer_emitter",
     {"xla_tpu_enable_pincer_short_fusion_emitter": "true"}),
    ("vmem_to_vmem_dma", {"xla_tpu_enable_vmem_to_vmem_dmas": "true"}),
    ("ilp_scheduler",
     {"xla_tpu_enable_ilp_latency_hiding_scheduler": "true"}),
    ("dot_dot_fusion", {"xla_tpu_dot_dot_fusion": "true"}),
    ("conv_input_downcast_fusion",
     {"xla_tpu_allow_conv_input_fusion_with_downcast_convert": "true"}),
    ("licm_inflation", {"xla_tpu_licm_size_inflation_ratio": "8"}),
    # --- round 2: autotuners + reduce-shape knobs; finer vmem (32m won) ---
    ("vmem_16m", {"xla_tpu_scoped_vmem_limit_kib": "16384"}),
    ("vmem_24m", {"xla_tpu_scoped_vmem_limit_kib": "24576"}),
    ("vmem_48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("autotune_fusions", {"xla_tpu_autotune_fusions": "true"}),
    ("autotune_layouts", {"xla_tpu_autotune_layouts": "true"}),
    ("autotune_windows", {"xla_tpu_autotune_windows": "true"}),
    ("autotune_dots", {"xla_tpu_autotune_dots": "true"}),
    ("multi_dim_reduce_rwb", {"xla_tpu_allow_multi_dim_reduce_rwb": "true"}),
    ("backward_propagate_reduce",
     {"xla_tpu_backward_propagate_reduce": "true"}),
    ("pipelined_loop_unrolling",
     {"xla_tpu_enable_pipelined_loop_unrolling": "true"}),
    # --- round 3: combinations of measured round-1 winners ---
    ("vmem32_costmodel", {
        "xla_tpu_scoped_vmem_limit_kib": "32768",
        "xla_tpu_enable_experimental_fusion_cost_model": "true",
    }),
    ("vmem16_costmodel", {
        "xla_tpu_scoped_vmem_limit_kib": "16384",
        "xla_tpu_enable_experimental_fusion_cost_model": "true",
    }),
    # --- round 4: jf (TPU core codegen) conv-fusion + mof + scheduling ---
    ("jf_conv_input_fusion", {"xla_jf_conv_input_fusion": "true"}),
    ("jf_conv_output_fusion", {"xla_jf_conv_output_fusion": "true"}),
    ("jf_conv_reshape_fusion", {"xla_jf_conv_reshape_fusion": "true"}),
    ("jf_mof", {"xla_jf_enable_multi_output_fusion": "true"}),
    ("jf_advanced_mof",
     {"xla_jf_enable_advanced_multi_output_fusion": "true"}),
    ("jf_pc_mof",
     {"xla_jf_enable_producer_consumer_multi_output_fusion": "true"}),
    ("jf_final_priority_fusion",
     {"xla_jf_enable_final_priority_fusion": "true"}),
    ("jf_accum_reassoc", {"xla_jf_accumulation_reassociation": "true"}),
    ("jf_critical_path_sched", {"xla_jf_critical_path_scheduler": "true"}),
    ("jf_fusion_vmem_64mib", {"xla_jf_fusion_max_vmem_mib": "64"}),
    # --- round 5: MSA / scheduler stragglers ---
    ("mblo", {"xla_tpu_memory_bound_loop_optimizer_options": "enabled:true"}),
    ("latency_hiding_sched",
     {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("msa_reduce_scoped_vmem",
     {"xla_tpu_msa_reduce_scoped_vmem_limit": "true"}),
]


def load_done(path):
    done = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    done[(rec["name"], rec.get("batch", 128))] = rec
    return done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--results", default="/tmp/xla_sweep.jsonl")
    ap.add_argument("--only", default=None,
                    help="comma-separated combo names to run")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    combos = COMBOS
    if args.only:
        names = set(args.only.split(","))
        combos = [c for c in COMBOS if c[0] in names]
    if args.list:
        for name, opts in combos:
            print(name, json.dumps(opts))
        return

    done = load_done(args.results)
    todo = [c for c in combos if (c[0], args.batch) not in done]
    if not todo:
        print("all combos done; results:")
        for rec in done.values():
            print(json.dumps(rec))
        return

    import jax

    from ieee_tpu.engine import Image3MEngine
    from ieee_tpu.models import build_model
    from ieee_tpu.optim import build_lr_scheduler, build_optimizer
    from ieee_tpu.data import ImageDataManager

    num_pids = 171
    dm = ImageDataManager(
        sources="synthetic_mm", height=256, width=128,
        batch_size_train=args.batch, batch_size_test=100, workers=0,
        train_sampler="RandomIdentitySampler", num_instances=4,
        num_pids=num_pids, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("ieee3modalPart", num_classes=num_pids, loss="margin",
                        pretrained=False)
    tx = build_optimizer(optim="sgd", lr=0.001, momentum=0.9,
                         weight_decay=5e-4)
    sched = build_lr_scheduler("multi_step", stepsize=[20, 40], base_lr=0.001)
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=sched, margin=1.0,
                        seed=0)
    eng.max_epoch = 1

    data = next(iter(dm.train_loader))
    imgs, pids = eng._put_batch(data)
    key = jax.random.PRNGKey(0)

    # keep a pristine copy of the initial state: donation invalidates the
    # buffers each call, and each combo should start from identical state
    init_state = jax.tree_util.tree_map(lambda x: jax.numpy.copy(x),
                                        eng.state)

    for name, opts in todo:
        print(f"=== {name}: {json.dumps(opts)}", flush=True)
        rec = {"name": name, "options": opts, "batch": args.batch}
        try:
            step_fn = eng._build_train_step(compiler_options=opts or None)
            eng.state = jax.tree_util.tree_map(lambda x: jax.numpy.copy(x),
                                               init_state)
            t0 = time.perf_counter()
            for i in range(3):
                eng.state, m = step_fn(eng.state, imgs, pids,
                                       jax.random.fold_in(key, i), 0.001,
                                       None)
                float(m["loss"])
            rec["compile_s"] = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            for i in range(args.steps):
                eng.state, m = step_fn(eng.state, imgs, pids,
                                       jax.random.fold_in(key, 100 + i),
                                       0.001, None)
            loss = float(m["loss"])  # sync
            dt = time.perf_counter() - t0
            rec["ms_per_step"] = round(dt / args.steps * 1e3, 2)
            rec["triplets_per_sec"] = round(args.steps * args.batch / dt, 1)
            rec["loss"] = round(loss, 4)
        except Exception as e:  # compiler rejection, OOM, ...
            rec["error"] = f"{type(e).__name__}: {e}"[:500]
        with open(args.results, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
