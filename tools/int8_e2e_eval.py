"""End-to-end int8-PTQ eval measurement -> INT8_EVAL_r04.json (VERDICT r3
item 6: replace the op-level "+24-26%" claim with a whole-pipeline number).

Runs the REAL eval pipeline twice — plain bf16 flax forward vs the w8a8 PTQ
path (``models/int8_eval.py``, cfg.tpu.int8_eval) — on the same weights and
the same synthetic_mm heldout split (the e2e suite protocol), through
``Engine._evaluate``: threaded loader -> device transform -> feature
extraction -> device distmat -> device CMC/mAP. Records per-path wall-clock,
per-batch forward time at the eval batch size, and the mAP delta.

With ``--init-from`` pointing at a trained checkpoint (e.g. the r04 suite's
base or warm-started full run) the mAP delta is measured on real learned
features; without it the run still measures wall-clocks but the mAP column
is near-chance (flagged in the artifact).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/int8_e2e_eval.py \
        [--init-from /root/repo/.ckpts/base/model/epoch-150.msgpack] \
        [--pids 48] [--variant base] [--out INT8_EVAL_r04.json]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--init-from", type=str, default="")
    ap.add_argument("--pids", type=int, default=48)
    ap.add_argument("--imgs-per-pid", type=int, default=32)
    ap.add_argument("--variant", type=str, default="base",
                    choices=["base", "cim", "cim3m", "full"],
                    help="must match the checkpoint's architecture")
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--fwd-iters", type=int, default=10)
    ap.add_argument("--out", type=str, default="INT8_EVAL_r04.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ieee_tpu.data import ImageDataManager
    from ieee_tpu.engine import Image3MEngine
    from ieee_tpu.models import build_model

    model_kw = {}
    if args.variant == "base":
        model_kw.update(interaction=False, attention=False, using_REM=False)
    elif args.variant in ("cim", "cim3m"):
        model_kw.update(interaction=True, attention=True, using_REM=False)

    dm = ImageDataManager(
        sources="synthetic_mm", height=256, width=128,
        batch_size_train=32, batch_size_test=args.batch, workers=2,
        train_sampler="RandomIdentitySampler", num_instances=4,
        num_pids=args.pids, imgs_per_pid=args.imgs_per_pid, correlated=True,
        heldout_test=True, verbose=False, seed=0,
        transforms=["random_flip"],
    )
    model = build_model("ieee3modalPart", num_classes=args.pids,
                        loss="margin", pretrained=False, **model_kw)

    results = {}
    trained = bool(args.init_from)
    for tag, int8 in (("bf16", False), ("int8", True)):
        eng = Image3MEngine(dm, model, seed=0, int8_eval=int8)
        if args.init_from:
            from ieee_tpu.utils.checkpoint import load_pretrained_weights

            var = load_pretrained_weights(
                {"params": eng.state.params,
                 "batch_stats": eng.state.batch_stats}, args.init_from)
            eng.state = eng._place_state(eng.state.replace(
                params=var["params"], batch_stats=var["batch_stats"]))

        q = dm.test_loader["synthetic_mm"]["query"]
        g = dm.test_loader["synthetic_mm"]["gallery"]

        # warm the compile (loader + forward + distmat + rank), then time
        with contextlib.redirect_stdout(io.StringIO()):
            eng._evaluate(dataset_name="synthetic_mm", query_loader=q,
                          gallery_loader=g, ranks=(1, 5, 10))
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(io.StringIO()):
            rank1, mAP = eng._evaluate(dataset_name="synthetic_mm",
                                       query_loader=q, gallery_loader=g,
                                       ranks=(1, 5, 10))
        pipeline_s = time.perf_counter() - t0

        # pure device forward rate at the eval batch size (loader excluded):
        # one pre-staged batch, timed over fwd-iters, synced by scalar pull
        # (block_until_ready does not block through the axon tunnel)
        rng = np.random.default_rng(0)
        imgs = tuple(jax.device_put(
            rng.integers(0, 256, (args.batch, 256, 128, 3), dtype=np.uint8))
            for _ in range(3))
        step = eng._eval_step_fn
        f = step(eng.state.params, eng.state.batch_stats, imgs)
        float(np.asarray(f)[0, 0])
        t0 = time.perf_counter()
        for _ in range(args.fwd_iters):
            f = step(eng.state.params, eng.state.batch_stats, imgs)
        float(np.asarray(f)[0, 0])
        fwd_ms = (time.perf_counter() - t0) / args.fwd_iters * 1e3

        results[tag] = {
            "pipeline_wall_s": round(pipeline_s, 3),
            "fwd_ms_per_batch": round(fwd_ms, 2),
            "imgs_per_s": round(args.batch / (fwd_ms / 1e3), 1),
            "mAP": round(float(mAP), 4),
            "rank1": round(float(rank1), 4),
        }
        print(tag, results[tag], flush=True)

    artifact = {
        "protocol": {
            "dataset": "synthetic_mm(correlated=True, heldout ids)",
            "pids": args.pids, "imgs_per_pid": args.imgs_per_pid,
            "eval_batch": args.batch, "variant": args.variant,
            "init_from": args.init_from or "RANDOM INIT (mAP near chance)",
            "backend": jax.default_backend(),
            "pipeline": "Engine._evaluate: loader -> features -> device "
                        "distmat -> device CMC/mAP",
        },
        "trained_weights": trained,
        "bf16": results["bf16"],
        "int8": results["int8"],
        "fwd_speedup": round(results["bf16"]["fwd_ms_per_batch"]
                             / results["int8"]["fwd_ms_per_batch"], 3),
        "pipeline_speedup": round(results["bf16"]["pipeline_wall_s"]
                                  / results["int8"]["pipeline_wall_s"], 3),
        "mAP_delta": round(results["int8"]["mAP"] - results["bf16"]["mAP"], 4),
    }
    with open(args.out, "w") as fo:
        json.dump(artifact, fo, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("fwd_speedup", "pipeline_speedup", "mAP_delta")}))


if __name__ == "__main__":
    main()
