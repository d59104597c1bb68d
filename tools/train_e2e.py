"""End-to-end IEEE convergence run on learnable synthetic data.

Stand-in for the license-gated RGBNT201 protocol (BASELINE.md): trains the
full-depth ieee3modalPart stack through the REAL product surface
(``Engine.run``: loader -> device augmentation -> jitted train step ->
checkpoint -> on-device eval) on the pid-correlated synthetic 3-modal
dataset, and records the mAP/CMC trajectory. On a chance-level start
(~1/85 gallery ids), a healthy stack must drive mAP toward 1.0 — this
exercises every layer the reference's mainMultiModal.py run does
(reference scripts/mainMultiModal.py:189-246) with real learning signal.

Usage:
    PYTHONPATH=/root/repo[:/root/.axon_site] python tools/train_e2e.py \
        [--epochs 30] [--batch 128] [--pids 171] [--imgs-per-pid 8] \
        [--height 256] [--width 128] [--eval-freq 10] \
        [--out E2E_TRAIN_r03.json] [--save-dir /tmp/e2e_train]

Defaults mirror bench.py's RGBNT201-shaped config so the TPU train-step
compile is shared. Writes ONE JSON artifact with the per-epoch loss and
per-eval mAP/CMC trajectory.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import signal
import sys
import time


def _provenance(protocol: dict) -> dict:
    """Artifact provenance stamp: git commit + a hash of the protocol block
    (so any artifact can be traced to the exact code + config that produced
    it), and a placeholder for the trained-weights fingerprint."""
    import hashlib
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "-C", osp.dirname(osp.dirname(osp.abspath(__file__))),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        commit = "unknown"
    blob = json.dumps(protocol, sort_keys=True).encode()
    return {"git_commit": commit or "unknown",
            "protocol_hash": hashlib.md5(blob).hexdigest()[:12]}


def params_fingerprint(params) -> str:
    """Order-stable fingerprint of a parameter tree: blake2b over the
    (path, float32-L2-norm) pairs of every leaf. Distinguishes any two
    trained checkpoints without pulling full weights through the tunnel
    (one small device->host vector instead of ~1.6 GB)."""
    import hashlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    leaves = sorted(jax.tree_util.tree_leaves_with_path(params),
                    key=lambda kv: str(kv[0]))
    arrs = [leaf for _, leaf in leaves]
    norms = jax.jit(lambda ls: jnp.stack(
        [jnp.linalg.norm(a.astype(jnp.float32).ravel()) for a in ls]))(arrs)
    h = hashlib.blake2b(digest_size=10)
    for (path, _), n in zip(leaves, np.asarray(norms)):
        h.update(f"{jax.tree_util.keystr(path)}:{float(n):.6e};".encode())
    return h.hexdigest()


def distill(save_dir: str, out: str, protocol: dict, final_rank1,
            wall: float, complete: bool, quiet: bool = False,
            extra: dict | None = None) -> dict:
    """metrics.jsonl -> the committed artifact (drop machine-dependent
    timing meters, keep losses/accuracies). Partial runs (timeout/SIGTERM)
    write ``complete: false`` so the suite never mistakes them for done."""
    evals_by_epoch, losses = {}, {}
    path = osp.join(save_dir, "metrics.jsonl")
    if osp.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue  # torn tail line (snapshot raced the writer)
                if rec.get("kind") == "eval":
                    # keyed by epoch: re-run epochs after a resume dedupe
                    # to the last record
                    evals_by_epoch[rec.get("epoch")] = {
                        k: rec[k] for k in rec
                        if k in ("epoch", "mAP", "rank1", "rank5",
                                 "rank10", "rank20")}
                elif rec.get("kind") == "train_epoch":
                    losses[rec["epoch"]] = {
                        k: round(v, 4) for k, v in rec.items()
                        if isinstance(v, float) and k not in
                        ("lr", "batch_time_avg", "data_time_avg")}
    evals = [evals_by_epoch[e] for e in sorted(evals_by_epoch)]
    artifact = {
        "protocol": protocol,
        **_provenance(protocol),
        **(extra or {}),
        "complete": bool(complete),
        "loss_per_epoch": losses,
        "evals": evals,
        "final_rank1": None if final_rank1 is None else float(final_rank1),
        "wall_s": round(wall, 1),
    }
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(artifact, f, indent=1)
    os.replace(tmp, out)  # atomic: a killed snapshot never leaves torn JSON
    if not quiet:
        print(json.dumps({"complete": bool(complete),
                          "final_rank1": artifact["final_rank1"],
                          "final_mAP": evals[-1]["mAP"] if evals else None,
                          "wall_s": round(wall, 1)}))
    return artifact


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--pids", type=int, default=171)
    ap.add_argument("--imgs-per-pid", type=int, default=8)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--eval-freq", type=int, default=10)
    ap.add_argument("--backbone-layers", type=str, default="",
                    help="e.g. 1,1,1,1 for the shallow CPU-testable stack")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--optim", type=str, default="sgd",
                    help="sgd follows the reference RGBNT201 protocol "
                         "(assumes warm start); adam suits from-scratch")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--weight-m", type=float, default=1.0)
    ap.add_argument("--weight-m-warmup", type=int, default=0,
                    help="ramp weight_m 0->target over the first N "
                         "epochs (margin gradient dominates 200-500x "
                         "from scratch, E2E_DIAG_r03.jsonl)")
    ap.add_argument("--margin-mean", action="store_true",
                    help="average the 3M loss over ids instead of the "
                         "reference's sum (cfg.loss.margin_mean_over_ids): "
                         "batch-size-invariant margin:CE ratio")
    ap.add_argument("--stepsize", type=str, default="20,40")
    ap.add_argument("--variant", type=str, default="full",
                    choices=["base", "cim", "cim3m", "full"],
                    help="paper Table-3 ablation: base (no CIM/CA/REM), "
                         "cim (+CIM+CA, no 3M), cim3m (+CIM+CA+3M), full")
    ap.add_argument("--decode-cache", action="store_true")
    ap.add_argument("--device-cache", action="store_true",
                    help="whole train set in device HBM; batches gather "
                         "on device (kills per-step host->device transfer)")
    ap.add_argument("--cross-modal", action="store_true",
                    help="use the synthetic-x1 discriminative benchmark: "
                         "identity info factorized across modalities "
                         "(group-shared weak code + modality-specific "
                         "codes + stripe occlusion) so the CIM/3M/REM "
                         "modules have measurable jobs (paper Table 3)")
    ap.add_argument("--seed", type=int, default=0,
                    help="run seed: init + sampler + per-image nuisance "
                         "draws (identity codes stay fixed per pid)")
    ap.add_argument("--heldout-test", action="store_true",
                    help="query/gallery identities disjoint from train "
                         "(open-set, like the real re-ID protocols); "
                         "default evaluates held-out images of seen ids")
    ap.add_argument("--out", type=str, default="E2E_TRAIN_r03.json")
    ap.add_argument("--save-dir", type=str, default="/tmp/e2e_train")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the newest checkpoint in save-dir "
                         "(checkpoints land every --save-freq epochs); "
                         "fresh run if none exists. Keeps metrics.jsonl "
                         "(the distiller dedupes re-run epochs by keeping "
                         "the last record)")
    ap.add_argument("--save-freq", type=int, default=100,
                    help="checkpoint every N epochs (plus the final epoch), "
                         "independent of --eval-freq. A full-state save is "
                         "a ~1.6 GB device pull (~3 min through the axon "
                         "tunnel), so saving at every eval dominates the "
                         "run; best-eval epochs are also skipped here "
                         "(save_best=False — the artifact is metrics.jsonl, "
                         "checkpoints exist only for resume). 0 = save at "
                         "every eval")
    ap.add_argument("--init-from", type=str, default="",
                    help="warm-start params/batch_stats from a checkpoint "
                         "or bare {params,batch_stats} msgpack (tolerant "
                         "partial load — e.g. a trained base-variant trunk "
                         "under a full-variant model, mirroring the "
                         "reference's ImageNet warm-start protocol). "
                         "Optimizer state starts fresh; --resume, when a "
                         "checkpoint exists in save-dir, takes precedence")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke test)")
    ap.add_argument("--distill-only", action="store_true",
                    help="skip training: distill save-dir/metrics.jsonl "
                         "into --out (marked partial) and exit")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # protocol block is needed by every exit path (incl. --distill-only,
    # which must not touch the backend: the tunnel may be down)
    model_kw = {}
    if args.backbone_layers:
        model_kw["backbone_layers"] = tuple(
            int(x) for x in args.backbone_layers.split(","))
    # ablation variants mirror tools/ablation_sweep.py (paper Table 3)
    if args.variant == "base":
        model_kw.update(interaction=False, attention=False, using_REM=False)
        args.weight_m = 0.0
    elif args.variant == "cim":
        model_kw.update(interaction=True, attention=True, using_REM=False)
        args.weight_m = 0.0
    elif args.variant == "cim3m":
        model_kw.update(interaction=True, attention=True, using_REM=False)
    lr = args.lr if args.lr is not None else (
        0.001 if args.optim == "sgd" else 3e-4)
    stepsize = [int(x) for x in args.stepsize.split(",")]
    protocol = {
        "dataset": ("synthetic_mm(cross_modal=x1)" if args.cross_modal
                    else "synthetic_mm(correlated=True)"),
        "seed": args.seed,
        "test_split": ("heldout ids (open-set)" if args.heldout_test
                       else "held-out images of seen ids (closed-set)"),
        "pids": args.pids, "imgs_per_pid": args.imgs_per_pid,
        "hw": [args.height, args.width], "batch": args.batch,
        "epochs": args.epochs,
        "optim": (f"{args.optim} lr {lr} wd 5e-4, "
                  f"multi_step {stepsize}, weight_m {args.weight_m}"
                  + (f" warmup {args.weight_m_warmup}"
                     if args.weight_m_warmup else "")
                  + (" margin_mean_over_ids" if args.margin_mean else "")),
        "backbone_layers": args.backbone_layers or "full (3,4,6,3)",
        "variant": args.variant,
    }
    if args.distill_only:
        protocol["backend"] = "unknown (distill-only)"
        distill(args.save_dir, args.out, protocol, None, 0.0, complete=False)
        return

    from ieee_tpu.data import ImageDataManager
    from ieee_tpu.engine import Image3MEngine
    from ieee_tpu.models import build_model
    from ieee_tpu.optim import build_lr_scheduler, build_optimizer

    dm = ImageDataManager(
        sources="synthetic_mm", height=args.height, width=args.width,
        batch_size_train=args.batch, batch_size_test=100,
        workers=args.workers, train_sampler="RandomIdentitySampler",
        num_instances=4, num_pids=args.pids,
        imgs_per_pid=args.imgs_per_pid, correlated=True,
        cross_modal=args.cross_modal, verbose=False,
        seed=args.seed, transforms=["random_flip"],
        decode_cache=args.decode_cache, device_cache=args.device_cache,
        heldout_test=args.heldout_test,
    )
    model = build_model("ieee3modalPart", num_classes=args.pids,
                        loss="margin", pretrained=False, **model_kw)
    tx = build_optimizer(optim=args.optim, lr=lr, momentum=0.9,
                         weight_decay=5e-4)
    # reference protocol: multi_step x0.1 at [20, 40] (BASELINE.md)
    sched = build_lr_scheduler("multi_step", stepsize=stepsize, base_lr=lr)
    compiler_options = None
    if jax.default_backend() in ("tpu", "axon"):
        compiler_options = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=sched, margin=1.0,
                        weight_m=args.weight_m, seed=args.seed,
                        weight_m_warmup=args.weight_m_warmup,
                        margin_mean_over_ids=args.margin_mean,
                        compiler_options=compiler_options)

    resume_path = ""
    if args.resume:
        from ieee_tpu.utils.checkpoint import list_checkpoints

        cands = list_checkpoints(osp.join(args.save_dir, "model"))
        if cands:
            resume_path = cands[-1][1]
            print(f"resuming from {resume_path}")

    if args.init_from and not resume_path:
        from ieee_tpu.utils.checkpoint import load_pretrained_weights

        var = load_pretrained_weights(
            {"params": eng.state.params, "batch_stats": eng.state.batch_stats},
            args.init_from)
        eng.state = eng._place_state(eng.state.replace(
            params=var["params"], batch_stats=var["batch_stats"]))
    if args.init_from:
        protocol["init_from"] = args.init_from

    # metrics.jsonl is append-mode (Engine._log_metrics): on a fresh run,
    # clear any record of a prior run in this save_dir so the artifact
    # holds ONE trajectory (on resume the trajectory continues instead)
    stale = osp.join(args.save_dir, "metrics.jsonl")
    if osp.exists(stale) and not resume_path:
        os.remove(stale)

    protocol["backend"] = jax.default_backend()

    # a timeout(1) TERM (the suite's stall watchdog, the driver's bounds)
    # must still reach the finally-distill below: convert it to SystemExit
    signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))

    t0 = time.time()

    # belt-and-braces: signal delivery during native compute is not a
    # reliable cleanup path (observed: a TERM'd run left no artifact), so a
    # daemon thread snapshots a partial artifact every 60 s — even SIGKILL
    # leaves at most a minute of trajectory unrecorded. Atomic rename; the
    # final distill wins via stop event.
    import threading

    stop_snap = threading.Event()

    def _prune_checkpoints(keep: int = 2):
        # bound save_dir growth: each epoch file is ~1.6 GB; a 600-epoch
        # suite across 5 variants would otherwise exceed the disk. The
        # newest `keep` epoch files cover resume; model-best.msgpack is a
        # separate file and never pruned.
        from ieee_tpu.utils.checkpoint import list_checkpoints

        cands = list_checkpoints(osp.join(args.save_dir, "model"))
        for _, path in cands[:-keep]:
            for f in (path, path + ".json"):
                try:
                    os.remove(f)
                except OSError:
                    pass

    def _snapshot():
        while not stop_snap.wait(60.0):
            try:
                distill(args.save_dir, args.out, protocol, None,
                        time.time() - t0, complete=False, quiet=True)
                _prune_checkpoints()
            except Exception:
                pass

    snap_thread = threading.Thread(target=_snapshot, daemon=True)
    snap_thread.start()

    final_rank1, complete, extra = None, False, {}
    try:
        final_rank1 = eng.run(save_dir=args.save_dir, max_epoch=args.epochs,
                              eval_freq=args.eval_freq, print_freq=5,
                              save_freq=args.save_freq, save_best=False,
                              resume=resume_path)
        complete = True
        # VERDICT r4 weak #2: stamp the trained weights so two artifacts
        # reporting identical metrics can be distinguished from two evals
        # of one checkpoint
        extra["params_fingerprint"] = params_fingerprint(eng.state.params)
    except BaseException:
        try:
            extra["params_fingerprint"] = params_fingerprint(
                eng.state.params)
        except Exception:
            pass
        raise
    finally:
        # stop AND JOIN the snapshotter before the final distill: both
        # writers share out+'.tmp', so an in-flight snapshot could tear the
        # final artifact or replace complete:true with a stale partial.
        # set() wakes Event.wait immediately, so the join is prompt.
        stop_snap.set()
        snap_thread.join(timeout=30.0)
        distill(args.save_dir, args.out, protocol, final_rank1,
                time.time() - t0, complete, extra=extra)
        # the final-epoch save lands after the snapshot loop's last prune
        _prune_checkpoints()


if __name__ == "__main__":
    main()
