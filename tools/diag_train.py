"""Training-dynamics diagnostic: per-group gradient norms + logit statistics.

Investigates the open e2e finding (E2E_TRAIN_r03.json): at full depth the
margin loss trains while the summed part-CE stays pinned at chance
(6*ln(48) per modality) for 600 epochs. This tool runs REAL engine train
steps (same jitted step as ``Engine.train``) and, every ``--diag-every``
steps, computes a jitted diagnostic on the incoming batch:

  * loss terms (LossM / lossR,N,T / acc)
  * global + per-top-level-module gradient norms (classifier_* vs fc_* vs
    backbone_* ...), and matching parameter norms
  * logit scale (std / |max|) and part-FC feature stats (std, dead-ReLU
    fraction) per modality

Distinguishes "CE gradient vanishes into the classifier" (grad_norm
classifier ~ 0, logits ~ 0) from "CE gradient is healthy but the shared
trunk ignores it" (classifier grads O(1), backbone dominated by LossM).

Usage (chip or --cpu with --backbone-layers 1,1,1,1):
    python tools/diag_train.py --steps 200 --diag-every 25 \
        [--pids 48 --imgs-per-pid 32] [--weight-m 1.0] [--lr 3e-4]
Prints one JSON line per diagnostic point.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--diag-every", type=int, default=25)
    ap.add_argument("--pids", type=int, default=48)
    ap.add_argument("--imgs-per-pid", type=int, default=32)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--backbone-layers", type=str, default="")
    ap.add_argument("--optim", type=str, default="amsgrad")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--weight-m", type=float, default=1.0)
    ap.add_argument("--variant", type=str, default="full",
                    choices=["base", "cim", "cim3m", "full"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    from ieee_tpu.data import ImageDataManager
    from ieee_tpu.engine import Image3MEngine
    from ieee_tpu.models import build_model
    from ieee_tpu.optim import build_lr_scheduler, build_optimizer

    model_kw = {}
    if args.backbone_layers:
        model_kw["backbone_layers"] = tuple(
            int(x) for x in args.backbone_layers.split(","))
    if args.variant == "base":
        model_kw.update(interaction=False, attention=False, using_REM=False)
        args.weight_m = 0.0
    elif args.variant == "cim":
        model_kw.update(interaction=True, attention=True, using_REM=False)
        args.weight_m = 0.0
    elif args.variant == "cim3m":
        model_kw.update(interaction=True, attention=True, using_REM=False)

    dm = ImageDataManager(
        sources="synthetic_mm", height=args.height, width=args.width,
        batch_size_train=args.batch, batch_size_test=100, workers=2,
        train_sampler="RandomIdentitySampler", num_instances=4,
        num_pids=args.pids, imgs_per_pid=args.imgs_per_pid, correlated=True,
        verbose=False, seed=0, transforms=["random_flip"], decode_cache=True,
    )
    model = build_model("ieee3modalPart", num_classes=args.pids,
                        loss="margin", pretrained=False, **model_kw)
    tx = build_optimizer(optim=args.optim, lr=args.lr, momentum=0.9,
                         weight_decay=5e-4)
    sched = build_lr_scheduler("multi_step", stepsize=[10**6], base_lr=args.lr)
    compiler_options = None
    if jax.default_backend() in ("tpu", "axon"):
        compiler_options = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=sched, margin=1.0,
                        weight_m=args.weight_m, seed=0,
                        compiler_options=compiler_options)

    def loss_fn(params, batch_stats, imgs, pids):
        out, new_stats = eng._forward_train(params, batch_stats, imgs)
        loss, metrics = eng.compute_loss(out, pids)
        return loss, (metrics, out)

    def _group_norms(tree):
        # one scalar per top-level flax module (classifier_R, fc_R,
        # backbone_R, reduce_0, ...)
        return {k: optax.global_norm(v) for k, v in tree.items()}

    def diag_fn(params, batch_stats, imgs, pids, key):
        imgs = eng._transform_train(key, imgs)
        (loss, (metrics, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, imgs, pids)
        stats = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        for m in "RNT":
            lg = out[f"logits_{m}"].astype(jnp.float32)
            stats[f"logit_std_{m}"] = jnp.std(lg)
            stats[f"logit_absmax_{m}"] = jnp.max(jnp.abs(lg))
        return (loss, metrics, stats, _group_norms(grads),
                _group_norms(params))

    diag = jax.jit(diag_fn)
    step_fn = eng._build_train_step()
    state = eng.state

    it = iter(dm.train_loader)
    step = 0
    while step < args.steps:
        for data in dm.train_loader:
            if step >= args.steps:
                break
            imgs, pids = eng._put_batch(data)
            key = jax.random.fold_in(eng.rng, step)
            if step % args.diag_every == 0:
                loss, metrics, stats, gn, pn = diag(
                    state.params, state.batch_stats, imgs, pids, key)
                rec = {"step": step,
                       **{k: round(float(v), 4) for k, v in metrics.items()},
                       **{k: round(float(v), 5) for k, v in stats.items()}}
                # grad/param norms for the CE head chain + the trunk
                for g in sorted(gn):
                    if g.split("_")[0] in ("classifier", "fc", "backbone",
                                           "reduce"):
                        rec[f"g:{g}"] = round(float(gn[g]), 6)
                        rec[f"p:{g}"] = round(float(pn[g]), 4)
                print(json.dumps(rec), flush=True)
            state, _ = step_fn(state, imgs, pids, key, args.lr, None, None)
            step += 1
    del it


if __name__ == "__main__":
    main()
