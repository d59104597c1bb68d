"""IEEE ablation sweep on the chip (paper Table 3 / VERDICT round-2 #10):
trains a few steps of each ablation variant — (a) 3-branch base,
(b) +CIM, (d) full IEEE (+CIM+CA+REM) — and records triplets/s and the loss
trajectory per variant. Ablation (c) (+CIM+3M) is (b) with the 3M loss on,
which is how (b) trains here too (the loss blend is an engine knob, not a
model change).

Usage: python tools/ablation_sweep.py [batch] [steps]
Writes one JSON line per variant to stdout and ABLATION.json.
"""

from __future__ import annotations

import json
import sys
import time

import jax


def run_variant(name, batch, steps, **model_flags):
    from ieee_tpu.data import ImageDataManager
    from ieee_tpu.engine import Image3MEngine
    from ieee_tpu.models import build_model
    from ieee_tpu.optim import build_lr_scheduler, build_optimizer

    num_pids = 171
    dm = ImageDataManager(
        sources="synthetic_mm", height=256, width=128,
        batch_size_train=batch, batch_size_test=100, workers=0,
        train_sampler="RandomIdentitySampler", num_instances=4,
        num_pids=num_pids, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("ieee3modalPart", num_classes=num_pids, loss="margin",
                        pretrained=False, **model_flags)
    tx = build_optimizer(optim="sgd", lr=0.001, momentum=0.9,
                         weight_decay=5e-4)
    sched = build_lr_scheduler("multi_step", stepsize=[20, 40], base_lr=0.001)
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=sched, margin=1.0,
                        seed=0)
    eng.max_epoch = 1

    data = next(iter(dm.train_loader))
    imgs, pids = eng._put_batch(data)
    step_fn = eng._build_train_step()
    key = jax.random.PRNGKey(0)

    losses = []
    for i in range(3):  # warmup/compile
        eng.state, m = step_fn(eng.state, imgs, pids,
                               jax.random.fold_in(key, i), 0.001, None)
        losses.append(float(m["loss"]))
    t0 = time.perf_counter()
    for i in range(steps):
        eng.state, m = step_fn(eng.state, imgs, pids,
                               jax.random.fold_in(key, 100 + i), 0.001, None)
        if (i + 1) % 5 == 0:
            losses.append(float(m["loss"]))
    float(m["loss"])
    dt = time.perf_counter() - t0

    rec = {
        "variant": name,
        "flags": model_flags,
        "triplets_per_sec": round(steps * batch / dt, 1),
        "ms_per_step": round(dt / steps * 1e3, 1),
        "loss_first": round(losses[0], 4),
        "loss_last": round(losses[-1], 4),
        "losses": [round(x, 4) for x in losses],
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    variants = [
        ("a_base", dict(interaction=False, attention=False, using_REM=False)),
        ("b_cim", dict(interaction=True, attention=True, using_REM=False)),
        ("d_full", dict(interaction=True, attention=True, using_REM=True)),
    ]
    out = [run_variant(n, batch, steps, **f) for n, f in variants]
    with open("ABLATION.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
