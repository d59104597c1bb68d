"""Benchmark: full-IEEE train-step throughput on one TPU chip.

Metric: RGBNT201-shaped training triplets/sec/chip (3x 256x128 images per
triplet) through the complete compiled train step — device-side augmentation,
3x ResNet-50 forward, CIM/REM heads, 3M+CE loss, backward, SGD update.

Baseline: the PyTorch reference trains IEEE on an RTX 3090 at batch 8
(BASELINE.md); BASELINE.json's target is >=5x an A100-class torch reference
per chip. No measured reference number exists in the repo, so vs_baseline is
computed against a documented estimate of 400 triplets/sec for the torch
stack on A100-class hardware (3x ResNet-50 fwd+bwd at 256x128).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

BASELINE_TRIPLETS_PER_SEC = 400.0  # documented A100-class torch estimate

# Watchdog: the axon PJRT tunnel has been observed to wedge (client asleep
# in epoll, no progress, forever). The driver runs this unattended — on a
# stall, print an honest zero-value JSON line with the stage that hung and
# exit non-zero rather than hanging the round. 1500 s covers the worst
# observed cold compile (~7 min) with 2x headroom.
_beat_state = {"t": time.time(), "stage": "init"}


def _beat(stage: str) -> None:
    _beat_state.update(t=time.time(), stage=stage)


def _watchdog(limit_s: float = 1500.0) -> None:
    while True:
        time.sleep(30)
        if time.time() - _beat_state["t"] > limit_s:
            print(json.dumps({
                "metric": "rgbnt201_ieee_train_triplets_per_sec_per_chip",
                "value": 0.0,
                "unit": "triplets/s",
                "vs_baseline": 0.0,
                "error": (f"stalled in '{_beat_state['stage']}' for "
                          f">{limit_s:.0f}s (axon tunnel wedge)"),
            }), flush=True)
            os._exit(3)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax

    from ieee_tpu.data.transforms import build_transforms
    from ieee_tpu.engine import Image3MEngine
    from ieee_tpu.models import build_model
    from ieee_tpu.optim import build_lr_scheduler, build_optimizer
    from ieee_tpu.data import ImageDataManager

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    height, width = 256, 128
    num_pids = 171  # RGBNT201 train_171

    _beat("datamanager build")
    dm = ImageDataManager(
        sources="synthetic_mm", height=height, width=width,
        batch_size_train=batch, batch_size_test=100, workers=0,
        train_sampler="RandomIdentitySampler", num_instances=4,
        num_pids=num_pids, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("ieee3modalPart", num_classes=num_pids, loss="margin",
                        pretrained=False)
    tx = build_optimizer(optim="sgd", lr=0.001, momentum=0.9,
                         weight_decay=5e-4)
    sched = build_lr_scheduler("multi_step", stepsize=[20, 40], base_lr=0.001)
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=sched, margin=1.0,
                        seed=0,
                        # measured winner of the XLA:TPU option sweep
                        # (tools/xla_flag_sweep.py; CLAUDE.md perf study):
                        # -4% step time vs compiler defaults on v5e
                        compiler_options={
                            "xla_tpu_scoped_vmem_limit_kib": "32768"})
    eng.max_epoch = 1

    # one fixed on-device batch: isolates chip throughput from the 1-core
    # host decode (production runs use the threaded prefetch loader)
    from ieee_tpu.parallel import batch_sharding

    _beat("host batch build")
    data = next(iter(dm.train_loader))
    _beat("device transfer")
    imgs, pids = eng._put_batch(data, batch_sharding(eng.mesh))
    step_fn = eng._build_train_step()

    key = jax.random.PRNGKey(0)
    # warmup / compile; sync via a host scalar pull (block_until_ready is
    # unreliable through the axon PJRT tunnel)
    for i in range(3):
        _beat(f"warmup step {i} (incl. compile)")
        eng.state, m = step_fn(eng.state, imgs, pids,
                               jax.random.fold_in(key, i), 0.001, None)
        float(m["loss"])

    n_steps = 20
    _beat("timed steps")
    t0 = time.perf_counter()
    for i in range(n_steps):
        eng.state, m = step_fn(eng.state, imgs, pids,
                               jax.random.fold_in(key, 100 + i), 0.001, None)
    float(m["loss"])  # sync on the last step's output
    dt = time.perf_counter() - t0

    triplets_per_sec = n_steps * batch / dt
    print(json.dumps({
        "metric": "rgbnt201_ieee_train_triplets_per_sec_per_chip",
        "value": round(triplets_per_sec, 2),
        "unit": "triplets/s",
        "vs_baseline": round(triplets_per_sec / BASELINE_TRIPLETS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
