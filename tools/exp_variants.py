"""Step-level perf experiments on the real chip. Each variant times the FULL
train step (the only reliable measurement through the axon tunnel).

Variants:
  base     — current engine step
  remat    — forward wrapped in jax.checkpoint(nothing_saveable)
  gconv    — scan-probe: 3 separate convs vs 1 grouped conv (feature_group_count=3)

Usage: python tools/exp_variants.py [base|remat|gconv|all] [batch]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def build(batch, **model_kw):
    from ieee_tpu.engine import Image3MEngine
    from ieee_tpu.models import build_model
    from ieee_tpu.optim import build_lr_scheduler, build_optimizer
    from ieee_tpu.data import ImageDataManager

    num_pids = 171
    dm = ImageDataManager(
        sources="synthetic_mm", height=256, width=128,
        batch_size_train=batch, batch_size_test=100, workers=0,
        train_sampler="RandomIdentitySampler", num_instances=4,
        num_pids=num_pids, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("ieee3modalPart", num_classes=num_pids, loss="margin",
                        pretrained=False, **model_kw)
    tx = build_optimizer(optim="sgd", lr=0.001, momentum=0.9,
                         weight_decay=5e-4)
    sched = build_lr_scheduler("multi_step", stepsize=[20, 40], base_lr=0.001)
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=sched, margin=1.0,
                        seed=0)
    eng.max_epoch = 1
    data = next(iter(dm.train_loader))
    imgs, pids = eng._put_batch(data)
    return eng, imgs, pids


def time_step(eng, step_fn, imgs, pids, label, batch, n=20):
    key = jax.random.PRNGKey(0)
    for i in range(3):
        eng.state, m = step_fn(eng.state, imgs, pids,
                               jax.random.fold_in(key, i), 0.001, None)
        float(m["loss"])
    t0 = time.perf_counter()
    for i in range(n):
        eng.state, m = step_fn(eng.state, imgs, pids,
                               jax.random.fold_in(key, 100 + i), 0.001, None)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.1f} ms/step, {batch/dt:.1f} triplets/s",
          flush=True)


def run_base(batch):
    eng, imgs, pids = build(batch)
    time_step(eng, eng._build_train_step(), imgs, pids, "base", batch)


def run_remat(batch):
    eng, imgs, pids = build(batch)
    orig_fwd = eng._forward_train
    eng._forward_train = jax.checkpoint(
        lambda p, s, im: orig_fwd(p, s, im),
        policy=jax.checkpoint_policies.nothing_saveable,
    )
    time_step(eng, eng._build_train_step(), imgs, pids, "remat-all", batch)


def run_gradbar(batch):
    """optimization_barrier between grads and the optimizer update:
    round-3 probe — the profile shows 31.8 ms/step of dW+optimizer
    fusions at ~45 TF/s while the bare dW dot sustains ~99 TF/s in a scan
    chain; the barrier stops XLA fusing the SGD chain into the dW dots to
    see whether the fusion (not the dot) is the slowdown."""
    import optax

    eng, imgs, pids = build(batch)
    from ieee_tpu.engine.engine import TrainState

    model = eng.model
    tx = eng.optimizer
    k_tfm = 1

    def loss_fn(params, batch_stats, im, pids):
        out, new_stats = eng._forward_train(params, batch_stats, im)
        loss, metrics = eng.compute_loss(out, pids)
        return loss, (metrics, new_stats)

    def step(state, im, pids, key, lr, mask):
        im = eng._transform_train(key, im)
        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, im, pids)
        grads = jax.lax.optimization_barrier(grads)  # <- the probe
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return TrainState(params=new_params, batch_stats=new_stats,
                          opt_state=new_opt_state, step=state.step + 1), metrics

    step_fn = jax.jit(step)
    time_step(eng, step_fn, imgs, pids, "grad-barrier", batch)


def run_twostream(batch):
    """Two independent half-batch grad computations inside one jit, grads
    averaged, one optimizer update. Same FLOPs/traffic; the point is
    scheduler freedom — the round-3 profile is flat with every class at
    ~45-75% of its isolated-op rate, suggesting dependency stalls; two
    streams let the MXU of one overlap the bandwidth-bound epilogues of
    the other. BN stats per half (per-replica semantics)."""
    import optax

    eng, imgs, pids = build(batch)
    from ieee_tpu.engine.engine import TrainState

    tx = eng.optimizer
    h = batch // 2

    def loss_fn(params, batch_stats, im, pd):
        out, new_stats = eng._forward_train(params, batch_stats, im)
        loss, metrics = eng.compute_loss(out, pd)
        return loss, (metrics, new_stats)

    def step(state, im, pd, key, lr, mask):
        im = eng._transform_train(key, im)
        halves = [tuple(m[:h] for m in im), tuple(m[h:] for m in im)]
        pds = [pd[:h], pd[h:]]
        grads_acc = None
        loss_acc = 0.0
        new_stats = None
        for s in range(2):
            (loss, (metrics, st)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, halves[s], pds[s])
            grads_acc = grads if grads_acc is None else jax.tree_util.tree_map(
                jnp.add, grads_acc, grads)
            loss_acc = loss_acc + loss
            new_stats = st if new_stats is None else jax.tree_util.tree_map(
                lambda a, b: 0.5 * (a + b), new_stats, st)
        grads = jax.tree_util.tree_map(lambda g: g * 0.5, grads_acc)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(params=new_params, batch_stats=new_stats,
                          opt_state=new_opt_state, step=state.step + 1), \
            {"loss": loss_acc * 0.5}

    step_fn = jax.jit(step)
    time_step(eng, step_fn, imgs, pids, "two-stream", batch)


def run_gconv(batch):
    """3 sequential convs vs one grouped conv, chained N times in one jit."""
    k = jax.random.PRNGKey(0)
    B, H, W, C = batch, 16, 8, 2048
    x3 = jax.random.normal(k, (B, H, W, 3 * C), jnp.bfloat16) * 0.1
    w3 = [jax.random.normal(jax.random.fold_in(k, i), (1, 1, C, C),
                            jnp.bfloat16) * 0.02 for i in range(3)]
    wg = jnp.concatenate(w3, axis=-1)  # (1,1,C,3C) grouped layout

    def sep(x):
        def f(c, _):
            outs = []
            for i in range(3):
                xi = c[..., i * C:(i + 1) * C]
                outs.append(jax.lax.conv_general_dilated(
                    xi, w3[i], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16))
            return jnp.concatenate(outs, axis=-1) * 0.01, None
        c, _ = jax.lax.scan(f, x, None, length=10)
        return jnp.sum(c.astype(jnp.float32))

    def grp(x):
        def f(c, _):
            y = jax.lax.conv_general_dilated(
                c, wg, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=3,
                preferred_element_type=jnp.bfloat16)
            return y * 0.01, None
        c, _ = jax.lax.scan(f, x, None, length=10)
        return jnp.sum(c.astype(jnp.float32))

    for name, fn in [("3 separate 1x1 convs x10", sep),
                     ("1 grouped conv x10", grp)]:
        jf = jax.jit(fn)
        float(jf(x3))
        t0 = time.perf_counter()
        float(jf(x3))
        print(f"{name}: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


def run_megakernel(batch):
    """Pallas whole-block backward on every stride-1 bottleneck
    (ops/pallas/block_bwd.py; round-3 VERDICT item 4). Whole-step protocol,
    identical program otherwise."""
    eng, imgs, pids = build(batch, block_megakernel=True)
    time_step(eng, eng._build_train_step(), imgs, pids, "megakernel", batch)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    if which == "megakernel":
        run_megakernel(batch)
    if which in ("base", "all"):
        run_base(batch)
    if which in ("remat", "all"):
        run_remat(batch)
    if which in ("gconv", "all"):
        run_gconv(batch)
    if which == "gradbar":
        run_gradbar(batch)
    if which == "twostream":
        run_twostream(batch)


if __name__ == "__main__":
    main()
