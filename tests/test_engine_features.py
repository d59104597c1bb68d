"""Engine feature tests: fixbase/open_layers, test_only, staged engine
behaviors."""

import io
import contextlib

import numpy as np
import pytest

import jax

from ieee_tpu.data import ImageDataManager
from ieee_tpu.engine import ImageSoftmaxEngine
from ieee_tpu.models import build_model
from ieee_tpu.optim import build_optimizer


def _engine(tmp_seed=0):
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=8,
        batch_size_test=8, workers=0, train_sampler="RandomIdentitySampler",
        num_instances=4, num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    tx = build_optimizer(optim="sgd", lr=0.5, momentum=0.0, weight_decay=0.0)
    return ImageSoftmaxEngine(dm, model, optimizer=tx,
                              scheduler=lambda e: 0.5, seed=tmp_seed)


def test_fixbase_freezes_non_open_layers():
    eng = _engine()
    eng.max_epoch = 1
    eng.epoch = 0
    before = jax.tree_util.tree_map(np.asarray, eng.state.params)
    with contextlib.redirect_stdout(io.StringIO()):
        eng.train(print_freq=1000, fixbase_epoch=1, open_layers=["classifier"])
    after = eng.state.params
    # classifier must move
    assert not np.allclose(np.asarray(after["classifier"]["kernel"]),
                           before["classifier"]["kernel"])
    # trunk must be frozen
    np.testing.assert_array_equal(
        np.asarray(after["trunk"]["stem"]["conv"]["kernel"]),
        before["trunk"]["stem"]["conv"]["kernel"],
    )


def test_fixbase_bn_freeze_pins_frozen_running_stats():
    """Frozen layers' BN running stats stay pinned during warmup — the
    faithful analog of the reference putting frozen modules in .eval()
    (torchtools.py:171-221). Two ways in: the default fixbase_bn_eval=True
    (full .eval(): running-stat normalization AND no stat update) and the
    legacy fixbase_bn_freeze=True (stat pin only). The legacy opt-out
    (bn_eval=False, bn_freeze=False) keeps the round-1 behavior: stats
    update everywhere."""
    for kw in (dict(),  # default: fixbase_bn_eval=True
               dict(fixbase_bn_eval=False, fixbase_bn_freeze=True)):
        eng = _engine()
        eng.max_epoch = 1
        eng.epoch = 0
        trunk_bn_before = jax.tree_util.tree_map(
            np.asarray, eng.state.batch_stats["trunk"])
        with contextlib.redirect_stdout(io.StringIO()):
            eng.train(print_freq=1000, fixbase_epoch=1,
                      open_layers=["classifier"], **kw)
        jax.tree_util.tree_map(
            np.testing.assert_array_equal,
            jax.tree_util.tree_map(np.asarray, eng.state.batch_stats["trunk"]),
            trunk_bn_before,
        )

    # control: the legacy opt-out updates the trunk stats
    eng2 = _engine()
    eng2.max_epoch = 1
    eng2.epoch = 0
    mean_before = np.asarray(jax.tree_util.tree_leaves(
        eng2.state.batch_stats["trunk"])[0])
    with contextlib.redirect_stdout(io.StringIO()):
        eng2.train(print_freq=1000, fixbase_epoch=1,
                   open_layers=["classifier"], fixbase_bn_eval=False)
    mean_after = np.asarray(jax.tree_util.tree_leaves(
        eng2.state.batch_stats["trunk"])[0])
    assert not np.allclose(mean_after, mean_before)


def test_fixbase_bn_eval_handles_constructor_bound_batchnorm():
    """Regression: ieee3modalPart's PartFC builds plain ``nn.BatchNorm`` with
    a CONCRETE ``use_running_average=not train`` (ieee3modal.py:119) — flax
    ``merge_param`` rejects a call-time override, so the bn_eval interceptor
    must flip the attribute instead of passing the kwarg. Before the fix any
    fixbase warmup on the IEEE model (default fixbase_bn_eval=True,
    open_layers=['classifier']) crashed on the first step; the frozen fc_*
    BN stats must also stay pinned (.eval() semantics)."""
    from ieee_tpu.engine import Image3MEngine

    dm = ImageDataManager(
        sources="synthetic_mm", height=64, width=32, batch_size_train=8,
        batch_size_test=16, workers=0, train_sampler="RandomIdentitySampler",
        num_instances=4, num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("ieee3modalPart", num_classes=dm.num_train_pids,
                        loss="margin", pretrained=False,
                        backbone_layers=(1, 1, 1, 1))
    tx = build_optimizer(optim="sgd", lr=0.1, momentum=0.0, weight_decay=0.0)
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=lambda e: 0.1,
                        margin=1.0, seed=0)
    eng.max_epoch = 1
    eng.epoch = 0
    fc_bn_before = jax.tree_util.tree_map(
        np.asarray, eng.state.batch_stats["fc_R"])
    with contextlib.redirect_stdout(io.StringIO()):
        eng.train(print_freq=1000, fixbase_epoch=1,
                  open_layers=["classifier"])
    # frozen PartFC BN ran in eval semantics: stats unchanged
    jax.tree_util.tree_map(
        np.testing.assert_array_equal,
        jax.tree_util.tree_map(np.asarray, eng.state.batch_stats["fc_R"]),
        fc_bn_before,
    )
    # the open classifiers trained
    cls = eng.state.params["classifier_R"]
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(cls)[0])).all()


def test_fixbase_bn_freeze_composes_with_bn_eval():
    """fixbase_bn_freeze must stay active when fixbase_bn_eval is also on:
    the Pallas fused paths (cfg.tpu.fused_1x1 / block_megakernel) compute BN
    outside flax modules where the bn_eval interceptor can't reach, so the
    post-hoc stats_mask pin is their only freeze mechanism. Regression for
    the round-4 review finding that bn_eval silently suppressed the mask."""
    eng = _engine()
    eng.max_epoch = 1
    eng.epoch = 0
    eng._train_step_fn = eng._build_train_step()
    seen = {}
    real = eng._train_step_fn

    def spy(state, imgs, pids, key, lr, mask, stats_mask=None, hp=None,
            bn_eval=None):
        seen["stats_mask"] = stats_mask
        seen["bn_eval"] = bn_eval
        return real(state, imgs, pids, key, lr, mask, stats_mask, hp, bn_eval)

    eng._train_step_fn = spy
    with contextlib.redirect_stdout(io.StringIO()):
        eng.train(print_freq=1000, fixbase_epoch=1,
                  open_layers=["classifier"], fixbase_bn_eval=True,
                  fixbase_bn_freeze=True)
    assert seen["bn_eval"] == ("classifier",)
    assert seen["stats_mask"] is not None


def test_fixbase_bn_eval_alone_still_pins_stats():
    """With the DEFAULT knobs (fixbase_bn_eval=True, fixbase_bn_freeze=False)
    the stats_mask pin must still be passed: without it, the Pallas fused-BN
    paths (which update ra_mean/ra_var in-kernel, out of the interceptor's
    reach) would silently drift frozen layers' running stats during warmup.
    Round-4 review finding #2."""
    eng = _engine()
    eng.max_epoch = 1
    eng.epoch = 0
    eng._train_step_fn = eng._build_train_step()
    seen = {}
    real = eng._train_step_fn

    def spy(state, imgs, pids, key, lr, mask, stats_mask=None, hp=None,
            bn_eval=None):
        seen["stats_mask"] = stats_mask
        return real(state, imgs, pids, key, lr, mask, stats_mask, hp, bn_eval)

    eng._train_step_fn = spy
    with contextlib.redirect_stdout(io.StringIO()):
        eng.train(print_freq=1000, fixbase_epoch=1,
                  open_layers=["classifier"])  # defaults: bn_eval only
    assert seen["stats_mask"] is not None


def test_open_layers_respected_only_during_fixbase():
    eng = _engine()
    eng.max_epoch = 2
    eng.epoch = 1  # past fixbase_epoch=1 -> everything trains
    before = np.asarray(eng.state.params["trunk"]["stem"]["conv"]["kernel"])
    with contextlib.redirect_stdout(io.StringIO()):
        eng.train(print_freq=1000, fixbase_epoch=1, open_layers=["classifier"])
    after = np.asarray(eng.state.params["trunk"]["stem"]["conv"]["kernel"])
    assert not np.allclose(after, before)


def test_run_test_only(tmp_path):
    eng = _engine()
    with contextlib.redirect_stdout(io.StringIO()) as buf:
        rank1 = eng.run(save_dir=str(tmp_path), max_epoch=5, test_only=True,
                        ranks=(1,))
    assert np.isfinite(rank1)
    # no training happened: no checkpoints written
    import os
    assert not os.path.exists(tmp_path / "model")


def test_eval_with_rerank(tmp_path):
    eng = _engine()
    with contextlib.redirect_stdout(io.StringIO()) as buf:
        rank1 = eng.run(save_dir=str(tmp_path), max_epoch=1, test_only=True,
                        ranks=(1,), rerank=True)
    assert np.isfinite(rank1)
    assert "re-ranking" in buf.getvalue()


def test_accum_steps_matches_manual_microbatching():
    """cfg.train.accum_steps=2: the one jitted step must equal the manual
    semantics — transform the full batch, split in half, chain BN stats
    through the halves, average the two grads, one optimizer update.
    f32 compute so lax.scan-vs-unrolled reorder noise stays ~1e-6 and the
    tolerance keeps real discriminative power (bf16 noise is ~3e-3)."""
    import optax


    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=8,
        batch_size_test=8, workers=0, train_sampler="RandomIdentitySampler",
        num_instances=4, num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False, dtype="float32")
    tx = build_optimizer(optim="sgd", lr=0.1, momentum=0.9, weight_decay=5e-4)
    # 1-device mesh: the manual oracle below runs EAGER grad/forward calls.
    # Eager ops over dp-sharded arrays launch per-op cross-device all-reduces
    # (BN stats) whose 40 s rendezvous aborts the process when the single CPU
    # core is contended. Multi-device coverage lives in test_multichip.py.
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("data",))
    eng_a = ImageSoftmaxEngine(dm, model, optimizer=tx, mesh=mesh,
                               scheduler=lambda e: 0.1, seed=0, accum_steps=2)
    eng_b = ImageSoftmaxEngine(dm, model, optimizer=tx, mesh=mesh,
                               scheduler=lambda e: 0.1, seed=0)

    data = next(iter(dm.train_loader))
    imgs, pids = eng_a._put_batch(data)
    key = jax.random.PRNGKey(0)
    step = eng_a._build_train_step()
    new_state, metrics = step(eng_a.state, imgs, pids, key, 0.1, None, None)
    assert np.isfinite(float(metrics["loss"]))

    # manual oracle on the untouched twin engine
    imgs_t = eng_b._transform_train(key, imgs)

    def loss_fn(p, s, im, pd):
        out, ns = eng_b._forward_train(p, s, im)
        loss, _ = eng_b.compute_loss(out, pd)
        return loss, ns

    g = jax.grad(loss_fn, has_aux=True)
    p0, s0 = eng_b.state.params, eng_b.state.batch_stats
    g1, s1 = g(p0, s0, imgs_t[:4], pids[:4])
    g2, s2 = g(p0, s1, imgs_t[4:], pids[4:])
    grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)
    opt_state = eng_b.state.opt_state
    opt_state.hyperparams["learning_rate"] = 0.1
    updates, _ = tx.update(grads, opt_state, p0)
    want_params = optax.apply_updates(p0, updates)

    for path_got, path_want in zip(
        jax.tree_util.tree_leaves_with_path(new_state.params),
        jax.tree_util.tree_leaves_with_path(want_params),
    ):
        np.testing.assert_allclose(
            np.asarray(path_got[1]), np.asarray(path_want[1]),
            rtol=1e-4, atol=5e-5, err_msg=str(path_got[0]))
    for got, want in zip(jax.tree_util.tree_leaves(new_state.batch_stats),
                         jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_accum_steps_must_divide_batch():
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=8,
        batch_size_test=8, workers=0, train_sampler="RandomIdentitySampler",
        num_instances=4, num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    tx = build_optimizer(optim="sgd", lr=0.1)
    eng = ImageSoftmaxEngine(dm, model, optimizer=tx,
                             scheduler=lambda e: 0.1, seed=0, accum_steps=3)

    data = next(iter(dm.train_loader))
    imgs, pids = eng._put_batch(data)
    step = eng._build_train_step()
    with pytest.raises(ValueError, match="divisible"):
        step(eng.state, imgs, pids, jax.random.PRNGKey(0), 0.1, None, None)
    with pytest.raises(ValueError, match="accum_steps"):
        ImageSoftmaxEngine(dm, model, optimizer=tx, scheduler=lambda e: 0.1,
                           seed=0, accum_steps=0)


def test_weight_m_warmup_schedule_and_injection():
    """cfg.loss.weight_m_warmup: weight_m ramps 0 -> target over the first N
    epochs as a TRACED hyperparam — loss is exactly base + wm*LossM at every
    ramp point, the jitted step takes the dict without retracing, and
    warmup=0 preserves the reference behavior (no hp, baked constant)."""
    from ieee_tpu.engine import Image3MEngine

    dm = ImageDataManager(
        sources="synthetic_mm", height=32, width=16, batch_size_train=8,
        batch_size_test=8, workers=0, train_sampler="RandomIdentitySampler",
        num_instances=4, num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("ieee3modalPart", num_classes=dm.num_train_pids,
                        loss="margin", pretrained=False,
                        backbone_layers=(1, 1, 1, 1))
    tx = build_optimizer(optim="sgd", lr=0.1)
    # 1-device mesh: see test_accum_steps_matches_manual_microbatching —
    # the eager _forward_train below must not launch per-op collectives.
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("data",))
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=lambda e: 0.1,
                        seed=0, mesh=mesh, weight_m=2.0, weight_m_warmup=4)

    # schedule shape (epoch is 0-based: first epoch pure CE, full at N)
    assert eng.loss_hparams(0) == {"weight_m": 0.0}
    assert eng.loss_hparams(2) == {"weight_m": 1.0}
    assert eng.loss_hparams(4) == {"weight_m": 2.0}
    assert eng.loss_hparams(9) == {"weight_m": 2.0}

    data = next(iter(dm.train_loader))
    imgs, pids = eng._put_batch(data)
    key = jax.random.PRNGKey(0)
    out, _ = eng._forward_train(eng.state.params, eng.state.batch_stats,
                                eng._transform_train(key, imgs))
    loss0, m0 = eng.compute_loss(out, pids, {"weight_m": 0.0})
    loss_half, _ = eng.compute_loss(out, pids, {"weight_m": 1.0})
    assert float(m0["LossM"]) > 0
    np.testing.assert_allclose(float(loss_half),
                               float(loss0) + 1.0 * float(m0["LossM"]),
                               rtol=1e-5)

    # the jitted step accepts the hp dict; two ramp values, one trace
    step = eng._build_train_step()
    s1, met1 = step(eng.state, imgs, pids, key, 0.1, None, None,
                    {"weight_m": 0.0})
    _, met2 = step(s1, imgs, pids, key, 0.1, None, None, {"weight_m": 2.0})
    assert np.isfinite(float(met1["loss"])) and np.isfinite(float(met2["loss"]))
    if hasattr(step, "_cache_size"):
        assert step._cache_size() == 1

    # warmup disabled -> no hp, reference-identical path
    eng_ref = Image3MEngine(dm, model, optimizer=tx, scheduler=lambda e: 0.1,
                            seed=0, weight_m=2.0)
    assert eng_ref.loss_hparams(0) is None
    loss_ref, _ = eng_ref.compute_loss(out, pids)
    loss_full, _ = eng.compute_loss(out, pids, {"weight_m": 2.0})
    np.testing.assert_allclose(float(loss_ref), float(loss_full), rtol=1e-6)
