"""End-to-end smoke tests: full train + eval loops on synthetic data (CPU).

This is the test the reference never had (SURVEY §4): a 1-epoch train-step
smoke covering config -> data -> model -> loss -> optimizer -> eval protocol.
"""

import numpy as np
import pytest

from ieee_tpu.data import ImageDataManager
from ieee_tpu.engine import (
    Image3MEngine,
    ImageSoftmaxEngine,
    MultiModalImageSoftmaxEngine,
)
from ieee_tpu.models import build_model
from ieee_tpu.optim import build_lr_scheduler, build_optimizer

pytestmark = pytest.mark.e2e


def _make_dm(sources="synthetic", batch=8, **kw):
    return ImageDataManager(
        sources=sources, height=64, width=32, batch_size_train=batch,
        batch_size_test=16, workers=0, train_sampler="RandomIdentitySampler",
        num_instances=4, num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
        **kw,
    )


def test_single_modal_softmax_train_and_eval(tmp_path):
    dm = _make_dm("synthetic")
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    tx = build_optimizer(optim="sgd", lr=0.01, momentum=0.9, sgd_nesterov=True)
    sched = build_lr_scheduler("single_step", stepsize=20, base_lr=0.01)
    eng = ImageSoftmaxEngine(dm, model, optimizer=tx, scheduler=sched, seed=0)

    rank1 = eng.run(save_dir=str(tmp_path), max_epoch=1, eval_freq=1,
                    print_freq=1, ranks=(1, 5))
    assert 0.0 <= rank1 <= 1.0
    # checkpoint written (including the final epoch — our divergence fix)
    import os
    assert any(f.startswith("model.msgpack-") for f in
               os.listdir(tmp_path / "model"))


def _run_save_freq_case(tmp_path, eval_freq, save_freq, save_best,
                        eval_values, max_epoch):
    """Drive Engine.run with a scripted eval (deterministic is_best) and
    return the saved epoch numbers."""
    import os

    dm = _make_dm("synthetic")
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    tx = build_optimizer(optim="sgd", lr=0.01, momentum=0.9)
    sched = build_lr_scheduler("single_step", stepsize=20, base_lr=0.01)
    eng = ImageSoftmaxEngine(dm, model, optimizer=tx, scheduler=sched, seed=0)
    vals = iter(eval_values)
    eng.test = lambda **kw: next(vals)

    eng.run(save_dir=str(tmp_path), max_epoch=max_epoch, eval_freq=eval_freq,
            save_freq=save_freq, save_best=save_best, print_freq=10,
            ranks=(1,))
    return sorted(
        int(f.rsplit("-", 1)[1]) for f in os.listdir(tmp_path / "model")
        if f.startswith("model.msgpack-") and not f.endswith(".json"))


def test_save_freq_decouples_checkpoints_from_evals(tmp_path):
    """save_freq (TPU extra: full-state saves are ~1.6 GB device pulls)
    checkpoints every N epochs INDEPENDENT of eval cadence; best-eval
    epochs and the final epoch also save."""
    import os

    # evals at 3 and 6 (scripted: 6 is NOT an improvement); saves at 2, 4
    # (freq, non-eval epochs), 3 (first eval is always best) and 6 (final)
    saved = _run_save_freq_case(tmp_path, eval_freq=3, save_freq=2,
                                save_best=True, eval_values=[10.0, 5.0],
                                max_epoch=6)
    assert saved == [2, 3, 4, 6], saved
    assert os.path.exists(tmp_path / "model" / "model-best.msgpack")


def test_save_freq_save_best_false_skips_best_pull(tmp_path):
    """save_best=False (what tools/train_e2e.py passes: the artifact is
    metrics.jsonl, checkpoints exist only for resume) drops the best-eval
    save; only freq and final epochs checkpoint."""
    saved = _run_save_freq_case(tmp_path, eval_freq=3, save_freq=2,
                                save_best=False, eval_values=[10.0, 5.0],
                                max_epoch=6)
    assert saved == [2, 4, 6], saved


def test_loss_decreases_single_modal():
    dm = _make_dm("synthetic")
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    tx = build_optimizer(optim="sgd", lr=0.05, momentum=0.9)
    eng = ImageSoftmaxEngine(dm, model, optimizer=tx,
                             scheduler=lambda e: 0.05, seed=0)
    eng.max_epoch = 3
    losses = []
    for epoch in range(3):
        eng.epoch = epoch
        import io, contextlib

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            eng.train(print_freq=1000)
        # read final loss from the meter
        losses.append(eng_last_loss(eng))
    assert losses[-1] < losses[0]


def eng_last_loss(eng):
    # re-run one batch to probe current loss level
    import jax

    data = next(iter(eng.train_loader))
    imgs, pids = eng._put_batch(data)
    eng.state, metrics = eng._train_step_fn(eng.state, imgs, pids,
                                            jax.random.PRNGKey(123), 0.0, None)
    return float(metrics["loss"])


@pytest.mark.parametrize("engine_cls,loss_name", [
    (MultiModalImageSoftmaxEngine, "softmax"),
    (Image3MEngine, "margin"),
])
def test_multimodal_engines_train_step(engine_cls, loss_name, tmp_path):
    dm = _make_dm("synthetic_mm")
    model = build_model("ieee3modalPart", num_classes=dm.num_train_pids,
                        loss=loss_name, pretrained=False,
                        backbone_layers=(1, 1, 1, 1))
    tx = build_optimizer(optim="sgd", lr=0.001, momentum=0.9)
    sched = build_lr_scheduler("multi_step", stepsize=[20, 40], base_lr=0.001)
    kwargs = dict(margin=1.0, weight_m=1.0, weight_x=1.0) \
        if loss_name == "margin" else {}
    eng = engine_cls(dm, model, optimizer=tx, scheduler=sched, seed=0,
                     **kwargs)

    # single train epoch + eval (tiny), exercising the full loop
    rank1 = eng.run(save_dir=str(tmp_path), max_epoch=1, eval_freq=-1,
                    print_freq=2, ranks=(1,))
    assert np.isfinite(rank1)


def test_k_tfm_train_step_e2e():
    """k_tfm=2: two augmentation draws per image fold into the batch
    (reference ``dataset.py:304-317``); the (P, K*k_tfm) loss contract holds
    and a full train step runs with finite loss."""
    import jax


    dm = _make_dm("synthetic_mm", k_tfm=2)
    model = build_model("ieee3modalPart", num_classes=dm.num_train_pids,
                        loss="margin", pretrained=False,
                        backbone_layers=(1, 1, 1, 1))
    tx = build_optimizer(optim="sgd", lr=0.001, momentum=0.9)
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=lambda e: 0.001,
                        margin=1.0, seed=0)
    assert eng.num_instances == 8  # 4 sampler instances x 2 draws

    data = next(iter(dm.train_loader))
    imgs, pids = eng._put_batch(data)
    step_fn = eng._build_train_step()
    eng.state, metrics = step_fn(eng.state, imgs, pids, jax.random.PRNGKey(0),
                                 0.001, None)
    assert np.isfinite(float(metrics["loss"]))


def test_engine_eval_step_uses_fused_path_and_matches_flax():
    """With cfg.tpu.fused_eval the engine dispatches full-IEEE eval to the
    fused folded-BN + Pallas part-pool path; features must match the plain
    flax apply (the two paths differ only in bf16 rounding). Plain flax is
    the DEFAULT (measured faster on v5e; VERDICT r2 item 3)."""
    from ieee_tpu.models.fast_eval import supports_fast_eval

    dm = _make_dm("synthetic_mm")
    model = build_model("ieee3modalPart", num_classes=dm.num_train_pids,
                        loss="margin", pretrained=False,
                        backbone_layers=(1, 1, 1, 1))
    tx = build_optimizer(optim="sgd", lr=0.001)
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=lambda e: 0.001,
                        seed=0, fused_eval=True)
    assert supports_fast_eval(model.module)

    data = next(iter(dm.test_loader["synthetic_mm"]["query"]))
    imgs = tuple(np.asarray(m) for m in data["img"])
    fused = np.asarray(eng.extract_features(imgs), np.float32)

    tfm = dm.transform_te
    ref = model.module.apply(
        {"params": eng.state.params, "batch_stats": eng.state.batch_stats},
        tuple(tfm(m) for m in imgs), train=False,
    )
    np.testing.assert_allclose(fused, np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)

    # ablation without REM falls back to the flax path
    model_ab = build_model("ieee3modalPart", num_classes=dm.num_train_pids,
                           loss="margin", pretrained=False,
                           backbone_layers=(1, 1, 1, 1), using_REM=False)
    assert not supports_fast_eval(model_ab.module)


def test_eval_feature_dim_is_2304():
    dm = _make_dm("synthetic_mm")
    model = build_model("ieee3modalPart", num_classes=dm.num_train_pids,
                        loss="margin", pretrained=False,
                        backbone_layers=(1, 1, 1, 1))
    tx = build_optimizer(optim="sgd", lr=0.001)
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=lambda e: 0.001,
                        seed=0)
    qf, q_pids, q_camids = eng._feature_extraction(
        dm.test_loader["synthetic_mm"]["query"]
    )
    assert qf.shape[1] == 2304
    assert len(q_pids) == qf.shape[0]
