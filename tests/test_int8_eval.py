"""w8a8 PTQ inference path (models/int8_eval.py): walker parity vs the flax
eval forward, quantization-error bounds, and engine dispatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ieee_tpu.models import build_model
from ieee_tpu.models.int8_eval import (
    build_int8_ieee_eval_step,
    build_int8_reid_eval_step,
    collect_scales,
    make_trunk_exec,
    supports_int8_eval,
    trunk_forward_int8,
    trunk_forward_ref,
)


def _cos(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / np.maximum(den, 1e-12)


def _trunk_setup(block, layers):
    from ieee_tpu.models.base import ReIDModel
    from ieee_tpu.models.resnet import ReIDResNet

    module = ReIDResNet(num_classes=8, loss="softmax", block=block,
                        layers=layers)
    model = ReIDModel(module=module, name=f"{block}-test", num_classes=8,
                      loss="softmax", num_streams=1,
                      feature_dim=512 * (4 if block == "bottleneck" else 1))
    variables = model.init_variables(jax.random.PRNGKey(0), batch=2,
                                     height=64, width=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32, 3), jnp.float32)
    exec_ = make_trunk_exec(module.block, tuple(module.layers),
                            module.last_stride)
    return model, variables, x, exec_


@pytest.mark.parametrize("block,layers", [("basic", (1, 1, 1, 1)),
                                          ("bottleneck", (1, 1, 1, 1))])
def test_walker_ref_matches_flax_eval(block, layers):
    """The trunk walker replays ResNetTrunk.__call__ over the same param
    tree; folded-BN bf16 must match the flax eval forward to bf16 noise."""
    model, variables, x, exec_ = _trunk_setup(block, layers)
    want = model.module.apply(variables, x, train=False,
                              return_featuremaps=True)
    got = trunk_forward_ref(exec_, variables["params"]["trunk"],
                            variables["batch_stats"]["trunk"], x)
    assert got.shape == want.shape
    c = _cos(np.asarray(got, np.float32).reshape(2, -1),
             np.asarray(want, np.float32).reshape(2, -1))
    assert c.min() > 0.999, c
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.1, atol=0.15)


def test_int8_trunk_close_to_ref():
    model, variables, x, exec_ = _trunk_setup("bottleneck", (1, 1, 1, 1))
    p = variables["params"]["trunk"]
    s = variables["batch_stats"]["trunk"]
    ref = trunk_forward_ref(exec_, p, s, x)
    scales = {k: float(v) for k, v in collect_scales(exec_, p, s, x).items()}
    q = trunk_forward_int8(exec_, p, s, x, scales)
    c = _cos(np.asarray(q, np.float32).reshape(2, -1),
             np.asarray(ref, np.float32).reshape(2, -1))
    assert c.min() > 0.98, c


def test_int8_reid_eval_step_matches_plain():
    model, variables, x, _ = _trunk_setup("basic", (1, 1, 1, 1))
    assert supports_int8_eval(model.module)
    step = build_int8_reid_eval_step(model)
    feats = step(variables["params"], variables["batch_stats"], x)
    plain = model.module.apply(variables, x, train=False)
    assert feats.shape == plain.shape
    c = _cos(np.asarray(feats), np.asarray(plain))
    assert c.min() > 0.98, c
    # second call reuses the calibrated program
    feats2 = step(variables["params"], variables["batch_stats"], x)
    np.testing.assert_array_equal(np.asarray(feats), np.asarray(feats2))


def test_int8_ieee_eval_step_matches_plain():
    model = build_model("ieee3modalPart", num_classes=8, loss="margin",
                        pretrained=False, backbone_layers=(1, 1, 1, 1),
                        parts=2)
    assert supports_int8_eval(model.module)
    variables = model.init_variables(jax.random.PRNGKey(0), batch=2,
                                     height=64, width=32)
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (2, 64, 32, 3), jnp.float32)
        for i in range(3)
    )
    step = build_int8_ieee_eval_step(model)
    feats = step(variables["params"], variables["batch_stats"], imgs)
    plain = model.module.apply(variables, imgs, train=False)
    assert feats.shape == plain.shape
    c = _cos(np.asarray(feats), np.asarray(plain))
    assert c.min() > 0.97, c


def test_int8_rejects_grouped_conv_trunks():
    """resnext* (groups=32) must take the plain fallback: the trunk walker
    replays convs with feature_group_count=1 and would crash otherwise."""
    from ieee_tpu.models import build_model

    for name in ("resnext50_32x4d", "resnext101_32x8d"):
        assert not supports_int8_eval(build_model(name, num_classes=8).module)
    assert supports_int8_eval(build_model("resnet50", num_classes=8).module)


def test_int8_reid_fc_neck_matches_plain():
    """fc512-style neck: quantized trunk + folded-bf16 DenseBNReLU chain."""
    from ieee_tpu.models.base import ReIDModel
    from ieee_tpu.models.resnet import ReIDResNet

    module = ReIDResNet(num_classes=8, loss="softmax", block="basic",
                        layers=(1, 1, 1, 1), fc_dims=[64])
    model = ReIDModel(module=module, name="fc-test", num_classes=8,
                      loss="softmax", num_streams=1, feature_dim=64)
    assert supports_int8_eval(module)
    variables = model.init_variables(jax.random.PRNGKey(0), batch=2,
                                     height=64, width=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32, 3), jnp.float32)
    step = build_int8_reid_eval_step(model)
    feats = step(variables["params"], variables["batch_stats"], x)
    plain = model.module.apply(variables, x, train=False)
    assert feats.shape == plain.shape == (2, 64)
    c = _cos(np.asarray(feats), np.asarray(plain))
    assert c.min() > 0.97, c


def test_feature_extractor_int8():
    from ieee_tpu.utils.feature_extractor import FeatureExtractor

    fe = FeatureExtractor(model_name="resnet18", image_size=(32, 16),
                          pretrained=False, int8=True)
    fe32 = FeatureExtractor(model_name="resnet18", image_size=(32, 16),
                            pretrained=False, seed=0)
    batch = np.random.default_rng(0).integers(
        0, 256, (3, 32, 16, 3), dtype=np.uint8)
    f = np.asarray(fe(batch))
    g = np.asarray(fe32(batch))
    assert f.shape == g.shape == (3, 512)
    assert _cos(f, g).min() > 0.98


def test_engine_dispatches_int8_eval():
    from ieee_tpu.data import ImageDataManager
    from ieee_tpu.engine.image.softmax import ImageSoftmaxEngine
    from ieee_tpu.optim import build_optimizer

    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=8,
        batch_size_test=8, workers=0, num_pids=4, imgs_per_pid=4,
        verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    eng = ImageSoftmaxEngine(dm, model,
                             optimizer=build_optimizer(optim="sgd", lr=0.01),
                             scheduler=lambda e: 0.01, seed=0,
                             int8_eval=True)
    rank1 = eng.test(ranks=(1,))
    assert np.isfinite(rank1)
