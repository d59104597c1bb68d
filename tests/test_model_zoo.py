"""Shape smoke tests for the wider model zoo."""

import numpy as np
import pytest

import jax

from ieee_tpu.models import build_model

pytestmark = pytest.mark.e2e


def _rand_inputs(m, b=2, h=64, w=32, seed=0):
    key = jax.random.PRNGKey(seed)
    if m.num_streams == 1:
        return jax.random.normal(key, (b, h, w, 3))
    return tuple(
        jax.random.normal(jax.random.fold_in(key, i), (b, h, w, 3))
        for i in range(m.num_streams)
    )


def test_pfnet_shapes():
    m = build_model("pfnet", num_classes=7, loss="softmax", pretrained=False,
                    backbone_layers=(1, 1, 1, 1))
    v = m.init_variables(0, batch=2, height=64, width=32)
    x = _rand_inputs(m)
    feat = m.apply(v, x, train=False)
    assert feat.shape == (2, 2560)  # 5 branches x 2 parts x 256
    out, _ = m.apply(v, x, train=True)
    assert out["logits_RGB"].shape == (2, 2, 7)
    assert out["logits_all"].shape == (2, 7)


def test_osnet_shapes():
    m = build_model("osnet_x0_25", num_classes=7, loss="softmax",
                    pretrained=False)
    v = m.init_variables(0, batch=2, height=64, width=32)
    x = _rand_inputs(m)
    feat = m.apply(v, x, train=False)
    assert feat.shape == (2, 512)
    out, _ = m.apply(v, x, train=True)
    assert out.shape == (2, 7)


def test_osnet_triplet_output():
    m = build_model("osnet_x0_25", num_classes=5, loss="triplet",
                    pretrained=False)
    v = m.init_variables(0, batch=2, height=64, width=32)
    y, feat = m.apply(v, _rand_inputs(m), train=True)[0]
    assert y.shape == (2, 5)
    assert feat.shape == (2, 512)


ZOO_SMALL = [
    # (name, feat_dim, input_hw)
    ("se_resnet50", 2048, (64, 32)),
    ("densenet121", 1024, (64, 32)),
    ("mobilenetv2_x1_0", 1280, (64, 32)),
    ("shufflenet_v2_x0_5", 1024, (64, 32)),
    ("squeezenet1_0", 512, (64, 32)),
    ("resnet50_ibn_a", 2048, (64, 32)),
    ("resnet50_ibn_b", 2048, (64, 32)),
    ("mlfn", 1024, (64, 32)),
    ("mudeep", 4096, (256, 128)),
    ("hacnn", 1024, (160, 64)),
    ("resnet50mid", 3072, (64, 32)),
]


@pytest.mark.parametrize("name,feat_dim,hw", ZOO_SMALL)
def test_zoo_model_shapes(name, feat_dim, hw):
    m = build_model(name, num_classes=7, loss="softmax", pretrained=False)
    v = m.init_variables(0, batch=2, height=hw[0], width=hw[1])
    x = _rand_inputs(m, b=2, h=hw[0], w=hw[1])
    feat = m.apply(v, x, train=False)
    assert feat.shape == (2, feat_dim), f"{name}: {feat.shape}"
    out, _ = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    logits = out[0] if isinstance(out, tuple) else out
    assert logits.shape[-1] == 7


def test_pcb_shapes():
    m = build_model("pcb_p6", num_classes=7, loss="softmax", pretrained=False,
                    backbone_layers=(1, 1, 1, 1))
    v = m.init_variables(0, batch=2, height=64, width=32)
    x = _rand_inputs(m)
    feat = m.apply(v, x, train=False)
    assert feat.shape == (2, 6 * 2048)
    out, _ = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out.shape == (2, 6, 7)


ZOO_LARGE = [
    ("xception", 2048, (64, 32)),
    ("shufflenet", 960, (64, 32)),
    ("inceptionv4", 1536, (160, 64)),
    ("inceptionresnetv2", 1536, (160, 64)),
    ("osnet_ain_x0_25", 512, (64, 32)),
    ("osnet_ibn_x1_0", 512, (64, 32)),
]


@pytest.mark.parametrize("name,feat_dim,hw", ZOO_LARGE)
def test_zoo_large_model_shapes(name, feat_dim, hw):
    m = build_model(name, num_classes=5, loss="softmax", pretrained=False)
    v = m.init_variables(0, batch=2, height=hw[0], width=hw[1])
    x = _rand_inputs(m, b=2, h=hw[0], w=hw[1])
    feat = m.apply(v, x, train=False)
    assert feat.shape == (2, feat_dim), f"{name}: {feat.shape}"


def test_nasnet_shapes():
    m = build_model("nasnetamobile", num_classes=5, loss="softmax",
                    pretrained=False)
    v = m.init_variables(0, batch=2, height=64, width=32)
    x = _rand_inputs(m, b=2, h=64, w=32)
    feat = m.apply(v, x, train=False)
    assert feat.shape == (2, 1056)


def test_resnet50_ieee_3modal_trunk_shapes():
    """The 3-modal fusion trunk variant (reference resnet.py:639-880):
    forward(rest[, one_feat]) -> layer-4 map; the reference's per-stage
    fusion is dead code in its own forward, so only the trunk + a discarded
    side branch remain."""
    m = build_model("resnet50_ieee_3modal", num_classes=5, loss="softmax",
                    pretrained=False)
    v = m.init_variables(0, batch=2, height=64, width=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 32, 3))
    fmap = m.module.apply(v, x, train=False)
    # last_stride=1: 64x32 -> 4x2 map, 2048 channels
    assert fmap.shape == (2, 4, 2, 2048)
    # the one_feat side branch runs (and is discarded) without changing out
    one = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 1, 2048))
    fmap2 = m.module.apply(v, x, one_feat=one, train=False)
    np.testing.assert_allclose(np.asarray(fmap2), np.asarray(fmap),
                               rtol=1e-5, atol=1e-5)
