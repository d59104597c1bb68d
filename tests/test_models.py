"""Model shape tests + numeric parity of the ResNet trunk vs a torch
functional implementation on identical weights (validates NHWC conv/BN/pool
semantics AND the torch->flax converter mapping)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ieee_tpu.models import build_model, show_avai_models
from ieee_tpu.models.converter import convert_torch_trunk, graft_trunk
from ieee_tpu.models.resnet import ResNetTrunk


def test_registry():
    avail = show_avai_models()
    for name in ("resnet50", "resnet18", "resnet50_fc512", "ieee3modalPart"):
        assert name in avail
    with pytest.raises(KeyError):
        build_model("nope", 10)


@pytest.mark.parametrize("loss,n_out", [("softmax", 1), ("triplet", 2)])
def test_reid_resnet_outputs(loss, n_out):
    m = build_model("resnet18", num_classes=7, loss=loss, pretrained=False)
    v = m.init_variables(0, batch=2, height=64, width=32)
    x = m.dummy_input(2, 64, 32)
    feat = m.apply(v, x, train=False)
    assert feat.shape == (2, 512)
    out, _ = m.apply(v, x, train=True)
    if n_out == 1:
        assert out.shape == (2, 7)
    else:
        assert out[0].shape == (2, 7) and out[1].shape == (2, 512)


def test_ieee_model_shapes():
    m = build_model("ieee3modalPart", num_classes=9, loss="margin",
                    pretrained=False, backbone_layers=(1, 1, 1, 1))
    v = m.init_variables(0, batch=2, height=64, width=32)
    key = jax.random.PRNGKey(7)
    x = tuple(
        jax.random.normal(jax.random.fold_in(key, i), (2, 64, 32, 3))
        for i in range(3)
    )
    feat = m.apply(v, x, train=False)
    assert feat.shape == (2, 6 * 128 * 3)  # T,R,N concat = 2304-d at parts=6
    out, updates = m.apply(v, x, train=True)
    assert out["logits_R"].shape == (2, 6, 9)
    assert out["feat_T"].shape == (2, 768)
    # normalized per-modality features
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["feat_R"]), axis=1), 1.0, rtol=1e-3
    )
    assert "batch_stats" in updates


def test_ieee_ablation_flags():
    # base (no CIM, no REM) must still produce the same output shapes
    m = build_model(
        "ieee3modalPart", num_classes=5, loss="softmax", pretrained=False,
        interaction=False, attention=False, using_REM=False,
        backbone_layers=(1, 1, 1, 1),
    )
    v = m.init_variables(0, batch=2, height=64, width=32)
    feat = m.apply(v, m.dummy_input(2, 64, 32), train=False)
    assert feat.shape == (2, 2304)
    # CIM params must not exist when interaction=False
    assert not any("convOne" in k for k in v["params"])


def test_ieee_last_stride_featuremap():
    m = build_model("ieee3modalPart", num_classes=5, loss="softmax",
                    pretrained=False, backbone_layers=(1, 1, 1, 1))
    v = m.init_variables(0, batch=1, height=256, width=128)
    maps = m.apply(v, m.dummy_input(1, 256, 128), train=False,
                   return_featuremaps=True)
    assert maps[0].shape == (1, 16, 8, 2048)  # last_stride=1 keeps 16x8


# ---------------------------------------------------------------------------
# torch parity
# ---------------------------------------------------------------------------

def _flax_to_torch_sd(params, stats, block, layers):
    """Inverse of convert_torch_trunk: emit a torchvision-style state_dict."""
    import torch

    sd = {}

    def k2t(w):  # HWIO -> OIHW
        return torch.tensor(np.transpose(np.asarray(w), (3, 2, 0, 1)))

    def put_bn(tname, p, s):
        sd[f"{tname}.weight"] = torch.tensor(np.asarray(p["scale"]))
        sd[f"{tname}.bias"] = torch.tensor(np.asarray(p["bias"]))
        sd[f"{tname}.running_mean"] = torch.tensor(np.asarray(s["mean"]))
        sd[f"{tname}.running_var"] = torch.tensor(np.asarray(s["var"]))

    sd["conv1.weight"] = k2t(params["stem"]["conv"]["kernel"])
    put_bn("bn1", params["stem"]["bn"], stats["stem"]["bn"])
    conv_map = (
        {"conv1": ("cb1", "bn1"), "conv2": ("conv2", "bn2"), "conv3": ("cb3", "bn3")}
        if block == "bottleneck"
        else {"conv1": ("cb1", "bn1"), "conv2": ("cb2", "bn2")}
    )
    for stage, n in enumerate(layers, start=1):
        for b in range(n):
            fp = params[f"layer{stage}_{b}"]
            fs = stats[f"layer{stage}_{b}"]
            for tconv, (fmod, tbn) in conv_map.items():
                if fmod.startswith("cb"):
                    sd[f"layer{stage}.{b}.{tconv}.weight"] = k2t(fp[fmod]["conv"]["kernel"])
                    put_bn(f"layer{stage}.{b}.{tbn}", fp[fmod]["bn"], fs[fmod]["bn"])
                else:
                    sd[f"layer{stage}.{b}.conv2.weight"] = k2t(fp["conv2"]["kernel"])
                    put_bn(f"layer{stage}.{b}.bn2", fp["bn2"], fs["bn2"])
            if "downsample" in fp:
                sd[f"layer{stage}.{b}.downsample.0.weight"] = k2t(
                    fp["downsample"]["conv"]["kernel"]
                )
                put_bn(f"layer{stage}.{b}.downsample.1",
                       fp["downsample"]["bn"], fs["downsample"]["bn"])
    return sd


def _torch_trunk_forward(sd, x, block, layers, last_stride):
    """Standard (torchvision-architecture) ResNet trunk, functional torch."""
    import torch
    import torch.nn.functional as F

    def bn(h, name):
        return F.batch_norm(
            h, sd[f"{name}.running_mean"], sd[f"{name}.running_var"],
            sd[f"{name}.weight"], sd[f"{name}.bias"], training=False, eps=1e-5,
        )

    h = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    h = F.relu(bn(h, "bn1"))
    h = F.max_pool2d(h, 3, stride=2, padding=1)

    expansion = 4 if block == "bottleneck" else 1
    strides = (1, 2, 2, last_stride)
    for stage, (n, s) in enumerate(zip(layers, strides), start=1):
        for b in range(n):
            stride = s if b == 0 else 1
            p = f"layer{stage}.{b}"
            identity = h
            if block == "bottleneck":
                o = F.relu(bn(F.conv2d(h, sd[f"{p}.conv1.weight"]), f"{p}.bn1"))
                o = F.relu(bn(F.conv2d(o, sd[f"{p}.conv2.weight"], stride=stride,
                                       padding=1), f"{p}.bn2"))
                o = bn(F.conv2d(o, sd[f"{p}.conv3.weight"]), f"{p}.bn3")
            else:
                o = F.relu(bn(F.conv2d(h, sd[f"{p}.conv1.weight"], stride=stride,
                                       padding=1), f"{p}.bn1"))
                o = bn(F.conv2d(o, sd[f"{p}.conv2.weight"], padding=1), f"{p}.bn2")
            if f"{p}.downsample.0.weight" in sd:
                identity = bn(
                    F.conv2d(h, sd[f"{p}.downsample.0.weight"], stride=stride),
                    f"{p}.downsample.1",
                )
            h = F.relu(o + identity)
    return h


@pytest.mark.parametrize("block,layers", [("basic", (1, 1, 1, 1)),
                                          ("bottleneck", (1, 1, 1, 1))])
def test_trunk_matches_torch(block, layers):
    import torch

    trunk = ResNetTrunk(block=block, layers=layers, last_stride=1,
                        dtype=jnp.float32)
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 64, 32, 3), jnp.float32)
    variables = trunk.init(jax.random.PRNGKey(0), x, train=False)
    # randomize batch_stats so BN actually does something
    stats = jax.tree_util.tree_map(
        lambda v: jnp.asarray(
            np.random.default_rng(0).uniform(0.5, 1.5, v.shape), jnp.float32
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    flax_out = trunk.apply(variables, x, train=False)  # NHWC

    sd = _flax_to_torch_sd(variables["params"], variables["batch_stats"],
                           block, layers)
    tx = torch.tensor(np.transpose(np.asarray(x), (0, 3, 1, 2)))
    torch_out = _torch_trunk_forward(sd, tx, block, layers, last_stride=1)
    torch_out = np.transpose(torch_out.numpy(), (0, 2, 3, 1))  # NCHW -> NHWC

    np.testing.assert_allclose(np.asarray(flax_out), torch_out, rtol=2e-3,
                               atol=2e-3)


def test_converter_roundtrip():
    """convert_torch_trunk(inverse(params)) == params (mapping bijectivity)."""
    trunk = ResNetTrunk(block="bottleneck", layers=(1, 1, 1, 1), dtype=jnp.float32)
    x = jnp.zeros((1, 64, 32, 3))
    variables = trunk.init(jax.random.PRNGKey(0), x, train=False)
    sd = _flax_to_torch_sd(variables["params"], variables["batch_stats"],
                           "bottleneck", (1, 1, 1, 1))
    params, stats = convert_torch_trunk(sd, "bottleneck", (1, 1, 1, 1))

    flat_orig = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_conv = jax.tree_util.tree_leaves_with_path(params)
    assert len(flat_orig) == len(flat_conv)
    for (p1, v1), (p2, v2) in zip(sorted(flat_orig, key=str),
                                  sorted(flat_conv, key=str)):
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
