"""Structural test for the reference IEEE checkpoint converter: fabricate a
torch-style state_dict with the reference's module names/shapes, convert,
and require the result to align leaf-for-leaf with our model's init tree."""

import numpy as np
import pytest

import jax

from ieee_tpu.models import build_model
from ieee_tpu.models.ieee_converter import convert_ieee_torch_checkpoint


def _fake_reference_state_dict(parts=6, num_classes=7, rng=None):
    """Emit the reference ieee3modalPart state_dict names
    (``torchreid/models/ieee3modalPart.py`` module structure) with
    correctly-shaped random tensors (numpy stands in for torch tensors)."""
    rng = np.random.default_rng(rng)
    sd = {}

    def add(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32)

    def add_bn(prefix, c):
        add(f"{prefix}.weight", c)
        add(f"{prefix}.bias", c)
        sd[f"{prefix}.running_mean"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = (
            np.abs(rng.standard_normal(c)) + 0.5
        ).astype(np.float32)

    # trunks (torchvision resnet50 names under backbone.{i}.)
    layers = (3, 4, 6, 3)
    for i in range(3):
        p = f"backbone.{i}"
        add(f"{p}.conv1.weight", 64, 3, 7, 7)
        add_bn(f"{p}.bn1", 64)
        in_ch = 64
        for stage, n in enumerate(layers, start=1):
            planes = 64 * 2 ** (stage - 1)
            for b in range(n):
                q = f"{p}.layer{stage}.{b}"
                add(f"{q}.conv1.weight", planes, in_ch, 1, 1)
                add_bn(f"{q}.bn1", planes)
                add(f"{q}.conv2.weight", planes, planes, 3, 3)
                add_bn(f"{q}.bn2", planes)
                add(f"{q}.conv3.weight", planes * 4, planes, 1, 1)
                add_bn(f"{q}.bn3", planes * 4)
                if b == 0:
                    add(f"{q}.downsample.0.weight", planes * 4, in_ch, 1, 1)
                    add_bn(f"{q}.downsample.1", planes * 4)
                in_ch = planes * 4

    for i in range(3):
        for mod in (f"convOne.{i}.layers", f"convAvgRest.{i}.layers"):
            add(f"{mod}.0.weight", 2048, 2048, 1, 1)
            add_bn(f"{mod}.1", 2048)
        add(f"reduce_layer.{i}.layers.0.weight", 768, 2048, 1, 1)
        add_bn(f"reduce_layer.{i}.layers.1", 768)
        add(f"CA.{i}.fc.0.weight", 128, 2048, 1, 1)
        add(f"CA.{i}.fc.2.weight", 2048, 128, 1, 1)
        for nm in ("conv_query", "conv_part", "conv_value"):
            add(f"REM.{i}.{nm}.weight", 768, 768)
            add(f"REM.{i}.{nm}.bias", 768)
        sd[f"REM.{i}.param"] = np.asarray([0.25], np.float32)

    for m in "RNT":
        for p in range(parts):
            add(f"fc_{m}.{p}.0.weight", 128, 768)
            add(f"fc_{m}.{p}.0.bias", 128)
            add_bn(f"fc_{m}.{p}.1", 128)
            add(f"classifier_{m}.{p}.weight", num_classes, 128)
            add(f"classifier_{m}.{p}.bias", num_classes)
    return sd


def test_ieee_converter_structure_matches_model():
    sd = _fake_reference_state_dict()
    params, stats = convert_ieee_torch_checkpoint(sd, parts=6)

    m = build_model("ieee3modalPart", num_classes=7, loss="margin",
                    pretrained=False)
    v = m.init_variables(0, batch=1, height=64, width=32)

    def flat(tree):
        return {
            jax.tree_util.keystr(k): tuple(np.shape(x))
            for k, x in jax.tree_util.tree_leaves_with_path(tree)
        }

    ours_p, conv_p = flat(v["params"]), flat(params)
    ours_s, conv_s = flat(v["batch_stats"]), flat(stats)
    assert ours_p == conv_p, (
        f"missing={set(ours_p) - set(conv_p)} "
        f"extra={set(conv_p) - set(ours_p)} "
        f"mismatch={[k for k in ours_p if k in conv_p and ours_p[k] != conv_p[k]]}"
    )
    assert ours_s == conv_s

    # spot-check value routing: REM gamma and fc stacking order
    np.testing.assert_allclose(np.asarray(params["REM_0"]["gamma"]), [0.25])
    np.testing.assert_allclose(
        np.asarray(params["fc_R"]["kernel"][2]),
        np.asarray(sd["fc_R.2.0.weight"]).T,
    )
    np.testing.assert_allclose(
        np.asarray(stats["fc_T"]["bn"]["mean"][128 * 3: 128 * 4]),
        np.asarray(sd["fc_T.3.1.running_mean"]),
    )
