"""Full-model numerical parity: reference-style torch IEEE forward (eval)
vs our flax model on CONVERTED weights.

The torch side re-implements the reference's eval forward functionally
(``ieee3modalPart.py:439-505``): 3 trunks -> CIM (+channel attention) ->
adaptive part/global pooling -> shared reduce -> REM nonLocal -> per-part
FC necks -> fc_all = [T, R, N]. Weights come from the fabricated
reference-format state_dict, converted by ``convert_ieee_torch_checkpoint``.
This is the direct evidence for checkpoint-level mAP parity.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ieee_tpu.models import build_model
from ieee_tpu.models.ieee_converter import convert_ieee_torch_checkpoint
from tests.test_ieee_converter import _fake_reference_state_dict
from tests.test_models import _torch_trunk_forward

PARTS = 6


def _t(sd, name):
    return torch.tensor(np.asarray(sd[name]))


def _bn2d(sd, prefix, x):
    return F.batch_norm(
        x, _t(sd, f"{prefix}.running_mean"), _t(sd, f"{prefix}.running_var"),
        _t(sd, f"{prefix}.weight"), _t(sd, f"{prefix}.bias"),
        training=False, eps=1e-5,
    )


def _convbn_relu(sd, prefix, x):
    h = F.conv2d(x, _t(sd, f"{prefix}.0.weight"))
    return F.relu(_bn2d(sd, f"{prefix}.1", h))


def _channel_attention(sd, i, x):
    avg = F.adaptive_avg_pool2d(x, 1)
    mx = F.adaptive_max_pool2d(x, 1)
    w1, w2 = _t(sd, f"CA.{i}.fc.0.weight"), _t(sd, f"CA.{i}.fc.2.weight")
    mlp = lambda v: F.conv2d(F.relu(F.conv2d(v, w1)), w2)
    return torch.sigmoid(mlp(avg) + mlp(mx))


def _rem(sd, i, query, part):
    """reference nonLocal forward, verbatim math (ieee3modalPart.py:60-80)."""
    lin = lambda nm, v: F.linear(v, _t(sd, f"REM.{i}.{nm}.weight"),
                                 _t(sd, f"REM.{i}.{nm}.bias"))
    f_query = lin("conv_query", query).unsqueeze(1)
    f_part = lin("conv_part", part).unsqueeze(2)
    energy = torch.matmul(f_query, f_part)
    similarity = torch.softmax(energy, dim=-1)
    f_value = torch.matmul(f_part, similarity) + f_part
    gamma = _t(sd, f"REM.{i}.param")
    final = query.unsqueeze(2) + torch.matmul(f_value, gamma.unsqueeze(0))
    return final.squeeze(2)


def _torch_ieee_eval(sd, imgs):
    """imgs: list of 3 NCHW tensors (R, N, T)."""
    maps = [
        _torch_trunk_forward(
            {k[len(f"backbone.{i}."):]: _t(sd, k) for k in sd
             if k.startswith(f"backbone.{i}.")},
            imgs[i], "bottleneck", (3, 4, 6, 3), last_stride=1,
        )
        for i in range(3)
    ]

    def cim(one, r1, r2, i):
        f_one = _convbn_relu(sd, f"convOne.{i}.layers", one)
        f_rest = _convbn_relu(sd, f"convAvgRest.{i}.layers", r1 + r2)
        gate = _channel_attention(sd, i, f_rest)
        return f_one + gate * f_rest + f_rest

    pooled = [cim(maps[0], maps[1], maps[2], 0),
              cim(maps[1], maps[0], maps[2], 1),
              cim(maps[2], maps[0], maps[1], 2)]

    fc_all_blocks = {}
    for i, m in enumerate("RNT"):
        g = _convbn_relu(sd, f"reduce_layer.{i}.layers",
                         F.adaptive_avg_pool2d(maps[i], (1, 1)))
        p = _convbn_relu(sd, f"reduce_layer.{i}.layers",
                         F.adaptive_avg_pool2d(pooled[i], (PARTS, 1)))
        g = g.flatten(1)  # (B, 768)
        parts = [p[:, :, j, :].flatten(1) for j in range(PARTS)]
        parts = [_rem(sd, i, part, g) for part in parts]
        fcs = []
        for j, part in enumerate(parts):
            h = F.linear(part, _t(sd, f"fc_{m}.{j}.0.weight"),
                         _t(sd, f"fc_{m}.{j}.0.bias"))
            h = F.batch_norm(
                h, _t(sd, f"fc_{m}.{j}.1.running_mean"),
                _t(sd, f"fc_{m}.{j}.1.running_var"),
                _t(sd, f"fc_{m}.{j}.1.weight"), _t(sd, f"fc_{m}.{j}.1.bias"),
                training=False, eps=1e-5,
            )
            fcs.append(F.relu(h))
        fc_all_blocks[m] = torch.cat(fcs, dim=1)
    return torch.cat([fc_all_blocks["T"], fc_all_blocks["R"],
                      fc_all_blocks["N"]], dim=1)


def test_full_ieee_eval_parity_on_converted_weights():
    sd = _fake_reference_state_dict(parts=PARTS, num_classes=7, rng=0)
    # tame the random BN/conv magnitudes for numerical comparability
    for k in list(sd):
        if k.endswith(".weight") and sd[k].ndim == 4:
            sd[k] = (sd[k] * 0.05).astype(np.float32)
        if k.endswith("running_var"):
            sd[k] = np.ones_like(sd[k])

    params, stats = convert_ieee_torch_checkpoint(sd, parts=PARTS)
    m = build_model("ieee3modalPart", num_classes=7, loss="margin",
                    pretrained=False, dtype=jnp.float32)
    variables = {"params": params, "batch_stats": stats}

    rng = np.random.default_rng(1)
    imgs_np = [rng.standard_normal((2, 96, 32, 3)).astype(np.float32)
               for _ in range(3)]

    ours = np.asarray(
        m.apply(variables, tuple(jnp.asarray(x) for x in imgs_np),
                train=False)
    )

    timgs = [torch.tensor(np.transpose(x, (0, 3, 1, 2))) for x in imgs_np]
    with torch.no_grad():
        theirs = _torch_ieee_eval(sd, timgs).numpy()

    assert ours.shape == theirs.shape == (2, 2304)
    np.testing.assert_allclose(ours, theirs, rtol=1e-2, atol=1e-2)
    cos = (ours * theirs).sum(1) / (
        np.linalg.norm(ours, axis=1) * np.linalg.norm(theirs, axis=1) + 1e-12)
    assert (cos > 0.9999).all()
