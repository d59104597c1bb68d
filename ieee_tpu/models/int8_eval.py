"""Post-training-quantized (w8a8) inference path for the ResNet trunks.

TPU-native serving optimization with no reference analog (the reference's
inference is f32 torch, ``feature_extractor.py``): the v5e MXU runs
s8 x s8 -> s32 at ~2x the bf16 rate, measured on this chip at model shapes
as +24-26% end-rate including requantization (tools/int8_probe.py: conv3x3
110.5 TOP/s vs 88.8 TFLOP/s bf16; dot 71.6 vs 56.6).

Scheme (standard PTQ):
 - eval-mode BatchNorm is folded into each conv (exact);
 - weights: symmetric per-output-channel int8 (absmax/127), quantized
   in-jit from the live f32 params (cost: one pass over the weights);
 - activations: symmetric per-tensor int8 with STATIC per-site scales,
   calibrated once from one representative batch (absmax);
 - conv accumulates in int32 on the MXU, dequantizes in the epilogue
   (y32 * sx*sw[c] + b), residual adds and ReLU stay bf16.

The trunk walker mirrors ``ResNetTrunk.__call__`` (models/resnet.py:199-238)
over the SAME param tree, so it serves any trained checkpoint; the IEEE
head (CIM/REM/part-FC, ~3% of eval FLOPs) reuses the folded-bf16 head
(fast_eval.head_from_maps). Opt-in via ``cfg.tpu.int8_eval``; quantization
error is bounded by tests (feature cosine vs the f32 path) and should be
re-validated per checkpoint before serving.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from .fast_eval import head_from_maps, supports_fast_eval

__all__ = [
    "make_trunk_exec",
    "collect_scales",
    "trunk_forward_ref",
    "trunk_forward_int8",
    "build_int8_ieee_eval_step",
    "build_int8_reid_eval_step",
    "export_forward_int8",
    "supports_int8_eval",
]

_EPS = 1e-5


def supports_int8_eval(module) -> bool:
    """IEEE full head (reuses the folded head) or a ReIDResNet (the fc512
    neck runs folded-bf16); everything else falls back to the plain path."""
    if supports_fast_eval(module):
        return True
    # the trunk walker replays convs with feature_group_count=1 only, so
    # grouped variants (resnext*) must take the plain fallback, not crash.
    return (
        type(module).__name__ == "ReIDResNet"
        and getattr(module, "groups", 1) == 1
    )


def _fold(p, s):
    """ConvBN eval fold: (kernel HWIO * inv[c_out], shift[c_out]) — exact
    in eval mode (running statistics)."""
    w = p["conv"]["kernel"]
    inv = jax.lax.rsqrt(s["bn"]["var"] + _EPS) * p["bn"]["scale"]
    shift = p["bn"]["bias"] - s["bn"]["mean"] * inv
    return w * inv[None, None, None, :], shift


def make_trunk_exec(block: str, layers, last_stride: int) -> Callable:
    """Returns ``forward(params, stats, x, conv)`` replaying
    ``ResNetTrunk.__call__`` (models/resnet.py:199-238) through a pluggable
    ``conv(x, site, params_sub, stats_sub, strides, padding, relu)``
    callback. groups == 1 only (every registered trunk the IEEE/ReID
    models use)."""
    expansion = 4 if block == "bottleneck" else 1
    layers = tuple(layers)

    def forward(params, stats, x, conv):
        x = conv(x, "stem", params["stem"], stats["stem"], (2, 2),
                 ((3, 3), (3, 3)), True)
        import flax.linen as nn

        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        in_planes = 64
        for stage_idx, (p_, n_blocks, s) in enumerate(
            zip((64, 128, 256, 512), layers, (1, 2, 2, last_stride))
        ):
            for b in range(n_blocks):
                stride = s if b == 0 else 1
                needs_down = b == 0 and (
                    stride != 1 or in_planes != p_ * expansion)
                name = f"layer{stage_idx + 1}_{b}"
                bp, bs = params[name], stats[name]
                identity = x
                if block == "bottleneck":
                    out = conv(x, f"{name}/cb1", bp["cb1"], bs["cb1"],
                               (1, 1), "VALID", True)
                    c2 = {"conv": {"kernel": bp["conv2"]["kernel"]},
                          "bn": bp["bn2"]}
                    out = conv(out, f"{name}/conv2", c2, {"bn": bs["bn2"]},
                               (stride, stride), ((1, 1), (1, 1)), True)
                    out = conv(out, f"{name}/cb3", bp["cb3"], bs["cb3"],
                               (1, 1), "VALID", False)
                else:
                    out = conv(x, f"{name}/cb1", bp["cb1"], bs["cb1"],
                               (stride, stride), ((1, 1), (1, 1)), True)
                    out = conv(out, f"{name}/cb2", bp["cb2"], bs["cb2"],
                               (1, 1), ((1, 1), (1, 1)), False)
                if needs_down:
                    identity = conv(x, f"{name}/downsample",
                                    bp["downsample"], bs["downsample"],
                                    (stride, stride), "VALID", False)
                x = jax.nn.relu(out + identity)
            in_planes = p_ * expansion
        return x

    return forward


def _conv_nhwc(x, w, strides, padding, out_dtype):
    return jax.lax.conv_general_dilated(
        x, w, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


def trunk_forward_ref(exec_, params, stats, x):
    """Folded-BN bf16 reference forward — validates the walker against the
    flax apply and is the calibration-mode compute."""

    def conv(x, site, p, s, strides, padding, relu):
        w, b = _fold(p, s)
        y = _conv_nhwc(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       strides, padding, jnp.bfloat16)
        y = y + b.astype(jnp.bfloat16)
        return jax.nn.relu(y) if relu else y

    return exec_(params, stats, x, conv)


def collect_scales(exec_, params, stats, x) -> Dict[str, jnp.ndarray]:
    """One calibration pass: per-site absmax of every conv input (the
    quantities the static activation scales are derived from)."""
    amax = {}

    def conv(x, site, p, s, strides, padding, relu):
        amax[site] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        w, b = _fold(p, s)
        y = _conv_nhwc(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       strides, padding, jnp.bfloat16)
        y = y + b.astype(jnp.bfloat16)
        return jax.nn.relu(y) if relu else y

    exec_(params, stats, x, conv)
    return amax


def trunk_forward_int8(exec_, params, stats, x, scales: Dict[str, float]):
    """w8a8 forward: weights quantized in-jit from the live params,
    activations quantized per-site with the static calibrated scales."""

    def conv(x, site, p, s, strides, padding, relu):
        w, b = _fold(p, s)
        sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
        wq = jnp.round(w / sw).astype(jnp.int8)
        sx = max(scales[site], 1e-6) / 127.0  # all-zero site guard
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / sx)),
                      -127, 127).astype(jnp.int8)
        y32 = _conv_nhwc(xq, wq, strides, padding, jnp.int32)
        y = (y32.astype(jnp.float32) * (sw * sx)[None, None, None, :]
             + b[None, None, None, :]).astype(jnp.bfloat16)
        return jax.nn.relu(y) if relu else y

    return exec_(params, stats, x, conv)


def build_int8_ieee_eval_step(model, transform=None) -> Callable:
    """Engine-shaped int8 eval step for the full IEEE model:
    ``fn(params, batch_stats, imgs) -> (B, 2304)``.

    The first call calibrates the per-site activation scales from its own
    batch (host-side) and compiles the quantized program; later calls reuse
    the scales. Weights requantize from the live params every call, so
    training updates flow through; the STATIC activation scales assume the
    serving regime (a trained, stable checkpoint)."""
    module = model.module
    # the IEEE backbones are 3 identical-spec ResNetTrunks (ieee3modal.py
    # setup: block="bottleneck", last_stride=1, layers=backbone_layers);
    # setup() attrs are unreachable on the unbound module, so read the spec
    # from the config fields
    exec_ = make_trunk_exec("bottleneck", tuple(module.backbone_layers), 1)
    execs = [exec_] * 3
    holder = {}

    def _apply_tfm(imgs):
        if transform is not None:
            return tuple(transform(m) for m in imgs)
        return tuple(imgs)

    def step(params, batch_stats, imgs):
        imgs = _apply_tfm(imgs)
        if "fn" not in holder:
            scales = []
            for i, m in enumerate("RNT"):
                am = collect_scales(execs[i], params[f"backbone_{m}"],
                                    batch_stats[f"backbone_{m}"], imgs[i])
                scales.append({k: float(v) for k, v in am.items()})

            @jax.jit
            def fn(params, batch_stats, imgs):
                maps = [
                    trunk_forward_int8(
                        execs[i], params[f"backbone_{m}"],
                        batch_stats[f"backbone_{m}"], imgs[i], scales[i])
                    for i, m in enumerate("RNT")
                ]
                return head_from_maps(
                    module, {"params": params, "batch_stats": batch_stats},
                    maps)

            holder["fn"] = fn
        return holder["fn"](params, batch_stats, imgs)

    step.holder = holder  # calibrated inner fn, for serving export
    return step


def _folded_fc_chain(params, stats, v):
    """Eval-folded DenseBNReLU neck (models/common.py:126-151): Dense bias
    and BatchNorm1d fold into one affine; compute stays bf16 like the flax
    path. Identity when the model has no fc{i} layers."""
    i = 0
    v = v.astype(jnp.bfloat16)
    while f"fc{i}" in params:
        p, s = params[f"fc{i}"], stats[f"fc{i}"]
        inv = jax.lax.rsqrt(s["bn"]["var"] + _EPS) * p["bn"]["scale"]
        shift = p["bn"]["bias"] - s["bn"]["mean"] * inv
        k = p["fc"]["kernel"] * inv[None, :]
        b = p["fc"]["bias"] * inv + shift
        v = jax.nn.relu(v @ k.astype(jnp.bfloat16) + b.astype(jnp.bfloat16))
        i += 1
    return v.astype(jnp.float32)


def build_int8_reid_eval_step(model, transform=None) -> Callable:
    """Engine-shaped int8 eval step for a ``ReIDResNet``: quantized trunk +
    f32 global average pool [+ folded-bf16 fc neck], matching the model's
    eval output (models/resnet.py:261-284)."""
    module = model.module
    spec = (module.block, tuple(module.layers), module.last_stride)
    exec_ = make_trunk_exec(*spec)
    holder = {}

    def step(params, batch_stats, imgs):
        if transform is not None:
            imgs = transform(imgs)
        if "fn" not in holder:
            am = collect_scales(exec_, params["trunk"],
                                batch_stats["trunk"], imgs)
            scales = {k: float(v) for k, v in am.items()}

            @jax.jit
            def fn(params, batch_stats, imgs):
                f = trunk_forward_int8(exec_, params["trunk"],
                                       batch_stats["trunk"], imgs, scales)
                v = jnp.mean(f.astype(jnp.float32), axis=(1, 2))
                return _folded_fc_chain(params, batch_stats, v)

            holder["fn"] = fn
        return holder["fn"](params, batch_stats, imgs)

    step.holder = holder  # calibrated inner fn, for serving export
    return step


def export_forward_int8(model, variables, transform, calib_imgs) -> Callable:
    """Build a self-contained jittable ``fwd(*uint8_image_batches) ->
    features`` with the quantized weights AND calibrated activation scales
    baked in — the int8 serving analog of ``utils/export.py``'s default
    forward. ``calib_imgs``: representative uint8 batch(es) matching the
    export signature (tuple of 3 for the IEEE model, one array otherwise).
    """
    module = model.module
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if supports_fast_eval(module):
        step = build_int8_ieee_eval_step(model, transform=transform)
        step(params, stats, calib_imgs)  # calibrate + compile

        def fwd(*imgs):
            ims = tuple(transform(m) for m in imgs) if transform else imgs
            return step.holder["fn"](params, stats, ims)

        return fwd
    step = build_int8_reid_eval_step(model, transform=transform)
    step(params, stats, calib_imgs)

    def fwd(img):
        im = transform(img) if transform else img
        return step.holder["fn"](params, stats, im)

    return fwd
