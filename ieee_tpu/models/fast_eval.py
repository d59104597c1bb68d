"""Inference-optimized IEEE eval path (north star: CIM/REM/part-pool fused).

Builds a jitted feature extractor equivalent to
``IEEE3modalPart.__call__(train=False)`` but with every BatchNorm folded into
affine scale/shift (running statistics — exact in eval mode) and the
pool -> 2048->768 reduce -> BN -> ReLU chain running as the fused Pallas
kernel (``ops/pallas/partpool.py``). The CIM channel attention and REM
residual become a handful of folded matmuls.

This IS the engine's eval path for ieee3modalPart (``Engine._build_eval_step``
dispatches here); the plain flax apply remains the fallback for every other
model and for IEEE ablations that drop CIM/CA/REM.

Parity: bit-identical math to the flax eval path up to bf16 rounding
(tested in tests/test_fast_eval.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.pallas.partpool import fold_bn, fused_partpool_project

__all__ = ["build_fast_ieee_eval", "build_fast_ieee_eval_step",
           "head_from_maps", "supports_fast_eval"]


def supports_fast_eval(module) -> bool:
    """The fused path covers the full IEEE head (CIM + CA + REM); ablation
    variants fall back to the flax apply."""
    return (
        type(module).__name__ == "IEEE3modalPart"
        and getattr(module, "interaction", False)
        and getattr(module, "attention", False)
        and getattr(module, "using_REM", False)
    )


def _folded_conv1x1(params, stats, eps=1e-5):
    """ConvBN (1x1, no bias) eval fold -> (W[C_in, C_out], b[C_out])."""
    w = params["conv"]["kernel"][0, 0]  # (C_in, C_out)
    s, t = fold_bn(params["bn"]["scale"], params["bn"]["bias"],
                   stats["bn"]["mean"], stats["bn"]["var"], eps)
    return w * s[None, :], t


def _fold_head(params, stats, parts: int):
    """Fold every head BatchNorm into affine weights. Traceable — runs inside
    the jitted eval step so params stay fresh as training updates them."""
    cim = []
    for i in range(3):
        w_one, b_one = _folded_conv1x1(params[f"convOne_{i}"],
                                       stats[f"convOne_{i}"])
        w_rest, b_rest = _folded_conv1x1(params[f"convAvgRest_{i}"],
                                         stats[f"convAvgRest_{i}"])
        ca = params[f"CA_{i}"]
        cim.append(dict(w_one=w_one, b_one=b_one, w_rest=w_rest,
                        b_rest=b_rest,
                        ca_fc1=ca["fc1"]["kernel"], ca_fc2=ca["fc2"]["kernel"]))

    reduce_folded = []
    for i in range(3):
        w = params[f"reduce_{i}"]["conv"]["kernel"][0, 0]  # (2048, 768)
        s, t = fold_bn(params[f"reduce_{i}"]["bn"]["scale"],
                       params[f"reduce_{i}"]["bn"]["bias"],
                       stats[f"reduce_{i}"]["bn"]["mean"],
                       stats[f"reduce_{i}"]["bn"]["var"])
        reduce_folded.append((w, s, t))

    rem = []
    for i in range(3):
        r = params[f"REM_{i}"]
        rem.append((r["conv_part"]["kernel"], r["conv_part"]["bias"],
                    r["gamma"]))

    fc_folded = []
    for m in "RNT":
        p = params[f"fc_{m}"]
        s, t = fold_bn(p["bn"]["scale"], p["bn"]["bias"],
                       stats[f"fc_{m}"]["bn"]["mean"],
                       stats[f"fc_{m}"]["bn"]["var"])
        f = p["kernel"].shape[-1]
        fc_folded.append((
            p["kernel"],  # (P, 768, 128)
            p["bias"],  # (P, 128)
            s.reshape(parts, f), t.reshape(parts, f),
        ))
    return cim, reduce_folded, rem, fc_folded


def _cim_apply(one, rest_sum, c):
    f_one = jnp.maximum(
        jnp.einsum("bhwc,cd->bhwd", one, c["w_one"]) + c["b_one"], 0.0)
    f_rest = jnp.maximum(
        jnp.einsum("bhwc,cd->bhwd", rest_sum, c["w_rest"]) + c["b_rest"],
        0.0)
    # channel attention gate (avg+max pooled shared MLP)
    avg = jnp.mean(f_rest, axis=(1, 2))
    mx = jnp.max(f_rest, axis=(1, 2))
    mlp = lambda v: jnp.maximum(v @ c["ca_fc1"], 0.0) @ c["ca_fc2"]
    gate = jax.nn.sigmoid(mlp(avg) + mlp(mx))[:, None, None, :]
    return f_one + gate * f_rest + f_rest


def head_from_maps(module, variables, maps):
    """Folded-BN IEEE head on precomputed trunk feature maps (also the head
    of the int8 PTQ path, models/int8_eval.py): CIM -> fused part-pool ->
    REM -> per-part FC neck -> (B, 2304) concat features."""
    parts = module.parts
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    cim, reduce_folded, rem, fc_folded = _fold_head(params, stats, parts)
    maps = [m.astype(jnp.float32) for m in maps]
    cims = [
        _cim_apply(maps[0], maps[1] + maps[2], cim[0]),
        _cim_apply(maps[1], maps[0] + maps[2], cim[1]),
        _cim_apply(maps[2], maps[0] + maps[1], cim[2]),
    ]
    fc_flat = []
    for i in range(3):
        w, s, t = reduce_folded[i]
        # fused Pallas kernel: [global; parts] in one pass each
        g = fused_partpool_project(maps[i], w, s, t, parts=parts)[:, 0]
        p = fused_partpool_project(cims[i], w, s, t, parts=parts)[:, 1:]
        # REM: part + 2*gamma * (W_p g + b_p)
        wp, bp, gamma = rem[i]
        delta = (2.0 * gamma) * (g @ wp + bp)
        p = p + delta[:, None, :]
        # folded per-part FC neck
        k, b2, s2, t2 = fc_folded[i]
        y = jnp.einsum("bpd,pdf->bpf", p.astype(jnp.bfloat16),
                       k.astype(jnp.bfloat16)).astype(jnp.float32) + b2
        y = jnp.maximum(y * s2[None] + t2[None], 0.0)
        fc_flat.append(y.reshape(y.shape[0], -1))
    fc_R_all, fc_N_all, fc_T_all = fc_flat
    return jnp.concatenate([fc_T_all, fc_R_all, fc_N_all], axis=1)


def _fast_eval_core(module, variables, imgs):
    maps = module.apply(variables, imgs, train=False, return_featuremaps=True)
    return head_from_maps(module, variables, maps)


def build_fast_ieee_eval(model, variables) -> Callable:
    """Returns jitted fn(imgs: (R, N, T) tuple of (B,H,W,3)) -> (B, 2304)
    closed over fixed ``variables`` (feature-extractor style)."""
    module = model.module

    @jax.jit
    def fast_eval(imgs):
        return _fast_eval_core(module, variables, imgs)

    return fast_eval


def build_fast_ieee_eval_step(model, transform=None) -> Callable:
    """Engine-shaped fused eval step:
    fn(params, batch_stats, imgs) -> (B, 2304). ``transform`` (the compiled
    test-time transform) is applied to each modality inside the jit."""
    module = model.module

    @jax.jit
    def step(params, batch_stats, imgs):
        if transform is not None:
            imgs = tuple(transform(m) for m in imgs)
        return _fast_eval_core(
            module, {"params": params, "batch_stats": batch_stats}, imgs
        )

    return step
