"""Reference IEEE checkpoint converter: torch state_dict -> flax variables.

Lets a reference-trained checkpoint (``model.pth.tar-<epoch>`` from
ziwang1121/IEEE, module names per ``torchreid/models/ieee3modalPart.py``)
evaluate in this framework — the practical route to bit-level mAP-parity
checks. Mapping:

    backbone.{m}.*            -> backbone_{R|N|T}/*   (via convert_torch_trunk)
    convOne.{m}.layers.{0,1}  -> convOne_{m}/conv|bn
    convAvgRest.{m}.layers.*  -> convAvgRest_{m}/conv|bn
    CA.{m}.fc.{0,2}           -> CA_{m}/fc1|fc2
    reduce_layer.{m}.layers.* -> reduce_{m}/conv|bn
    REM.{m}.conv_*|param      -> REM_{m}/conv_*|gamma
    fc_{R,N,T}.{p}.{0,1}      -> fc_{R,N,T} stacked (P,768,128) + wide BN
    classifier_{R,N,T}.{p}    -> classifier_{R,N,T} stacked (P,128,C)

The reference's ``nn.DataParallel`` 'module.' prefix is stripped. Entries
absent in the target (e.g. the trunks' orphan fc head) are skipped.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from .converter import convert_torch_trunk

__all__ = ["convert_ieee_torch_checkpoint", "convert_pfnet_torch_checkpoint"]

_MODAL = "RNT"


def _np(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def convert_ieee_torch_checkpoint(
    state_dict: Dict[str, Any], parts: int = 6,
    layers: Tuple[int, ...] = (3, 4, 6, 3),
) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) trees matching
    ``ieee_tpu.models.ieee3modal.IEEE3modalPart``. ``layers`` follows the
    trunk depth (reduced-depth checkpoints are used by parity tests)."""
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }
    params: Dict = {}
    stats: Dict = {}

    def conv_kernel(w):
        return np.transpose(_np(w), (2, 3, 1, 0))  # OIHW -> HWIO

    def put_convbn(dst_params, dst_stats, prefix):
        dst_params["conv"] = {"kernel": conv_kernel(sd[f"{prefix}.0.weight"])}
        dst_params["bn"] = {
            "scale": _np(sd[f"{prefix}.1.weight"]),
            "bias": _np(sd[f"{prefix}.1.bias"]),
        }
        dst_stats["bn"] = {
            "mean": _np(sd[f"{prefix}.1.running_mean"]),
            "var": _np(sd[f"{prefix}.1.running_var"]),
        }

    # 3x ResNet-50 trunks
    for i, m in enumerate(_MODAL):
        t_params, t_stats = convert_torch_trunk(
            sd, block="bottleneck", layers=tuple(layers),
            prefix=f"backbone.{i}.",
        )
        params[f"backbone_{m}"] = t_params
        stats[f"backbone_{m}"] = t_stats

    # CIM convs + channel attention
    for i in range(3):
        for src, dst in ((f"convOne.{i}.layers", f"convOne_{i}"),
                         (f"convAvgRest.{i}.layers", f"convAvgRest_{i}"),
                         (f"reduce_layer.{i}.layers", f"reduce_{i}")):
            params[dst], stats[dst] = {}, {}
            put_convbn(params[dst], stats[dst], src)
        # ChannelAttention: 1x1 convs (C_out, C_in, 1, 1) -> Dense (C_in, C_out)
        params[f"CA_{i}"] = {
            "fc1": {"kernel": _np(sd[f"CA.{i}.fc.0.weight"])[:, :, 0, 0].T},
            "fc2": {"kernel": _np(sd[f"CA.{i}.fc.2.weight"])[:, :, 0, 0].T},
        }
        # REM nonLocal: torch Linear (out, in) -> flax (in, out)
        params[f"REM_{i}"] = {
            "conv_query": {
                "kernel": _np(sd[f"REM.{i}.conv_query.weight"]).T,
                "bias": _np(sd[f"REM.{i}.conv_query.bias"]),
            },
            "conv_part": {
                "kernel": _np(sd[f"REM.{i}.conv_part.weight"]).T,
                "bias": _np(sd[f"REM.{i}.conv_part.bias"]),
            },
            "conv_value": {
                "kernel": _np(sd[f"REM.{i}.conv_value.weight"]).T,
                "bias": _np(sd[f"REM.{i}.conv_value.bias"]),
            },
            "gamma": _np(sd[f"REM.{i}.param"]).reshape(1),
        }

    # per-part FC necks -> stacked einsum weights + wide folded BN
    for m in _MODAL:
        ks, bs = [], []
        bn_scale, bn_bias, bn_mean, bn_var = [], [], [], []
        for p in range(parts):
            ks.append(_np(sd[f"fc_{m}.{p}.0.weight"]).T)  # (768, 128)
            bs.append(_np(sd[f"fc_{m}.{p}.0.bias"]))
            bn_scale.append(_np(sd[f"fc_{m}.{p}.1.weight"]))
            bn_bias.append(_np(sd[f"fc_{m}.{p}.1.bias"]))
            bn_mean.append(_np(sd[f"fc_{m}.{p}.1.running_mean"]))
            bn_var.append(_np(sd[f"fc_{m}.{p}.1.running_var"]))
        params[f"fc_{m}"] = {
            "kernel": np.stack(ks),  # (P, 768, 128)
            "bias": np.stack(bs),  # (P, 128)
            "bn": {
                "scale": np.concatenate(bn_scale),  # (P*128,)
                "bias": np.concatenate(bn_bias),
            },
        }
        stats[f"fc_{m}"] = {
            "bn": {
                "mean": np.concatenate(bn_mean),
                "var": np.concatenate(bn_var),
            }
        }
        cks = [
            _np(sd[f"classifier_{m}.{p}.weight"]).T for p in range(parts)
        ]
        cbs = [_np(sd[f"classifier_{m}.{p}.bias"]) for p in range(parts)]
        params[f"classifier_{m}"] = {
            "kernel": np.stack(cks),  # (P, 128, C)
            "bias": np.stack(cbs),
        }

    return params, stats


def convert_pfnet_torch_checkpoint(
    state_dict: Dict[str, Any], parts: int = 2,
    layers: Tuple[int, ...] = (3, 4, 6, 3),
) -> Tuple[Dict, Dict]:
    """torch PFNET state_dict -> flax variables for ``models/pfnet.py``.

    Mapping (reference ``torchreid/models/pfnet.py:299-457``):
        backbone.{i}.*                  -> backbone_{i}/*  (trunk converter)
        reduce_layer.{i}.layers.{0,1}   -> reduce_{i}/conv|bn
        fc_{B}.{p}.0.{0,1}              -> fc_{B} stacked (P,768,256) + wide BN
        classifier_{B}.{p}              -> classifier_{B} stacked (P,256,C)
        classifier_all                  -> classifier_all (transposed)
    Branches are mapped BY NAME (the reference registers fc_RGB, fc_TI,
    fc_NI, fc_RT, fc_RN in a different order than it uses them)."""
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }
    params: Dict = {}
    stats: Dict = {}

    def conv_kernel(w):
        return np.transpose(_np(w), (2, 3, 1, 0))

    for i in range(3):
        t_params, t_stats = convert_torch_trunk(
            sd, block="bottleneck", layers=tuple(layers),
            prefix=f"backbone.{i}.",
        )
        params[f"backbone_{i}"] = t_params
        stats[f"backbone_{i}"] = t_stats

    for i in range(5):
        src = f"reduce_layer.{i}.layers"
        params[f"reduce_{i}"] = {
            "conv": {"kernel": conv_kernel(sd[f"{src}.0.weight"])},
            "bn": {"scale": _np(sd[f"{src}.1.weight"]),
                   "bias": _np(sd[f"{src}.1.bias"])},
        }
        stats[f"reduce_{i}"] = {
            "bn": {"mean": _np(sd[f"{src}.1.running_mean"]),
                   "var": _np(sd[f"{src}.1.running_var"])},
        }

    for b in ("RGB", "NI", "TI", "RT", "RN"):
        ks, bs = [], []
        bn = {k: [] for k in ("scale", "bias", "mean", "var")}
        for p in range(parts):
            ks.append(_np(sd[f"fc_{b}.{p}.0.0.weight"]).T)
            bs.append(_np(sd[f"fc_{b}.{p}.0.0.bias"]))
            bn["scale"].append(_np(sd[f"fc_{b}.{p}.0.1.weight"]))
            bn["bias"].append(_np(sd[f"fc_{b}.{p}.0.1.bias"]))
            bn["mean"].append(_np(sd[f"fc_{b}.{p}.0.1.running_mean"]))
            bn["var"].append(_np(sd[f"fc_{b}.{p}.0.1.running_var"]))
        params[f"fc_{b}"] = {
            "kernel": np.stack(ks), "bias": np.stack(bs),
            "bn": {"scale": np.concatenate(bn["scale"]),
                   "bias": np.concatenate(bn["bias"])},
        }
        stats[f"fc_{b}"] = {
            "bn": {"mean": np.concatenate(bn["mean"]),
                   "var": np.concatenate(bn["var"])},
        }
        params[f"classifier_{b}"] = {
            "kernel": np.stack([
                _np(sd[f"classifier_{b}.{p}.weight"]).T
                for p in range(parts)
            ]),
            "bias": np.stack([
                _np(sd[f"classifier_{b}.{p}.bias"]) for p in range(parts)
            ]),
        }

    params["classifier_all"] = {
        "kernel": _np(sd["classifier_all.weight"]).T,
        "bias": _np(sd["classifier_all.bias"]),
    }
    return params, stats
