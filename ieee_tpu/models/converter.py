"""torch state_dict -> flax variables converter for the ResNet trunks.

Role: the reference initializes its backbones from torchvision ImageNet
weights (``models/resnet.py:1075-1089``; URLs at ``resnet.py:19-29``). mAP
parity is unreachable without that init (SURVEY §7 hard parts), so we provide
a one-time converter from a torchvision-format ``state_dict`` (a ``.pth``
file the user supplies, e.g. resnet50-19c8e357.pth) to our NHWC flax trunk.

Layout care: torch conv weights are OIHW; flax wants HWIO. torch BN
(weight, bias, running_mean, running_var) -> flax (scale, bias, mean, var).
"""

from __future__ import annotations

import os
import os.path as osp
import warnings
from typing import Any, Dict, Tuple

import numpy as np

__all__ = [
    "convert_torch_trunk",
    "load_pretrained_trunk",
    "pretrained_search_paths",
]

_BLOCK_CONVS = {
    # torch name -> (flax module, flax bn module)
    "bottleneck": {
        "conv1": ("cb1/conv", "cb1/bn", "bn1"),
        "conv2": ("conv2", "bn2", "bn2"),
        "conv3": ("cb3/conv", "cb3/bn", "bn3"),
    },
    "basic": {
        "conv1": ("cb1/conv", "cb1/bn", "bn1"),
        "conv2": ("cb2/conv", "cb2/bn", "bn2"),
    },
}


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_torch_trunk(
    state_dict: Dict[str, Any],
    block: str = "bottleneck",
    layers: Tuple[int, ...] = (3, 4, 6, 3),
    prefix: str = "",
) -> Tuple[Dict, Dict]:
    """Convert a torchvision(-style) ResNet state_dict to (params, batch_stats)
    trees matching ``ieee_tpu.models.resnet.ResNetTrunk``.

    Ignores fc/classifier entries (partial load, as the reference's
    ``init_pretrained_weights`` does).
    """

    def get(name):
        v = state_dict[prefix + name]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params: Dict = {}
    stats: Dict = {}

    # stem
    _set(params, "stem/conv/kernel", _conv_kernel(get("conv1.weight")))
    _set(params, "stem/bn/scale", get("bn1.weight"))
    _set(params, "stem/bn/bias", get("bn1.bias"))
    _set(stats, "stem/bn/mean", get("bn1.running_mean"))
    _set(stats, "stem/bn/var", get("bn1.running_var"))

    conv_map = _BLOCK_CONVS[block]
    for stage, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            tsrc = f"layer{stage}.{b}"
            fdst = f"layer{stage}_{b}"
            for tconv, (fconv, fbn, tbn) in conv_map.items():
                _set(
                    params,
                    f"{fdst}/{fconv}/kernel",
                    _conv_kernel(get(f"{tsrc}.{tconv}.weight")),
                )
                _set(params, f"{fdst}/{fbn}/scale", get(f"{tsrc}.{tbn}.weight"))
                _set(params, f"{fdst}/{fbn}/bias", get(f"{tsrc}.{tbn}.bias"))
                _set(stats, f"{fdst}/{fbn}/mean", get(f"{tsrc}.{tbn}.running_mean"))
                _set(stats, f"{fdst}/{fbn}/var", get(f"{tsrc}.{tbn}.running_var"))
            if prefix + f"{tsrc}.downsample.0.weight" in state_dict:
                _set(
                    params,
                    f"{fdst}/downsample/conv/kernel",
                    _conv_kernel(get(f"{tsrc}.downsample.0.weight")),
                )
                _set(params, f"{fdst}/downsample/bn/scale",
                     get(f"{tsrc}.downsample.1.weight"))
                _set(params, f"{fdst}/downsample/bn/bias",
                     get(f"{tsrc}.downsample.1.bias"))
                _set(stats, f"{fdst}/downsample/bn/mean",
                     get(f"{tsrc}.downsample.1.running_mean"))
                _set(stats, f"{fdst}/downsample/bn/var",
                     get(f"{tsrc}.downsample.1.running_var"))
    return params, stats


def pretrained_search_paths(arch: str):
    """Where we look for a torchvision .pth/.npz for ``arch``."""
    roots = [
        os.environ.get("IEEE_TPU_PRETRAINED_DIR", ""),
        osp.expanduser("~/.cache/ieee_tpu"),
        osp.expanduser("~/.cache/torch/hub/checkpoints"),
    ]
    out = []
    for r in roots:
        if not r:
            continue
        out.append(osp.join(r, f"{arch}.npz"))
        out.append(osp.join(r, f"{arch}.pth"))
    return out


def load_pretrained_trunk(arch: str = "resnet50", block: str = "bottleneck",
                          layers=(3, 4, 6, 3)):
    """Best-effort ImageNet init: returns (params, batch_stats) or None.

    Accepts either a converted ``.npz`` (flat 'params/...'/'stats/...' keys)
    or a raw torch ``.pth`` state_dict (including files whose names embed a
    hash, e.g. resnet50-19c8e357.pth).
    """
    candidates = list(pretrained_search_paths(arch))
    # hash-suffixed torchvision files
    for r in (osp.expanduser("~/.cache/torch/hub/checkpoints"),
              os.environ.get("IEEE_TPU_PRETRAINED_DIR", "")):
        if r and osp.isdir(r):
            for f in sorted(os.listdir(r)):
                if f.startswith(arch + "-") and f.endswith(".pth"):
                    candidates.append(osp.join(r, f))
    for path in candidates:
        if not osp.isfile(path):
            continue
        try:
            if path.endswith(".npz"):
                flat = dict(np.load(path))
                params, stats = {}, {}
                for k, v in flat.items():
                    if k.startswith("params/"):
                        _set(params, k[len("params/"):], v)
                    elif k.startswith("stats/"):
                        _set(stats, k[len("stats/"):], v)
                return params, stats
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            if "state_dict" in sd:
                sd = sd["state_dict"]
            return convert_torch_trunk(sd, block=block, layers=tuple(layers))
        except Exception as e:  # corrupt file should not kill training
            warnings.warn(f"Failed to load pretrained weights from {path}: {e}")
    return None


def graft_trunk(variables: Dict, trunk_params: Dict, trunk_stats: Dict,
                trunk_name: str) -> Dict:
    """Return a copy of ``variables`` with one named trunk's params/stats
    replaced (partial load — anything not in the converted tree is kept,
    matching reference ``init_pretrained_weights`` semantics)."""
    import flax

    var = flax.core.unfreeze(variables)

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst.setdefault(k, {}), v)
            else:
                if k in dst and hasattr(dst[k], "shape"):
                    if tuple(dst[k].shape) != tuple(v.shape):
                        continue  # size-mismatch entries kept unchanged
                import jax.numpy as jnp

                dst[k] = jnp.asarray(v, dtype=jnp.float32)

    if trunk_name in var["params"]:
        merge(var["params"][trunk_name], trunk_params)
        merge(var.setdefault("batch_stats", {}).setdefault(trunk_name, {}),
              trunk_stats)
    return var
