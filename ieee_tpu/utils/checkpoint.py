"""Checkpoint save / load / resume.

Reference analog: ``torchreid/utils/torchtools.py:13-133`` —
``save_checkpoint`` writes ``model.pth.tar-<epoch>`` (+ ``model-best``
copy), ``resume_from_checkpoint`` restores model/optimizer/scheduler and
returns the start epoch. Here a checkpoint is the full TrainState pytree
(params, batch_stats, opt_state, step) serialized with flax msgpack, plus a
small JSON sidecar (epoch, rank1). Writes are atomic (tmp + rename) so a
killed run never leaves a truncated checkpoint.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil
from typing import Any, Optional, Tuple

import flax.serialization

from .tools import mkdir_if_missing

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "list_checkpoints",
    "resume_from_checkpoint",
    "load_pretrained_weights",
]


def save_checkpoint(
    state: Any,
    save_dir: str,
    epoch: int,
    rank1: Optional[float] = None,
    is_best: bool = False,
    remove_module_from_keys: bool = False,  # API parity; no DataParallel here
) -> str:
    """Write ``model.msgpack-<epoch>`` (+ ``model-best.msgpack`` copy)."""
    del remove_module_from_keys
    mkdir_if_missing(save_dir)
    fpath = osp.join(save_dir, f"model.msgpack-{epoch}")
    meta = {"epoch": int(epoch)}
    if rank1 is not None:
        meta["rank1"] = float(rank1)
    # every write is tmp+rename, and the meta sidecar lands BEFORE the
    # msgpack it describes: _latest_checkpoint keys on the msgpack file, so
    # a kill between the two leaves only an orphan .json (harmless), never
    # a resumable checkpoint with a missing/torn sidecar (which would
    # silently resume at epoch 0).
    _atomic_json(fpath + ".json", meta)
    tmp = fpath + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(_pull_to_host(state)))
    os.replace(tmp, fpath)
    print(f'Checkpoint saved to "{fpath}"')
    if is_best:
        best = osp.join(save_dir, "model-best.msgpack")
        _atomic_json(best + ".json", meta)
        shutil.copy(fpath, best + ".tmp")
        os.replace(best + ".tmp", best)
    return fpath


def _pull_to_host(state: Any) -> Any:
    """Pull a device pytree to host numpy ONE LEAF AT A TIME.

    ``flax.serialization.to_bytes`` on a device tree triggers a single
    batched device->host transfer of the whole state (~0.9 GB for the IEEE
    train state: params + optimizer moments + batch_stats). The axon PJRT
    tunnel has been observed to wedge on very large single transfers
    (2026-08-18: checkpoint save froze with zero CPU accrual right after
    eval); the ship direction is already chunked into 48 MB slabs
    (``engine/device_cache``) for the same reason. Per-leaf ``np.asarray``
    keeps every pull bounded by the largest parameter (~16-64 MB) at the
    cost of one round trip per leaf (~2 ms each, ~1.5 s for ~700 leaves).
    """
    import jax
    import numpy as np

    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, state
    )


def _atomic_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def list_checkpoints(dirpath: str) -> list:
    """All epoch checkpoints in ``dirpath`` as ``[(epoch, path)]``, sorted
    ascending by epoch. The single parser of the ``model.msgpack-<epoch>``
    filename convention — resume, latest-lookup, and pruning all go
    through here."""
    if not osp.isdir(dirpath):
        return []
    out = []
    for f in os.listdir(dirpath):
        if not f.startswith("model.msgpack-") or f.endswith((".json", ".tmp")):
            continue
        tail = f.rsplit("-", 1)[1]
        if tail.isdigit():
            out.append((int(tail), osp.join(dirpath, f)))
    out.sort()
    return out


def _latest_checkpoint(dirpath: str) -> Optional[str]:
    cands = list_checkpoints(dirpath)
    return cands[-1][1] if cands else None


def load_checkpoint(fpath: str, template: Any) -> Tuple[Any, dict]:
    """Deserialize a checkpoint into the structure of ``template``
    (reference ``load_checkpoint``, ``torchtools.py:61-94``)."""
    if fpath is None:
        raise ValueError("File path is None")
    if osp.isdir(fpath):
        latest = _latest_checkpoint(fpath)
        if latest is None:
            raise FileNotFoundError(f'No checkpoint found at "{fpath}"')
        fpath = latest
    if not osp.exists(fpath):
        raise FileNotFoundError(f'File is not found at "{fpath}"')
    with open(fpath, "rb") as f:
        state = flax.serialization.from_bytes(template, f.read())
    meta = {}
    if osp.exists(fpath + ".json"):
        try:
            with open(fpath + ".json") as f:
                meta = json.load(f)
        except (json.JSONDecodeError, OSError) as e:
            # pre-atomic-sidecar checkpoints could leave a torn .json;
            # warn (resume will restart epoch counting) instead of crashing
            import warnings

            warnings.warn(
                f'Unreadable checkpoint sidecar "{fpath}.json" ({e}); '
                "epoch/rank1 metadata lost — resume counts from epoch 0.")
    return state, meta


def resume_from_checkpoint(fpath: str, state_template: Any) -> Tuple[Any, int]:
    """Resume TrainState; returns (state, start_epoch)
    (reference ``torchtools.py:97-133``)."""
    print(f'Loading checkpoint from "{fpath}"')
    state, meta = load_checkpoint(fpath, state_template)
    start_epoch = int(meta.get("epoch", 0))
    print("Loaded model + optimizer + batch stats")
    print(f"Last epoch = {start_epoch}")
    if "rank1" in meta:
        print(f"Last rank1 = {meta['rank1']:.1%}")
    return state, start_epoch


def load_pretrained_weights(variables: Any, weight_path: str) -> Any:
    """Partial-load model weights from a checkpoint file into a variables
    pytree (reference ``load_pretrained_weights``, ``torchtools.py:256-311``):
    matching-named entries load; mismatched/missing are kept and reported."""
    import flax.core
    import numpy as np

    with open(weight_path, "rb") as f:
        blob = f.read()
    # accepts either a full TrainState dump or a bare {params, batch_stats}
    loaded = flax.serialization.msgpack_restore(blob)
    var = flax.core.unfreeze(variables)
    matched, discarded = [], []

    def merge(dst, src, path=""):
        for k, v in src.items():
            p = f"{path}/{k}" if path else k
            if isinstance(v, dict):
                if k in dst and isinstance(dst[k], dict):
                    merge(dst[k], v, p)
                else:
                    discarded.append(p)
            else:
                if k in dst and hasattr(dst[k], "shape") and tuple(
                    dst[k].shape
                ) == tuple(np.shape(v)):
                    import jax.numpy as jnp

                    dst[k] = jnp.asarray(v)
                    matched.append(p)
                else:
                    discarded.append(p)

    src_params = loaded.get("params", loaded)
    merge(var.get("params", var), src_params)
    if "batch_stats" in loaded and "batch_stats" in var:
        merge(var["batch_stats"], loaded["batch_stats"], "batch_stats")

    if not matched:
        import warnings

        warnings.warn(
            f'The pretrained weights "{weight_path}" cannot be loaded: no '
            "layers matched"
        )
    else:
        print(f'Successfully loaded pretrained weights from "{weight_path}"')
        if discarded:
            print("** The following layers are discarded due to unmatched "
                  f"keys or layer size: {discarded[:20]}"
                  f"{' ...' if len(discarded) > 20 else ''}")
    return var
