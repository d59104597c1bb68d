"""Generic torch state_dict -> flax variables converter for the model zoo.

Role: the reference warm-starts EVERY zoo model from ImageNet weights
(``init_pretrained_weights`` repeated per model file — e.g. reference
``models/resnet.py:1075-1089``, ``osnet.py:505-553``, ``senet.py:15-80``);
``converter.py`` covers the ResNet trunks only. This module converts an
arbitrary torchreid/torchvision-style ``state_dict`` into the variable tree
of any of our flax zoo models.

Approach — ordered structural alignment, no per-arch name tables:

* The torch ``state_dict`` preserves module **registration** order; group its
  keys into parameter "units" (conv / linear / batchnorm / plain-affine).
* The flax variable tree preserves module **creation** (execution) order —
  ``nn.compact`` creates params in call order and flax dicts keep insertion
  order; flatten it into the same unit vocabulary.
* Align the two unit sequences. Registration and execution order agree
  almost everywhere; where they differ locally (e.g. the reference OSBlock
  registers its shared gate after all four streams, ``osnet.py:236-260``,
  while execution touches it after stream one), a pending-pool + bounded
  lookahead resolves the permutation using kind/shape compatibility.

Layout rules applied per unit: conv OIHW->HWIO; depthwise conv
(C,1,k,k)->(k,k,1,C) (same transpose); linear (out,in)->(in,out);
1x1-conv <-> dense cross-matches (the reference implements channel-MLPs as
1x1 convs, e.g. ChannelGate ``osnet.py:179-198``); BN
(weight,bias,running_mean,running_var) -> (scale,bias) + (mean,var).
"""

from __future__ import annotations

import re
import warnings
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

__all__ = ["convert_torch_zoo", "torch_units", "flax_units", "graft_zoo"]


# ----------------------------------------------------------------------
# unit extraction
# ----------------------------------------------------------------------
@dataclass
class Unit:
    name: str                     # torch module prefix or flax path
    kind: str                     # conv | dense | bn | affine
    arrays: Dict[str, Any] = field(default_factory=dict)

    def shape(self, key):
        a = self.arrays.get(key)
        return None if a is None else tuple(a.shape)


def _np(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def torch_units(state_dict) -> List[Unit]:
    """Group an ordered torch ``state_dict`` into Units (registration
    order). ``num_batches_tracked`` buffers are dropped."""
    groups: Dict[str, Dict[str, Any]] = {}
    order: List[str] = []
    for k, v in state_dict.items():
        field_name = k.rsplit(".", 1)[-1] if "." in k else k
        prefix = k.rsplit(".", 1)[0] if "." in k else ""
        if field_name == "num_batches_tracked":
            continue
        if prefix not in groups:
            groups[prefix] = {}
            order.append(prefix)
        groups[prefix][field_name] = _np(v)

    units = []
    for name in order:
        g = groups[name]
        if "running_mean" in g:
            units.append(Unit(name, "bn", dict(
                scale=g.get("weight"), bias=g.get("bias"),
                mean=g["running_mean"], var=g["running_var"])))
        elif "weight" in g and g["weight"].ndim == 4:
            units.append(Unit(name, "conv", dict(
                kernel=g["weight"], bias=g.get("bias"))))
        elif "weight" in g and g["weight"].ndim == 2:
            units.append(Unit(name, "dense", dict(
                kernel=g["weight"], bias=g.get("bias"))))
        elif "weight" in g:
            units.append(Unit(name, "affine", dict(
                scale=g["weight"], bias=g.get("bias"))))
        else:
            # bare nn.Parameters (MuDeep saliency weights, REM gamma, ...)
            for f, v in g.items():
                units.append(Unit(f"{name}.{f}", "param", dict(value=v)))
    return units


def _walk(tree, path=()):
    for k, v in tree.items():
        if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
            yield from _walk(v, path + (k,))
        else:
            yield path + (k,), v


def flax_units(variables) -> List[Unit]:
    """Flatten a flax variables dict ({'params': ..., 'batch_stats': ...})
    into Units in creation (execution) order. BN scale/bias in params pair
    with mean/var at the same path in batch_stats."""
    params = variables.get("params", variables)
    stats = variables.get("batch_stats", {})

    def stat_node(path):
        node = stats
        for p in path:
            if not isinstance(node, dict) and type(node).__name__ != "FrozenDict":
                return None
            if p not in node:
                return None
            node = node[p]
        return node

    units: List[Unit] = []

    def visit(node, path):
        keys = list(node.keys())
        leaf_keys = [k for k in keys
                     if not (isinstance(node[k], dict)
                             or type(node[k]).__name__ == "FrozenDict")]
        if "kernel" in leaf_keys:
            kern = node["kernel"]
            kind = "conv" if kern.ndim == 4 else "dense"
            units.append(Unit("/".join(path), kind, dict(
                kernel=kern, bias=node.get("bias"))))
        elif "scale" in leaf_keys or "bias" in leaf_keys:
            st = stat_node(path)
            if st is not None and "mean" in st:
                units.append(Unit("/".join(path), "bn", dict(
                    scale=node.get("scale"), bias=node.get("bias"),
                    mean=st["mean"], var=st["var"])))
            else:
                units.append(Unit("/".join(path), "affine", dict(
                    scale=node.get("scale"), bias=node.get("bias"))))
        elif leaf_keys:
            # bare parameters (e.g. MuDeep's saliency weights, REM gamma):
            # shape-agnostic unit; the path INCLUDES the leaf name
            for k in leaf_keys:
                units.append(Unit("/".join(path + (k,)), "param",
                                  dict(value=node[k])))
        for k in keys:
            v = node[k]
            if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
                visit(v, path + (k,))

    visit(params, ())
    return units


# ----------------------------------------------------------------------
# compatibility + conversion
# ----------------------------------------------------------------------
def _tokens(name: str) -> frozenset:
    """Lower-cased alphabetic tokens of a unit name ('fm_conv3' ->
    {fm, conv}; 'block3/downsample' -> {block, downsample}). Digits are
    deliberately dropped: positional indices ('conv2.3' vs 'conv2_3_2')
    collide coincidentally across architectures, while word tokens mirror
    the reference's module names. Used only as a tie-break between
    structurally valid candidates when shapes alone are ambiguous."""
    return frozenset(re.findall(r"[a-z]+", name.lower()))


def _name_score(tu: Unit, fu: Unit) -> int:
    return len(_tokens(tu.name) & _tokens(fu.name))


def _convertible(tu: Unit, fu: Unit) -> bool:
    """Can torch unit ``tu`` fill flax unit ``fu`` exactly (shape-wise)?"""
    if fu.kind in ("conv", "dense") and tu.kind in ("conv", "dense"):
        # bias presence must agree — same-shaped biased/unbiased convs
        # coexist (e.g. MLFN's fsm vs fm chains) and must not cross-match
        if (fu.arrays.get("bias") is None) != (tu.arrays.get("bias") is None):
            return False
    if fu.kind == "conv" and tu.kind == "conv":
        o, i, kh, kw = tu.arrays["kernel"].shape
        fh, fw, fi, fo = fu.arrays["kernel"].shape
        return (kh, kw, o) == (fh, fw, fo) and fi in (i, i // max(fi, 1) * fi)
    if fu.kind == "dense" and tu.kind == "dense":
        return tu.arrays["kernel"].shape[::-1] == fu.arrays["kernel"].shape
    if fu.kind == "dense" and tu.kind == "conv":
        o, i, kh, kw = tu.arrays["kernel"].shape
        return (kh, kw) == (1, 1) and (i, o) == fu.arrays["kernel"].shape
    if fu.kind == "conv" and tu.kind == "dense":
        fh, fw, fi, fo = fu.arrays["kernel"].shape
        return (fh, fw) == (1, 1) and (fo, fi) == tu.arrays["kernel"].shape
    if fu.kind in ("bn", "affine") and tu.kind in ("bn", "affine"):
        if fu.kind != tu.kind:
            return False
        fs = fu.shape("scale") or fu.shape("bias")
        ts = tu.shape("scale") or tu.shape("bias")
        return fs == ts
    if fu.kind == "param" and tu.kind == "param":
        # layout may differ (NCHW (1,C,1,1) vs NHWC (1,1,1,C)): match on
        # squeezed shape, reshape at convert
        return tuple(d for d in fu.shape("value") if d != 1) == tuple(
            d for d in tu.shape("value") if d != 1)
    return False


def _converted(tu: Unit, fu: Unit) -> Dict[str, np.ndarray]:
    out = {}
    if fu.kind == "param":
        return {"value": tu.arrays["value"].reshape(
            fu.arrays["value"].shape)}
    if fu.kind == "conv":
        k = tu.arrays["kernel"]
        if tu.kind == "dense":
            k = k[:, :, None, None]
        out["kernel"] = np.transpose(k, (2, 3, 1, 0))
    elif fu.kind == "dense":
        k = tu.arrays["kernel"]
        if tu.kind == "conv":
            k = k[:, :, 0, 0]
        out["kernel"] = np.transpose(k, (1, 0))
    for f in ("bias", "scale", "mean", "var"):
        if fu.arrays.get(f) is not None and tu.arrays.get(f) is not None:
            out[f] = tu.arrays[f]
    return out


def convert_torch_zoo(
    state_dict,
    variables,
    lookahead: int = 160,
    allow_missing: Tuple[str, ...] = ("classifier",),
    verbose: bool = False,
) -> Tuple[Dict, List[str]]:
    """Align ``state_dict`` onto ``variables`` and return
    ``(new_variables, skipped_flax_paths)``.

    Alignment walks the flax units in execution order, consuming torch units
    from a FIFO pending pool first, then scanning ahead up to ``lookahead``
    units (skipped ones land in the pool). A flax unit with no compatible
    torch unit is left at its current value if its path contains one of
    ``allow_missing`` substrings (partial load, reference
    ``init_pretrained_weights`` semantics) — otherwise it is an error.
    """
    tus = torch_units(state_dict)
    fus = flax_units(variables)

    assignments: Dict[str, Tuple[Unit, Unit]] = {}
    consumed = [False] * len(tus)
    ti = 0          # scan frontier: units < ti are "seen"
    last = -1       # index of the last matched torch unit
    skipped: List[str] = []
    for fu in fus:
        match_i: Optional[int] = None
        # 1. adjacency: the unit right after the last match — torch
        # registers conv->bn (or bn->conv) pairs adjacently, and shape
        # alone cannot tell same-width norm layers apart. Peeking is
        # limited to seen units plus the frontier itself; a frontier
        # adjacency match advances the frontier so chains of successors
        # (conv -> bn -> next conv at cell starts, nasnet's factorized
        # reduce -> final_path_bn) stay adjacent without ever jumping
        # blindly ahead.
        adj_i: Optional[int] = None
        j = last + 1
        while j < len(tus) and consumed[j]:
            j += 1
        if j < len(tus) and j <= ti and _convertible(tus[j], fu):
            adj_i = j
        # 2. seen-but-unconsumed pool, in order
        pool_i: Optional[int] = None
        for j in range(ti):
            if j != adj_i and not consumed[j] and _convertible(tus[j], fu):
                pool_i = j
                break
        # Adjacency wins by default; a pool candidate overrides it only
        # when its name-token overlap is strictly better (mlfn executes
        # fm_conv3 before downsample while torch registers fsm ->
        # downsample adjacently — shapes collide, names don't).
        if adj_i is not None and pool_i is not None:
            match_i = (pool_i if _name_score(tus[pool_i], fu)
                       > _name_score(tus[adj_i], fu) else adj_i)
        elif adj_i is not None:
            match_i = adj_i
        elif pool_i is not None:
            match_i = pool_i
        if match_i == adj_i and match_i == ti:
            ti = match_i + 1
        # 3. scan ahead
        if match_i is None:
            scanned = 0
            while ti < len(tus) and scanned <= lookahead:
                j = ti
                ti += 1
                if consumed[j]:
                    continue  # taken via the adjacency fast path
                scanned += 1
                if _convertible(tus[j], fu):
                    match_i = j
                    break
        if match_i is None:
            if any(s in fu.name for s in allow_missing):
                skipped.append(fu.name)
                continue
            near = [u.name for i, u in enumerate(tus[:ti])
                    if not consumed[i]][-4:] + \
                [u.name for u in tus[ti:ti + 4]]
            raise ValueError(
                f"No torch unit matches flax {fu.kind} '{fu.name}' "
                f"(shape {fu.shape('kernel') or fu.shape('scale')}); "
                f"candidates near cursor: {near}")
        consumed[match_i] = True
        last = match_i
        match = tus[match_i]
        assignments[fu.name] = (match, fu)
        if verbose:
            print(f"  {match.name} -> {fu.name} [{fu.kind}]")

    leftovers = [u for i, u in enumerate(tus)
                 if not consumed[i]]
    real_left = [u for u in leftovers
                 if not any(s in u.name for s in allow_missing)]
    if real_left:
        warnings.warn(
            f"{len(real_left)} torch unit(s) unused in conversion: "
            f"{[u.name for u in real_left[:6]]}...")

    return _apply(variables, assignments), skipped


def _apply(variables, assignments):
    import jax.numpy as jnp

    try:
        import flax
        var = flax.core.unfreeze(variables)
    except Exception:
        var = dict(variables)

    def set_path(tree, path, key, value, like):
        node = tree
        for p in path:
            node = node[p]
        node[key] = jnp.asarray(value, dtype=like.dtype if hasattr(
            like, "dtype") else jnp.float32)

    for name, (tu, fu) in assignments.items():
        path = tuple(name.split("/"))
        conv = _converted(tu, fu)
        if fu.kind == "param":
            # path includes the leaf name itself
            set_path(var["params"], path[:-1], path[-1], conv["value"],
                     fu.arrays["value"])
            continue
        for key in ("kernel", "bias", "scale"):
            if key in conv and fu.arrays.get(key) is not None:
                set_path(var["params"], path, key, conv[key], fu.arrays[key])
        if fu.kind == "bn":
            for key in ("mean", "var"):
                if key in conv:
                    set_path(var["batch_stats"], path, key, conv[key],
                             fu.arrays[key])
    return var


def graft_zoo(variables, state_dict, **kw):
    """Convenience: convert + return new variables (drops the skip list)."""
    new_var, _ = convert_torch_zoo(state_dict, variables, **kw)
    return new_var
