"""Serving export: serialize the eval forward to a self-contained StableHLO
artifact via ``jax.export``.

The reference has no serving path beyond pickled torch modules
(``torchreid/utils/feature_extractor.py:13-152`` is its inference surface);
this is the TPU-native equivalent for production deployment: the trained
weights and the test-time preprocessing are BAKED INTO one ahead-of-time
serialized program (uint8 images in, features out) that any JAX runtime of
the same platform can load and call with zero framework code — no Python
model classes, no checkpoint plumbing, stable across process restarts.

Static shapes by design (XLA semantics): one artifact per (batch, H, W)
signature; pad the tail batch like ``Engine._feature_extraction`` does.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np


def export_eval_forward(
    model,
    variables,
    batch: int,
    height: int,
    width: int,
    num_streams: int = 1,
    transform: Optional[Callable] = None,
    in_dtype=np.uint8,
    platforms: Optional[Sequence[str]] = None,
    forward: Optional[Callable] = None,
) -> bytes:
    """Serialize ``features = model(preprocess(imgs))`` with weights baked in.

    ``transform`` is the test-time device transform (resize is host-side, so
    inputs are already (B, H, W, 3); the baked transform does the float
    conversion + normalization exactly like ``Engine._build_eval_step``).
    ``num_streams > 1`` exports a multi-modal signature — a tuple of
    ``num_streams`` image batches, as the IEEE 3-modal model consumes.
    ``platforms`` pins the lowering platforms (e.g. ``["tpu"]``); default is
    the current backend. ``forward`` overrides the serialized program (e.g.
    the quantized ``models/int8_eval.export_forward_int8``); it must accept
    the same ``*image_batches`` signature.
    """
    import jax
    from jax import export as jexport

    def default_fwd(*imgs):
        ims = tuple(
            transform(m) if transform is not None else m for m in imgs
        )
        if num_streams == 1:
            (ims,) = ims
        return model.module.apply(variables, ims, train=False)

    fwd = forward if forward is not None else default_fwd

    spec = jax.ShapeDtypeStruct((batch, height, width, 3), in_dtype)
    specs = (spec,) * num_streams
    exported = jexport.export(
        jax.jit(fwd),
        platforms=tuple(platforms) if platforms else None,
    )(*specs)
    return bytes(exported.serialize())


def load_exported(data: bytes) -> Callable:
    """Deserialize an exported artifact into a callable.

    Returns ``fn(*image_batches) -> features`` matching the exported
    signature exactly (shape/dtype-checked by the jax.export calling
    convention).
    """
    from jax import export as jexport

    exported = jexport.deserialize(bytearray(data))

    def fn(*imgs):
        return exported.call(*imgs)

    fn.exported = exported
    return fn
