"""Zoo-wide torch->flax conversion + forward parity tests.

For each zoo family: load the REFERENCE's own torch model by path
(/root/reference/torchreid/models/<file>.py), randomly initialize it, mutate
its BN running stats with a train-mode forward, convert its ``state_dict``
into our flax model with the generic ``zoo_converter``, and assert eval-mode
forward parity — the same anchor style as test_reference_model_parity.py
uses for IEEE. This is the test the reference's per-file
``init_pretrained_weights`` (e.g. ``osnet.py:505-553``, ``senet.py:15-80``)
implies: a torch-pretrained checkpoint must be loadable and equivalent.
"""

from __future__ import annotations

import importlib.util
import os.path as osp
import sys
import types

import numpy as np
import pytest

import jax

REF_MODELS = "/root/reference/torchreid/models"

pytestmark = pytest.mark.skipif(
    not osp.isdir(REF_MODELS), reason="reference checkout not present"
)


def _load_ref_model_module(fname: str, name: str):
    torch = pytest.importorskip("torch")
    del torch
    path = osp.join(REF_MODELS, fname)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _torch_eval_features(tmodel, x_nchw):
    import torch

    tmodel.eval()
    with torch.no_grad():
        out = tmodel(torch.from_numpy(x_nchw))
    if isinstance(out, (tuple, list)):
        # hacnn eval returns (x_global, x_local); our model concatenates
        out = torch.cat(list(out), 1)
    return out.numpy()


def _mutate_running_stats(tmodel, x_nchw, steps: int = 2):
    """Run train-mode forwards so BN running stats move off the (0, 1)
    init — otherwise mean/var conversion goes untested."""
    import torch

    tmodel.train()
    with torch.no_grad():
        for _ in range(steps):
            tmodel(torch.from_numpy(x_nchw))


def _convert_and_compare(ref_file, ref_factory, our_name, hw=(64, 32),
                         rtol=1e-3, atol=2e-3, num_classes=7, **factory_kw):
    import torch

    from ieee_tpu.models import build_model
    from ieee_tpu.models.zoo_converter import convert_torch_zoo

    h, w = hw
    mod = _load_ref_model_module(ref_file, f"ref_{ref_factory}")
    torch.manual_seed(0)
    if ref_factory.startswith("class:"):
        # reference files that export only the nn.Module class (hacnn,
        # mudeep — never registered in the reference factory either)
        tmodel = getattr(mod, ref_factory[len("class:"):])(
            num_classes=num_classes, loss="softmax", use_gpu=False,
            **factory_kw)
    else:
        tmodel = getattr(mod, ref_factory)(
            num_classes=num_classes, loss="softmax", pretrained=False,
            **factory_kw)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, h, w), np.float32)
    _mutate_running_stats(tmodel, x)
    want = _torch_eval_features(tmodel, x)

    model = build_model(our_name, num_classes=num_classes, loss="softmax",
                        pretrained=False, dtype="float32")
    variables = model.init_variables(jax.random.PRNGKey(0), batch=2,
                                     height=h, width=w)
    new_vars, skipped = convert_torch_zoo(tmodel.state_dict(), variables)
    # only head layers may go unconverted (num_classes matches here, so
    # really nothing but genuinely-missing units should be skipped)
    assert all("classifier" in s for s in skipped), skipped

    got = np.asarray(
        model.apply(new_vars, np.transpose(x, (0, 2, 3, 1)), train=False),
        np.float32)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)


# --- fast tier: the two smallest families ------------------------------
def test_osnet_converter_parity():
    _convert_and_compare("osnet.py", "osnet_x0_25", "osnet_x0_25")


def test_mobilenetv2_converter_parity():
    _convert_and_compare("mobilenetv2.py", "mobilenetv2_x1_0",
                         "mobilenetv2_x1_0")


def test_apply_pretrained_zoo_path(tmp_path, monkeypatch):
    """build_model(pretrained=True) + apply_pretrained warm-starts a zoo
    model from a local <arch>.pth via the generic converter (the reference's
    per-file init_pretrained_weights equivalent)."""
    import torch

    from ieee_tpu.models import apply_pretrained, build_model

    mod = _load_ref_model_module("osnet.py", "ref_osnet_pth")
    torch.manual_seed(3)
    tmodel = mod.osnet_x0_25(num_classes=5, loss="softmax", pretrained=False)
    x = np.random.default_rng(1).standard_normal((2, 3, 64, 32), np.float32)
    _mutate_running_stats(tmodel, x)
    torch.save(tmodel.state_dict(), tmp_path / "osnet_x0_25.pth")
    monkeypatch.setenv("IEEE_TPU_PRETRAINED_DIR", str(tmp_path))

    model = build_model("osnet_x0_25", num_classes=5, pretrained=True,
                        dtype="float32")
    variables = model.init_variables(jax.random.PRNGKey(0), batch=2,
                                     height=64, width=32)
    warm = apply_pretrained(model, variables)
    got = np.asarray(model.apply(warm, np.transpose(x, (0, 2, 3, 1)),
                                 train=False), np.float32)
    want = _torch_eval_features(tmodel, x)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


# --- e2e tier: the rest of the zoo -------------------------------------
@pytest.mark.e2e
@pytest.mark.parametrize("ref_file,ref_factory,our_name,hw", [
    ("osnet.py", "osnet_ibn_x1_0", "osnet_ibn_x1_0", (64, 32)),
    ("osnet_ain.py", "osnet_ain_x0_25", "osnet_ain_x0_25", (64, 32)),
    ("senet.py", "se_resnet50", "se_resnet50", (64, 32)),
    ("senet.py", "senet154", "senet154", (64, 32)),
    ("densenet.py", "densenet121", "densenet121", (64, 32)),
    ("shufflenetv2.py", "shufflenet_v2_x0_5", "shufflenet_v2_x0_5",
     (64, 32)),
    ("shufflenet.py", "shufflenet", "shufflenet", (64, 32)),
    ("squeezenet.py", "squeezenet1_0", "squeezenet1_0", (64, 32)),
    ("xception.py", "xception", "xception", (128, 64)),
    ("inceptionv4.py", "inceptionv4", "inceptionv4", (160, 96)),
    ("inceptionresnetv2.py", "inceptionresnetv2", "inceptionresnetv2",
     (160, 96)),
    ("mlfn.py", "mlfn", "mlfn", (64, 32)),
    ("hacnn.py", "class:HACNN", "hacnn", (160, 64)),
    ("mudeep.py", "class:MuDeep", "mudeep", (256, 128)),
    ("resnetmid.py", "resnet50mid", "resnet50mid", (64, 32)),
    ("pcb.py", "pcb_p6", "pcb_p6", (96, 48)),
    ("resnet_ibn_a.py", "resnet50_ibn_a", "resnet50_ibn_a", (64, 32)),
    ("resnet_ibn_b.py", "resnet50_ibn_b", "resnet50_ibn_b", (64, 32)),
    # odd spatial dims on purpose: stresses the z-pad/crop reduction-cell
    # semantics (ZeroPad2d((1,0,1,0)) + [1:,1:] crops)
    ("nasnet.py", "nasnetamobile", "nasnetamobile", (128, 64)),
])
def test_zoo_converter_parity(ref_file, ref_factory, our_name, hw):
    _convert_and_compare(ref_file, ref_factory, our_name, hw=hw)
