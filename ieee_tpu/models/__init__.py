"""Model factory + registry.

Reference analog: ``torchreid/models/__init__.py:28-111`` (``__model_factory``
dict, ``build_model``, ``show_avai_models``). Registered zoo grows per
SURVEY §2.3's completeness target; each factory returns a ``ReIDModel``.
"""

from __future__ import annotations

import warnings
from typing import Callable, Dict

import jax.numpy as jnp

from .base import ReIDModel
from .ieee3modal import IEEE3modalPart
from .resnet import RESNET_SPECS, ReIDResNet
from . import converter
from .graph import GAT, GraphAttentionLayer, GraphConvolution, gen_A, gen_adj

__model_factory: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        __model_factory[name] = fn
        return fn

    return deco


def show_avai_models():
    """Displays available models (reference ``models/__init__.py:70-77``)."""
    print(sorted(__model_factory.keys()))
    return sorted(__model_factory.keys())


_COMPUTE_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
}


def build_model(
    name: str,
    num_classes: int,
    loss: str = "softmax",
    pretrained: bool = True,
    use_gpu: bool = True,
    dtype=None,
    **kwargs,
) -> ReIDModel:
    """Build a model from the registry (reference ``models/__init__.py:80-111``).
    ``use_gpu`` kept for signature parity; device placement is jit's concern.
    ``dtype`` (str or jnp dtype) overrides the MXU compute dtype
    (``cfg.tpu.compute_dtype``); params stay float32 masters regardless."""
    del use_gpu
    avai = sorted(__model_factory.keys())
    if name not in __model_factory:
        raise KeyError(f"Unknown model: {name}. Must be one of {avai}")
    if dtype is not None:
        if isinstance(dtype, str):
            if dtype not in _COMPUTE_DTYPES:
                raise ValueError(
                    f"unknown compute dtype {dtype!r}; choose from "
                    f"{sorted(_COMPUTE_DTYPES)}"
                )
            dtype = _COMPUTE_DTYPES[dtype]
        kwargs["dtype"] = dtype
    return __model_factory[name](
        num_classes=num_classes, loss=loss, pretrained=pretrained, **kwargs
    )


# ---------------------------------------------------------------------------
# ResNet family
# ---------------------------------------------------------------------------

def _make_reid_resnet(arch, num_classes, loss, pretrained, last_stride=2,
                      fc_dims=None, dtype=jnp.bfloat16, **kwargs):
    block, layers, groups, wpg = RESNET_SPECS[arch]
    module = ReIDResNet(
        num_classes=num_classes,
        loss=loss,
        block=block,
        layers=layers,
        groups=groups,
        width_per_group=wpg,
        last_stride=last_stride,
        fc_dims=fc_dims,
        dtype=dtype,
    )
    feature_dim = fc_dims[-1] if fc_dims else 512 * (4 if block == "bottleneck" else 1)
    meta = {"trunks": {"trunk": arch} if pretrained else {}, "arch": arch,
            "block": block, "layers": layers}
    return ReIDModel(
        module=module,
        name=arch,
        num_classes=num_classes,
        loss=loss,
        num_streams=1,
        feature_dim=feature_dim,
        meta=meta,
    )


for _arch in RESNET_SPECS:
    def _factory(num_classes, loss="softmax", pretrained=True, _arch=_arch, **kw):
        return _make_reid_resnet(_arch, num_classes, loss, pretrained, **kw)

    __model_factory[_arch] = _factory


@register_model("resnet50_fc512")
def resnet50_fc512(num_classes, loss="softmax", pretrained=True, **kw):
    return _make_reid_resnet(
        "resnet50", num_classes, loss, pretrained, last_stride=1,
        fc_dims=[512], **kw
    )


# ---------------------------------------------------------------------------
# IEEE multi-modal
# ---------------------------------------------------------------------------

@register_model("ieee3modalPart")
def ieee3modal_part(
    num_classes,
    loss="softmax",
    pretrained=True,
    parts=6,
    interaction=True,
    attention=True,
    using_REM=True,
    backbone_layers=(3, 4, 6, 3),
    dtype=jnp.bfloat16,
    fused_1x1=None,
    block_megakernel=None,
    **kwargs,
):
    """The IEEE model (reference factory ``ieee3modalPart``,
    ``models/ieee3modalPart.py:542-555``). Ablation flags map to the
    reference's ``interaction/attention/using_REM`` attributes.
    ``backbone_layers`` shrinks the trunks for CI-scale tests."""
    module = IEEE3modalPart(
        num_classes=num_classes,
        loss=loss,
        parts=parts,
        interaction=interaction,
        attention=attention,
        using_REM=using_REM,
        backbone_layers=tuple(backbone_layers),
        dtype=dtype,
        fused_1x1=fused_1x1,
        block_megakernel=block_megakernel,
    )
    meta = {
        "trunks": (
            {f"backbone_{m}": "resnet50" for m in "RNT"} if pretrained else {}
        ),
        "parts": parts,
    }
    return ReIDModel(
        module=module,
        name="ieee3modalPart",
        num_classes=num_classes,
        loss=loss,
        num_streams=3,
        feature_dim=parts * 128 * 3,
        meta=meta,
    )


@register_model("resnet50_ieee_3modal")
def resnet50_ieee_3modal(num_classes, loss="softmax", pretrained=True,
                         dtype=jnp.bfloat16, **kwargs):
    """Analog of the reference's ``resnet50_ieee_3modal`` factory
    (``models/resnet.py:1265-1280``): a headless trunk whose forward takes
    ``(rest, one_feat)`` and returns the layer-4 map; the per-stage fusion
    in the reference is commented out of its own forward (dead code), so
    only the trunk (+ a discarded side branch) remains. Exposed for
    inventory completeness — the reference never registers it either."""
    from .resnet import ResNetIEEE3Modal

    module = ResNetIEEE3Modal(layers=(3, 4, 6, 3), last_stride=1, dtype=dtype)
    return ReIDModel(
        module=module, name="resnet50_ieee_3modal", num_classes=num_classes,
        loss=loss, num_streams=1, feature_dim=2048,
        meta={"arch": "resnet50", "trunks": {"trunk": "resnet50"}
              if pretrained else {}},
    )


def _wrap_trunk(trunk_partial, arch, num_classes, loss, feature_dim,
                fc_dims=None, dropout_p=None, dtype=jnp.bfloat16, meta=None,
                pretrained=False):
    from .heads import TrunkWithHead

    module = TrunkWithHead(
        trunk=trunk_partial, num_classes=num_classes, loss=loss,
        fc_dims=fc_dims, dropout_p=dropout_p, dtype=dtype,
    )
    meta = meta or {"arch": arch, "trunks": {}}
    if pretrained:
        # generic whole-model warm start (zoo_converter) from a local
        # torch state_dict named after the arch — the TPU analog of the
        # reference's per-file init_pretrained_weights
        meta.setdefault("zoo_pretrained", arch)
    return ReIDModel(
        module=module, name=arch, num_classes=num_classes, loss=loss,
        num_streams=1,
        feature_dim=fc_dims[-1] if fc_dims else feature_dim,
        meta=meta,
    )


def _register_trunk_models():
    from functools import partial

    from .densenet import DENSENET_CFG, DenseNetTrunk
    from .mobilenetv2 import MobileNetV2Trunk
    from .resnet_ibn import ResNetIBNTrunk
    from .senet import SENET_SPECS, SENetTrunk
    from .shufflenetv2 import SHUFFLENETV2_CFG, ShuffleNetV2Trunk
    from .squeezenet import SqueezeNetTrunk

    def add(name, trunk_partial, feature_dim, fc_dims=None):
        def factory(num_classes, loss="softmax", pretrained=True,
                    _t=trunk_partial, _n=name, _f=feature_dim,
                    _fc=fc_dims, **kw):
            return _wrap_trunk(_t, _n, num_classes, loss, _f, fc_dims=_fc,
                               pretrained=pretrained, **kw)

        __model_factory[name] = factory

    for arch, (layers, groups, reduction, wpg) in SENET_SPECS.items():
        add(arch, partial(SENetTrunk, layers=layers, groups=groups,
                          reduction=reduction, width_per_group=wpg), 2048)
    add("se_resnet50_fc512",
        partial(SENetTrunk, layers=(3, 4, 6, 3), last_stride=1), 2048,
        fc_dims=[512])
    # SENet154 (reference senet.py:530-546): 154-style blocks, groups=64,
    # 3x 3x3 stem; unregistered in the reference factory but fully
    # implemented there — ported for completeness
    add("senet154", partial(SENetTrunk, layers=(3, 8, 36, 3), groups=64,
                            reduction=16, style_154=True), 2048)

    for arch, (gr, cfg, init_f) in DENSENET_CFG.items():
        feat = init_f
        for i, n in enumerate(cfg):
            feat += n * gr
            if i != len(cfg) - 1:
                feat //= 2
        add(arch, partial(DenseNetTrunk, growth_rate=gr, block_config=cfg,
                          num_init_features=init_f), feat)
    add("densenet121_fc512",
        partial(DenseNetTrunk, growth_rate=32, block_config=(6, 12, 24, 16),
                num_init_features=64), 1024, fc_dims=[512])

    add("mobilenetv2_x1_0", partial(MobileNetV2Trunk, width_mult=1.0), 1280)
    add("mobilenetv2_x1_4", partial(MobileNetV2Trunk, width_mult=1.4), 1792)

    for arch, (reps, outs) in SHUFFLENETV2_CFG.items():
        add(arch, partial(ShuffleNetV2Trunk, stages_repeats=reps,
                          stages_out=outs), outs[-1])

    add("squeezenet1_0", partial(SqueezeNetTrunk, version="1_0"), 512)
    add("squeezenet1_0_fc512", partial(SqueezeNetTrunk, version="1_0"), 512,
        fc_dims=[512])
    add("squeezenet1_1", partial(SqueezeNetTrunk, version="1_1"), 512)

    add("resnet50_ibn_a", partial(ResNetIBNTrunk, variant="a"), 2048)
    add("resnet50_ibn_b", partial(ResNetIBNTrunk, variant="b"), 2048)

    from .inceptionresnetv2 import InceptionResNetV2Trunk
    from .inceptionv4 import InceptionV4Trunk
    from .shufflenet import ShuffleNetTrunk
    from .xception import XceptionTrunk

    add("xception", partial(XceptionTrunk), 2048)
    add("inceptionv4", partial(InceptionV4Trunk), 1536)
    add("inceptionresnetv2", partial(InceptionResNetV2Trunk), 1536)
    add("shufflenet", partial(ShuffleNetTrunk, groups=3), 960)


_register_trunk_models()


def _register_osnet_variants():
    from .osnet import OSNET_WIDTHS, OSNet

    def add_osnet(name, widths, conv1_IN=False, in_pattern=None,
                  post_in_pattern=None):
        def factory(num_classes, loss="softmax", pretrained=True,
                    dtype=jnp.bfloat16, _w=widths, _cin=conv1_IN,
                    _pat=in_pattern, _post=post_in_pattern, _n=name, **kw):
            module = OSNet(
                num_classes=num_classes, loss=loss, widths=_w,
                conv1_IN=_cin,
                in_pattern=_pat or ((False, False),) * 3,
                post_in_pattern=_post or ((False, False),) * 3, dtype=dtype,
            )
            meta = {"arch": _n, "trunks": {}}
            if pretrained:
                meta["zoo_pretrained"] = _n
            return ReIDModel(module=module, name=_n,
                             num_classes=num_classes, loss=loss,
                             num_streams=1, feature_dim=512,
                             meta=meta)

        __model_factory[name] = factory

    # osnet_ibn: IN stem + post-add IN on stage-1 blocks (reference
    # osnet.py osnet_ibn_x1_0 factory: OSNet(..., IN=True) -> conv1 IN and
    # conv2's blocks get IN applied after the residual add)
    add_osnet("osnet_ibn_x1_0", OSNET_WIDTHS["osnet_x1_0"], conv1_IN=True,
              post_in_pattern=((True, True), (False, False), (False, False)))
    # osnet_ain: IN stem + mixed OSBlockINin pattern
    # (reference osnet_ain.py:536-560: stage1=[INin,INin],
    #  stage2=[plain,INin], stage3=[INin,plain])
    ain_pattern = ((True, True), (False, True), (True, False))
    for suffix in ("x1_0", "x0_75", "x0_5", "x0_25"):
        add_osnet(f"osnet_ain_{suffix}", OSNET_WIDTHS[f"osnet_{suffix}"],
                  conv1_IN=True, in_pattern=ain_pattern)


_register_osnet_variants()


@register_model("nasnetamobile")
def nasnetamobile(num_classes, loss="softmax", pretrained=True,
                  dtype=jnp.bfloat16, **kw):
    from .nasnet import NASNetAMobile

    module = NASNetAMobile(num_classes=num_classes, loss=loss, dtype=dtype)
    return ReIDModel(module=module, name="nasnetamobile",
                     num_classes=num_classes, loss=loss, num_streams=1,
                     feature_dim=1056, meta={"trunks": {}})


# reference registry typo kept as an alias (``models/__init__.py:56``)
__model_factory["nasnsetmobile"] = __model_factory["nasnetamobile"]


@register_model("pcb_p6")
def pcb_p6(num_classes, loss="softmax", pretrained=True, parts=6,
           backbone_layers=(3, 4, 6, 3), dtype=jnp.bfloat16, **kw):
    from .pcb import PCB

    module = PCB(num_classes=num_classes, loss=loss, parts=parts,
                 backbone_layers=tuple(backbone_layers), dtype=dtype)
    return ReIDModel(
        module=module, name=f"pcb_p{parts}", num_classes=num_classes,
        loss=loss, num_streams=1, feature_dim=parts * 2048,
        meta={"trunks": {"trunk": "resnet50"} if pretrained else {}},
    )


@register_model("pcb_p4")
def pcb_p4(num_classes, loss="softmax", pretrained=True, **kw):
    return pcb_p6(num_classes, loss, pretrained, parts=4, **kw)


@register_model("mlfn")
def mlfn(num_classes, loss="softmax", pretrained=True, dtype=jnp.bfloat16,
         **kw):
    from .mlfn import MLFN

    module = MLFN(num_classes=num_classes, loss=loss, dtype=dtype)
    return ReIDModel(module=module, name="mlfn", num_classes=num_classes,
                     loss=loss, num_streams=1, feature_dim=1024,
                     meta={"trunks": {}})


@register_model("hacnn")
def hacnn(num_classes, loss="softmax", pretrained=True, learn_region=True,
          dtype=jnp.bfloat16, **kw):
    from .hacnn import HACNN

    module = HACNN(num_classes=num_classes, loss=loss,
                   learn_region=learn_region, dtype=dtype)
    return ReIDModel(module=module, name="hacnn", num_classes=num_classes,
                     loss=loss, num_streams=1,
                     feature_dim=1024 if learn_region else 512,
                     meta={"trunks": {}, "input_hw": (160, 64)})


@register_model("mudeep")
def mudeep(num_classes, loss="softmax", pretrained=True, dtype=jnp.bfloat16,
           **kw):
    from .mudeep import MuDeep

    module = MuDeep(num_classes=num_classes, loss=loss, dtype=dtype)
    return ReIDModel(module=module, name="mudeep", num_classes=num_classes,
                     loss=loss, num_streams=1, feature_dim=4096,
                     meta={"trunks": {}, "input_hw": (256, 128)})


@register_model("resnet50mid")
def resnet50mid(num_classes, loss="softmax", pretrained=True,
                dtype=jnp.bfloat16, **kw):
    from .resnetmid import ResNetMid

    module = ResNetMid(num_classes=num_classes, loss=loss, fc_dims=(1024,),
                       dtype=dtype)
    return ReIDModel(module=module, name="resnet50mid",
                     num_classes=num_classes, loss=loss, num_streams=1,
                     feature_dim=1024 + 2048, meta={"trunks": {}})


def _make_osnet(arch, num_classes, loss, pretrained, dtype=jnp.bfloat16, **kw):
    from .osnet import OSNET_WIDTHS, OSNet

    module = OSNet(num_classes=num_classes, loss=loss,
                   widths=OSNET_WIDTHS[arch], dtype=dtype)
    meta = {"arch": arch, "trunks": {}}
    if pretrained:
        meta["zoo_pretrained"] = arch
    return ReIDModel(
        module=module, name=arch, num_classes=num_classes, loss=loss,
        num_streams=1, feature_dim=512, meta=meta,
    )


for _arch in ("osnet_x1_0", "osnet_x0_75", "osnet_x0_5", "osnet_x0_25"):
    def _osnet_factory(num_classes, loss="softmax", pretrained=True,
                       _arch=_arch, **kw):
        return _make_osnet(_arch, num_classes, loss, pretrained, **kw)

    __model_factory[_arch] = _osnet_factory


@register_model("pfnet")
def pfnet(num_classes, loss="softmax", pretrained=True, parts=2,
          backbone_layers=(3, 4, 6, 3), dtype=jnp.bfloat16, **kwargs):
    """PFNet baseline (reference ``models/pfnet.py:476-490``; registered here
    although the reference leaves it out of its factory)."""
    from .pfnet import PFNET

    module = PFNET(
        num_classes=num_classes, loss=loss, parts=parts,
        backbone_layers=tuple(backbone_layers), dtype=dtype,
    )
    meta = {
        "trunks": (
            {f"backbone_{i}": "resnet50" for i in range(3)} if pretrained else {}
        ),
        "parts": parts,
    }
    return ReIDModel(
        module=module, name="pfnet", num_classes=num_classes, loss=loss,
        num_streams=3, feature_dim=parts * 256 * 5, meta=meta,
    )


def _apply_zoo_pretrained(model: ReIDModel, variables):
    """Whole-model warm start via the generic zoo converter: load a local
    torch state_dict named after the arch and align it onto the variable
    tree (models/zoo_converter.py). The reference equivalent is the
    ``init_pretrained_weights`` block in every zoo model file
    (``osnet.py:505-553``, ``senet.py:15-80``, ...)."""
    import os
    import os.path as osp

    arch = model.meta.get("zoo_pretrained")
    if not arch:
        return variables
    candidates = list(converter.pretrained_search_paths(arch))
    for r in (osp.expanduser("~/.cache/torch/hub/checkpoints"),
              os.environ.get("IEEE_TPU_PRETRAINED_DIR", "")):
        if r and osp.isdir(r):
            candidates += [osp.join(r, f) for f in sorted(os.listdir(r))
                           if f.startswith(arch) and f.endswith(".pth")]
    for path in candidates:
        if not osp.isfile(path) or path.endswith(".npz"):
            continue
        try:
            import torch

            from .zoo_converter import convert_torch_zoo

            sd = torch.load(path, map_location="cpu", weights_only=True)
            if "state_dict" in sd:
                sd = sd["state_dict"]
            sd = {(k[len("module."):] if k.startswith("module.") else k): v
                  for k, v in sd.items()}
            new_vars, _ = convert_torch_zoo(sd, variables)
            return new_vars
        except Exception as e:
            warnings.warn(f"Failed zoo pretrained load from {path}: {e}")
    warnings.warn(
        f"No local pretrained weights for {arch} "
        f"(set IEEE_TPU_PRETRAINED_DIR); using random init")
    return variables


def apply_pretrained(model: ReIDModel, variables):
    """Graft ImageNet-pretrained trunk weights into freshly-initialized
    variables, for every trunk the model's meta declares — plus the generic
    whole-model zoo path for non-ResNet archs. No-op (with a warning) when
    no weight file is available locally."""
    trunks = model.meta.get("trunks", {})
    if not trunks:
        return _apply_zoo_pretrained(model, variables)
    cache = {}
    for trunk_name, arch in trunks.items():
        if arch not in cache:
            cache[arch] = converter.load_pretrained_trunk(
                arch,
                block=RESNET_SPECS[arch][0],
                layers=RESNET_SPECS[arch][1],
            )
        loaded = cache[arch]
        if loaded is None:
            warnings.warn(
                f"No local pretrained weights for {arch} "
                f"(set IEEE_TPU_PRETRAINED_DIR); using random init"
            )
            return variables
        variables = converter.graft_trunk(variables, loaded[0], loaded[1], trunk_name)
    return variables


__all__ = [
    "build_model",
    "show_avai_models",
    "register_model",
    "apply_pretrained",
    "ReIDModel",
]
