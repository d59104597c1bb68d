"""Training-trajectory parity against the reference's OWN code.

Round-2 VERDICT item 2 (second half): train the reference's real
``IEEE3modalPart`` + ``multiModalMarginLossNew`` + ``CrossEntropyLoss`` +
``DeepSupervision`` (imported from /root/reference by path) with
``torch.optim.SGD``, and our flax model through ``Image3MEngine``'s real
train step (executed eagerly — a full-depth CPU jit compile is minutes),
from the SAME converted initial weights on the SAME batch sequence.
Asserts per-step total-loss parity, final eval-feature parity, and
CMC/mAP-within-noise on a synthetic retrieval split.

The torch loop mirrors ``engine/image/margin.py:94-125`` statement by
statement (loss = weight_m*3M + weight_x*(CE_R+CE_N+CE_T) with
DeepSupervision summing per-part CE, ``losses/__init__.py:8-29``).
"""

from __future__ import annotations

import importlib
import importlib.machinery
import importlib.util
import os.path as osp
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"

pytestmark = [
    pytest.mark.e2e,
    pytest.mark.skipif(not osp.isdir(REF_ROOT),
                       reason="reference checkout not present"),
]

P, K = 4, 2          # 4 pids x 2 instances = batch 8
NUM_CLASSES = 6
H, W = 96, 48        # -> 6x3 final map, divisible by the (6,1) part pool
N_STEPS = 6
LR = 0.001  # the reference config's lr (RGBNT_ieee_part_margin.yaml)


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        # a real ModuleSpec so later importlib.util.find_spec(name) calls
        # (e.g. from optional-dependency probes) don't choke on the stub
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
    for k, v in attrs.items():
        if not hasattr(mod, k):
            setattr(mod, k, v)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Reference models package + losses package, imported from
    /root/reference by path with dead-import stubs."""
    np_mod = importlib.import_module("numpy")
    _stub("numpy.lib.function_base", _flip_dispatcher=None,
          append=np_mod.append, _parse_input_dimensions=None)
    tv = _stub("torchvision")
    tv.models = _stub("torchvision.models")
    _stub("tqdm", tqdm=lambda x, *a, **k: x)
    _stub("torchreid")
    _stub("torchreid.data")
    _stub("torchreid.data.transforms", ColorAugmentation=type(
        "ColorAugmentation", (), {}))

    models_pkg = types.ModuleType("refmodels")
    models_pkg.__path__ = [osp.join(REF_ROOT, "torchreid", "models")]
    sys.modules.setdefault("refmodels", models_pkg)
    models = importlib.import_module("refmodels.ieee3modalPart")

    losses_pkg = types.ModuleType("reflosses")
    losses_pkg.__path__ = [osp.join(REF_ROOT, "torchreid", "losses")]
    sys.modules.setdefault("reflosses", losses_pkg)
    spec = importlib.util.spec_from_file_location(
        "reflosses.__init__",
        osp.join(REF_ROOT, "torchreid", "losses", "__init__.py"),
        submodule_search_locations=losses_pkg.__path__,
    )
    losses = importlib.util.module_from_spec(spec)
    losses.__package__ = "reflosses"
    sys.modules["reflosses.__init__"] = losses
    spec.loader.exec_module(losses)
    return models, losses


def _batches():
    """Deterministic (imgs_nchw x3, pids) sequence shared by both sides.
    Pids rotate over NUM_CLASSES with K consecutive instances per pid
    (the RandomIdentitySampler / 3M-loss batch contract)."""
    rng = np.random.default_rng(42)
    out = []
    for s in range(N_STEPS):
        ids = (np.arange(P) + s) % NUM_CLASSES
        pids = np.repeat(ids, K).astype(np.int64)
        imgs = [rng.standard_normal((P * K, 3, H, W)).astype(np.float32) * 0.1
                for _ in range(3)]
        out.append((imgs, pids))
    return out


def _eval_split():
    """Structured retrieval split: each identity is a base pattern, each
    instance the base + small jitter. Same-id image distance << cross-id
    distance, so the CNN's rankings carry real signal that is STABLE under
    the ~1e-3 feature divergence accumulated between the two
    implementations — with iid-random images, rankings are chance and mAP
    flips on numerical noise (measured: 6-pt swings), proving nothing."""
    rng = np.random.default_rng(7)
    n_q, n_g = 8, 24
    bases = [rng.standard_normal((NUM_CLASSES, 3, H, W)).astype(np.float32)
             * 0.1 for _ in range(3)]

    def make(pids):
        return [
            (b[pids] + rng.standard_normal((len(pids), 3, H, W))
             .astype(np.float32) * 0.02)
            for b in bases
        ]

    q_pids = rng.integers(0, NUM_CLASSES, n_q)
    g_pids = rng.integers(0, NUM_CLASSES, n_g)
    q_imgs, g_imgs = make(q_pids), make(g_pids)
    q_camids = np.zeros(n_q, np.int64)
    g_camids = np.ones(n_g, np.int64)
    return q_imgs, g_imgs, q_pids, g_pids, q_camids, g_camids


def test_training_trajectory_matches_reference(ref):
    import torch

    import jax
    import jax.numpy as jnp

    from ieee_tpu.data import ImageDataManager
    from ieee_tpu.engine import Image3MEngine
    from ieee_tpu.engine.engine import TrainState
    from ieee_tpu.models import build_model
    from ieee_tpu.models.ieee_converter import convert_ieee_torch_checkpoint
    from ieee_tpu.ops.ranking import eval_market1501_numpy
    from ieee_tpu.optim import build_optimizer
    from ieee_tpu.parallel import replicate

    ref_models, ref_losses = ref

    # ---- reference side -------------------------------------------------
    torch.manual_seed(0)
    rmodel = ref_models.ieee3modalPart(num_classes=NUM_CLASSES, loss="margin",
                                       pretrained=False)
    sd0 = {k: v.clone() for k, v in rmodel.state_dict().items()}
    crit_x = ref_losses.CrossEntropyLoss(num_classes=NUM_CLASSES,
                                         use_gpu=False, label_smooth=True)
    crit_m = ref_losses.multiModalMarginLossNew(margin=1.0, dist_type="l2")
    opt = torch.optim.SGD(rmodel.parameters(), lr=LR, momentum=0.9,
                          weight_decay=5e-4)

    batches = _batches()
    ref_losses_per_step = []
    rmodel.train()
    for imgs, pids in batches:
        timgs = [torch.tensor(m) for m in imgs]
        tpids = torch.tensor(pids)
        out_R, out_N, out_T, f_R, f_N, f_T = rmodel(timgs)
        loss = crit_m(f_R, f_N, f_T, tpids)
        loss = loss + (ref_losses.DeepSupervision(crit_x, out_R, tpids)
                       + ref_losses.DeepSupervision(crit_x, out_N, tpids)
                       + ref_losses.DeepSupervision(crit_x, out_T, tpids))
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses_per_step.append(float(loss.detach()))

    q_imgs, g_imgs, q_pids, g_pids, q_camids, g_camids = _eval_split()
    rmodel.eval()
    with torch.no_grad():
        ref_qf = rmodel([torch.tensor(m) for m in q_imgs]).numpy()
        ref_gf = rmodel([torch.tensor(m) for m in g_imgs]).numpy()

    # ---- our side: the REAL engine step, eagerly ------------------------
    params0, stats0 = convert_ieee_torch_checkpoint(
        {k: v.numpy() for k, v in sd0.items()}
    )
    dm = ImageDataManager(
        sources="synthetic_mm", height=H, width=W,
        batch_size_train=P * K, batch_size_test=8, workers=0,
        train_sampler="RandomIdentitySampler", num_instances=K,
        num_pids=NUM_CLASSES, imgs_per_pid=K, verbose=False, seed=0,
    )
    model = build_model("ieee3modalPart", num_classes=NUM_CLASSES,
                        loss="margin", pretrained=False, dtype="float32")
    tx = build_optimizer(optim="sgd", lr=LR, momentum=0.9, weight_decay=5e-4)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("data",))
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=lambda e: LR,
                        margin=1.0, weight_m=1.0, weight_x=1.0,
                        label_smooth=True, seed=0, mesh=mesh, donate=False)
    # identical float batches on both sides: no device augmentation
    eng.datamanager.transform_tr = lambda key, x: x
    eng.state = replicate(mesh, TrainState(
        params=params0, batch_stats=stats0, opt_state=tx.init(params0),
        step=jnp.zeros((), jnp.int32),
    ))
    step_fn = eng._build_train_step()

    key = jax.random.PRNGKey(0)
    our_losses_per_step = []
    with jax.disable_jit():
        for i, (imgs, pids) in enumerate(batches):
            jimgs = tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
                          for m in imgs)
            eng.state, m = step_fn(eng.state, jimgs, jnp.asarray(pids),
                                   jax.random.fold_in(key, i), LR, None)
            our_losses_per_step.append(float(m["loss"]))

    # Step 0 runs on identical weights: any loss-wiring bug shows here.
    # Measured agreement 1.1e-5 relative; assert an order looser.
    np.testing.assert_allclose(our_losses_per_step[0],
                               ref_losses_per_step[0], rtol=1e-4)
    # Later steps drift chaotically: ~1e-3 BN-batch-stat noise per forward
    # is amplified by SGD(lr=0.01) through 50-conv depth — measured max 3.9%
    # at step 3 with a semantically-identical step (a wiring/optimizer bug
    # shows up as 10s of percent). Envelope assert:
    np.testing.assert_allclose(our_losses_per_step, ref_losses_per_step,
                               rtol=8e-2)

    # final weights: eval features and retrieval metrics within noise
    def our_feats(imgs):
        jimgs = tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
                      for m in imgs)
        out = model.module.apply(
            {"params": eng.state.params,
             "batch_stats": eng.state.batch_stats}, jimgs, train=False)
        return np.asarray(out, np.float32)

    with jax.disable_jit():
        qf, gf = our_feats(q_imgs), our_feats(g_imgs)

    def mAP(qf, gf):
        d = (np.linalg.norm(qf[:, None] - gf[None], axis=-1) ** 2)
        cmc, m = eval_market1501_numpy(d, q_pids, g_pids, q_camids, g_camids,
                                       max_rank=5)
        return m, cmc

    ref_map, ref_cmc = mAP(ref_qf, ref_gf)
    our_map, our_cmc = mAP(qf, gf)
    assert abs(our_map - ref_map) < 0.02, (our_map, ref_map)
    np.testing.assert_allclose(our_cmc, ref_cmc, atol=0.05)
