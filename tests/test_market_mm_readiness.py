"""Market1501-MM mAP-parity readiness check (round-4 VERDICT item 5).

Mirror of tests/test_rgbnt201_readiness.py for the paper's second dataset:
Market1501 converted to the 3-modal RGBNT201 layout (reference
``torchreid/data/datasets/image/market_to_RGBNT201.py:15-78``; paper Table 1
row: IEEE mAP 64.32 / R1 83.93). Skipped until the dataset and a reference
checkpoint exist locally; then the parity bar is one pytest away:

    IEEE_TPU_MARKET_MM_ROOT=/data \
    IEEE_TPU_REF_CHECKPOINT_MARKET=/data/model.pth.tar-50 \
    python -m pytest tests/test_market_mm_readiness.py -x -q

``IEEE_TPU_MARKET_MM_ROOT`` is the parent of ``market1501_to_RGBNT201/``
(train/ query/ gallery/, each with RGB/ NI/ TI/ of identically-named jpgs);
``IEEE_TPU_REF_CHECKPOINT_MARKET`` a torch checkpoint of the reference's
IEEE3modalPart trained on it (raw state_dict or the reference
save_checkpoint dict).
"""

from __future__ import annotations

import os
import os.path as osp

import pytest

ROOT = os.environ.get("IEEE_TPU_MARKET_MM_ROOT", "")
CKPT = os.environ.get("IEEE_TPU_REF_CHECKPOINT_MARKET", "")

pytestmark = [
    pytest.mark.e2e,
    pytest.mark.skipif(
        not (ROOT and osp.isdir(osp.join(ROOT, "market1501_to_RGBNT201"))),
        reason="market1501_to_RGBNT201 dataset not present "
               "(set IEEE_TPU_MARKET_MM_ROOT)"),
    pytest.mark.skipif(
        not (CKPT and osp.isfile(CKPT)),
        reason="reference checkpoint not present "
               "(set IEEE_TPU_REF_CHECKPOINT_MARKET)"),
]

# paper Table 1 Market1501-MM row (BASELINE.md); override for re-trained
# checkpoints whose published numbers differ
EXPECT_MAP = float(os.environ.get("IEEE_TPU_EXPECT_MAP_MARKET", "64.32"))
TOL_PTS = 0.5


def test_market_mm_eval_parity_vs_reference_checkpoint():
    import torch

    from ieee_tpu.data import ImageDataManager
    from ieee_tpu.engine import Image3MEngine
    from ieee_tpu.models import build_model
    from ieee_tpu.models.ieee_converter import convert_ieee_torch_checkpoint

    sd = torch.load(CKPT, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.removeprefix("module."): v.numpy() for k, v in sd.items()}

    dm = ImageDataManager(
        root=ROOT, sources="market_to_RGBNT201", height=256, width=128,
        batch_size_train=8, batch_size_test=100, workers=2,
        train_sampler="RandomIdentitySampler", num_instances=4,
        transforms=["random_flip"], verbose=True,
    )
    model = build_model("ieee3modalPart",
                        num_classes=dm.num_train_pids, loss="margin",
                        pretrained=False)
    params, stats = convert_ieee_torch_checkpoint(sd)
    eng = Image3MEngine(dm, model, seed=0)
    eng.state = eng._place_state(eng.state.replace(
        params=params, batch_stats=stats))

    rank1, mAP = eng._evaluate(
        dataset_name="market_to_RGBNT201",
        query_loader=dm.test_loader["market_to_RGBNT201"]["query"],
        gallery_loader=dm.test_loader["market_to_RGBNT201"]["gallery"],
        dist_metric="euclidean", ranks=(1, 5, 10))

    got_pts = 100.0 * float(mAP)
    assert abs(got_pts - EXPECT_MAP) < TOL_PTS, (
        f"Market1501-MM mAP {got_pts:.2f} vs expected {EXPECT_MAP:.2f} "
        f"(tolerance {TOL_PTS} pt)")
