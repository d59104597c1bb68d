"""Tests for the tools/ scripts (parse_test_res, compute_mean_std CLI glue,
gnn rerank CLI contract)."""

import os.path as osp
import pickle
import re
import subprocess
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_parse_test_res(tmp_path):
    (tmp_path / "split0").mkdir()
    (tmp_path / "split1").mkdir()
    (tmp_path / "split0" / "test.log").write_text(
        "** Results **\nmAP: 46.4%\nCMC curve\nRank-1  : 47.1%\n"
        "Rank-5  : 58.5%\nRank-10 : 64.2%\n"
    )
    (tmp_path / "split1" / "test.log").write_text(
        "** Results **\nmAP: 44.4%\nCMC curve\nRank-1  : 45.1%\n"
        "Rank-5  : 56.5%\nRank-10 : 62.2%\n"
    )
    out = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "parse_test_res.py"),
         str(tmp_path)],
        capture_output=True, text=True, check=True,
    ).stdout
    assert "mAP: 45.4%" in out
    assert "r1: 46.1%" in out


def test_gnn_rerank_cli(tmp_path):
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((6, 16))
    feats, pids = [], []
    for p in range(6):
        feats.append(centers[p] + 0.1 * rng.standard_normal((5, 16)))
        pids.extend([p] * 5)
    feats = np.concatenate(feats).astype(np.float32)
    pids = np.asarray(pids)
    cams = np.arange(len(pids)) % 3
    mask = np.arange(len(feats)) % 3 == 0
    data = {
        "query_f": feats[mask], "gallery_f": feats[~mask],
        "query_pid": pids[mask], "gallery_pid": pids[~mask],
        "query_cam": cams[mask], "gallery_cam": cams[~mask],
    }
    pkl = tmp_path / "features.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(data, f)
    out = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "gnn_rerank_cli.py"),
         "--data", str(pkl), "--k1", "8", "--k2", "3", "--cpu"],
        capture_output=True, text=True, check=True, timeout=300,
    ).stdout
    m = re.search(r"mAP: ([\d.]+)%", out)
    assert m and float(m.group(1)) > 50.0


def test_visactmap_on_synthetic(tmp_path):
    """Exercise the activation-map visualization core on synthetic data."""
    import sys

    sys.path.insert(0, osp.join(REPO, "tools"))
    import jax

    from ieee_tpu.data import ImageDataManager
    from ieee_tpu.models import build_model
    from visualize_actmap import visactmap

    dm = ImageDataManager(
        sources="synthetic", height=64, width=32, batch_size_train=4,
        batch_size_test=4, workers=0, num_pids=4, imgs_per_pid=2,
        verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=4, loss="softmax",
                        pretrained=False)
    v = model.init_variables(0, batch=2, height=64, width=32)
    visactmap(model, v, dm.test_loader, str(tmp_path), width=32, height=64,
              modal="RGB", max_batches=1)
    import os

    out_dir = tmp_path / "actmap_synthetic"
    assert out_dir.exists() and len(os.listdir(out_dir)) > 0
