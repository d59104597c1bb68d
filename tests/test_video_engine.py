import numpy as np

from ieee_tpu.data import VideoDataManager
from ieee_tpu.engine import VideoSoftmaxEngine, VideoTripletEngine
from ieee_tpu.models import build_model
from ieee_tpu.optim import build_lr_scheduler, build_optimizer
import pytest

pytestmark = pytest.mark.e2e


def _make_dm():
    return VideoDataManager(
        sources="synthetic_video", height=64, width=32, batch_size_train=4,
        batch_size_test=4, workers=0, train_sampler="RandomIdentitySampler",
        num_instances=2, seq_len=4, num_pids=6, tracklets_per_pid=4,
        frames_per_tracklet=6, verbose=False, seed=0,
    )


def test_video_softmax_engine_end_to_end(tmp_path):
    dm = _make_dm()
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    tx = build_optimizer(optim="sgd", lr=0.01, momentum=0.9)
    sched = build_lr_scheduler("single_step", stepsize=20, base_lr=0.01)
    eng = VideoSoftmaxEngine(dm, model, optimizer=tx, scheduler=sched,
                             pooling_method="avg", seed=0)
    rank1 = eng.run(save_dir=str(tmp_path), max_epoch=1, eval_freq=-1,
                    print_freq=2, ranks=(1,))
    assert np.isfinite(rank1)


def test_video_batch_folding():
    dm = _make_dm()
    batch = next(iter(dm.train_loader))
    # (B, S, H, W, C) uint8 tracklet batches
    assert batch["img"].shape == (4, 4, 64, 32, 3)

    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    tx = build_optimizer(optim="sgd", lr=0.01)
    eng = VideoSoftmaxEngine(dm, model, optimizer=tx,
                             scheduler=lambda e: 0.01, seed=0)

    imgs, pids = eng._put_batch(batch)
    assert imgs.shape == (16, 64, 32, 3)  # frames folded into batch
    assert pids.shape == (16,)
    # pids repeated per frame
    assert (np.asarray(pids).reshape(4, 4) ==
            batch["pid"][:, None]).all()


def test_video_put_batch_delegates_to_shared_placement(monkeypatch):
    """The video _put_batch folds frames then routes through the base
    engine's _put_arrays — the ONE place implementing multi-host
    global-array assembly (make_array_from_process_local_data) and
    rank-aware spatial sharding. Regression: the override used plain
    jax.device_put, which would silently feed per-process slices as if
    replicated on multi-host video runs."""
    dm = _make_dm()
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    eng = VideoSoftmaxEngine(dm, model,
                             optimizer=build_optimizer(optim="sgd", lr=0.01),
                             scheduler=lambda e: 0.01, seed=0)
    batch = next(iter(dm.train_loader))
    seen = {}
    orig = eng._put_arrays

    def spy(imgs, pids):
        seen["imgs"] = imgs.shape
        seen["pids"] = pids.shape
        return orig(imgs, pids)

    monkeypatch.setattr(eng, "_put_arrays", spy)
    imgs, pids = eng._put_batch(batch)
    assert seen["imgs"] == (16, 64, 32, 3)  # folded BEFORE placement
    assert seen["pids"] == (16,)
    assert imgs.shape == (16, 64, 32, 3)
