"""Multi-chip (8-device virtual CPU mesh) tests: full train step + eval
under SPMD data sharding — the framework's parallelism strategy
(SURVEY §2.8; replaces the reference's nn.DataParallel)."""

import numpy as np
import pytest

import jax

from ieee_tpu.data import ImageDataManager
from ieee_tpu.engine import Image3MEngine, ImageSoftmaxEngine
from ieee_tpu.models import build_model
from ieee_tpu.optim import build_optimizer
from ieee_tpu.parallel import make_mesh

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh([8], ("data",))


def test_train_step_sharded_over_mesh(mesh8):
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0, train_sampler="RandomIdentitySampler",
        num_instances=4, num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    tx = build_optimizer(optim="sgd", lr=0.01, momentum=0.9)
    eng = ImageSoftmaxEngine(dm, model, optimizer=tx,
                             scheduler=lambda e: 0.01, mesh=mesh8, seed=0)
    step = eng._build_train_step()
    data = next(iter(dm.train_loader))
    imgs, pids = eng._put_batch(data)
    # batch really is sharded over 8 devices
    assert len(imgs.sharding.device_set) == 8
    eng.state, metrics = step(eng.state, imgs, pids, jax.random.PRNGKey(0),
                              0.01, None)
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated after the update
    leaf = jax.tree_util.tree_leaves(eng.state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sync_batchnorm_knob_changes_bn_stats(mesh8):
    """cfg.tpu.sync_batchnorm: True = BN stats over the GLOBAL batch (pjit
    semantics); False = per-replica stats via shard_map, running stats
    cross-replica-averaged (DataParallel-faithful). The two must differ on a
    batch whose per-shard statistics differ, and per-replica must equal a
    hand-computed mean of per-shard BN updates."""
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0, train_sampler="RandomIdentitySampler",
        num_instances=4, num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)

    def one_step(sync):
        tx = build_optimizer(optim="sgd", lr=0.0)  # lr=0: isolate BN stats
        eng = ImageSoftmaxEngine(dm, model, optimizer=tx,
                                 scheduler=lambda e: 0.0, mesh=mesh8, seed=0,
                                 sync_batchnorm=sync)
        step = eng._build_train_step()
        data = next(iter(dm.train_loader))
        imgs, pids = eng._put_batch(data)
        eng.state, _ = step(eng.state, imgs, pids, jax.random.PRNGKey(0),
                            0.0, None)
        return jax.tree_util.tree_map(np.asarray, eng.state.batch_stats)

    stats_sync = one_step(True)
    stats_rep = one_step(False)
    leaves_s = jax.tree_util.tree_leaves(stats_sync)
    leaves_r = jax.tree_util.tree_leaves(stats_rep)
    # means agree (mean of per-shard means == global mean, equal shards) but
    # variances must differ (E[var_shard] < global var when shard means vary)
    diffs = [np.max(np.abs(a - b)) for a, b in zip(leaves_s, leaves_r)]
    assert max(diffs) > 1e-6


def test_build_engine_wires_tpu_knobs(mesh8):
    from ieee_tpu.config import get_default_config
    from ieee_tpu.engine import build_engine
    from ieee_tpu.optim import build_optimizer as bo

    cfg = get_default_config()
    cfg.model.name = "resnet18"
    cfg.loss.name = "softmax"
    cfg.tpu.mesh_shape = [8]
    cfg.tpu.sync_batchnorm = False
    cfg.tpu.donate = False
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0, num_pids=8, imgs_per_pid=8,
        verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False,
                        dtype=cfg.tpu.compute_dtype)
    eng = build_engine(cfg, dm, model, bo(optim="sgd", lr=0.01),
                       lambda e: 0.01)
    assert tuple(eng.mesh.devices.shape) == (8,)
    assert eng.sync_batchnorm is False
    assert eng.donate is False


def test_build_engine_wires_compiler_options(mesh8):
    """cfg.tpu.compiler_options "flag=value" strings reach the engine as the
    per-jit XLA option dict (tools/xla_flag_sweep.py winners land here)."""
    from ieee_tpu.config import get_default_config
    from ieee_tpu.engine import build_engine
    from ieee_tpu.optim import build_optimizer as bo

    cfg = get_default_config()
    cfg.model.name = "resnet18"
    cfg.loss.name = "softmax"
    cfg.tpu.mesh_shape = [8]
    cfg.tpu.compiler_options = ["xla_tpu_scoped_vmem_limit_kib=65536"]
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0, num_pids=8, imgs_per_pid=8,
        verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False,
                        dtype=cfg.tpu.compute_dtype)
    eng = build_engine(cfg, dm, model, bo(optim="sgd", lr=0.01),
                       lambda e: 0.01)
    assert eng.compiler_options == {
        "xla_tpu_scoped_vmem_limit_kib": "65536"}
    # jit construction with options must not raise (compilation — where an
    # unknown flag would be rejected — only happens on first call)
    eng._build_train_step()


def test_build_engine_wires_round3_knobs(mesh8):
    """cfg.tpu.rerank_bf16 / cfg.tpu.fused_eval reach the engine."""
    from ieee_tpu.config import get_default_config
    from ieee_tpu.engine import build_engine
    from ieee_tpu.optim import build_optimizer as bo

    cfg = get_default_config()
    cfg.model.name = "resnet18"
    cfg.loss.name = "softmax"
    cfg.tpu.mesh_shape = [4, 2]
    cfg.tpu.mesh_axes = ["data", "model"]
    cfg.tpu.rerank_bf16 = True
    cfg.tpu.fused_eval = True
    cfg.tpu.spatial_parallel = True
    cfg.train.accum_steps = 2
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0, num_pids=8, imgs_per_pid=8,
        verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False,
                        dtype=cfg.tpu.compute_dtype)
    eng = build_engine(cfg, dm, model, bo(optim="sgd", lr=0.01),
                       lambda e: 0.01)
    assert eng.rerank_bf16 is True
    assert eng.fused_eval is True
    assert eng.spatial_parallel is True
    assert eng.accum_steps == 2


def test_compiler_options_without_equals_is_a_clear_error():
    """A cfg.tpu.compiler_options entry missing '=' must raise a ValueError
    naming the bad string, not an opaque dict-update error."""
    import pytest

    from ieee_tpu.engine import _parse_compiler_options

    with pytest.raises(ValueError, match="xla_tpu_bogus_flag"):
        _parse_compiler_options(["xla_tpu_bogus_flag"])
    assert _parse_compiler_options(["a=1", "b=x=y"]) == {
        "a": "1", "b": "x=y"}


def test_multimodal_train_and_eval_on_mesh(mesh8, tmp_path):
    dm = ImageDataManager(
        sources="synthetic_mm", height=32, width=16, batch_size_train=8,
        batch_size_test=8, workers=0, train_sampler="RandomIdentitySampler",
        num_instances=4, num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("ieee3modalPart", num_classes=dm.num_train_pids,
                        loss="margin", pretrained=False,
                        backbone_layers=(1, 1, 1, 1), parts=2)
    tx = build_optimizer(optim="sgd", lr=0.001, momentum=0.9)
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=lambda e: 0.001,
                        mesh=mesh8, margin=1.0, seed=0)
    rank1 = eng.run(save_dir=str(tmp_path), max_epoch=1, eval_freq=-1,
                    print_freq=100, ranks=(1,))
    assert np.isfinite(rank1)


def _tp_mesh():
    return make_mesh([4, 2], ("data", "model"))


def test_tensor_parallel_train_step_matches_replicated():
    """cfg.tpu.tensor_parallel on a 2-D (data, model) mesh: wide layers are
    really sharded over the model axis, the train step runs, and the loss
    matches the replicated 1-D-mesh run (GSPMD inserts the collectives —
    the program is semantically identical)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0, train_sampler="RandomIdentitySampler",
        num_instances=4, num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)

    data = next(iter(dm.train_loader))  # the sampler is stateful: fetch once

    def one_step(mesh, tp):
        tx = build_optimizer(optim="sgd", lr=0.01, momentum=0.9)
        eng = ImageSoftmaxEngine(dm, model, optimizer=tx,
                                 scheduler=lambda e: 0.01, mesh=mesh, seed=0,
                                 tensor_parallel=tp)
        step = eng._build_train_step()
        imgs, pids = eng._put_batch(data)
        eng.state, metrics = step(eng.state, imgs, pids,
                                  jax.random.PRNGKey(0), 0.01, None)
        return eng, float(metrics["loss"])

    eng_tp, loss_tp = one_step(_tp_mesh(), True)
    # wide leaves (last dim >= 512, divisible) are distributed, small ones
    # replicated — check one of each
    specs = {
        "/".join(str(k.key) for k in path): leaf.sharding.spec
        for path, leaf in jax.tree_util.tree_leaves_with_path(
            eng_tp.state.params)
    }
    sharded = [k for k, s in specs.items() if "model" in s]
    assert sharded, f"no param sharded over the model axis: {list(specs)[:5]}"
    assert any(leaf.sharding.is_fully_replicated
               for leaf in jax.tree_util.tree_leaves(eng_tp.state.params))
    # moments inherit the param shardings (memory actually distributed)
    opt_leaves = jax.tree_util.tree_leaves(eng_tp.state.opt_state)
    assert any(
        getattr(l.sharding, "spec", None) is not None
        and "model" in l.sharding.spec
        for l in opt_leaves if hasattr(l, "sharding")
    )

    _, loss_rep = one_step(make_mesh([8], ("data",)), False)
    assert np.isfinite(loss_tp)
    np.testing.assert_allclose(loss_tp, loss_rep, rtol=2e-2)


def test_tensor_parallel_training_converges():
    """Tensor parallelism must TRAIN, not just step: ~15 steps on the
    (data, model) mesh drive the softmax loss well below its start (the
    step-parity test above pins one step; this pins the trajectory —
    optimizer-moment shardings, lr injection, and donation all compose)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0, train_sampler="RandomIdentitySampler",
        num_instances=4, num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    tx = build_optimizer(optim="adam", lr=1e-3)
    eng = ImageSoftmaxEngine(dm, model, optimizer=tx,
                             scheduler=lambda e: 1e-3, mesh=_tp_mesh(),
                             seed=0, tensor_parallel=True)
    step = eng._build_train_step()
    key = jax.random.PRNGKey(0)
    losses = []
    it = iter(dm.train_loader)
    for i in range(20):
        try:
            data = next(it)
        except StopIteration:
            it = iter(dm.train_loader)
            data = next(it)
        imgs, pids = eng._put_batch(data)
        key, sub = jax.random.split(key)
        eng.state, metrics = step(eng.state, imgs, pids, sub, 1e-3, None)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # batch 16 over 64 images is noisy per step: compare window means
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.25, losses


def test_resume_restores_mesh_placement():
    """Checkpoint resume deserializes to host numpy leaves; the engine must
    re-place them on the mesh (tensor-parallel shardings included) before
    the next jitted step — engine.py Engine._place_state."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0, num_pids=8, imgs_per_pid=8,
        verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    eng = ImageSoftmaxEngine(dm, model,
                             optimizer=build_optimizer(optim="sgd", lr=0.01),
                             scheduler=lambda e: 0.01, mesh=_tp_mesh(),
                             seed=0, tensor_parallel=True)
    # simulate what utils.checkpoint.from_bytes hands back: host numpy leaves
    host_state = jax.tree.map(np.asarray, eng.state)
    placed = eng._place_state(host_state)
    specs = [
        leaf.sharding.spec
        for leaf in jax.tree_util.tree_leaves(placed.params)
        if hasattr(leaf, "sharding")
    ]
    assert any("model" in s for s in specs), specs[:5]
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(placed.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(eng.state.params)[0]))


def test_tensor_parallel_requires_model_axis():
    """tensor_parallel=True on a mesh without a model axis raises instead of
    silently running replicated (review finding, engine.py)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0, num_pids=8, imgs_per_pid=8,
        verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    with pytest.raises(ValueError, match="model"):
        ImageSoftmaxEngine(dm, model,
                           optimizer=build_optimizer(optim="sgd", lr=0.01),
                           scheduler=lambda e: 0.01,
                           mesh=make_mesh([8], ("data",)),
                           seed=0, tensor_parallel=True)


def test_tensor_parallel_requires_sync_batchnorm():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0, num_pids=8, imgs_per_pid=8,
        verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    with pytest.raises(ValueError, match="sync_batchnorm"):
        ImageSoftmaxEngine(dm, model,
                           optimizer=build_optimizer(optim="sgd", lr=0.01),
                           scheduler=lambda e: 0.01, mesh=_tp_mesh(),
                           seed=0, tensor_parallel=True,
                           sync_batchnorm=False)


def test_spatial_parallel_step_matches_replicated():
    """cfg.tpu.spatial_parallel on a 2-D (data, model) mesh: image batches
    shard (batch, height), the compiled step spatially partitions the convs
    (halo exchanges -> collective-permute in the HLO), params stay
    replicated, and the loss matches the replicated 1-D run (layout-only
    change; the math is the single-device program)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0, train_sampler="RandomIdentitySampler",
        num_instances=4, num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    data = next(iter(dm.train_loader))  # the sampler is stateful: fetch once

    def one_step(mesh, sp):
        tx = build_optimizer(optim="sgd", lr=0.01, momentum=0.9)
        eng = ImageSoftmaxEngine(dm, model, optimizer=tx,
                                 scheduler=lambda e: 0.01, mesh=mesh, seed=0,
                                 spatial_parallel=sp)
        step = eng._build_train_step()
        imgs, pids = eng._put_batch(data)
        if sp:
            # the batch is really laid out (data, model) on the mesh
            assert tuple(imgs.sharding.spec) == ("data", "model")
            txt = step.lower(eng.state, imgs, pids, jax.random.PRNGKey(0),
                             0.01, None, None).compile().as_text()
            # halo exchanges prove the convs run spatially partitioned
            assert txt.count("collective-permute") > 0, \
                "no halo exchange: GSPMD gathered H instead of partitioning"
        eng.state, metrics = step(eng.state, imgs, pids,
                                  jax.random.PRNGKey(0), 0.01, None, None)
        if sp:
            # params replicated (sp is a layout change, not weight sharding)
            assert all(l.sharding.is_fully_replicated
                       for l in jax.tree_util.tree_leaves(eng.state.params))
        return float(metrics["loss"])

    loss_sp = one_step(make_mesh([2, 4], ("data", "model")), True)
    loss_rep = one_step(make_mesh([8], ("data",)), False)
    assert np.isfinite(loss_sp)
    np.testing.assert_allclose(loss_sp, loss_rep, rtol=5e-3)


def test_spatial_parallel_validation():
    """spatial_parallel needs a model axis, sync BN, and is exclusive with
    tensor_parallel."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0, num_pids=8, imgs_per_pid=8,
        verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    kw = dict(optimizer=build_optimizer(optim="sgd", lr=0.01),
              scheduler=lambda e: 0.01, seed=0)
    with pytest.raises(ValueError, match="model"):
        ImageSoftmaxEngine(dm, model, mesh=make_mesh([8], ("data",)),
                           spatial_parallel=True, **kw)
    with pytest.raises(ValueError, match="one or the other"):
        ImageSoftmaxEngine(dm, model, mesh=_tp_mesh(),
                           spatial_parallel=True, tensor_parallel=True, **kw)
    with pytest.raises(ValueError, match="sync_batchnorm"):
        ImageSoftmaxEngine(dm, model, mesh=_tp_mesh(),
                           spatial_parallel=True, sync_batchnorm=False, **kw)


def test_shard_opt_state_zero1_matches_replicated():
    """cfg.tpu.shard_opt_state (ZeRO-1): optimizer moments shard over the
    data axis (each device owns 1/N), params stay replicated, the updated
    moments keep their shards across the jitted step, and the step's math
    matches the replicated run (layout-only change)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0, train_sampler="RandomIdentitySampler",
        num_instances=4, num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False, dtype="float32")
    data = next(iter(dm.train_loader))  # the sampler is stateful: fetch once
    mesh = make_mesh([8], ("data",))

    def one_step(zero):
        tx = build_optimizer(optim="adam", lr=0.01)  # adam: real moments
        eng = ImageSoftmaxEngine(dm, model, optimizer=tx,
                                 scheduler=lambda e: 0.01, mesh=mesh, seed=0,
                                 shard_opt_state=zero)
        if zero:
            sharded = [
                l for l in jax.tree_util.tree_leaves(eng.state.opt_state)
                if hasattr(l, "sharding")
                and not l.sharding.is_fully_replicated]
            assert sharded, "ZeRO-1 placed no moment on the data axis"
            assert all(len(l.sharding.device_set) == 8 for l in sharded)
        step = eng._build_train_step()
        imgs, pids = eng._put_batch(data)
        eng.state, metrics = step(eng.state, imgs, pids,
                                  jax.random.PRNGKey(0), 0.01, None, None)
        if zero:
            # updated moments kept their shards (the constraint held)
            sharded = [
                l for l in jax.tree_util.tree_leaves(eng.state.opt_state)
                if hasattr(l, "sharding")
                and not l.sharding.is_fully_replicated]
            assert sharded, "step output re-replicated the moments"
            # params replicated (ZeRO stage 1, not 2/3)
            assert all(l.sharding.is_fully_replicated
                       for l in jax.tree_util.tree_leaves(eng.state.params))
        return float(metrics["loss"]), eng.state

    loss_z, state_z = one_step(True)
    loss_r, state_r = one_step(False)
    np.testing.assert_allclose(loss_z, loss_r, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves_with_path(state_z.params),
                    jax.tree_util.tree_leaves_with_path(state_r.params)):
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                                   rtol=1e-4, atol=1e-6, err_msg=str(a[0]))


def test_shard_opt_state_validation_and_wiring():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0, num_pids=8, imgs_per_pid=8,
        verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    kw = dict(optimizer=build_optimizer(optim="sgd", lr=0.01),
              scheduler=lambda e: 0.01, seed=0)
    with pytest.raises(ValueError, match="shard_opt_state"):
        ImageSoftmaxEngine(dm, model, mesh=_tp_mesh(), shard_opt_state=True,
                           tensor_parallel=True, **kw)
    from ieee_tpu.config import get_default_config
    from ieee_tpu.engine import build_engine

    cfg = get_default_config()
    cfg.model.name = "resnet18"
    cfg.loss.name = "softmax"
    cfg.tpu.mesh_shape = [8]
    cfg.tpu.shard_opt_state = True
    eng = build_engine(cfg, dm, model,
                       build_optimizer(optim="sgd", lr=0.01), lambda e: 0.01)
    assert eng.shard_opt_state is True
    assert eng._opt_shardings is not None


def test_image_sharding_rank_aware():
    """Under spatial_parallel the image sharding is rank-dispatched: 4-D
    NHWC shards H at dim 1, 5-D video tracklets (B,S,H,W,C) shard H at
    dim 2 — never the frame axis — and non-image ranks (pids) shard axis 0
    only. Regression: eval used to apply P('data','model') to 5-D video
    batches, sharding frames instead of height."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0, num_pids=8, imgs_per_pid=8,
        verbose=False, seed=0,
    )
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    eng = ImageSoftmaxEngine(dm, model,
                             optimizer=build_optimizer(optim="sgd", lr=0.01),
                             scheduler=lambda e: 0.01, mesh=_tp_mesh(),
                             seed=0, spatial_parallel=True)
    assert tuple(eng._image_sharding(4).spec) == ("data", "model")
    assert tuple(eng._image_sharding(5).spec) == ("data", None, "model")
    assert tuple(eng._image_sharding(1).spec) == ("data",)
    # without spatial_parallel everything is plain batch sharding
    eng2 = ImageSoftmaxEngine(dm, model,
                              optimizer=build_optimizer(optim="sgd", lr=0.01),
                              scheduler=lambda e: 0.01,
                              mesh=make_mesh([8], ("data",)), seed=0)
    assert tuple(eng2._image_sharding(5).spec) == ("data",)
