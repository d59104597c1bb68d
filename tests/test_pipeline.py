"""Pipeline parallelism (parallel/pipeline.py): GPipe-style stage splitting
over a ('pipe', 'data') mesh. The reference has no pipeline parallelism (its
one strategy is nn.DataParallel, scripts/mainMultiModal.py:219-220; SURVEY
§2.8 "Pipeline parallel: no") — this is TPU-native extra capability, so the
contract tested here is internal: stage-sliced forwards compose to the full
forward, and the pipelined step reproduces the gradient-accumulation step's
math exactly (same microbatch semantics)."""

import contextlib
import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ieee_tpu.data import ImageDataManager
from ieee_tpu.engine import Image3MEngine, ImageSoftmaxEngine
from ieee_tpu.models import build_model
from ieee_tpu.optim import build_optimizer
from ieee_tpu.parallel import PipelinePlan, make_mesh

pytestmark = pytest.mark.e2e


def _dm(sources="synthetic", batch=8):
    return ImageDataManager(
        sources=sources, height=32, width=16, batch_size_train=batch,
        batch_size_test=batch, workers=0,
        train_sampler="RandomIdentitySampler", num_instances=4, num_pids=8,
        imgs_per_pid=8, verbose=False, seed=0,
    )


@pytest.fixture(scope="module")
def pipe_mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    return make_mesh([2, 1], ("pipe", "data"))


def test_plan_filter_merge_roundtrip(pipe_mesh):
    """Stage subtrees are disjoint, cover every param, and merge back to the
    original tree (same leaves, no copies)."""
    model = build_model("resnet18", num_classes=8, loss="softmax",
                        pretrained=False)
    variables = model.init_variables(jax.random.PRNGKey(0), batch=2,
                                     height=32, width=16)
    plan = PipelinePlan(model.module, 2, pipe_mesh)
    parts = [plan.filter_tree(variables["params"], i) for i in range(2)]
    leaves_full = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(variables["params"])}
    leaves_parts = []
    for sub in parts:
        leaves_parts += [
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(sub)]
    assert len(leaves_parts) == len(set(leaves_parts))  # disjoint
    assert set(leaves_parts) == leaves_full  # complete
    merged = plan.merge_trees(parts)
    assert jax.tree_util.tree_structure(merged) == \
        jax.tree_util.tree_structure(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(merged),
                    jax.tree_util.tree_leaves(variables["params"])):
        assert a is b


@pytest.mark.parametrize("name", ["resnet18", "ieee3modalPart"])
def test_pp_units_forward_matches_full(pipe_mesh, name):
    """Chaining the stage slices (pp_units) reproduces the full eval forward
    bit-for-bit: each stage binds only its filtered param subtree."""
    kw = dict(dtype="float32")
    if name == "ieee3modalPart":
        kw.update(backbone_layers=(1, 1, 1, 1), parts=2)
    model = build_model(name, num_classes=8,
                        loss="margin" if name == "ieee3modalPart"
                        else "softmax", pretrained=False, **kw)
    variables = model.init_variables(jax.random.PRNGKey(0), batch=2,
                                     height=32, width=16)
    rng = np.random.default_rng(0)
    if name == "ieee3modalPart":
        x = tuple(rng.standard_normal((2, 32, 16, 3)).astype(np.float32)
                  for _ in range(3))
    else:
        x = rng.standard_normal((2, 32, 16, 3)).astype(np.float32)
    full = model.module.apply(variables, x, train=False)

    plan = PipelinePlan(model.module, 2, pipe_mesh)
    y = x
    for stage in range(2):
        sub = {
            "params": plan.filter_tree(variables["params"], stage),
            "batch_stats": plan.filter_tree(
                variables.get("batch_stats", {}), stage),
        }
        y = model.module.apply(sub, y, train=False,
                               pp_units=plan.groups[stage])
    np.testing.assert_array_equal(np.asarray(y), np.asarray(full))


def test_pp_units_contiguity_enforced():
    model = build_model("resnet18", num_classes=8, loss="softmax",
                        pretrained=False)
    variables = model.init_variables(jax.random.PRNGKey(0), batch=2,
                                     height=32, width=16)
    x = np.zeros((2, 32, 16, 3), np.float32)
    with pytest.raises(ValueError, match="contiguous"):
        model.module.apply(variables, x, train=False, pp_units=(0, 2))
    with pytest.raises(ValueError, match="out of range"):
        model.module.apply(variables, x, train=False, pp_units=(7,))


def test_pipeline_step_matches_accum(pipe_mesh):
    """The pipelined train step (2 stages x 2 microbatches) must equal the
    gradient-accumulation step with accum_steps=2 — identical microbatch
    semantics: BN stats chain in microbatch order, grads average, one
    optimizer update. f32 so the tolerance keeps discriminative power."""
    dm = _dm()
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False, dtype="float32")
    tx_a = build_optimizer(optim="sgd", lr=0.1, momentum=0.9,
                           weight_decay=5e-4)
    tx_b = build_optimizer(optim="sgd", lr=0.1, momentum=0.9,
                           weight_decay=5e-4)
    eng_a = ImageSoftmaxEngine(
        dm, model, optimizer=tx_a, scheduler=lambda e: 0.1, seed=0,
        mesh=pipe_mesh, pipeline_parallel=2, pipeline_microbatches=2)
    mesh1 = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("data",))
    eng_b = ImageSoftmaxEngine(dm, model, optimizer=tx_b, mesh=mesh1,
                               scheduler=lambda e: 0.1, seed=0,
                               accum_steps=2)

    # pipeline placement really is stage-partitioned: stem on stage 0's
    # device, classifier on stage 1's
    dev_of = lambda t: {d for leaf in jax.tree_util.tree_leaves(t)
                        for d in leaf.sharding.device_set}
    d_stem = dev_of(eng_a.state.params["trunk"]["stem"])
    d_cls = dev_of(eng_a.state.params["classifier"])
    assert d_stem.isdisjoint(d_cls)

    data = next(iter(dm.train_loader))
    key = jax.random.PRNGKey(0)

    from ieee_tpu.parallel import PipelineTrainStep

    step_a = PipelineTrainStep(eng_a)
    imgs_a, pids_a = eng_a._put_batch(data)
    state_a, metrics_a = step_a(eng_a.state, imgs_a, pids_a, key, 0.1, None)

    step_b = eng_b._build_train_step()
    imgs_b, pids_b = eng_b._put_batch(data)
    state_b, metrics_b = step_b(eng_b.state, imgs_b, pids_b, key, 0.1, None,
                                None)

    np.testing.assert_allclose(float(metrics_a["loss"]),
                               float(metrics_b["loss"]), rtol=1e-5)
    for got, want in zip(
        jax.tree_util.tree_leaves_with_path(state_a.params),
        jax.tree_util.tree_leaves_with_path(state_b.params),
    ):
        np.testing.assert_allclose(
            np.asarray(got[1]), np.asarray(want[1]), rtol=1e-4, atol=5e-5,
            err_msg=str(got[0]))
    for got, want in zip(jax.tree_util.tree_leaves(state_a.batch_stats),
                         jax.tree_util.tree_leaves(state_b.batch_stats)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_fused_pipeline_matches_host_schedule(pipe_mesh):
    """The single-program GPipe wavefront (parallel/pipeline_fused.py:
    shard_map over 'pipe' + lax.switch per stage + ppermute rotation +
    grads through the scan) must reproduce the host-dispatched schedule's
    step exactly: same loss, same updated params/stats. f32 end to end."""
    dm = _dm()
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False, dtype="float32")

    def make_engine():
        tx = build_optimizer(optim="sgd", lr=0.1, momentum=0.9,
                             weight_decay=5e-4)
        return ImageSoftmaxEngine(
            dm, model, optimizer=tx, scheduler=lambda e: 0.1, seed=0,
            mesh=pipe_mesh, pipeline_parallel=2, pipeline_microbatches=2)

    from ieee_tpu.parallel import FusedPipelineTrainStep, PipelineTrainStep

    data = next(iter(dm.train_loader))
    key = jax.random.PRNGKey(0)

    eng_a = make_engine()
    step_a = FusedPipelineTrainStep(eng_a)
    imgs_a, pids_a = eng_a._put_batch(data)
    state_a, metrics_a = step_a(eng_a.state, imgs_a, pids_a, key, 0.1, None)

    eng_b = make_engine()
    step_b = PipelineTrainStep(eng_b)
    imgs_b, pids_b = eng_b._put_batch(data)
    state_b, metrics_b = step_b(eng_b.state, imgs_b, pids_b, key, 0.1, None)

    np.testing.assert_allclose(float(metrics_a["loss"]),
                               float(metrics_b["loss"]), rtol=1e-6)
    for got, want in zip(
        jax.tree_util.tree_leaves_with_path(state_a.params),
        jax.tree_util.tree_leaves_with_path(state_b.params),
    ):
        # same tolerance as the host-vs-accum parity test: one SGD step at
        # lr .1 amplifies f32 reduction-order grad noise (~5e-6 abs seen)
        np.testing.assert_allclose(
            np.asarray(got[1]), np.asarray(want[1]), rtol=1e-4, atol=1e-5,
            err_msg=str(got[0]))
    for got, want in zip(jax.tree_util.tree_leaves(state_a.batch_stats),
                         jax.tree_util.tree_leaves(state_b.batch_stats)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)
    # the updated params keep their stage placement (disjoint submeshes)
    dev_of = lambda t: {d for leaf in jax.tree_util.tree_leaves(t)
                        for d in leaf.sharding.device_set}
    assert dev_of(state_a.params["trunk"]["stem"]).isdisjoint(
        dev_of(state_a.params["classifier"]))


def test_fused_pipeline_ieee_3m_with_data_axis(tmp_path):
    """Fused schedule on a (2, 2) mesh (pipe x data) with the flagship
    3-modal model + 3M margin loss: parity vs the host schedule including
    metrics, with the batch sharded over the data axis inside each stage."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh([2, 2], ("pipe", "data"))
    dm = _dm("synthetic_mm")
    model = build_model("ieee3modalPart", num_classes=dm.num_train_pids,
                        loss="margin", pretrained=False,
                        backbone_layers=(1, 1, 1, 1), parts=2,
                        dtype="float32")

    def make_engine():
        tx = build_optimizer(optim="sgd", lr=0.1, momentum=0.9)
        return Image3MEngine(
            dm, model, optimizer=tx, scheduler=lambda e: 0.1, seed=0,
            margin=1.0, weight_m=1.0, mesh=mesh, pipeline_parallel=2,
            pipeline_microbatches=2)

    from ieee_tpu.parallel import FusedPipelineTrainStep, PipelineTrainStep

    data = next(iter(dm.train_loader))
    key = jax.random.PRNGKey(1)
    hp = {"weight_m": 1.0}

    eng_a = make_engine()
    step_a = FusedPipelineTrainStep(eng_a)
    imgs_a, pids_a = eng_a._put_batch(data)
    state_a, metrics_a = step_a(eng_a.state, imgs_a, pids_a, key, 0.1,
                                None, None, hp)

    eng_b = make_engine()
    step_b = PipelineTrainStep(eng_b)
    imgs_b, pids_b = eng_b._put_batch(data)
    state_b, metrics_b = step_b(eng_b.state, imgs_b, pids_b, key, 0.1,
                                None, None, hp)

    for k in metrics_b:
        np.testing.assert_allclose(float(metrics_a[k]),
                                   float(metrics_b[k]), rtol=1e-5,
                                   err_msg=k)
    for got, want in zip(
        jax.tree_util.tree_leaves_with_path(state_a.params),
        jax.tree_util.tree_leaves_with_path(state_b.params),
    ):
        np.testing.assert_allclose(
            np.asarray(got[1]), np.asarray(want[1]), rtol=1e-4, atol=1e-5,
            err_msg=str(got[0]))


def test_fused_pipeline_dispatch_count(pipe_mesh, monkeypatch):
    """The point of the fused schedule (round-4 VERDICT item 4): the
    host schedule dispatches O(stages x microbatches) jits per step, the
    fused one a constant ~3S+3. Measured by counting every jitted-callable
    invocation during a steady-state (post-compile) step."""
    calls = {"n": 0}
    real_jit = jax.jit

    def counting_jit(f=None, **kw):
        if f is None:
            return lambda g: counting_jit(g, **kw)
        g = real_jit(f, **kw)

        def wrapper(*a, **k):
            calls["n"] += 1
            return g(*a, **k)

        return wrapper

    monkeypatch.setattr(jax, "jit", counting_jit)

    dm = _dm()
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False, dtype="float32")

    from ieee_tpu.parallel import FusedPipelineTrainStep, PipelineTrainStep

    M = 4  # batch 8 -> 4 microbatches of 2

    def steady_count(step_cls):
        tx = build_optimizer(optim="sgd", lr=0.1, momentum=0.9)
        eng = ImageSoftmaxEngine(
            dm, model, optimizer=tx, scheduler=lambda e: 0.1, seed=0,
            mesh=pipe_mesh, pipeline_parallel=2, pipeline_microbatches=M)
        step = step_cls(eng)
        data = next(iter(dm.train_loader))
        imgs, pids = eng._put_batch(data)
        state, _ = step(eng.state, imgs, pids, jax.random.PRNGKey(0),
                        0.1, None)
        calls["n"] = 0  # steady state: count the SECOND step only
        step(state, imgs, pids, jax.random.PRNGKey(1), 0.1, None)
        return calls["n"]

    n_host = steady_count(PipelineTrainStep)
    n_fused = steady_count(FusedPipelineTrainStep)
    S = 2
    # host: S*M fwd/last + (S-1)*M bwd + S upd + 1 transform = 15 at (2,4)
    assert n_host >= S * M + (S - 1) * M + S + 1, n_host
    # fused: 1 transform + 1 img-flatten + 2S flatten + 1 fused + S update
    assert n_fused <= 3 * S + 3, n_fused
    assert n_fused < n_host, (n_fused, n_host)
    print(f"dispatches/step: host={n_host} fused={n_fused} (S=2, M=4)")


def test_pipeline_run_end_to_end(tmp_path):
    """Engine.run under pipeline_parallel on a (2, 2) mesh: full epoch +
    eval (stage-partitioned train state gathered for the eval forward) +
    checkpoint save with the per-stage opt_state tuple."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh([2, 2], ("pipe", "data"))
    dm = _dm("synthetic_mm")
    model = build_model("ieee3modalPart", num_classes=dm.num_train_pids,
                        loss="margin", pretrained=False,
                        backbone_layers=(1, 1, 1, 1), parts=2)
    tx = build_optimizer(optim="sgd", lr=0.001, momentum=0.9)
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=lambda e: 0.001,
                        mesh=mesh, margin=1.0, seed=0,
                        pipeline_parallel=2)
    assert eng.pipeline_microbatches == 2  # GPipe default: one per stage
    with contextlib.redirect_stdout(io.StringIO()):
        rank1 = eng.run(save_dir=str(tmp_path), max_epoch=1, eval_freq=-1,
                        print_freq=100, ranks=(1,))
    assert np.isfinite(rank1)
    ckpt_dir = tmp_path / "model"
    assert any(ckpt_dir.glob("model.msgpack-*"))

    # resume: the per-stage opt_state tuple round-trips through msgpack and
    # _place_state re-partitions every stage onto its own mesh slice
    model_b = build_model("ieee3modalPart", num_classes=dm.num_train_pids,
                          loss="margin", pretrained=False,
                          backbone_layers=(1, 1, 1, 1), parts=2)
    eng_b = Image3MEngine(dm, model_b, optimizer=build_optimizer(
        optim="sgd", lr=0.001, momentum=0.9), scheduler=lambda e: 0.001,
        mesh=mesh, margin=1.0, seed=1, pipeline_parallel=2)
    with contextlib.redirect_stdout(io.StringIO()):
        rank1b = eng_b.run(save_dir=str(tmp_path), max_epoch=2,
                           resume=str(ckpt_dir), eval_freq=-1,
                           print_freq=100, ranks=(1,))
    assert np.isfinite(rank1b)
    assert eng_b.start_epoch == 1
    for a, b in zip(jax.tree_util.tree_leaves(eng.state.params),
                    jax.tree_util.tree_leaves(eng_b.state.params)):
        assert a.sharding.device_set == b.sharding.device_set


def test_fused_pipeline_run_through_engine(tmp_path):
    """Engine.run with cfg-level knob pipeline_fused=True: the product
    surface selects FusedPipelineTrainStep, trains an epoch, evals, and
    checkpoints — proving the knob end-to-end (not just the step object)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh([2, 2], ("pipe", "data"))
    dm = _dm("synthetic_mm")
    model = build_model("ieee3modalPart", num_classes=dm.num_train_pids,
                        loss="margin", pretrained=False,
                        backbone_layers=(1, 1, 1, 1), parts=2)
    tx = build_optimizer(optim="sgd", lr=0.001, momentum=0.9)
    eng = Image3MEngine(dm, model, optimizer=tx, scheduler=lambda e: 0.001,
                        mesh=mesh, margin=1.0, seed=0,
                        pipeline_parallel=2, pipeline_fused=True)
    with contextlib.redirect_stdout(io.StringIO()):
        rank1 = eng.run(save_dir=str(tmp_path), max_epoch=1, eval_freq=1,
                        print_freq=100, ranks=(1,))
    from ieee_tpu.parallel import FusedPipelineTrainStep

    assert isinstance(eng._train_step_fn, FusedPipelineTrainStep)
    assert np.isfinite(rank1)
    assert any((tmp_path / "model").glob("model.msgpack-*"))


def test_pipeline_validation(pipe_mesh):
    dm = _dm()
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    tx = build_optimizer(optim="sgd", lr=0.1)
    kw = dict(optimizer=tx, scheduler=lambda e: 0.1, seed=0)
    with pytest.raises(ValueError, match="sync_batchnorm"):
        ImageSoftmaxEngine(dm, model, mesh=pipe_mesh, pipeline_parallel=2,
                           sync_batchnorm=False, **kw)
    with pytest.raises(ValueError, match="accum_steps"):
        ImageSoftmaxEngine(dm, model, mesh=pipe_mesh, pipeline_parallel=2,
                           accum_steps=2, **kw)
    # tp + pp: rejected either by tp's own mesh check (no 'model' axis on a
    # pipe mesh) or, on a mesh with both axes, by the exclusivity check
    with pytest.raises(ValueError, match="tensor_parallel"):
        ImageSoftmaxEngine(dm, model, mesh=pipe_mesh, pipeline_parallel=2,
                           tensor_parallel=True, **kw)
    # mesh whose first axis is not 'pipe'
    bad = make_mesh([1, 2], ("data", "model"))
    with pytest.raises(ValueError, match="pipe"):
        ImageSoftmaxEngine(dm, model, mesh=bad, pipeline_parallel=2, **kw)
    # batch (8) not divisible by microbatches (3)
    eng = ImageSoftmaxEngine(dm, model, mesh=pipe_mesh, pipeline_parallel=2,
                             pipeline_microbatches=3, **kw)
    from ieee_tpu.parallel import PipelineTrainStep

    step = PipelineTrainStep(eng)
    data = next(iter(dm.train_loader))
    imgs, pids = eng._put_batch(data)
    with pytest.raises(ValueError, match="divisible"):
        step(eng.state, imgs, pids, jax.random.PRNGKey(0), 0.1, None)


def test_build_engine_wires_pipeline_knobs(pipe_mesh):
    from ieee_tpu.config import get_default_config
    from ieee_tpu.engine import build_engine

    cfg = get_default_config()
    cfg.model.name = "resnet18"
    cfg.loss.name = "softmax"
    cfg.tpu.mesh_shape = [2, 1]
    cfg.tpu.mesh_axes = ["pipe", "data"]
    cfg.tpu.pipeline_parallel = 2
    cfg.tpu.pipeline_microbatches = 4
    cfg.tpu.pipeline_fused = True
    dm = _dm()
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False)
    eng = build_engine(cfg, dm, model,
                       build_optimizer(optim="sgd", lr=0.01), lambda e: 0.01)
    assert eng.pipeline_parallel == 2
    assert eng.pipeline_microbatches == 4
    assert eng.pipeline_fused is True
    assert eng._pp_plan is not None
    assert eng._pp_plan.groups == [(0, 1, 2), (3, 4)]
    # fused without pipeline stages is rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pipeline_fused"):
        ImageSoftmaxEngine(dm, model,
                           optimizer=build_optimizer(optim="sgd", lr=0.01),
                           scheduler=lambda e: 0.01, seed=0,
                           pipeline_fused=True)
