import numpy as np
import pytest

import jax.numpy as jnp
import optax

from ieee_tpu.optim import (
    AVAI_OPTIMS,
    build_lr_scheduler,
    build_optimizer,
    get_lr,
    set_lr,
)


def _step(tx, params, grads, state=None):
    state = tx.init(params) if state is None else state
    updates, state = tx.update(grads, state, params)
    return optax.apply_updates(params, updates), state


def test_sgd_matches_torch_semantics():
    """SGD + momentum + nesterov + weight decay, two steps vs torch."""
    import torch

    lr, wd, mom = 0.1, 0.01, 0.9
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.5, 0.5, -1.0], np.float32)

    tw = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.SGD([tw], lr=lr, momentum=mom, weight_decay=wd,
                          nesterov=True)
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()

    tx = build_optimizer(optim="sgd", lr=lr, weight_decay=wd, momentum=mom,
                         sgd_nesterov=True)
    params = {"w": jnp.asarray(w0)}
    state = None
    for _ in range(3):
        params, state = _step(tx, params, {"w": jnp.asarray(g)}, state)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-5)


def test_adam_matches_torch_semantics():
    import torch

    lr, wd = 0.01, 0.005
    w0 = np.array([0.3, -0.7], np.float32)
    g = np.array([1.0, -2.0], np.float32)
    tw = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.Adam([tw], lr=lr, weight_decay=wd, eps=1e-8)
    for _ in range(4):
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()

    tx = build_optimizer(optim="adam", lr=lr, weight_decay=wd)
    params = {"w": jnp.asarray(w0)}
    state = None
    for _ in range(4):
        params, state = _step(tx, params, {"w": jnp.asarray(g)}, state)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-4, atol=1e-6)


def _load_reference_radam():
    """Import the reference's vendored RAdam by path
    (/root/reference/torchreid/optim/radam.py). Its step() uses the
    pre-1.5 ``Tensor.add_(scalar, tensor)`` / ``addcmul_/addcdiv_(scalar,
    t1, t2)`` positional overloads; if this torch has removed them, shim
    them so the reference math still executes verbatim."""
    import importlib.util
    import os.path as osp

    import torch

    path = "/root/reference/torchreid/optim/radam.py"
    if not osp.exists(path):
        pytest.skip("reference checkout not present")
    try:
        torch.zeros(1).add_(2.0, torch.zeros(1))
    except TypeError:
        orig_add = torch.Tensor.add_
        orig_addcmul = torch.Tensor.addcmul_
        orig_addcdiv = torch.Tensor.addcdiv_

        def add_(self, a, b=None):
            if b is None:
                return orig_add(self, a)
            return orig_add(self, b, alpha=a)

        def addcmul_(self, a, b, c=None):
            if c is None:
                return orig_addcmul(self, a, b)
            return orig_addcmul(self, b, c, value=a)

        def addcdiv_(self, a, b, c=None):
            if c is None:
                return orig_addcdiv(self, a, b)
            return orig_addcdiv(self, b, c, value=a)

        torch.Tensor.add_ = add_
        torch.Tensor.addcmul_ = addcmul_
        torch.Tensor.addcdiv_ = addcdiv_
    spec = importlib.util.spec_from_file_location("ref_radam", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("weight_decay", [0.0, 5e-4])
def test_radam_matches_reference(weight_decay):
    """Step-for-step parity vs the reference's vendored RAdam
    (torchreid/optim/radam.py:19-129) over 25 steps — covering the early
    degenerated-to-SGD regime (N_sma < 5, the first ~5 steps at b2=0.999)
    and the rectified regime, with gated decoupled weight decay."""
    import torch

    ref = _load_reference_radam()
    lr = 0.01
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal(16).astype(np.float32)
    grads = [rng.standard_normal(16).astype(np.float32) * (1.0 + 0.1 * i)
             for i in range(25)]

    tw = torch.tensor(w0.copy(), requires_grad=True)
    opt = ref.RAdam([tw], lr=lr, weight_decay=weight_decay)
    torch_traj = []
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()
        torch_traj.append(tw.detach().numpy().copy())

    tx = build_optimizer(optim="radam", lr=lr, weight_decay=weight_decay)
    params = {"w": jnp.asarray(w0)}
    state = None
    for i, g in enumerate(grads):
        params, state = _step(tx, params, {"w": jnp.asarray(g)}, state)
        # f32 summation-order noise only (torch addcdiv vs fused jnp ops)
        np.testing.assert_allclose(
            np.asarray(params["w"]), torch_traj[i], rtol=1e-4, atol=2e-6,
            err_msg=f"diverged at step {i + 1}")


def test_radam_degenerated_to_sgd_false_freezes_early_steps():
    """With degenerated_to_sgd=False the reference takes NO step (and no
    weight decay) while N_sma < 5; our transform must emit zero updates
    there and match the reference after the rectified regime kicks in."""
    import torch

    ref = _load_reference_radam()
    from ieee_tpu.optim.radam import scale_by_ref_radam

    lr, wd = 0.02, 1e-3
    w0 = np.array([0.5, -1.5, 2.0, -0.25], np.float32)
    g = np.array([1.0, -0.5, 0.25, 2.0], np.float32)

    tw = torch.tensor(w0.copy(), requires_grad=True)
    opt = ref.RAdam([tw], lr=lr, weight_decay=wd, degenerated_to_sgd=False)
    tx = optax.chain(
        scale_by_ref_radam(weight_decay=wd, degenerated_to_sgd=False),
        optax.scale(-lr))
    params = {"w": jnp.asarray(w0)}
    state = None
    for i in range(10):
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()
        params, state = _step(tx, params, {"w": jnp.asarray(g)}, state)
        np.testing.assert_allclose(
            np.asarray(params["w"]), tw.detach().numpy(), rtol=2e-5,
            atol=1e-6, err_msg=f"step {i + 1}")
        if i < 4:  # N_sma(t) < 5 for t <= 5 at b2=0.999
            np.testing.assert_array_equal(np.asarray(params["w"]), w0)


@pytest.mark.parametrize("optim", AVAI_OPTIMS)
def test_all_optimizers_run(optim):
    tx = build_optimizer(optim=optim, lr=0.01)
    params = {"w": jnp.ones(4)}
    params2, _ = _step(tx, params, {"w": jnp.ones(4)})
    assert not np.allclose(np.asarray(params2["w"]), 1.0)


def test_lr_hyperparam_injection():
    tx = build_optimizer(optim="sgd", lr=0.1, weight_decay=0.0, momentum=0.0)
    params = {"w": jnp.ones(2)}
    state = tx.init(params)
    assert get_lr(state) == pytest.approx(0.1)
    state = set_lr(state, 0.001)
    p2, _ = _step(tx, params, {"w": jnp.ones(2)}, state)
    np.testing.assert_allclose(np.asarray(p2["w"]), 1.0 - 0.001, rtol=1e-6)


def test_staged_lr():
    tx = build_optimizer(
        params={"classifier": {"w": jnp.ones(2)}, "backbone": {"w": jnp.ones(2)}},
        optim="sgd", lr=0.1, weight_decay=0.0, momentum=0.0, staged_lr=True,
        new_layers=["classifier"], base_lr_mult=0.1,
    )
    params = {"classifier": {"w": jnp.ones(2)}, "backbone": {"w": jnp.ones(2)}}
    grads = {"classifier": {"w": jnp.ones(2)}, "backbone": {"w": jnp.ones(2)}}
    p2, _ = _step(tx, params, grads)
    np.testing.assert_allclose(np.asarray(p2["classifier"]["w"]), 0.9, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p2["backbone"]["w"]), 0.99, rtol=1e-5)


def test_schedulers():
    sched = build_lr_scheduler("single_step", stepsize=20, gamma=0.1,
                               base_lr=1.0)
    assert sched(0) == 1.0 and sched(19) == 1.0
    assert sched(20) == pytest.approx(0.1) and sched(40) == pytest.approx(0.01)

    sched = build_lr_scheduler("multi_step", stepsize=[20, 40], gamma=0.1,
                               base_lr=0.001)
    assert sched(0) == 0.001
    assert sched(20) == pytest.approx(1e-4)
    assert sched(40) == pytest.approx(1e-5)
    assert sched(60) == pytest.approx(1e-5)

    sched = build_lr_scheduler("cosine", max_epoch=100, base_lr=1.0)
    assert sched(0) == pytest.approx(1.0)
    assert sched(50) == pytest.approx(0.5)
    assert sched(100) == pytest.approx(0.0, abs=1e-9)

    with pytest.raises(ValueError):
        build_lr_scheduler("warmup_foo")
    with pytest.raises(TypeError):
        build_lr_scheduler("multi_step", stepsize=5)
