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
