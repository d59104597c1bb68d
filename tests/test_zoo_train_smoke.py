"""Gradient-flow smoke tests for the model zoo.

The zoo's forward behavior is pinned by shape tests (test_model_zoo.py) and
per-family torch parity (test_zoo_converter.py); this file checks the zoo is
*trainable* as a drop-in for the reference's torch models (every reference
model trains under its engines — e.g. ``engine/image/softmax.py:94-117``):
one backward pass per family, asserting every gradient is finite and that
gradients actually reach (nearly) all parameter leaves — the class of bug
(stop-gradient, detached branch, dead aux head) that forward tests cannot
see.

A small number of zero-gradient leaves is tolerated (ReLU-dead units at
batch 2, by-design dead side branches mirrored from the reference), but >10%
dead leaves fails with the offending paths named.
"""

import jax
import jax.numpy as jnp
import pytest

from ieee_tpu.models import build_model

pytestmark = pytest.mark.e2e


def _rand_inputs(m, b=2, h=64, w=32, seed=0):
    key = jax.random.PRNGKey(seed)
    if m.num_streams == 1:
        return jax.random.normal(key, (b, h, w, 3))
    return tuple(
        jax.random.normal(jax.random.fold_in(key, i), (b, h, w, 3))
        for i in range(m.num_streams)
    )


def _pseudo_loss(out):
    """Mean-square pull on every float output leaf (logits, features, aux
    heads alike) — any format the zoo returns contributes gradient."""
    leaves = [
        l for l in jax.tree_util.tree_leaves(out)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.inexact)
    ]
    assert leaves, "model returned no float outputs"
    return sum(jnp.mean(jnp.square(l.astype(jnp.float32))) for l in leaves)


def _grad_smoke(name, hw=(64, 32), **kwargs):
    m = build_model(name, num_classes=7, loss="softmax", pretrained=False,
                    **kwargs)
    v = m.init_variables(0, batch=2, height=hw[0], width=hw[1])
    x = _rand_inputs(m, b=2, h=hw[0], w=hw[1])
    params, rest = v["params"], {k: s for k, s in v.items() if k != "params"}

    def loss_fn(p):
        out, _ = m.apply({"params": p, **rest}, x, train=True,
                         rngs={"dropout": jax.random.PRNGKey(1)})
        return _pseudo_loss(out)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert jnp.isfinite(loss), f"{name}: non-finite loss {loss}"

    flat = jax.tree_util.tree_leaves_with_path(grads)
    bad = [jax.tree_util.keystr(p) for p, g in flat
           if not bool(jnp.all(jnp.isfinite(g)))]
    assert not bad, f"{name}: non-finite grads at {bad[:5]}"
    dead = [jax.tree_util.keystr(p) for p, g in flat
            if float(jnp.max(jnp.abs(g))) == 0.0]
    frac = len(dead) / len(flat)
    assert frac <= 0.10, (
        f"{name}: {len(dead)}/{len(flat)} param leaves get zero gradient: "
        f"{dead[:10]}"
    )


ZOO = [
    ("osnet_x0_25", (64, 32), {}),
    ("osnet_ain_x0_25", (64, 32), {}),
    ("se_resnet50", (64, 32), {}),
    ("densenet121", (64, 32), {}),
    ("mobilenetv2_x1_0", (64, 32), {}),
    ("shufflenet_v2_x0_5", (64, 32), {}),
    ("shufflenet", (64, 32), {}),
    ("squeezenet1_0", (64, 32), {}),
    ("resnet50_ibn_a", (64, 32), {}),
    ("resnet50_ibn_b", (64, 32), {}),
    ("resnet50mid", (64, 32), {}),
    ("mlfn", (64, 32), {}),
    ("hacnn", (160, 64), {}),
    ("mudeep", (256, 128), {}),
    ("xception", (64, 32), {}),
    ("inceptionv4", (160, 64), {}),
    ("inceptionresnetv2", (160, 64), {}),
    ("nasnetamobile", (64, 32), {}),
    ("pcb_p6", (64, 32), {"backbone_layers": (1, 1, 1, 1)}),
    ("pfnet", (64, 32), {"backbone_layers": (1, 1, 1, 1)}),
]


@pytest.mark.parametrize("name,hw,kwargs", ZOO,
                         ids=[z[0] for z in ZOO])
def test_zoo_gradients_flow(name, hw, kwargs):
    _grad_smoke(name, hw=hw, **kwargs)
