"""Parity: the fused/folded IEEE inference path vs the flax eval forward."""

import numpy as np

import jax
import jax.numpy as jnp

from ieee_tpu.models import build_model
from ieee_tpu.models.fast_eval import build_fast_ieee_eval


def test_fast_ieee_eval_matches_flax_eval():
    m = build_model("ieee3modalPart", num_classes=7, loss="margin",
                    pretrained=False, backbone_layers=(1, 1, 1, 1),
                    dtype=jnp.float32)
    v = m.init_variables(0, batch=2, height=96, width=32)
    # randomize batch stats so BN folding is non-trivial
    key = jax.random.PRNGKey(9)

    def perturb(path, x):
        nonlocal key
        key = jax.random.fold_in(key, 1)
        if path[-1].key == "var":
            return jnp.abs(jax.random.normal(key, x.shape)) + 0.5
        if path[-1].key == "mean":
            return 0.1 * jax.random.normal(key, x.shape)
        return x

    v = {
        "params": v["params"],
        "batch_stats": jax.tree_util.tree_map_with_path(
            perturb, v["batch_stats"]),
    }
    # give REM a nonzero gamma so its branch is exercised
    import flax.core

    p = flax.core.unfreeze(v["params"])
    for i in range(3):
        p[f"REM_{i}"]["gamma"] = jnp.asarray([0.3])
    v["params"] = p

    imgs = tuple(
        jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(3), i),
                          (2, 96, 32, 3), jnp.float32)
        for i in range(3)
    )
    want = np.asarray(m.apply(v, imgs, train=False))
    fast = build_fast_ieee_eval(m, v)
    got = np.asarray(fast(imgs))
    assert got.shape == want.shape == (2, 2304)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # cosine similarity of the feature vectors must be ~1
    cos = (got * want).sum(1) / (
        np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1) + 1e-9)
    assert (cos > 0.999).all()
