"""Correctness of the fused Pallas matmul+BN kernels (interpret mode on CPU)
against plain jnp reference math — values AND gradients — plus drop-in
equivalence of FusedConvBN1x1 with ConvBN (identical param/stat trees).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ieee_tpu.ops.pallas.matmul_bn import mm_affine_act, mm_bn_act_train

EPS = 1e-5


def _ref_mm_bn(a, w, scale, bias, res=None, relu=False):
    """Reference math in plain jnp, mirroring the kernel's dtype contract
    (bf16 matmul with f32 accumulation, bf16 stored y)."""
    y = jnp.dot(a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    mean = jnp.mean(y, axis=0)
    var = jnp.mean(y * y, axis=0) - mean * mean
    inv = jax.lax.rsqrt(var + EPS) * scale
    shift = bias - mean * inv
    yb = y.astype(jnp.bfloat16).astype(jnp.float32)
    out = yb * inv + shift
    if res is not None:
        out = out + res.astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(jnp.bfloat16), mean, var


def _data(n=64, k=96, c=128, seed=0):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.standard_normal((n, k)), jnp.bfloat16)
    w = jnp.asarray(0.1 * rng.standard_normal((k, c)), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    res = jnp.asarray(rng.standard_normal((n, c)), jnp.bfloat16)
    return a, w, scale, bias, res


@pytest.mark.parametrize("relu", [False, True])
def test_mm_bn_forward_matches_reference(relu):
    a, w, scale, bias, _ = _data()
    placeholder = jnp.zeros((1, 1), jnp.bfloat16)
    act, mean, var = mm_bn_act_train(a, w, scale, bias, placeholder,
                                     relu, False)
    ref_act, ref_mean, ref_var = _ref_mm_bn(a, w, scale, bias, relu=relu)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(ref_var),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(act, np.float32),
                               np.asarray(ref_act, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_mm_bn_forward_residual():
    a, w, scale, bias, res = _data(seed=1)
    act, mean, var = mm_bn_act_train(a, w, scale, bias, res, False, True)
    ref_act, _, _ = _ref_mm_bn(a, w, scale, bias, res=res)
    np.testing.assert_allclose(np.asarray(act, np.float32),
                               np.asarray(ref_act, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("relu,has_res", [(False, False), (True, False),
                                          (False, True)])
def test_mm_bn_gradients_match_reference(relu, has_res):
    a, w, scale, bias, res = _data(seed=2)
    placeholder = jnp.zeros((1, 1), jnp.bfloat16)
    rng = np.random.default_rng(3)
    gcot = jnp.asarray(rng.standard_normal((a.shape[0], w.shape[1])),
                       jnp.float32)

    def fused_loss(a, w, scale, bias, res):
        act, _, _ = mm_bn_act_train(a, w, scale, bias,
                                    res if has_res else placeholder,
                                    relu, has_res)
        return jnp.sum(act.astype(jnp.float32) * gcot)

    def ref_loss(a, w, scale, bias, res):
        act, _, _ = _ref_mm_bn(a, w, scale, bias,
                               res=res if has_res else None, relu=relu)
        return jnp.sum(act.astype(jnp.float32) * gcot)

    g_f = jax.grad(fused_loss, argnums=(0, 1, 2, 3, 4))(a, w, scale, bias,
                                                        res)
    g_r = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(a, w, scale, bias, res)
    names = ["da", "dw", "dscale", "dbias", "dres"]
    for name, gf, gr in zip(names, g_f, g_r):
        if name == "dres" and not has_res:
            continue
        gf = np.asarray(gf, np.float32).ravel()
        gr = np.asarray(gr, np.float32).ravel()
        # a formula error decorrelates gradients everywhere; bf16 dy
        # quantization only perturbs a handful of cancellation-prone entries
        cos = float(gf @ gr / (np.linalg.norm(gf) * np.linalg.norm(gr)))
        assert cos > 0.999, f"{name} decorrelated (cos={cos}, relu={relu})"
        np.testing.assert_allclose(
            gf, gr, rtol=5e-2, atol=0.15,
            err_msg=f"{name} mismatch (relu={relu}, res={has_res})",
        )


def test_mm_affine_act_eval():
    a, w, scale, bias, _ = _data(seed=4)
    mean = jnp.asarray(np.random.default_rng(5).standard_normal(w.shape[1]),
                       jnp.float32) * 0.1
    var = jnp.abs(jnp.asarray(
        np.random.default_rng(6).standard_normal(w.shape[1]), jnp.float32))
    inv = jax.lax.rsqrt(var + EPS) * scale
    shift = bias - mean * inv
    act = mm_affine_act(a, w, inv, shift, True)
    y = jnp.dot(a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    ref = jnp.maximum(y * inv + shift, 0.0)
    np.testing.assert_allclose(np.asarray(act, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


# ---------------------------------------------------------------------------
# FusedConvBN1x1 <-> ConvBN drop-in equivalence
# ---------------------------------------------------------------------------

def _make_pair(features=64, nonlinear="relu"):
    from ieee_tpu.models.common import ConvBN, FusedConvBN1x1

    plain = ConvBN(features, (1, 1), nonlinear=nonlinear)
    fused = FusedConvBN1x1(features, nonlinear=nonlinear)
    return plain, fused


def test_fused_convbn_tree_and_outputs_match_convbn():
    plain, fused = _make_pair()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 8, 4, 32)), jnp.float32)
    vp = plain.init(jax.random.PRNGKey(0), x, True)
    vf = fused.init(jax.random.PRNGKey(0), x, True)
    # identical param/stat trees (checkpoint compatibility)
    assert jax.tree_util.tree_structure(vp) == jax.tree_util.tree_structure(vf)
    for lp, lf in zip(jax.tree_util.tree_leaves(vp),
                      jax.tree_util.tree_leaves(vf)):
        assert lp.shape == lf.shape

    # same params -> same train output + same batch-stat updates
    out_p, up_p = plain.apply(vp, x, True, mutable=["batch_stats"])
    out_f, up_f = fused.apply(vp, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_p, np.float32),
                               rtol=3e-2, atol=3e-2)
    for sp, sf in zip(jax.tree_util.tree_leaves(up_p),
                      jax.tree_util.tree_leaves(up_f)):
        np.testing.assert_allclose(np.asarray(sf), np.asarray(sp),
                                   rtol=1e-2, atol=1e-3)

    # eval path
    out_p = plain.apply(vp, x, False)
    out_f = fused.apply(vp, x, False)
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_p, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_fused_bottleneck_matches_plain(monkeypatch):
    import ieee_tpu.models.resnet as resnet_mod
    from ieee_tpu.models.resnet import Bottleneck

    # the per-site size gate (fuse_worthwhile) would skip fusion on the tiny
    # test channels; force it on so the fused path is exercised
    monkeypatch.setattr(resnet_mod, "fuse_worthwhile",
                        lambda *a, **k: True)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 8, 4, 64)), jnp.float32)
    plain = Bottleneck(planes=16, strides=2, downsample=True, fused_1x1=False)
    fused = Bottleneck(planes=16, strides=2, downsample=True, fused_1x1=True)
    v = plain.init(jax.random.PRNGKey(0), x, True)
    v2 = fused.init(jax.random.PRNGKey(0), x, True)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    out_p, _ = plain.apply(v, x, True, mutable=["batch_stats"])
    out_f, _ = fused.apply(v, x, True, mutable=["batch_stats"])
    # bf16 noise: the fused path computes stats from the f32 accumulator
    # (pre-rounding), the plain path from the rounded bf16 conv output
    scale_ref = float(np.std(np.asarray(out_p, np.float32)))
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_p, np.float32),
                               rtol=1e-1, atol=5e-2 * scale_ref)

    # gradients flow and match through the fused block
    def loss(variables, mod):
        out, _ = mod.apply(variables, x, True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_p = jax.grad(lambda p: loss({"params": p,
                                   "batch_stats": v["batch_stats"]}, plain))(
        v["params"])
    g_f = jax.grad(lambda p: loss({"params": p,
                                   "batch_stats": v["batch_stats"]}, fused))(
        v["params"])
    flat_p = jax.tree_util.tree_leaves_with_path(g_p)
    flat_f = {jax.tree_util.keystr(kp): g
              for kp, g in jax.tree_util.tree_leaves_with_path(g_f)}
    for kp, gp in flat_p:
        gf = np.asarray(flat_f[jax.tree_util.keystr(kp)], np.float32).ravel()
        gp = np.asarray(gp, np.float32).ravel()
        denom = np.linalg.norm(gf) * np.linalg.norm(gp)
        if denom == 0:
            continue
        cos = float(gf @ gp / denom)
        assert cos > 0.995, f"{jax.tree_util.keystr(kp)} cos={cos}"
        np.testing.assert_allclose(
            gf, gp, rtol=1e-1, atol=0.1 * max(float(np.std(gp)), 1e-6),
            err_msg=jax.tree_util.keystr(kp),
        )
