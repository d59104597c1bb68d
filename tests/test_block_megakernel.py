"""Pallas bottleneck block-backward megakernel (ops/pallas/block_bwd.py).

Interpret-mode on the CPU mesh: exact-math parity of the custom VJP against
jax autodiff of the identical jnp forward, plus module-level equivalence of
``Bottleneck(block_megakernel=True)`` with the plain child-module path
(same param tree, same forward, same BN running-stat updates, same grads).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ieee_tpu.models.resnet import Bottleneck
from ieee_tpu.ops.pallas.block_bwd import (
    block_fwd_jnp,
    bottleneck_train,
)

B, H, W, CIN, CM = 2, 6, 4, 16, 8
F32 = jnp.float32


def _args(seed=0, dtype=F32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, H, W, CIN)), dtype)
    k1 = jnp.asarray(rng.standard_normal((1, 1, CIN, CM)) * 0.1, F32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, CM, CM)) * 0.1, F32)
    k3 = jnp.asarray(rng.standard_normal((1, 1, CM, CIN)) * 0.1, F32)
    s1 = jnp.asarray(rng.uniform(0.5, 1.5, CM), F32)
    b1 = jnp.asarray(rng.standard_normal(CM) * 0.1, F32)
    s2 = jnp.asarray(rng.uniform(0.5, 1.5, CM), F32)
    b2 = jnp.asarray(rng.standard_normal(CM) * 0.1, F32)
    s3 = jnp.asarray(rng.uniform(0.5, 1.5, CIN), F32)
    b3 = jnp.asarray(rng.standard_normal(CIN) * 0.1, F32)
    return (x, k1, s1, b1, k2, s2, b2, k3, s3, b3)


def test_forward_matches_jnp_reference():
    args = _args()
    y_ref, st_ref = block_fwd_jnp(*args)
    y, st = bottleneck_train(*args)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y))
    for a, b in zip(st_ref, st):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grads_match_autodiff_exactly_f32():
    """All ten input cotangents of the 4-kernel Pallas backward vs jax
    autodiff of the same forward, f32 (measured agreement ~3e-7)."""
    args = _args()
    rng = np.random.default_rng(1)
    wout = jnp.asarray(rng.standard_normal((B, H, W, CIN)), F32)

    def loss_ref(*a):
        y, _ = block_fwd_jnp(*a)
        return jnp.sum(y * wout)

    def loss_fused(*a):
        y, _ = bottleneck_train(*a)
        return jnp.sum(y * wout)

    gr = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    gf = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    for name, a, b in zip(
            "dx dk1 ds1 db1 dk2 ds2 db2 dk3 ds3 db3".split(), gr, gf):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-9)
        rel = float(jnp.max(jnp.abs(a - b))) / scale
        assert rel < 1e-5, f"{name}: rel {rel}"


def _bottleneck_pair():
    plain = Bottleneck(planes=CM // 4, strides=1, downsample=False,
                       dtype=F32)
    fused = Bottleneck(planes=CM // 4, strides=1, downsample=False,
                       dtype=F32, block_megakernel=True)
    return plain, fused


def test_module_param_tree_identical():
    """cb1/{conv,bn} + conv2 + bn2 + cb3/{conv,bn} with identical shapes AND
    identical initial values (same scope names -> same param RNG keys), so
    checkpoints/converters interchange between the paths."""
    plain, fused = _bottleneck_pair()
    # planes=CM//4 -> width CM//4... use an input whose channels == 4*planes
    x = jnp.zeros((B, H, W, CM), F32)
    vp = plain.init(jax.random.PRNGKey(0), x, train=True)
    vf = fused.init(jax.random.PRNGKey(0), x, train=True)
    fp = jax.tree_util.tree_flatten_with_path(vp)[0]
    ff = dict((jax.tree_util.keystr(p), v)
              for p, v in jax.tree_util.tree_flatten_with_path(vf)[0])
    assert len(fp) == len(ff)
    for path, leaf in fp:
        key = jax.tree_util.keystr(path)
        assert key in ff, f"missing {key} in megakernel tree"
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(ff[key]), err_msg=key)


def test_module_forward_and_stats_parity():
    plain, fused = _bottleneck_pair()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, H, W, CM)), F32)
    v = plain.init(jax.random.PRNGKey(0), x, train=True)

    yp, mp = plain.apply(v, x, train=True, mutable=["batch_stats"])
    yf, mf = fused.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yf),
                               rtol=1e-5, atol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(mp["batch_stats"])[0],
            jax.tree_util.tree_flatten_with_path(mf["batch_stats"])[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa))

    # eval forward on (updated) running stats
    v2 = {"params": v["params"], "batch_stats": mp["batch_stats"]}
    ye_p = plain.apply(v2, x, train=False)
    ye_f = fused.apply(v2, x, train=False)
    np.testing.assert_allclose(np.asarray(ye_p), np.asarray(ye_f),
                               rtol=1e-5, atol=1e-5)


def test_module_grad_parity():
    plain, fused = _bottleneck_pair()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, H, W, CM)), F32)
    v = plain.init(jax.random.PRNGKey(0), x, train=True)
    wout = jnp.asarray(rng.standard_normal((B, H, W, CM)), F32)

    def loss(mod, params):
        y, _ = mod.apply({"params": params,
                          "batch_stats": v["batch_stats"]}, x, train=True,
                         mutable=["batch_stats"])
        return jnp.sum(y * wout)

    gp = jax.grad(lambda p: loss(plain, p))(v["params"])
    gf = jax.grad(lambda p: loss(fused, p))(v["params"])
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(gp)[0],
            jax.tree_util.tree_flatten_with_path(gf)[0]):
        key = jax.tree_util.keystr(pa)
        scale = max(float(jnp.max(jnp.abs(a))), 1e-6)
        rel = float(jnp.max(jnp.abs(a - b))) / scale
        assert rel < 1e-4, f"{key}: rel {rel}"


def test_bf16_grads_within_noise():
    """Production dtype: bf16 activations, f32 masters — the fused backward
    must track autodiff of the same bf16 forward within bf16 noise."""
    args = _args(dtype=jnp.bfloat16)
    rng = np.random.default_rng(4)
    wout = jnp.asarray(rng.standard_normal((B, H, W, CIN)), jnp.bfloat16)

    def loss_ref(*a):
        y, _ = block_fwd_jnp(*a)
        return jnp.sum(y.astype(F32) * wout.astype(F32))

    def loss_fused(*a):
        y, _ = bottleneck_train(*a)
        return jnp.sum(y.astype(F32) * wout.astype(F32))

    gr = jax.grad(loss_ref, argnums=(1, 4, 7))(*args)   # dk1, dk2, dk3
    gf = jax.grad(loss_fused, argnums=(1, 4, 7))(*args)
    for a, b in zip(gr, gf):
        an = np.asarray(a, np.float32).ravel()
        bn_ = np.asarray(b, np.float32).ravel()
        cos = float(an @ bn_ /
                    max(np.linalg.norm(an) * np.linalg.norm(bn_), 1e-9))
        assert cos > 0.999, cos


def test_trunk_level_dispatch():
    """ResNetTrunk(block_megakernel=True): stride-1 blocks go fused, the
    stride-2/downsample heads keep the plain path — one tree, one forward."""
    from ieee_tpu.models.resnet import ResNetTrunk

    trunk_p = ResNetTrunk(layers=(1, 1), dtype=F32, num_stages=2)
    trunk_f = ResNetTrunk(layers=(2, 1), dtype=F32, num_stages=2,
                          block_megakernel=True)
    x = jnp.asarray(np.random.default_rng(5)
                    .standard_normal((1, 32, 16, 3)), F32)
    v = trunk_f.init(jax.random.PRNGKey(0), x, train=True)
    y, m = trunk_f.apply(v, x, train=True, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(y, np.float32)).all()
    # layer1_1 is a stride-1 non-downsample block -> fused path, and its
    # params must still carry the plain names
    assert "cb1" in v["params"]["layer1_1"]
    assert "conv" in v["params"]["layer1_1"]["cb1"]
    del trunk_p


def test_downsample_and_stride_blocks_stay_plain():
    """Megakernel flag on a downsample/stride-2 block is a no-op (falls
    through to the child-module path)."""
    mod = Bottleneck(planes=CM // 4, strides=2, downsample=True, dtype=F32,
                     block_megakernel=True)
    x = jnp.asarray(np.random.default_rng(6)
                    .standard_normal((B, H, W, CM)), F32)
    v = mod.init(jax.random.PRNGKey(0), x, train=True)
    assert "downsample" in v["params"]
    y, _ = mod.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == (B, H // 2, W // 2, CM)


def test_vmem_width_gate(monkeypatch):
    """width>256 blocks must NOT dispatch to the megakernel (layer4's
    conv2 pass VMEM-OOMs on the v5e — megakernel_vmem_ok docstring);
    width<=256 blocks must. Both paths share one param tree, so the probe
    is a sentinel patched over bottleneck_train."""
    from ieee_tpu.models.resnet import megakernel_vmem_ok
    from ieee_tpu.ops.pallas import block_bwd

    assert megakernel_vmem_ok(256) and not megakernel_vmem_ok(512)

    class _Sentinel(Exception):
        pass

    def _boom(*a, **k):
        raise _Sentinel

    monkeypatch.setattr(block_bwd, "bottleneck_train", _boom)
    rng = np.random.default_rng(7)

    # width 512 (planes=512): falls back to the plain path -> no sentinel
    wide = Bottleneck(planes=512, dtype=F32, block_megakernel=True)
    xw = jnp.asarray(rng.standard_normal((1, 2, 2, 2048)), F32)
    wide.init(jax.random.PRNGKey(0), xw, train=True)

    # width 8 block: megakernel path -> sentinel fires
    narrow = Bottleneck(planes=2, dtype=F32, block_megakernel=True)
    xn = jnp.asarray(rng.standard_normal((B, H, W, 8)), F32)
    with pytest.raises(_Sentinel):
        narrow.init(jax.random.PRNGKey(0), xn, train=True)
