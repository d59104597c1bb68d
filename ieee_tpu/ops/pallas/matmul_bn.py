"""Fused 1x1-conv (matmul) + BatchNorm [+ residual] [+ ReLU] Pallas kernels.

The train-step profile (round 2, tools/profile_train.py) shows ~52% of device
time in fusions producing per-channel [C] vectors — BN batch-stat reductions
and BN-backward reduces — each a full extra HBM pass over a conv output that
XLA cannot fuse into the convolution itself. For 1x1 convolutions (2/3 of the
BN sites in a bottleneck trunk, all of CIM, and the reduce layer) the conv IS
a matmul over the (B*H*W, C) view, so the stats ride the matmul epilogue
while each output tile is still in VMEM:

  forward   y = a @ w                         (MXU)
            sum(y), sum(y^2)                  (free: per-tile VMEM epilogue)
            act = [relu](xhat*s + b [+ res])  (one elementwise pass)

  backward  one fused reduce pass -> dbias = sum g, dscale = sum g*xhat
            da = dy @ w^T   with dy RECOMPUTED per tile (never materialized)
            dW = a^T @ dy   likewise; g / dy tensors never touch HBM

Residual variant contract: when ``res`` is fused, the op output is
``bn(y) + res`` WITHOUT relu (the block applies relu outside) so that the
backward's ``dres`` is exactly the incoming cotangent — no mask recompute,
no extra tensor writes.

Reference analog: the BN-heavy hot loop of
``torchreid/models/resnet.py:622-635`` and ``ieee3modalPart.py:439-505``.

Kernels run in interpret mode off-TPU (CPU tests) and compiled on TPU.
Weights arrive as f32 masters, cast to bf16 in-op; accumulation is f32;
stored activations are bf16 (matching the ConvBN path they replace).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mm_bn_act_train", "mm_affine_act"]

_EPS = 1e-5


def _interpret() -> bool:
    # axon is the remote-TPU PJRT plugin — a real TPU, same as partpool/
    # distmat gates; interpret mode is only for the CPU test mesh
    return jax.default_backend() not in ("tpu", "axon")


def _tile(dim: int, target: int, align: int = 8) -> int:
    """Largest tile <= target dividing dim and aligned, else the full dim
    (always legal in Pallas block specs)."""
    if dim <= target:
        return dim
    t = (target // align) * align
    while t >= align:
        if dim % t == 0:
            return t
        t -= align
    return dim


def _tile_lane(dim: int, target: int) -> int:
    return _tile(dim, target, align=128) if dim >= 128 else dim


def _vecs(*rows, c):
    """Stack per-channel vectors into the (8, C) f32 carrier Pallas tiles
    want (sublane-aligned)."""
    pad = [jnp.zeros((c,), jnp.float32)] * (8 - len(rows))
    return jnp.stack(list(rows) + pad, axis=0)


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _mm_stats_kernel(a_ref, w_ref, y_ref, st_ref, acc_ref, s_ref):
    i, k = pl.program_id(1), pl.program_id(2)
    ni, nk = pl.num_programs(1), pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((i == 0) & (k == 0))
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)

    acc_ref[:] += jnp.dot(a_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        y = acc_ref[:]
        y_ref[:] = y.astype(y_ref.dtype)
        s_ref[0:1, :] += jnp.sum(y, axis=0, keepdims=True)
        s_ref[1:2, :] += jnp.sum(y * y, axis=0, keepdims=True)

    @pl.when((i == ni - 1) & (k == nk - 1))
    def _():
        st_ref[:] = s_ref[:]


def _mm_stats(a, w):
    """(N,K) @ (K,C) -> y bf16 (N,C) + stats f32 (8,C): row0=sum, row1=sumsq."""
    n, k = a.shape
    c = w.shape[1]
    tn, tc, tk = _tile(n, 512), _tile_lane(c, 512), _tile_lane(k, 512)
    return pl.pallas_call(
        _mm_stats_kernel,
        grid=(c // tc, n // tn, k // tk),
        in_specs=[
            pl.BlockSpec((tn, tk), lambda j, i, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tc), lambda j, i, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, tc), lambda j, i, kk: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tc), lambda j, i, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), jnp.bfloat16),
            jax.ShapeDtypeStruct((8, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tn, tc), jnp.float32),
            pltpu.VMEM((8, tc), jnp.float32),
        ],
        interpret=_interpret(),
    )(a, w)


# ---------------------------------------------------------------------------
# backward kernels (g = relu-masked cotangent; dy recomputed per tile)
# ---------------------------------------------------------------------------

def _g_tile(relu, d_ref, y, v_ref):
    g = d_ref[:].astype(jnp.float32)
    if relu:
        pre = y * v_ref[0:1, :] + v_ref[1:2, :]
        g = jnp.where(pre > 0, g, 0.0)
    return g


def _dy_tile(relu, d_ref, y_ref, v_ref):
    """dy = inv * (g - S1/N - xhat * S2/N); v rows:
    0=inv(rstd*scale) 1=shift 2=mean 3=rstd 4=S1/N 5=S2/N."""
    y = y_ref[:].astype(jnp.float32)
    g = _g_tile(relu, d_ref, y, v_ref)
    xhat = (y - v_ref[2:3, :]) * v_ref[3:4, :]
    return (v_ref[0:1, :] * (g - v_ref[4:5, :] - xhat * v_ref[5:6, :])
            ).astype(jnp.bfloat16)


def _da_kernel(relu, d_ref, y_ref, v_ref, w_ref, o_ref, acc_ref):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dy = _dy_tile(relu, d_ref, y_ref, v_ref)
    # dy (TN, TC) x w (TK, TC)^T -> (TN, TK)
    acc_ref[:] += jax.lax.dot_general(
        dy, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _da(d_act, y, vecs, w, relu):
    n, c = y.shape
    kdim = w.shape[0]
    tn, tk, tc = _tile(n, 512), _tile_lane(kdim, 512), _tile_lane(c, 512)
    return pl.pallas_call(
        functools.partial(_da_kernel, relu),
        grid=(n // tn, kdim // tk, c // tc),
        in_specs=[
            pl.BlockSpec((tn, tc), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tc), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tc), lambda i, j, kk: (0, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tc), lambda i, j, kk: (j, kk),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, tk), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, kdim), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((tn, tk), jnp.float32)],
        interpret=_interpret(),
    )(d_act, y, vecs, w.astype(jnp.bfloat16))


def _dw_kernel(relu, a_ref, d_ref, y_ref, v_ref, o_ref, acc_ref):
    s = pl.program_id(2)
    ns = pl.num_programs(2)

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dy = _dy_tile(relu, d_ref, y_ref, v_ref)
    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(s == ns - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _dw(a, d_act, y, vecs, relu):
    n, c = y.shape
    kdim = a.shape[1]
    tn = _tile(n, 512)
    tk, tc = _tile_lane(kdim, 512), _tile_lane(c, 512)
    return pl.pallas_call(
        functools.partial(_dw_kernel, relu),
        grid=(kdim // tk, c // tc, n // tn),
        in_specs=[
            pl.BlockSpec((tn, tk), lambda j, jj, s: (s, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tc), lambda j, jj, s: (s, jj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tc), lambda j, jj, s: (s, jj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tc), lambda j, jj, s: (0, jj),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tk, tc), lambda j, jj, s: (j, jj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kdim, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tk, tc), jnp.float32)],
        interpret=_interpret(),
    )(a, d_act, y, vecs)


# ---------------------------------------------------------------------------
# custom-VJP op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def mm_bn_act_train(a, w, scale, bias, res, relu: bool, has_res: bool):
    """Fused train-mode 1x1 conv + BN [+ residual] [+ ReLU].

    a: (N, K); w: (K, C) f32 master; scale/bias: (C,) f32;
    res: (N, C) when has_res else a (1, 1) placeholder. relu and has_res are
    mutually exclusive (residual blocks apply relu outside so the residual
    gradient is exactly the incoming cotangent).

    Returns (act (N, C) bf16, mean (C,) f32, var (C,) f32); mean/var feed the
    running-stat update only (their cotangents are ignored — running
    statistics carry no loss gradient).
    """
    act, mean, var, _ = _fwd_impl(a, w, scale, bias, res, relu, has_res)
    return act, mean, var


def _fwd_impl(a, w, scale, bias, res, relu, has_res):
    assert not (relu and has_res), "residual variant applies relu outside"
    n = a.shape[0]
    y, st = _mm_stats(a.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    mean = st[0] / n
    var = st[1] / n - mean * mean
    rstd = jax.lax.rsqrt(var + _EPS)
    inv = rstd * scale
    shift = bias - mean * inv
    # normalize as plain XLA elementwise: measured FASTER than a dedicated
    # Pallas pass (XLA's fusion emitter streams 1R+1W near-roofline; the
    # matmul+stats epilogue above is where Pallas actually wins)
    act = y.astype(jnp.float32) * inv + shift
    if has_res:
        act = act + res.astype(jnp.float32)
    if relu:
        act = jnp.maximum(act, 0.0)
    act = act.astype(jnp.bfloat16)
    return act, mean, var, y


def _mm_bn_fwd(a, w, scale, bias, res, relu, has_res):
    act, mean, var, y = _fwd_impl(a, w, scale, bias, res, relu, has_res)
    return (act, mean, var), (a, w, scale, bias, y, mean, var)


def _mm_bn_bwd(relu, has_res, saved, cts):
    a, w, scale, bias, y, mean, var = saved
    d_act = cts[0].astype(jnp.bfloat16)  # d_mean/d_var carry no gradient
    n, c = y.shape
    rstd = jax.lax.rsqrt(var + _EPS)
    inv = rstd * scale
    shift = bias - mean * inv

    # one fused XLA pass over (d_act, y): relu mask + xhat + both reduces
    yf = y.astype(jnp.float32)
    g = d_act.astype(jnp.float32)
    if relu:
        g = jnp.where(yf * inv + shift > 0, g, 0.0)
    xhat = (yf - mean) * rstd
    dbias = jnp.sum(g, axis=0)
    dscale = jnp.sum(g * xhat, axis=0)

    vecs = _vecs(inv, shift, mean, rstd, dbias / n, dscale / n, c=c)
    da = _da(d_act, y, vecs, w, relu)
    dw = _dw(a.astype(jnp.bfloat16), d_act, y, vecs, relu)
    dres = d_act if has_res else jnp.zeros((1, 1), cts[0].dtype)
    return da.astype(a.dtype), dw.astype(w.dtype), dscale, dbias, dres


mm_bn_act_train.defvjp(_mm_bn_fwd, _mm_bn_bwd)


# ---------------------------------------------------------------------------
# eval-mode fused op (running stats folded; no VJP needed)
# ---------------------------------------------------------------------------

def _mm_affine_kernel(relu, a_ref, w_ref, v_ref, o_ref, acc_ref):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        x = acc_ref[:] * v_ref[0:1, :] + v_ref[1:2, :]
        if relu:
            x = jnp.maximum(x, 0.0)
        o_ref[:] = x.astype(o_ref.dtype)


def mm_affine_act(a, w, inv, shift, relu: bool):
    """Eval: act = [relu]((a @ w) * inv + shift) as ONE kernel
    (inv/shift = running stats folded with scale/bias)."""
    n, k = a.shape
    c = w.shape[1]
    tn, tc, tk = _tile(n, 512), _tile_lane(c, 512), _tile_lane(k, 512)
    v = _vecs(inv, shift, c=c)
    return pl.pallas_call(
        functools.partial(_mm_affine_kernel, relu),
        grid=(n // tn, c // tc, k // tk),
        in_specs=[
            pl.BlockSpec((tn, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tc), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tc), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, tc), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((tn, tc), jnp.float32)],
        interpret=_interpret(),
    )(a.astype(jnp.bfloat16), w.astype(jnp.bfloat16), v)
