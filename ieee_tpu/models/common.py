"""Shared flax building blocks for the model zoo.

TPU conventions used throughout the models package:
 - NHWC layout (XLA's native conv layout on TPU);
 - ``dtype`` = compute dtype (bfloat16 by default: convs/matmuls on the MXU),
   ``param_dtype`` = float32 master params;
 - BatchNorm statistics always computed in float32.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu')
conv_kaiming_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# torch nn.init.normal_(weight, 0, 0.01) for Linear layers in reID heads
dense_init = nn.initializers.normal(stddev=0.01)


class FastBatchNorm(nn.Module):
    """BatchNorm with f32 statistics but compute-dtype normalization.

    HBM-bandwidth optimization for the conv trunks: flax's BatchNorm with
    ``dtype=float32`` materializes f32 activation tensors on both sides of
    every conv; here the reductions (mean/var) run in f32 — numerically
    safe — while the elementwise normalize stays in bf16, halving activation
    traffic on the hot path. Param/stat names match ``nn.BatchNorm``
    (scale/bias, mean/var) so converters and checkpoints are interchangeable.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        use_ra = (self.use_running_average
                  if use_running_average is None else use_running_average)
        c = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            # one-pass E[x^2]-m^2 (flax semantics): both reductions fuse into
            # a single read of x — BN stats are the hot path's dominant cost.
            # (torch's two-pass variance differs by f32 cancellation noise
            # only; bounded in tests/test_reference_model_parity.py)
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias - mean * inv
        return (x.astype(self.dtype) * inv.astype(self.dtype)
                + shift.astype(self.dtype))


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm [+ ReLU] — the reference's DimReduceLayer
    shape (reference ``models/ieee3modalPart.py:28-48``) and the generic
    conv-bn unit of every backbone."""

    features: int
    kernel: Sequence[int] = (1, 1)
    strides: Sequence[int] = (1, 1)
    padding: Any = "VALID"
    nonlinear: str | None = None  # None | 'relu' | 'leakyrelu'
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    bn_momentum: float = 0.9  # == torch momentum 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NOTE (round-2 perf study): expressing 1x1 convs as 2-D dot_generals
        # over the (B*H*W, C) view measured 198.5 ms/step vs 135.9 for
        # nn.Conv on the v5e IEEE train step — XLA's native conv layouts beat
        # the relayout copies a 2-D view forces. Keep nn.Conv.
        x = nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel),
            strides=tuple(self.strides),
            padding=self.padding,
            use_bias=False,
            kernel_init=conv_kaiming_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        x = FastBatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="bn",
        )(x)
        if self.nonlinear == "relu":
            x = nn.relu(x)
        elif self.nonlinear == "leakyrelu":
            x = nn.leaky_relu(x, negative_slope=0.1)
        return x


class DenseBNReLU(nn.Module):
    """Linear + BatchNorm1d + ReLU — the reference's ``_construct_fc_layer``
    unit (reference ``models/ieee3modalPart.py:396-424``)."""

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(
            self.features,
            kernel_init=dense_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fc",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            name="bn",
        )(x)
        return nn.relu(x.astype(self.dtype))


class _ConvKernel(nn.Module):
    """Bare conv kernel param holder (param path matches ``nn.Conv``)."""

    shape: Sequence[int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_kaiming_init, tuple(self.shape),
                          jnp.float32)


class _BNState(nn.Module):
    """Bare BN param/stat holder (paths match ``FastBatchNorm``)."""

    features: int

    @nn.compact
    def __call__(self):
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        return scale, bias, ra_mean, ra_var


class _ConvBNState(nn.Module):
    """Bare ConvBN param/stat holder: nested ``conv``/``bn`` children so the
    tree is identical to ``ConvBN`` — used by block-fused paths that compute
    conv+BN outside flax (e.g. the Pallas block-backward Bottleneck)."""

    features: int
    k_in: int
    kernel_hw: Sequence[int] = (1, 1)

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_hw
        k = _ConvKernel((kh, kw, self.k_in, self.features), name="conv")()
        scale, bias, ra_mean, ra_var = _BNState(self.features, name="bn")()
        return k, scale, bias, ra_mean, ra_var


class FusedConvBN1x1(nn.Module):
    """Drop-in for ``ConvBN(kernel=(1,1), strides=(1,1))`` backed by the
    fused Pallas matmul+BN kernels (``ops/pallas/matmul_bn.py``): BN batch
    statistics ride the matmul epilogue instead of costing an extra HBM pass,
    and the custom VJP recomputes g/dy per tile so BN-backward reduces ride
    the gradient matmuls.

    Param/stat tree is identical to ``ConvBN`` (conv/kernel, bn/scale,
    bn/bias + batch_stats bn/mean, bn/var) so checkpoints and the reference
    converter are interchangeable.

    ``residual`` (optional): output = bn(conv(x)) + residual with NO relu —
    the caller applies relu (keeps the residual cotangent exact; see kernel
    module docstring). ``nonlinear='relu'`` is only valid without residual.
    """

    features: int
    nonlinear: str | None = None
    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = False, residual=None):
        from ..ops.pallas.matmul_bn import mm_affine_act, mm_bn_act_train

        relu = self.nonlinear == "relu"
        has_res = residual is not None
        if relu and has_res:
            raise ValueError("residual variant applies relu outside")
        k_in = x.shape[-1]
        w = _ConvKernel((1, 1, k_in, self.features), name="conv")()[0, 0]
        scale, bias, ra_mean, ra_var = _BNState(self.features, name="bn")()

        shp = x.shape
        a = x.reshape(-1, k_in).astype(self.dtype)
        if train:
            res = (residual.reshape(-1, self.features).astype(self.dtype)
                   if has_res else jnp.zeros((1, 1), self.dtype))
            act, mean, var = mm_bn_act_train(a, w, scale, bias, res,
                                             relu, has_res)
            if not self.is_initializing():
                m = self.bn_momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            inv = jax.lax.rsqrt(ra_var.value + 1e-5) * scale
            shift = bias - ra_mean.value * inv
            act = mm_affine_act(a, w, inv, shift, relu)
            if has_res:
                act = act + residual.reshape(-1, self.features).astype(
                    act.dtype)
        return act.reshape(shp[:-1] + (self.features,))


def global_avg_pool(x):
    """(B, H, W, C) -> (B, C)."""
    return jnp.mean(x, axis=(1, 2))


def global_max_pool(x):
    """(B, H, W, C) -> (B, C)."""
    return jnp.max(x, axis=(1, 2))


def adaptive_avg_pool(x, out_h: int, out_w: int):
    """NHWC AdaptiveAvgPool2d for output sizes that divide the input —
    the only case the reference uses ((6,1) part pooling and (1,1) global;
    reference ``ieee3modalPart.py:342-343``)."""
    b, h, w, c = x.shape
    if h % out_h != 0 or w % out_w != 0:
        # general adaptive pooling via interpolation-free bucketing
        return _adaptive_avg_pool_general(x, out_h, out_w)
    x = x.reshape(b, out_h, h // out_h, out_w, w // out_w, c)
    return jnp.mean(x, axis=(2, 4))


def _adaptive_avg_pool_general(x, out_h: int, out_w: int):
    import numpy as np

    b, h, w, c = x.shape
    # torch semantics: bucket i covers [floor(i*H/out), ceil((i+1)*H/out))
    rows = []
    for i in range(out_h):
        h0, h1 = (i * h) // out_h, -(-((i + 1) * h) // out_h)
        cols = []
        for j in range(out_w):
            w0, w1 = (j * w) // out_w, -(-((j + 1) * w) // out_w)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)
