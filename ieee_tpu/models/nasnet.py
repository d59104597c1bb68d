"""NASNet-A Mobile (Zoph et al., CVPR 2018).

Reference analog: ``torchreid/models/nasnet.py`` (1131 LoC). Structure: conv0
stem -> two reduction stem cells -> 3 stages of [FirstCell + 3 NormalCells]
with ReductionCells between, penultimate_filters = 1056 (filters = 44).
Cell wiring follows the reference exactly (NormalCell/ReductionCell comb
iterations, factorized path reduction in FirstCell/CellStem1, z-padded
pool/separable variants at reduction boundaries).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import conv_kaiming_init, dense_init, global_avg_pool

__all__ = ["NASNetAMobile"]


def _bn(x, train, name, dtype):
    h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-3, dtype=jnp.float32,
                     param_dtype=jnp.float32, name=name)(x)
    return h.astype(dtype)


class _ReluConvBN(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=conv_kaiming_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        return _bn(x, train, "bn", self.dtype)


def _zpad_crop(x):
    """torch ZeroPad2d((1,0,1,0)) then [:, 1:, 1:] crop combo used by the
    'specific'/pad pool variants at reduction boundaries."""
    return jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))


def _maxpool_pad(x):
    h = _zpad_crop(x)
    h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    return h[:, 1:, 1:, :]


def _avgpool_pad(x):
    h = _zpad_crop(x)
    h = nn.avg_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    count_include_pad=False)
    return h[:, 1:, 1:, :]


def _avgpool3s1(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


class BranchSeparables(nn.Module):
    """relu -> sep(k, stride) -> bn -> relu -> sep(k, 1) -> bn.
    ``specific=True`` z-pads before the strided separable (reduction cells).
    """

    features: int
    kernel: int
    strides: int = 1
    specific: bool = False
    dtype: Any = jnp.bfloat16

    def _sep(self, x, features, strides, name):
        pad = self.kernel // 2
        c = x.shape[-1]
        x = nn.Conv(c, (self.kernel, self.kernel), strides=(strides, strides),
                    padding=((pad, pad), (pad, pad)), feature_group_count=c,
                    use_bias=False, kernel_init=conv_kaiming_init,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=name + "_dw")(x)
        return nn.Conv(features, (1, 1), use_bias=False,
                       kernel_init=conv_kaiming_init, dtype=self.dtype,
                       param_dtype=jnp.float32, name=name + "_pw")(x)

    @nn.compact
    def __call__(self, x, train=False):
        h = nn.relu(x)
        if self.specific:
            h = _zpad_crop(h)
        h = self._sep(h, self.features, self.strides, "sep1")
        if self.specific:
            h = h[:, 1:, 1:, :]
        h = _bn(h, train, "bn1", self.dtype)
        h = nn.relu(h)
        h = self._sep(h, self.features, 1, "sep2")
        return _bn(h, train, "bn2", self.dtype)


class _FactorizedPath(nn.Module):
    """Stride-2 channel-split path reduction (FirstCell/CellStem1 left input)."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.relu(x)
        half = self.features // 2
        p1 = nn.avg_pool(x, (1, 1), strides=(2, 2), count_include_pad=False)
        p1 = nn.Conv(half, (1, 1), use_bias=False,
                     kernel_init=conv_kaiming_init, dtype=self.dtype,
                     param_dtype=jnp.float32, name="path1_conv")(p1)
        p2 = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, 1:, 1:, :]
        p2 = nn.avg_pool(p2, (1, 1), strides=(2, 2), count_include_pad=False)
        p2 = nn.Conv(self.features - half, (1, 1), use_bias=False,
                     kernel_init=conv_kaiming_init, dtype=self.dtype,
                     param_dtype=jnp.float32, name="path2_conv")(p2)
        return _bn(jnp.concatenate([p1, p2], axis=-1), train, "bn", self.dtype)


class _ReductionCombs(nn.Module):
    """The shared reduction-cell comb topology (CellStem0/1, ReductionCell0/1).
    Takes prepared (x_left @ hi-res, x_right) and emits the 4-way concat."""

    features: int
    specific: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x_right_hi, x_left_lo, train=False):
        """x_right_hi: the input reduced WITH stride inside combs;
        x_left_lo: the other input (also strided inside combs)."""
        f, sp, dt = self.features, self.specific, self.dtype
        bs = lambda k, s, spec, n: BranchSeparables(f, k, s, specific=spec,
                                                    dtype=dt, name=n)
        c0 = bs(5, 2, sp, "c0l")(x_right_hi, train) + \
            bs(7, 2, sp, "c0r")(x_left_lo, train)
        c1 = (_maxpool_pad(x_right_hi) if sp else nn.max_pool(
            x_right_hi, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))) + \
            bs(7, 2, sp, "c1r")(x_left_lo, train)
        c2 = (_avgpool_pad(x_right_hi) if sp else nn.avg_pool(
            x_right_hi, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            count_include_pad=False)) + \
            bs(5, 2, sp, "c2r")(x_left_lo, train)
        c3 = _avgpool3s1(c0) + c1
        c4 = bs(3, 1, sp, "c4l")(c0, train) + \
            (_maxpool_pad(x_right_hi) if sp else nn.max_pool(
                x_right_hi, (3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1))))
        return jnp.concatenate([c1, c2, c3, c4], axis=-1)


class NormalCell(nn.Module):
    features: int  # out_channels per comb
    first: bool = False  # FirstCell: left input goes through factorized path
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, x_prev, train=False):
        f, dt = self.features, self.dtype
        if self.first:
            x_left = _FactorizedPath(f, dtype=dt, name="path")(x_prev, train)
            x_right = _ReluConvBN(f * 2 if False else f, dtype=dt,
                                  name="conv_1x1")(x, train)
        else:
            x_left = _ReluConvBN(f, dtype=dt, name="conv_prev_1x1")(
                x_prev, train)
            x_right = _ReluConvBN(f, dtype=dt, name="conv_1x1")(x, train)

        bs = lambda k, n: BranchSeparables(f, k, 1, dtype=dt, name=n)
        c0 = bs(5, "c0l")(x_right, train) + bs(3, "c0r")(x_left, train)
        c1 = bs(5, "c1l")(x_left, train) + bs(3, "c1r")(x_left, train)
        c2 = _avgpool3s1(x_right) + x_left
        c3 = _avgpool3s1(x_left) + _avgpool3s1(x_left)
        c4 = bs(3, "c4l")(x_right, train) + x_right
        return jnp.concatenate([x_left, c0, c1, c2, c3, c4], axis=-1)


class NASNetAMobile(nn.Module):
    num_classes: int = 100
    loss: str = "softmax"
    stem_filters: int = 32
    penultimate_filters: int = 1056
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False, return_featuremaps=False):
        f = self.penultimate_filters // 24  # 44
        dt = self.dtype
        x = x.astype(dt)

        # conv0: 3x3/2, VALID padding as torch padding=0
        h = nn.Conv(self.stem_filters, (3, 3), strides=(2, 2), padding="VALID",
                    use_bias=False, kernel_init=conv_kaiming_init, dtype=dt,
                    param_dtype=jnp.float32, name="conv0")(x)
        x_conv0 = _bn(h, train, "conv0_bn", dt)

        # cell_stem_0: right = 1x1(x_conv0), left = raw x_conv0 (stem sep)
        s0_r = _ReluConvBN(f // 4, dtype=dt, name="stem0_conv1x1")(
            x_conv0, train)
        x_stem_0 = _ReductionCombs(f // 4, specific=False, dtype=dt,
                                   name="stem0")(s0_r, x_conv0, train)

        # cell_stem_1: left = 1x1(stem0), right = factorized path of conv0
        s1_l = _ReluConvBN(f // 2, dtype=dt, name="stem1_conv1x1")(
            x_stem_0, train)
        s1_r = _FactorizedPath(f // 2, dtype=dt, name="stem1_path")(
            x_conv0, train)
        x_stem_1 = _ReductionCombs(f // 2, specific=True, dtype=dt,
                                   name="stem1")(s1_l, s1_r, train)

        # stage 1
        x_prev, x_cur = x_stem_0, x_stem_1
        h = NormalCell(f, first=True, dtype=dt, name="cell_0")(
            x_cur, x_prev, train)
        x_prev, x_cur = x_cur, h
        for i in (1, 2, 3):
            h = NormalCell(f, dtype=dt, name=f"cell_{i}")(x_cur, x_prev, train)
            x_prev, x_cur = x_cur, h

        r0_l = _ReluConvBN(2 * f, dtype=dt, name="red0_prev")(x_prev, train)
        r0_r = _ReluConvBN(2 * f, dtype=dt, name="red0_cur")(x_cur, train)
        x_red0 = _ReductionCombs(2 * f, specific=True, dtype=dt,
                                 name="reduction_cell_0")(r0_r, r0_l, train)

        # stage 2 (FirstCell bridges the resolution change)
        x_prev, x_cur = x_cur, x_red0
        h = NormalCell(2 * f, first=True, dtype=dt, name="cell_6")(
            x_cur, x_prev, train)
        x_prev, x_cur = x_cur, h
        for i in (7, 8, 9):
            h = NormalCell(2 * f, dtype=dt, name=f"cell_{i}")(
                x_cur, x_prev, train)
            x_prev, x_cur = x_cur, h

        r1_l = _ReluConvBN(4 * f, dtype=dt, name="red1_prev")(x_prev, train)
        r1_r = _ReluConvBN(4 * f, dtype=dt, name="red1_cur")(x_cur, train)
        x_red1 = _ReductionCombs(4 * f, specific=True, dtype=dt,
                                 name="reduction_cell_1")(r1_r, r1_l, train)

        # stage 3
        x_prev, x_cur = x_cur, x_red1
        h = NormalCell(4 * f, first=True, dtype=dt, name="cell_12")(
            x_cur, x_prev, train)
        x_prev, x_cur = x_cur, h
        for i in (13, 14, 15):
            h = NormalCell(4 * f, dtype=dt, name=f"cell_{i}")(
                x_cur, x_prev, train)
            x_prev, x_cur = x_cur, h

        feat = nn.relu(x_cur)
        if return_featuremaps:
            return feat
        v = global_avg_pool(feat).astype(jnp.float32)
        if not train:
            return v
        v = nn.Dropout(rate=0.5, deterministic=not train)(v)
        y = nn.Dense(self.num_classes, kernel_init=dense_init,
                     dtype=jnp.float32, param_dtype=jnp.float32,
                     name="classifier")(v)
        if self.loss == "softmax":
            return y
        if self.loss == "triplet":
            return y, v
        raise KeyError(f"Unsupported loss: {self.loss}")
