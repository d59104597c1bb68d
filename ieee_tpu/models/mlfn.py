"""MLFN — Multi-Level Factorisation Net (Chang et al., CVPR 2018).

Reference analog: ``torchreid/models/mlfn.py`` (337 LoC): 16 grouped-conv
blocks whose factor-selection-module (FSM) gates are concatenated into a
factor signature; final embedding = mean of projected conv feature and
projected signature. The fork's forward drops the classifier (returns v
only); the published MLFN classifies v — classifier applied here
(documented divergence).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import conv_kaiming_init, dense_init, global_avg_pool

_BLOCKS = [
    # (out_channels, stride, fsm_channels)
    (256, 1, (128, 64)), (256, 1, (128, 64)), (256, 1, (128, 64)),
    (512, 2, (256, 128)), (512, 1, (256, 128)), (512, 1, (256, 128)),
    (512, 1, (256, 128)),
    (1024, 2, (512, 128)), (1024, 1, (512, 128)), (1024, 1, (512, 128)),
    (1024, 1, (512, 128)), (1024, 1, (512, 128)), (1024, 1, (512, 128)),
    (2048, 2, (512, 128)), (2048, 1, (512, 128)), (2048, 1, (512, 128)),
]


class _CBR(nn.Module):
    features: int
    kernel: int = 1
    strides: int = 1
    groups: int = 1
    act: bool = True
    bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.groups, use_bias=self.bias,
                    kernel_init=conv_kaiming_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        x = x.astype(self.dtype)
        return nn.relu(x) if self.act else x


class MLFNBlock(nn.Module):
    out_channels: int
    strides: int
    fsm_channels: Sequence[int]
    groups: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        mid = self.out_channels // 2
        residual = x

        # fm1/fm2 BEFORE the fsm: keeps flax creation order aligned with
        # the reference's registration order (mlfn.py:24-51) so the generic
        # converter's same-shape fm-vs-fsm units stay unambiguous
        h = _CBR(mid, 1, dtype=self.dtype, name="fm1")(x, train)
        h = _CBR(mid, 3, self.strides, groups=self.groups, dtype=self.dtype,
                 name="fm2")(h, train)

        # factor selection module: pooled MLP -> per-group sigmoid gate
        s = global_avg_pool(x)[:, None, None, :]
        s = _CBR(self.fsm_channels[0], 1, bias=True, dtype=self.dtype,
                 name="fsm1")(s, train)
        s = _CBR(self.fsm_channels[1], 1, bias=True, dtype=self.dtype,
                 name="fsm2")(s, train)
        s = nn.Conv(self.groups, (1, 1), use_bias=True,
                    kernel_init=conv_kaiming_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="fsm3")(s)
        s = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="fsm3_bn")(s)
        s = nn.sigmoid(s).astype(self.dtype)  # (B,1,1,G)
        # gate each conv group by its factor weight: channels are laid out
        # group-major by grouped conv, i.e. channel j belongs to group
        # j // (c // G) (torch repeat+permute trick, ``mlfn.py:63-69``)
        c = h.shape[-1]
        gate = jnp.repeat(s, c // self.groups, axis=-1)  # (B,1,1,C)
        h = h * gate
        h = _CBR(self.out_channels, 1, dtype=self.dtype, name="fm3")(h, train)

        if residual.shape[-1] != self.out_channels or self.strides > 1:
            residual = _CBR(self.out_channels, 1, self.strides, act=False,
                            dtype=self.dtype, name="downsample")(
                residual, train)
        return nn.relu(residual + h), s[:, 0, 0, :]  # (B, G)


class MLFN(nn.Module):
    num_classes: int = 100
    loss: str = "softmax"
    groups: int = 32
    embed_dim: int = 1024
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False, return_featuremaps=False):
        x = x.astype(self.dtype)
        x = _CBR(64, 7, 2, bias=True, dtype=self.dtype, name="conv1")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        s_hat = []
        for i, (out_ch, stride, fsm) in enumerate(_BLOCKS):
            x, s = MLFNBlock(out_ch, stride, fsm, self.groups,
                             dtype=self.dtype, name=f"block{i}")(x, train)
            s_hat.append(s)
        if return_featuremaps:
            return x
        s_hat = jnp.concatenate(s_hat, axis=-1)[:, None, None, :]  # (B,1,1,512)

        v_x = _CBR(self.embed_dim, 1, dtype=self.dtype, name="fc_x")(
            global_avg_pool(x)[:, None, None, :], train)
        v_s = _CBR(self.embed_dim, 1, dtype=self.dtype, name="fc_s")(
            s_hat, train)
        v = ((v_x + v_s) * 0.5)[:, 0, 0, :].astype(jnp.float32)

        if not train:
            return v
        y = nn.Dense(self.num_classes, kernel_init=dense_init,
                     dtype=jnp.float32, param_dtype=jnp.float32,
                     name="classifier")(v)
        if self.loss == "softmax":
            return y
        if self.loss == "triplet":
            return y, v
        raise KeyError(f"Unsupported loss: {self.loss}")
