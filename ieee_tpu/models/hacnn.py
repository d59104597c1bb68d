"""HACNN — Harmonious Attention CNN (Li et al., CVPR 2018).

Reference analog: ``torchreid/models/hacnn.py`` (401 LoC): 3 Inception
stages, each with soft (spatial x channel) attention and hard attention
producing 4 region translations; a local stream applies spatial-transformer
crops (fixed 1 x 0.25 scale, learned translation) accumulated across stages.
Eval feature: L2-normalized (global 512, local 512) pair. Input is fixed at
160x64 as the reference asserts.

TPU notes: the torch ``affine_grid``/``grid_sample`` STN is re-expressed as a
vectorized bilinear gather (``_affine_sample``) — static output shapes, vmap
over batch; everything stays inside one XLA program.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import conv_kaiming_init, dense_init, global_avg_pool


class ConvBlock(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: int = 1
    padding: Tuple[int, int] = (0, 0)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, tuple(self.kernel),
                    strides=(self.strides, self.strides),
                    padding=(
                        (self.padding[0], self.padding[0]),
                        (self.padding[1], self.padding[1]),
                    ),
                    use_bias=True, kernel_init=conv_kaiming_init,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x.astype(self.dtype))


class InceptionA(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        mid = self.features // 4
        cb = lambda f, k, p, n: ConvBlock(f, (k, k), 1, (p, p),
                                          dtype=self.dtype, name=n)
        s1 = cb(mid, 3, 1, "s1b")(cb(mid, 1, 0, "s1a")(x, train), train)
        s2 = cb(mid, 3, 1, "s2b")(cb(mid, 1, 0, "s2a")(x, train), train)
        s3 = cb(mid, 3, 1, "s3b")(cb(mid, 1, 0, "s3a")(x, train), train)
        s4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        s4 = cb(mid, 1, 0, "s4")(s4, train)
        return jnp.concatenate([s1, s2, s3, s4], axis=-1)


class InceptionB(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        mid = self.features // 4
        cb = lambda f, k, s, p, n: ConvBlock(f, (k, k), s, (p, p),
                                             dtype=self.dtype, name=n)
        s1 = cb(mid, 3, 2, 1, "s1b")(cb(mid, 1, 1, 0, "s1a")(x, train), train)
        s2 = cb(mid, 3, 2, 1, "s2c")(
            cb(mid, 3, 1, 1, "s2b")(cb(mid, 1, 1, 0, "s2a")(x, train), train),
            train)
        s3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        s3 = cb(mid * 2, 1, 1, 0, "s3")(s3, train)
        return jnp.concatenate([s1, s2, s3], axis=-1)


def _resize_bilinear_ac(x, oh: int, ow: int):
    """Bilinear resize with torch ``align_corners=True`` semantics
    (``F.upsample(..., align_corners=True)``): output i samples input at
    ``i * (in-1) / (out-1)``. Separable matrices -> two einsums."""
    import numpy as np

    b, ih, iw, c = x.shape

    def mat(out_n, in_n):
        m = np.zeros((out_n, in_n), np.float32)
        if out_n == 1 or in_n == 1:
            m[:, 0] = 1.0
            return m
        pos = np.arange(out_n) * (in_n - 1) / (out_n - 1)
        lo = np.clip(np.floor(pos).astype(np.int64), 0, in_n - 1)
        hi = np.minimum(lo + 1, in_n - 1)
        w = pos - lo
        m[np.arange(out_n), lo] += 1.0 - w
        m[np.arange(out_n), hi] += w
        return m

    wh = jnp.asarray(mat(oh, ih))
    ww = jnp.asarray(mat(ow, iw))
    y = jnp.einsum("oh,bhwc->bowc", wh, x.astype(jnp.float32))
    y = jnp.einsum("pw,bowc->bopc", ww, y)
    return y.astype(x.dtype)


class SoftAttn(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        # spatial branch: channel-mean -> stride-2 conv -> upsample -> 1x1
        # (reference upsample is align_corners=True, hacnn.py:104-109)
        s = jnp.mean(x, axis=-1, keepdims=True)
        s = ConvBlock(1, (3, 3), 2, (1, 1), dtype=self.dtype,
                      name="spatial1")(s, train)
        s = _resize_bilinear_ac(s, s.shape[1] * 2, s.shape[2] * 2)
        s = ConvBlock(1, (1, 1), 1, (0, 0), dtype=self.dtype,
                      name="spatial2")(s, train)
        # channel branch: squeeze-excite style
        c = global_avg_pool(x)[:, None, None, :]
        c = ConvBlock(x.shape[-1] // 16, (1, 1), 1, (0, 0), dtype=self.dtype,
                      name="channel1")(c, train)
        c = ConvBlock(x.shape[-1], (1, 1), 1, (0, 0), dtype=self.dtype,
                      name="channel2")(c, train)
        y = s * c
        y = ConvBlock(x.shape[-1], (1, 1), 1, (0, 0), dtype=self.dtype,
                      name="fuse")(y, train)
        return nn.sigmoid(y.astype(jnp.float32)).astype(x.dtype)


class HardAttn(nn.Module):
    """Predicts 4 region translations (t_x, t_y) via tanh; bias initialized
    to spread regions vertically (reference ``hacnn.py:121-135``)."""

    @nn.compact
    def __call__(self, x):
        v = global_avg_pool(x).astype(jnp.float32)
        bias_init = lambda key, shape, dtype=jnp.float32: jnp.asarray(
            [0, -0.75, 0, -0.25, 0, 0.25, 0, 0.75], dtype)
        theta = jnp.tanh(
            nn.Dense(8, kernel_init=nn.initializers.zeros,
                     bias_init=bias_init, dtype=jnp.float32,
                     param_dtype=jnp.float32, name="fc")(v)
        )
        return theta.reshape(-1, 4, 2)


def _affine_sample(x, theta_t, scale):
    """torch ``F.affine_grid`` + ``F.grid_sample`` (both align_corners=False,
    the defaults the reference hits, ``hacnn.py:287-295``): sample the
    affine crop at the SOURCE resolution — the reference then bilinearly
    resizes (align_corners=True) to the stage's local size. scale fixed to
    (1, 0.25), translation from theta. x: (B,H,W,C); theta_t: (B,2)."""
    b, h, w, c = x.shape
    oh, ow = h, w
    sx, sy = scale  # width, height scale
    # normalized output grid at pixel centers (affine_grid ac=False)
    ys = (jnp.arange(oh) + 0.5) * 2.0 / oh - 1.0
    xs = (jnp.arange(ow) + 0.5) * 2.0 / ow - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (oh, ow)

    def one(img, t):
        src_x = sx * gx + t[0]
        src_y = sy * gy + t[1]
        # to pixel coords (grid_sample ac=False: px = ((g+1)*W - 1)/2)
        px = ((src_x + 1.0) * w - 1.0) / 2.0
        py = ((src_y + 1.0) * h - 1.0) / 2.0
        x0 = jnp.floor(px).astype(jnp.int32)
        y0 = jnp.floor(py).astype(jnp.int32)
        x1, y1 = x0 + 1, y0 + 1
        wx = px - x0
        wy = py - y0

        def gather(yy, xx):
            valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            yy = jnp.clip(yy, 0, h - 1)
            xx = jnp.clip(xx, 0, w - 1)
            vals = img[yy, xx]  # (oh, ow, C)
            return jnp.where(valid[..., None], vals, 0.0)

        out = (
            gather(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
            + gather(y0, x1) * (wx * (1 - wy))[..., None]
            + gather(y1, x0) * ((1 - wx) * wy)[..., None]
            + gather(y1, x1) * (wx * wy)[..., None]
        )
        return out

    return jax.vmap(one)(x.astype(jnp.float32), theta_t).astype(x.dtype)


class HACNN(nn.Module):
    num_classes: int = 100
    loss: str = "softmax"
    nchannels: Sequence[int] = (128, 256, 384)
    feat_dim: int = 512
    learn_region: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False, return_featuremaps=False):
        if x.shape[1] != 160 or x.shape[2] != 64:
            raise ValueError(
                f"HACNN expects 160x64 input, got {x.shape[1]}x{x.shape[2]}"
            )
        nc = list(self.nchannels)
        x = x.astype(self.dtype)
        x = ConvBlock(32, (3, 3), 2, (1, 1), dtype=self.dtype, name="conv")(
            x, train)

        local_sizes = [(24, 28), (12, 14), (6, 7)]
        stream_in = [x, None, None]
        x_cur = x
        locals_ = [None] * 4
        for stage in range(3):
            h = InceptionA(nc[stage], dtype=self.dtype,
                           name=f"inception{stage + 1}a")(x_cur, train)
            h = InceptionB(nc[stage], dtype=self.dtype,
                           name=f"inception{stage + 1}b")(h, train)
            attn = SoftAttn(dtype=self.dtype, name=f"soft{stage + 1}")(h, train)
            theta = HardAttn(name=f"hard{stage + 1}")(h)
            out = h * attn
            if self.learn_region:
                src = x if stage == 0 else prev_out
                # ONE shared local conv per stage applied to all 4 regions
                # (reference local_conv{1,2,3}, hacnn.py:258-260)
                local_conv = InceptionB(nc[stage], dtype=self.dtype,
                                        name=f"local_conv{stage + 1}")
                new_locals = []
                for r in range(4):
                    crop = _affine_sample(src, theta[:, r, :], (1.0, 0.25))
                    crop = _resize_bilinear_ac(crop, *local_sizes[stage])
                    if stage > 0:
                        crop = crop + locals_[r]
                    loc = local_conv(crop, train)
                    new_locals.append(loc)
                locals_ = new_locals
            prev_out = out
            x_cur = out

        if return_featuremaps:
            return prev_out

        v_global = global_avg_pool(prev_out).astype(jnp.float32)
        v_global = nn.Dense(self.feat_dim, kernel_init=dense_init,
                            dtype=jnp.float32, param_dtype=jnp.float32,
                            name="fc_global")(v_global)
        v_global = nn.relu(nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=jnp.float32,
            name="fc_global_bn")(v_global))

        if self.learn_region:
            v_local = jnp.concatenate(
                [global_avg_pool(l).astype(jnp.float32) for l in locals_],
                axis=1)
            v_local = nn.Dense(self.feat_dim, kernel_init=dense_init,
                               dtype=jnp.float32, param_dtype=jnp.float32,
                               name="fc_local")(v_local)
            v_local = nn.relu(nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, param_dtype=jnp.float32,
                name="fc_local_bn")(v_local))

        if not train:
            if self.learn_region:
                g = v_global / jnp.maximum(
                    jnp.linalg.norm(v_global, axis=1, keepdims=True), 1e-12)
                l = v_local / jnp.maximum(
                    jnp.linalg.norm(v_local, axis=1, keepdims=True), 1e-12)
                return jnp.concatenate([g, l], axis=1)
            return v_global

        y_global = nn.Dense(self.num_classes, kernel_init=dense_init,
                            dtype=jnp.float32, param_dtype=jnp.float32,
                            name="classifier_global")(v_global)
        if not self.learn_region:
            return y_global
        y_local = nn.Dense(self.num_classes, kernel_init=dense_init,
                           dtype=jnp.float32, param_dtype=jnp.float32,
                           name="classifier_local")(v_local)
        # per-stream logits pair (reference trains both streams jointly)
        return (y_global, y_local)
