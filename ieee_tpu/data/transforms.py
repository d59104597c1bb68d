"""Device-side batched image transforms, compiled into the input pipeline.

Reference analog: ``torchreid/data/transforms.py:233-326`` (per-image PIL
pipelines on the host). TPU-native re-design (BASELINE.json north star #1):
the host only decodes jpg -> uint8 (resized once at decode); everything else —
flip, crop-translate, color jitter, normalize, random-erase — runs as ONE
compiled function over the whole (B, H, W, 3) uint8 batch on device, RNG-keyed
(``jax.random``), so augmentation is deterministic given the epoch/step key.

Parameters mirror the reference ops:
 - random_flip: p=0.5 horizontal
 - random_crop (Random2DTranslation, ``transforms.py:12-48``): p=0.5, upscale
   1.125x then random crop back to (H, W)
 - color_jitter (``transforms.py:299-302``): brightness=0.2, contrast=0.15
 - random_erase (``transforms.py:51-106``): p=0.5, area in [0.02, 0.4],
   aspect in [0.3, 1/0.3], fill = [0.4914, 0.4822, 0.4465] (pre-normalize
   pixel value). Divergence: the reference rejection-samples up to 100
   attempts for a rectangle that fits; we clamp the sampled rectangle to the
   image instead (a fit always exists) — same marginal behavior, static shapes.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

AVAI_TRANSFORMS = [
    "random_flip",
    "random_crop",
    "color_jitter",
    "random_erase",
    "random_patch",  # host-side persistent-pool paste (see RandomPatchPool)
    "color_aug",  # PCA lighting (reference ColorAugmentation, unused by
    #               build_transforms in the reference; exposed here)
]

# ImageNet PCA lighting basis (reference ``transforms.py:109-141``)
_EIG_VEC = (
    (0.4009, 0.7192, -0.5675),
    (-0.8140, -0.0045, -0.5808),
    (0.4203, -0.6948, -0.5836),
)
_EIG_VAL = (0.2175, 0.0188, 0.0045)


def _normalize(x, mean, std):
    return (x - jnp.asarray(mean, x.dtype)) / jnp.asarray(std, x.dtype)


def _random_flip(key, x):
    b = x.shape[0]
    flip = jax.random.bernoulli(key, 0.5, (b,))
    return jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)


def _random_crop(key, x, height, width):
    """Random2DTranslation: upscale 1.125x + random crop, p=0.5."""
    b = x.shape[0]
    nh, nw = int(round(height * 1.125)), int(round(width * 1.125))
    big = jax.image.resize(x, (b, nh, nw, x.shape[3]), method="bilinear")
    k1, k2, k3 = jax.random.split(key, 3)
    y0 = jax.random.randint(k1, (b,), 0, nh - height + 1)
    x0 = jax.random.randint(k2, (b,), 0, nw - width + 1)

    def crop_one(img, yy, xx):
        return jax.lax.dynamic_slice(img, (yy, xx, 0), (height, width, img.shape[2]))

    cropped = jax.vmap(crop_one)(big, y0, x0)
    do = jax.random.bernoulli(k3, 0.5, (b,))
    return jnp.where(do[:, None, None, None], cropped, x)


def _rgb_to_gray(x):
    return 0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]


def _color_jitter(key, x, brightness=0.2, contrast=0.15, saturation=0.0,
                  hue=0.0):
    """torchvision-style ColorJitter on [0,1] images (the reference uses
    brightness=0.2, contrast=0.15, saturation=0, hue=0 —
    ``transforms.py:299-302``). torchvision applies the enabled ops in a
    uniformly random order per image (randperm) with one factor drawn per
    op per call independent of the order; both are reproduced exactly here
    for ANY number of enabled ops: factors are drawn once, the permutation
    comes from an argsort of per-image uniforms, and each position selects
    among the candidate op outputs branch-free (N^2 cheap elementwise
    applications instead of N! traced branches — compile-friendly)."""
    b = x.shape[0]
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    def _brightness(x):
        bf = jax.random.uniform(k1, (b, 1, 1, 1), minval=1 - brightness,
                                maxval=1 + brightness)
        return jnp.clip(x * bf, 0.0, 1.0)

    def _contrast(x):
        cf = jax.random.uniform(k2, (b, 1, 1, 1), minval=1 - contrast,
                                maxval=1 + contrast)
        gray = _rgb_to_gray(x).mean(axis=(1, 2), keepdims=True)
        return jnp.clip((x - gray) * cf + gray, 0.0, 1.0)

    def _saturation(x):
        sf = jax.random.uniform(k3, (b, 1, 1, 1), minval=1 - saturation,
                                maxval=1 + saturation)
        gray = _rgb_to_gray(x)
        return jnp.clip(gray + (x - gray) * sf, 0.0, 1.0)

    def _hue(x):
        hf = jax.random.uniform(k4, (b, 1, 1, 1), minval=-hue, maxval=hue)
        return _hue_shift(x, hf)

    ops = []
    if brightness > 0:
        ops.append(_brightness)
    if contrast > 0:
        ops.append(_contrast)
    if saturation > 0:
        ops.append(_saturation)
    if hue > 0:
        ops.append(_hue)

    if len(ops) >= 2:
        # per-image uniform permutation of the enabled ops (argsort of
        # uniforms == randperm); at each position select the op output by
        # index, branch-free
        perm = jnp.argsort(jax.random.uniform(k5, (b, len(ops))), axis=1)
        for p in range(len(ops)):
            sel = perm[:, p][:, None, None, None]
            out = ops[0](x)
            for j in range(1, len(ops)):
                out = jnp.where(sel == j, ops[j](x), out)
            x = out
        return x
    for op in ops:
        x = op(x)
    return x


def _hue_shift(x, shift):
    """Shift hue by ``shift`` (fraction of the full circle, torchvision
    semantics) via RGB->HSV->RGB, batched and branch-free."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn
    safe = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, ((g - b) / safe) % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    ) / 6.0
    h = jnp.where(d > 0, h, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    v = mx

    h = (h + shift[..., 0]) % 1.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [v, q, p, p, t, v])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [t, v, v, q, p, p])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [p, p, t, v, v, q])
    return jnp.stack([r2, g2, b2], axis=-1)


def _random_erase(key, x, sl=0.02, sh=0.4, r1=0.3,
                  mean=(0.4914, 0.4822, 0.4465), p=0.5):
    """Masked fixed-shape random erasing (operates pre-normalization)."""
    b, h, w, c = x.shape
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    area = h * w
    target = jax.random.uniform(k1, (b,), minval=sl, maxval=sh) * area
    aspect = jax.random.uniform(k2, (b,), minval=r1, maxval=1.0 / r1)
    eh = jnp.clip(jnp.round(jnp.sqrt(target * aspect)), 1, h - 1).astype(jnp.int32)
    ew = jnp.clip(jnp.round(jnp.sqrt(target / aspect)), 1, w - 1).astype(jnp.int32)
    y0 = (jax.random.uniform(k3, (b,)) * (h - eh)).astype(jnp.int32)
    x0 = (jax.random.uniform(k4, (b,)) * (w - ew)).astype(jnp.int32)
    do = jax.random.bernoulli(k5, p, (b,))

    rows = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    inside = (
        (rows >= y0[:, None, None])
        & (rows < (y0 + eh)[:, None, None])
        & (cols >= x0[:, None, None])
        & (cols < (x0 + ew)[:, None, None])
        & do[:, None, None]
    )
    fill = jnp.asarray(mean, x.dtype)
    return jnp.where(inside[..., None], fill, x)


def _color_aug(key, x, sigma=0.1):
    """PCA lighting noise on [0,1] images (AlexNet-style)."""
    b = x.shape[0]
    alpha = sigma * jax.random.normal(key, (b, 3))
    vec = jnp.asarray(_EIG_VEC, x.dtype)  # (3 rgb, 3 components)
    val = jnp.asarray(_EIG_VAL, x.dtype)
    delta = (alpha * val) @ vec.T  # (B, 3) rgb offsets
    return jnp.clip(x + delta[:, None, None, :], 0.0, 1.0)


class RandomPatchPool:
    """Exact-semantics RandomPatch (reference ``transforms.py:144-230``):
    a persistent cross-batch patch pool feeding random occlusion pastes.

    This one transform is host-side by design: the reference's pool is a
    host deque of variable-size crops whose lifetime spans batches — state
    a compiled device transform cannot carry without fixed-size ring
    tensors. Per image it is two small array copies; the loader applies it
    per decoded item (``data/loader.py``), everything else stays in the
    compiled device pipeline.

    Matches the reference step-for-step: min-area/aspect rejection sampling
    (100 attempts), pool capacity 50k / min fill 100, paste probability 0.5,
    patch flip-left-right and ±10° rotation each with probability 0.5.
    """

    def __init__(
        self,
        prob_happen=0.5,
        pool_capacity=50000,
        min_sample_size=100,
        patch_min_area=0.01,
        patch_max_area=0.5,
        patch_min_ratio=0.1,
        prob_rotate=0.5,
        prob_flip_leftright=0.5,
        seed=None,
    ):
        from collections import deque

        self.prob_happen = prob_happen
        self.patch_min_area = patch_min_area
        self.patch_max_area = patch_max_area
        self.patch_min_ratio = patch_min_ratio
        self.prob_rotate = prob_rotate
        self.prob_flip_leftright = prob_flip_leftright
        self.min_sample_size = min_sample_size
        self.pool = deque(maxlen=pool_capacity)
        import numpy as np

        self.rng = np.random.default_rng(seed)

    def _sample_wh(self, W, H):
        import math

        area = W * H
        for _ in range(100):
            target = self.rng.uniform(self.patch_min_area,
                                      self.patch_max_area) * area
            ratio = self.rng.uniform(self.patch_min_ratio,
                                     1.0 / self.patch_min_ratio)
            h = int(round(math.sqrt(target * ratio)))
            w = int(round(math.sqrt(target / ratio)))
            if w < W and h < H:
                return w, h
        return None, None

    def _transform_patch(self, patch):
        import numpy as np

        if self.rng.uniform() > self.prob_flip_leftright:
            patch = patch[:, ::-1]
        if self.rng.uniform() > self.prob_rotate:
            from PIL import Image

            deg = int(self.rng.integers(-10, 11))
            patch = np.asarray(Image.fromarray(patch).rotate(deg))
        return patch

    def __call__(self, img):
        """img: (H, W, 3) uint8 -> same, possibly with a pool patch pasted."""
        import numpy as np

        H, W = img.shape[:2]
        w, h = self._sample_wh(W, H)
        if w is not None and h is not None:
            x1 = int(self.rng.integers(0, W - w + 1))
            y1 = int(self.rng.integers(0, H - h + 1))
            self.pool.append(np.array(img[y1:y1 + h, x1:x1 + w]))

        if len(self.pool) < self.min_sample_size:
            return img
        if self.rng.uniform() > self.prob_happen:
            return img

        patch = self.pool[int(self.rng.integers(0, len(self.pool)))]
        ph, pw = patch.shape[:2]
        if ph >= H or pw >= W:  # pool may hold crops from larger images
            return img
        x1 = int(self.rng.integers(0, W - pw + 1))
        y1 = int(self.rng.integers(0, H - ph + 1))
        patch = self._transform_patch(patch)
        out = np.array(img)
        out[y1:y1 + ph, x1:x1 + pw] = patch
        return out


def build_host_transform(transforms, seed=None):
    """Host-side per-item train transform, or None. Only RandomPatch lives
    here (persistent cross-batch pool); see ``RandomPatchPool``."""
    if transforms is None:
        return None
    if isinstance(transforms, str):
        transforms = [transforms]
    if any(t.lower() == "random_patch" for t in transforms):
        return RandomPatchPool(seed=seed)
    return None


def build_transforms(
    height: int,
    width: int,
    transforms="random_flip",
    norm_mean: Sequence[float] = (0.485, 0.456, 0.406),
    norm_std: Sequence[float] = (0.229, 0.224, 0.225),
    k_tfm: int = 1,
    verbose: bool = True,
    cj_brightness: float = 0.2,
    cj_contrast: float = 0.15,
    cj_saturation: float = 0.0,
    cj_hue: float = 0.0,
    **kwargs,
) -> Tuple[Callable, Callable]:
    """Returns (train_fn, test_fn):
      train_fn(key, batch_uint8) -> normalized float32 (B,H,W,3)
      test_fn(batch_uint8) -> normalized float32 (B,H,W,3)
    Both are jit-compiled once per shape.
    """
    if transforms is None:
        transforms = []
    if isinstance(transforms, str):
        transforms = [transforms]
    if not isinstance(transforms, list):
        raise ValueError(f"transforms must be a list of strings, got "
                         f"{type(transforms)}")
    transforms = [t.lower() for t in transforms]
    for t in transforms:
        if t not in AVAI_TRANSFORMS:
            raise ValueError(f"unknown transform {t}; choose from {AVAI_TRANSFORMS}")
    if k_tfm < 1:
        raise ValueError(f"k_tfm must be >= 1, got {k_tfm}")

    if norm_mean is None or norm_std is None:
        norm_mean = (0.485, 0.456, 0.406)
        norm_std = (0.229, 0.224, 0.225)
    mean = tuple(float(m) for m in norm_mean)
    std = tuple(float(s) for s in norm_std)

    if verbose:
        print("Building train transforms ...")
        print(f"+ resize to {height}x{width} (host decode)")
        for t in transforms:
            print(f"+ {t} (device)")
        print("+ to float [0,1] + normalization (device)")

    def _train_one(key, batch):
        x = batch.astype(jnp.float32) / 255.0
        keys = jax.random.split(key, 5)
        if "random_flip" in transforms:
            x = _random_flip(keys[0], x)
        if "random_crop" in transforms:
            x = _random_crop(keys[1], x, height, width)
        # (random_patch is host-side: its persistent cross-batch patch pool
        # is applied per decoded item in the loader — see RandomPatchPool)
        if "color_jitter" in transforms:
            x = _color_jitter(keys[3], x, cj_brightness, cj_contrast,
                              cj_saturation, cj_hue)
        if "color_aug" in transforms:
            x = _color_aug(jax.random.fold_in(keys[3], 1), x)
        x = _normalize(x, mean, std)
        if "random_erase" in transforms:
            # reference order: Normalize THEN RandomErasing(mean=norm_mean)
            # (``transforms.py:310-312``) — the fill value norm_mean is
            # written into the already-normalized tensor verbatim
            x = _random_erase(keys[4], x, mean=mean)
        return x

    if k_tfm == 1:
        train_fn = jax.jit(_train_one)
    else:
        # k_tfm: k independent augmentation draws per image
        # (reference ``dataset.py:304-317``); returns (K, B, H, W, 3)
        @jax.jit
        def train_fn(key, batch):
            ks = jax.random.split(key, k_tfm)
            return jax.vmap(_train_one, in_axes=(0, None))(ks, batch)

    @jax.jit
    def test_fn(batch):
        return _normalize(batch.astype(jnp.float32) / 255.0, mean, std)

    return train_fn, test_fn
