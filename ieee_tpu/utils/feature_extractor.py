"""FeatureExtractor: a simple model+preprocess closure for inference.

Reference analog: ``torchreid/utils/feature_extractor.py:13-152``. Accepts
image paths / numpy arrays / pre-batched arrays and returns (B, D) features
from a jit-compiled eval forward.
"""

from __future__ import annotations

from typing import List, Union

import jax
import numpy as np

from ..data.transforms import build_transforms
from ..models import apply_pretrained, build_model
from .checkpoint import load_pretrained_weights
from .tools import read_image


class FeatureExtractor:
    def __init__(
        self,
        model_name: str = "resnet50",
        model_path: str = "",
        image_size=(256, 128),
        pixel_mean=(0.485, 0.456, 0.406),
        pixel_std=(0.229, 0.224, 0.225),
        pixel_norm: bool = True,
        num_classes: int = 1,
        pretrained: bool = True,
        seed: int = 0,
        verbose: bool = False,
        int8: bool = False,
    ):
        """``int8=True`` serves through the w8a8 PTQ path
        (models/int8_eval.py, int8 MXU on TPU): activation scales calibrate
        on the first batch; supported for ReIDResNet-style models
        (falls back with a warning otherwise)."""
        model = build_model(model_name, num_classes=num_classes,
                            loss="softmax", pretrained=pretrained)
        variables = model.init_variables(jax.random.PRNGKey(seed), batch=2,
                                         height=image_size[0],
                                         width=image_size[1])
        if pretrained:
            variables = apply_pretrained(model, variables)
        if model_path:
            variables = load_pretrained_weights(variables, model_path)

        if pixel_norm:
            _, test_fn = build_transforms(
                image_size[0], image_size[1], transforms=None,
                norm_mean=pixel_mean, norm_std=pixel_std, verbose=verbose,
            )
        else:
            test_fn = jax.jit(lambda b: b.astype(np.float32) / 255.0)

        forward = None
        if int8:
            from ..models.fast_eval import supports_fast_eval
            from ..models.int8_eval import (
                build_int8_reid_eval_step,
                supports_int8_eval,
            )

            # single-stream extractor: the ReIDResNet variant only (the
            # 3-modal IEEE model takes an (R, N, T) tuple, not one batch)
            if (supports_int8_eval(model.module)
                    and not supports_fast_eval(model.module)):
                step = build_int8_reid_eval_step(model, transform=test_fn)

                def forward(variables, batch_uint8):
                    return step(variables["params"],
                                variables.get("batch_stats", {}),
                                batch_uint8)
            else:
                print("WARN: int8=True unsupported for "
                      f"{model_name}; using the plain forward")
        if forward is None:
            @jax.jit
            def forward(variables, batch_uint8):
                return model.module.apply(variables, test_fn(batch_uint8),
                                          train=False)

        self.model = model
        self.variables = variables
        self.image_size = image_size
        self._forward = forward

    def _load(self, item) -> np.ndarray:
        from PIL import Image

        if isinstance(item, str):
            img = read_image(item)
        elif isinstance(item, np.ndarray):
            img = item.astype(np.uint8)
        else:
            raise TypeError(f"Unsupported input type: {type(item)}")
        if img.shape[:2] != tuple(self.image_size):
            img = np.asarray(
                Image.fromarray(img).resize(
                    (self.image_size[1], self.image_size[0]), Image.BILINEAR
                )
            )
        return img

    def __call__(self, inputs: Union[str, np.ndarray, List]):
        if isinstance(inputs, (str, np.ndarray)) and not (
            isinstance(inputs, np.ndarray) and inputs.ndim == 4
        ):
            inputs = [inputs]
        if isinstance(inputs, np.ndarray) and inputs.ndim == 4:
            batch = inputs.astype(np.uint8)
        else:
            batch = np.stack([self._load(i) for i in inputs])
        return self._forward(self.variables, batch)
