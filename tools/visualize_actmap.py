"""Visualize activation maps per modality.

Reference analog: ``tools/visualize_actmap.py:26-154`` — forwards with
``return_featuremaps=True``, takes the L2 channel energy of the final
feature map, overlays it as a heatmap next to the input image. ``--modal``
selects RGB / NI / TI for multi-modal models.

Usage:
    python tools/visualize_actmap.py --config-file <yaml> --root <data-root> \
        --weights <ckpt> --save-dir log/actmap [--modal RGB]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406])
IMAGENET_STD = np.array([0.229, 0.224, 0.225])
MODAL_IDX = {"RGB": 0, "NI": 1, "TI": 2}


def _colormap_jet(x):
    """x in [0,1] -> uint8 RGB via a JET-like map (no cv2 in this image)."""
    import matplotlib.cm as cm

    return (cm.jet(x)[..., :3] * 255).astype(np.uint8)


def visactmap(model, variables, test_loader, save_dir, width, height,
              modal="RGB", max_batches=10):
    import jax
    from PIL import Image

    from ieee_tpu.utils import mkdir_if_missing

    @jax.jit
    def featuremaps(variables, imgs):
        return model.module.apply(variables, imgs, train=False,
                                  return_featuremaps=True)

    for target, loaders in test_loader.items():
        out_dir = osp.join(save_dir, "actmap_" + target)
        mkdir_if_missing(out_dir)
        for b_idx, data in enumerate(loaders["query"]):
            if b_idx >= max_batches:
                break
            imgs = data["img"]
            multi = isinstance(imgs, tuple)
            norm = lambda a: (a.astype(np.float32) / 255.0 - IMAGENET_MEAN) \
                / IMAGENET_STD
            if multi:
                batch_in = tuple(norm(m) for m in imgs)
                fmaps = featuremaps(variables, batch_in)
                fmap = np.asarray(fmaps[MODAL_IDX[modal]], np.float32)
                shown = imgs[MODAL_IDX[modal]]
            else:
                fmap = np.asarray(featuremaps(variables, norm(imgs)),
                                  np.float32)
                shown = imgs

            # L2 channel energy -> per-image [0,1] heatmap (reference :96-118)
            energy = (fmap ** 2).sum(axis=-1)  # (B, h, w)
            b, h, w = energy.shape
            flat = energy.reshape(b, -1)
            flat = flat / (np.linalg.norm(flat, axis=1, keepdims=True) + 1e-12)
            energy = flat.reshape(b, h, w)
            emin = energy.min(axis=(1, 2), keepdims=True)
            emax = energy.max(axis=(1, 2), keepdims=True)
            energy = (energy - emin) / (emax - emin + 1e-12)

            for i in range(b):
                am = np.asarray(
                    Image.fromarray((energy[i] * 255).astype(np.uint8)).resize(
                        (width, height), Image.BILINEAR
                    ), np.float32,
                ) / 255.0
                heat = _colormap_jet(am)
                overlay = (0.6 * shown[i] + 0.4 * heat).astype(np.uint8)
                grid = np.concatenate(
                    [shown[i],
                     np.full((height, 10, 3), 255, np.uint8),
                     heat,
                     np.full((height, 10, 3), 255, np.uint8),
                     overlay],
                    axis=1,
                )
                name = osp.basename(
                    data["impath"][i] if isinstance(data["impath"][i], str)
                    else data["impath"][i][0]
                ).replace("/", "_").replace(":", "_")
                Image.fromarray(grid).save(osp.join(out_dir, f"{b_idx}_{name}.png"))
        print(f"actmaps for {target} ({modal}) written to {out_dir}")


def main():
    import jax

    from ieee_tpu.config import get_default_config, imagedata_kwargs
    from ieee_tpu.data import ImageDataManager
    from ieee_tpu.models import apply_pretrained, build_model
    from ieee_tpu.utils import load_pretrained_weights

    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", type=str, default="")
    parser.add_argument("--root", type=str, default="")
    parser.add_argument("--weights", type=str, default="")
    parser.add_argument("--save-dir", type=str, default="log/actmap")
    parser.add_argument("--modal", type=str, default="RGB",
                        choices=list(MODAL_IDX))
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg = get_default_config()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.root:
        cfg.data.root = args.root
    if args.opts:
        cfg.merge_from_list(args.opts)

    dm = ImageDataManager(**imagedata_kwargs(cfg))
    model = build_model(cfg.model.name, num_classes=dm.num_train_pids,
                        loss=cfg.loss.name, pretrained=cfg.model.pretrained)
    variables = model.init_variables(jax.random.PRNGKey(0), batch=2,
                                     height=cfg.data.height,
                                     width=cfg.data.width)
    if cfg.model.pretrained:
        variables = apply_pretrained(model, variables)
    if args.weights:
        variables = load_pretrained_weights(variables, args.weights)

    visactmap(model, variables, dm.test_loader, args.save_dir,
              cfg.data.width, cfg.data.height, modal=args.modal)


if __name__ == "__main__":
    main()
