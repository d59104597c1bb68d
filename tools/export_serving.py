"""Export a trained model's eval forward as a self-contained StableHLO
serving artifact (jax.export; see ieee_tpu/utils/export.py).

Usage:
    PYTHONPATH=/root/repo python tools/export_serving.py \
        --model ieee3modalPart --num-classes 171 [--weights ckpt.msgpack] \
        [--batch 100 --height 256 --width 128] [--roundtrip] \
        --out /tmp/ieee_eval.stablehlo

The artifact takes uint8 image batches (one per modality for the 3-modal
model) and returns eval features; preprocessing and weights are baked in.
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ieee3modalPart")
    ap.add_argument("--num-classes", type=int, default=171)
    ap.add_argument("--weights", default="",
                    help="checkpoint (.msgpack) to bake in; random init if unset")
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (artifact serves on CPU)")
    ap.add_argument("--roundtrip", action="store_true",
                    help="load the artifact back and check outputs match")
    ap.add_argument("--int8", action="store_true",
                    help="export the w8a8 PTQ forward (models/int8_eval.py) "
                         "with quantized weights + calibrated activation "
                         "scales baked in (int8 MXU on TPU)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ieee_tpu.data.transforms import build_transforms
    from ieee_tpu.models import build_model
    from ieee_tpu.utils.export import export_eval_forward, load_exported

    model = build_model(args.model, num_classes=args.num_classes,
                        loss="margin" if "3modal" in args.model else "softmax",
                        pretrained=False)
    variables = model.init_variables(jax.random.PRNGKey(0), batch=2,
                                     height=args.height, width=args.width)
    if args.weights:
        from ieee_tpu.utils.checkpoint import load_pretrained_weights

        variables = load_pretrained_weights(variables, args.weights)

    _, transform_te = build_transforms(args.height, args.width,
                                       transforms=None, verbose=False)
    streams = 3 if "3modal" in args.model else 1
    forward = None
    if args.int8:
        from ieee_tpu.models.int8_eval import export_forward_int8

        rng = np.random.default_rng(1)
        calib = tuple(
            rng.integers(0, 256, (args.batch, args.height, args.width, 3),
                         dtype=np.uint8)
            for _ in range(streams)
        )
        forward = export_forward_int8(
            model, variables, transform_te,
            calib if streams > 1 else calib[0])
    data = export_eval_forward(
        model, variables, batch=args.batch, height=args.height,
        width=args.width, num_streams=streams, transform=transform_te,
        forward=forward,
    )
    out = args.out or f"/tmp/{args.model}_eval.stablehlo"
    with open(out, "wb") as f:
        f.write(data)
    print(f"exported {args.model} eval forward -> {out} "
          f"({len(data) / 1e6:.1f} MB, batch {args.batch}, "
          f"{args.height}x{args.width}, {streams} stream(s))")

    if args.roundtrip:
        fn = load_exported(open(out, "rb").read())
        rng = np.random.default_rng(0)
        imgs = tuple(
            rng.integers(0, 256, (args.batch, args.height, args.width, 3),
                         dtype=np.uint8)
            for _ in range(streams)
        )
        feats = np.asarray(fn(*imgs))
        # verify against the LIVE forward (baked preprocessing + weights),
        # not just artifact determinism; for --int8 the live program is
        # the quantized forward itself
        if forward is not None:
            # int8: separate compilations can flip borderline requant
            # roundings (±1 LSB cascades); compare by feature cosine
            live = np.asarray(forward(*imgs), np.float32)
            cos = (feats * live).sum(-1) / np.maximum(
                np.linalg.norm(feats, axis=-1)
                * np.linalg.norm(live, axis=-1), 1e-12)
            assert cos.min() > 0.99, f"int8 roundtrip cosine {cos.min()}"
        else:
            ims = tuple(transform_te(m) for m in imgs)
            live = model.module.apply(
                variables, ims if streams > 1 else ims[0], train=False)
            np.testing.assert_allclose(feats, np.asarray(live),
                                       rtol=1e-4, atol=1e-4)
        print(f"roundtrip OK vs live model: features {feats.shape}, "
              f"norm {float(np.linalg.norm(feats)):.3f}")


if __name__ == "__main__":
    main()
