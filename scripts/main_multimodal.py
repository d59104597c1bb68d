"""Canonical multi-modal train/eval entry point.

Reference analog: ``scripts/mainMultiModal.py:150-241``: parse args -> merge
config -> seed -> Logger tee -> datamanager -> engine dispatch by
``cfg.loss.name`` -> model/optim/sched -> (resume) -> ``engine.run``.

Usage:
    python scripts/main_multimodal.py --config-file configs/rgbnt_ieee_part_margin.yaml \
        --root /path/to/data [--seed N] [opts key value ...]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import jax
import numpy as np

from ieee_tpu.config import (
    engine_run_kwargs,
    get_default_config,
    imagedata_kwargs,
    lr_scheduler_kwargs,
    optimizer_kwargs,
    videodata_kwargs,
)
from ieee_tpu.data import ImageDataManager, VideoDataManager
from ieee_tpu.engine import build_engine
from ieee_tpu.models import apply_pretrained, build_model
from ieee_tpu.optim import build_lr_scheduler, build_optimizer
from ieee_tpu.utils import Logger, collect_env_info, set_random_seed


def main():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--config-file", type=str, default="",
                        help="path to config file")
    parser.add_argument("--root", type=str, default="", help="path to data root")
    parser.add_argument("--seed", type=int, default=1, help="random seed")
    parser.add_argument("--init-multihost", action="store_true",
                        help="multi-host pod run: initialize "
                             "jax.distributed before anything else (same "
                             "--seed on every process; train.batch_size is "
                             "the GLOBAL batch)")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="modify config options using the command-line")
    args = parser.parse_args()

    if args.init_multihost:
        from ieee_tpu.parallel import init_multihost

        pi, pc = init_multihost()
        print(f"multihost: process {pi}/{pc}, "
              f"{len(jax.devices())} global devices")

    cfg = get_default_config()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.root:
        cfg.data.root = args.root
    cfg.train.seed = args.seed
    if args.opts:
        cfg.merge_from_list(args.opts)

    set_random_seed(cfg.train.seed)

    log_name = "test.log" if cfg.test.evaluate else "train.log"
    log_name += time.strftime("-%Y-%m-%d-%H-%M-%S")
    sys.stdout = Logger(osp.join(cfg.data.save_dir, log_name))

    print(f"Show configuration\n{cfg.dump()}")
    print(f"Collecting env info ...\n** System info **\n{collect_env_info()}\n")

    # seed rides in the kwargs adapters (cfg.train.seed)
    if cfg.data.type == "video":
        datamanager = VideoDataManager(**videodata_kwargs(cfg))
    else:
        datamanager = ImageDataManager(**imagedata_kwargs(cfg))

    print(f"Building model: {cfg.model.name}")
    extra = {}
    if cfg.model.name == "ieee3modalPart":
        fused = cfg.tpu.fused_1x1
        n_dev = (int(np.prod(cfg.tpu.mesh_shape)) if cfg.tpu.mesh_shape
                 else len(jax.devices()))
        mk = cfg.tpu.block_megakernel
        if n_dev > 1 and cfg.tpu.sync_batchnorm:
            # Pallas stats epilogues are per-shard under pjit; global-batch
            # BN over a multi-device mesh keeps the plain XLA path
            if fused is None:
                fused = False
                print("fused_1x1: auto-disabled (multi-device "
                      "global-batch BN)")
            if mk is None:
                mk = False
        extra = dict(interaction=cfg.model.interaction,
                     attention=cfg.model.attention,
                     using_REM=cfg.model.using_REM,
                     fused_1x1=fused, block_megakernel=mk)
    model = build_model(
        name=cfg.model.name,
        num_classes=datamanager.num_train_pids,
        loss=cfg.loss.name,
        pretrained=cfg.model.pretrained,
        dtype=cfg.tpu.compute_dtype,
        **extra,
    )
    variables = model.init_variables(
        jax.random.PRNGKey(cfg.train.seed), batch=2,
        height=cfg.data.height, width=cfg.data.width,
    )
    if cfg.model.pretrained:
        variables = apply_pretrained(model, variables)
    if cfg.model.load_weights:
        lw = cfg.model.load_weights
        if cfg.model.name == "ieee3modalPart" and (
            lw.endswith((".pth", ".pth.tar")) or ".pth.tar-" in lw
        ):
            # reference-format torch checkpoint -> full conversion
            import torch

            from ieee_tpu.models.ieee_converter import (
                convert_ieee_torch_checkpoint,
            )

            ckpt = torch.load(lw, map_location="cpu", weights_only=False)
            sd = ckpt.get("state_dict", ckpt)
            p, s = convert_ieee_torch_checkpoint(sd)
            variables = {"params": p, "batch_stats": s}
            print(f'Converted reference torch checkpoint "{lw}"')
        else:
            from ieee_tpu.utils import load_pretrained_weights

            variables = load_pretrained_weights(variables, lw)

    optimizer = build_optimizer(params=variables["params"],
                                **optimizer_kwargs(cfg))
    scheduler = build_lr_scheduler(base_lr=cfg.train.lr,
                                   **lr_scheduler_kwargs(cfg))

    print(f"Building {cfg.loss.name}-engine for {cfg.data.type}-reid")
    engine = build_engine(cfg, datamanager, model, optimizer, scheduler,
                          variables)

    run_kwargs = engine_run_kwargs(cfg)
    if cfg.model.resume:
        run_kwargs["resume"] = cfg.model.resume
    engine.run(**run_kwargs)


if __name__ == "__main__":
    main()
