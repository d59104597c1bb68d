"""Worker process for the REAL multi-process multi-host test
(test_multihost.py::test_two_process_train_and_eval_parity).

Runs the product path end-to-end on the CPU backend: init_multihost ->
ImageDataManager (per-process sampler sharding) -> ImageSoftmaxEngine ->
jitted train steps over the global mesh (batch assembled with
jax.make_array_from_process_local_data) -> eval feature extraction.
Writes one JSON result per process. ``nproc 1`` runs the same protocol
single-process (the parity reference).

Usage: python multihost_worker.py <coord> <nproc> <rank> <out.json>
"""

from __future__ import annotations

import json
import sys


def main():
    coord, nproc, rank, out = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older jaxlib: gloo is the default when available

    if nproc > 1:
        from ieee_tpu.parallel import init_multihost

        pi, pc = init_multihost(coordinator_address=coord,
                                num_processes=nproc, process_id=rank)
        assert (pi, pc) == (rank, nproc), (pi, pc)

    import numpy as np

    from ieee_tpu.data import ImageDataManager
    from ieee_tpu.engine import ImageSoftmaxEngine
    from ieee_tpu.models import build_model
    from ieee_tpu.optim import build_optimizer
    from ieee_tpu.parallel import make_mesh

    # batch_size_train is the GLOBAL batch: the datamanager shards the
    # sampler per process (data/datamanager.py _maybe_shard_per_process)
    dm = ImageDataManager(
        sources="synthetic", height=32, width=16, batch_size_train=16,
        batch_size_test=16, workers=0,
        train_sampler="RandomIdentitySampler", num_instances=4,
        num_pids=8, imgs_per_pid=8, verbose=False, seed=0,
    )
    mesh = make_mesh([jax.device_count()], ("data",))
    # f32 compute: in bf16, the DIFFERENT collective decomposition of a
    # 2-process mesh (intra-host + cross-host stages) vs single-process
    # makes f32-noise-level differences cross bf16 rounding boundaries
    # (ulp ~0.4%), compounding to ~0.1% logits divergence — measured,
    # benign, but it would force a meaninglessly loose parity tolerance
    model = build_model("resnet18", num_classes=dm.num_train_pids,
                        loss="softmax", pretrained=False, dtype="float32")
    tx = build_optimizer(optim="sgd", lr=0.01, momentum=0.9)
    eng = ImageSoftmaxEngine(dm, model, optimizer=tx,
                             scheduler=lambda e: 0.01, mesh=mesh, seed=0)
    step = eng._build_train_step()

    def jnp_abs_sum(a):
        import jax.numpy as jnp

        return jax.jit(lambda x: jnp.abs(x.astype(jnp.float32)).sum(),
                       out_shardings=None)(a)

    losses, batch0 = [], None
    p_sum = float(sum(
        jnp_abs_sum(leaf)
        for leaf in jax.tree_util.tree_leaves(eng.state.params)))
    it = iter(dm.train_loader)
    for i in range(4):
        try:
            data = next(it)
        except StopIteration:
            # epoch wrap: the sampler re-shuffles deterministically (same
            # seed + same draw count in every process/run)
            it = iter(dm.train_loader)
            data = next(it)
        imgs, pids = eng._put_batch(data)
        assert imgs.shape[0] == 16, imgs.shape  # global batch reassembled
        if i == 0:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = jax.jit(lambda x: x, out_shardings=NamedSharding(
                mesh, PartitionSpec()))(pids)
            batch0 = {
                "pids": np.asarray(
                    rep.addressable_shards[0].data).tolist(),
                "img_sum": float(jnp_abs_sum(imgs))}
        eng.state, metrics = step(eng.state, imgs, pids,
                                  jax.random.PRNGKey(i), 0.01, None)
        losses.append(float(metrics["loss"]))

    # eval leg: replicated per process (test loaders stay unsharded)
    feats, pids_, camids = eng._feature_extraction(
        dm.test_loader["synthetic"]["query"])

    with open(out, "w") as f:
        json.dump({
            "rank": rank,
            "global_devices": jax.device_count(),
            "local_devices": jax.local_device_count(),
            "losses": losses,
            "batch0": batch0,
            "params_abssum": p_sum,
            "feat_shape": list(feats.shape),
            "feat_absmean": float(np.abs(feats).mean()),
            "eval_pids": np.asarray(pids_).tolist(),
        }, f)
    print(f"rank {rank}: OK losses={losses}")


if __name__ == "__main__":
    main()
