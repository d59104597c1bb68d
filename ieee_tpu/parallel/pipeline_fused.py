"""Single-program GPipe: the whole fill/drain schedule in ONE jitted
wavefront (round-4 VERDICT item 4).

The host-dispatched schedule in ``pipeline.py`` issues O(stages x
microbatches) jit calls per step — correct, overlapped by async dispatch,
but each dispatch costs ~2 ms through a remote tunnel. This module runs the
ENTIRE schedule as one XLA program, the TPU-native way (the scaling-book /
praxis recipe, re-derived for heterogeneous CNN stages):

* One SPMD program can't place *different* computations on *disjoint*
  submeshes (measured: jit raises ``Received incompatible devices`` for
  committed inputs on different submeshes). So stages are made homogeneous
  at the TYPE level: every stage's params/BN-stats are flattened into
  padded 1-D f32 buffers stacked over a leading ``pipe`` axis; activations
  cross boundaries as padded per-sample flat rows. Each pipe row holds
  max-stage-size buffers — param memory still scales with stages.
* ``jax.shard_map`` manual over ``pipe`` only (``data`` stays auto, so BN
  statistics reduce over the stage's global data axis exactly like the
  host schedule's per-stage jits = sync_batchnorm semantics).
* Inside, a ``lax.scan`` over T = M + S - 1 wavefront steps:
  ``lax.ppermute`` rotates activation buffers one stage forward, row 0
  injects microbatch t, ``lax.switch`` on ``axis_index('pipe')`` runs that
  row's stage (unflatten -> apply -> flatten), the last row computes the
  loss for microbatch t - (S-1). Bubble steps execute on zero buffers and
  are masked out of the loss/metrics/BN-stat chain.
* Gradients come from plain ``jax.value_and_grad`` THROUGH the scan: the
  transpose of ``ppermute`` is the reverse rotation, so autodiff emits the
  backward wavefront automatically; ``jax.checkpoint`` around each stage
  branch gives GPipe rematerialization (activation memory = stage
  boundaries only, saved by the scan).
* The stacked (S, maxP) buffers are assembled from the per-stage trees
  with ``jax.make_array_from_single_device_arrays`` — a zero-copy
  metadata operation (the per-row shards are already on the right
  devices), and split back the same way for the per-stage optimizer jits.

Microbatch semantics are EXACTLY the host schedule's (= accum_steps): BN
stats chain per stage in microbatch order, gradients average over
microbatches, one optimizer step. Parity-tested against both in
tests/test_pipeline.py. Dispatches per step: 1 transform + 2S flatten +
1 fused fwd+bwd + S update = 3S + 2, independent of M (host schedule:
~(3 M + 1) S).

Reference: no analog (the reference's one strategy is nn.DataParallel,
scripts/mainMultiModal.py:219-220); opt-in via ``cfg.tpu.pipeline_fused``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["FusedPipelineTrainStep"]


def _vary(x):
    """Mark an array as varying over the manual 'pipe' axis (no-op when it
    already is — pcast rejects varying->varying)."""
    vma = getattr(jax.typeof(x), "vma", frozenset())
    if "pipe" in vma:
        return x
    return jax.lax.pcast(x, ("pipe",), to="varying")


class _FlatSpec:
    """Flatten/unflatten a pytree to one 1-D f32 buffer (order = jax's
    deterministic tree_flatten; works from arrays or ShapeDtypeStructs)."""

    def __init__(self, tree):
        leaves, self.treedef = jax.tree_util.tree_flatten(tree)
        self.shapes = [tuple(x.shape) for x in leaves]
        self.dtypes = [x.dtype for x in leaves]
        self.sizes = [int(np.prod(s)) if s else 1 for s in self.shapes]
        self.size = int(sum(self.sizes))

    def flatten(self, tree, pad_to: int = 0):
        leaves = jax.tree_util.tree_leaves(tree)
        parts = [jnp.ravel(x).astype(jnp.float32) for x in leaves]
        buf = (jnp.concatenate(parts) if parts
               else jnp.zeros((0,), jnp.float32))
        if pad_to > self.size:
            buf = jnp.pad(buf, (0, pad_to - self.size))
        return buf

    def unflatten(self, buf):
        out, off = [], 0
        for shape, dt, n in zip(self.shapes, self.dtypes, self.sizes):
            out.append(buf[off:off + n].reshape(shape).astype(dt))
            off += n
        return jax.tree_util.tree_unflatten(self.treedef, out)


class _BatchFlatSpec:
    """Per-sample flatten: (mb, ...) leaves -> one (mb, A) f32 buffer."""

    def __init__(self, tree):
        leaves, self.treedef = jax.tree_util.tree_flatten(tree)
        self.shapes = [tuple(x.shape) for x in leaves]
        self.dtypes = [x.dtype for x in leaves]
        mbs = {s[0] for s in self.shapes}
        assert len(mbs) == 1, f"mixed leading batch dims {mbs}"
        self.mb = mbs.pop()
        self.sizes = [int(np.prod(s[1:])) if len(s) > 1 else 1
                      for s in self.shapes]
        self.size = int(sum(self.sizes))  # per-sample columns

    def flatten(self, tree, pad_to: int = 0):
        leaves = jax.tree_util.tree_leaves(tree)
        parts = [x.reshape(x.shape[0], -1).astype(jnp.float32)
                 for x in leaves]
        buf = (jnp.concatenate(parts, axis=1) if parts
               else jnp.zeros((self.mb, 0), jnp.float32))
        if pad_to > self.size:
            buf = jnp.pad(buf, ((0, 0), (0, pad_to - self.size)))
        return buf

    def unflatten(self, buf):
        out, off = [], 0
        for shape, dt, n in zip(self.shapes, self.dtypes, self.sizes):
            out.append(buf[:, off:off + n].reshape(shape).astype(dt))
            off += n
        return jax.tree_util.tree_unflatten(self.treedef, out)


class FusedPipelineTrainStep:
    """Drop-in replacement for ``PipelineTrainStep`` with the engine step
    signature; consumes/produces the same per-stage-placed TrainState."""

    def __init__(self, engine):
        self.engine = engine
        self.plan = engine._pp_plan
        self.n_micro = int(engine.pipeline_microbatches)
        self._jit_opts = dict(
            compiler_options=(engine.compiler_options or None))
        self._transform_jit = None
        self._built_mb = None   # specs/jits are built per microbatch size
        self._mb_sizes_seen = set()

    # --- build (per microbatch size) -----------------------------------
    def _build(self, state, imgs_t, mb: int):
        from .pipeline import PipelineTrainStep

        PipelineTrainStep._warn_new_mb(self, mb)

        eng, plan = self.engine, self.plan
        S, M = plan.n_stages, self.n_micro
        self.S, self.M, self.mb = S, M, mb

        # per-stage param/stat specs (from the live tree structure)
        self.pspecs = [_FlatSpec(plan.filter_tree(state.params, i))
                       for i in range(S)]
        self.sspecs = [_FlatSpec(plan.filter_tree(state.batch_stats, i))
                       for i in range(S)]
        self.maxP = max(sp.size for sp in self.pspecs)
        self.maxB = max(1, max(sp.size for sp in self.sspecs))

        # boundary specs: trace each stage's output shape with eval_shape
        one_mb = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct((mb,) + a.shape[1:], a.dtype),
            imgs_t)
        self.bspecs = [_BatchFlatSpec(one_mb)]
        cur = one_mb
        p_structs = [jax.eval_shape(lambda t: t,
                                    plan.filter_tree(state.params, i))
                     for i in range(S)]
        s_structs = [jax.eval_shape(lambda t: t,
                                    plan.filter_tree(state.batch_stats, i))
                     for i in range(S)]
        for i in range(S - 1):
            y, _ = jax.eval_shape(
                lambda p, s, x, i=i: plan.apply_stage(
                    {"params": p, "batch_stats": s}, x, i),
                p_structs[i], s_structs[i], cur)
            self.bspecs.append(_BatchFlatSpec(y))
            cur = y
        self.maxA = max(sp.size for sp in self.bspecs)

        # metric keys from the last stage's loss (fixed order)
        out_last, _ = jax.eval_shape(
            lambda p, s, x: plan.apply_stage(
                {"params": p, "batch_stats": s}, x, S - 1),
            p_structs[S - 1], s_structs[S - 1], cur)
        pids_struct = jax.ShapeDtypeStruct((mb,), jnp.int32)
        hp0 = eng.loss_hparams(0)
        hp0 = None if hp0 is None else {k: 0.0 for k in hp0}
        _, metrics_struct = jax.eval_shape(
            lambda o, pd: eng.compute_loss(o, pd, hp0), out_last,
            pids_struct)
        self.metric_keys = sorted(metrics_struct)
        self._hp_keys = hp0

        self._fused = self._build_fused()
        b = mb * M
        img_spec = self.bspecs[0]
        self._flat_imgs = jax.jit(
            lambda t, sp=img_spec, b=b, M=M, mb=mb, A=self.maxA:
            sp.flatten(t, pad_to=A).reshape(M, mb, A))
        self._flat_p = [
            jax.jit(lambda t, sp=self.pspecs[i]:
                    sp.flatten(t, self.maxP).reshape(1, -1))
            for i in range(S)]
        self._flat_s = [
            jax.jit(lambda t, sp=self.sspecs[i]:
                    sp.flatten(t, self.maxB).reshape(1, -1))
            for i in range(S)]
        self._update = [self._build_update(i) for i in range(S)]
        self._built_mb = mb

    def _build_fused(self):
        eng, plan = self.engine, self.plan
        S, M, mb = self.S, self.M, self.mb
        T = M + S - 1
        maxA, maxB = self.maxA, self.maxB
        K = len(self.metric_keys)
        mesh = plan.mesh

        def make_branch(i):
            pspec, sspec = self.pspecs[i], self.sspecs[i]
            in_spec = self.bspecs[i]
            out_spec = self.bspecs[i + 1] if i < S - 1 else None

            def branch(pbuf, sbuf, act, m, pids_all, hp):
                params = pspec.unflatten(pbuf)
                stats = sspec.unflatten(sbuf)
                x = in_spec.unflatten(act[:, :in_spec.size])
                y, upd = plan.apply_stage(
                    {"params": params, "batch_stats": stats}, x, i)
                if i < S - 1:
                    act_out = out_spec.flatten(y, pad_to=maxA)
                    loss = jnp.float32(0.0)
                    met = jnp.zeros((K,), jnp.float32)
                else:
                    pids_mb = jax.lax.dynamic_index_in_dim(
                        pids_all, jnp.clip(m, 0, M - 1), 0, keepdims=False)
                    loss, mdict = eng.compute_loss(y, pids_mb, hp)
                    met = jnp.stack([
                        jnp.asarray(mdict[k], jnp.float32)
                        for k in self.metric_keys])
                    act_out = jnp.zeros((mb, maxA), jnp.float32)
                new_sbuf = sspec.flatten(
                    upd.get("batch_stats", {}), pad_to=maxB)
                # uniform VMA across branches (constants are unvarying)
                return jax.tree_util.tree_map(
                    _vary, (act_out, new_sbuf,
                            jnp.asarray(loss, jnp.float32), met))

            return jax.checkpoint(branch)  # GPipe remat

        branches = [make_branch(i) for i in range(S)]

        def body(p_row, s_row, imgs_flat, pids_all, hp):
            i = jax.lax.axis_index("pipe")
            pbuf = p_row[0]

            def step(carry, t):
                act, sbuf, loss_sum, met_sum = carry
                act_in = jax.lax.ppermute(
                    act, "pipe", [(k, k + 1) for k in range(S - 1)])
                m = t - i
                valid = (m >= 0) & (m < M)
                x_t = jax.lax.dynamic_index_in_dim(
                    imgs_flat, jnp.clip(t, 0, M - 1), 0, keepdims=False)
                act_in = jnp.where((i == 0) & (t < M), x_t, act_in)
                act_out, sbuf_new, loss, met = jax.lax.switch(
                    i, branches, pbuf, sbuf, act_in, m, pids_all, hp)
                sbuf = jnp.where(valid, sbuf_new, sbuf)
                loss_sum = loss_sum + jnp.where(valid, loss, 0.0)
                met_sum = met_sum + jnp.where(valid, met, 0.0)
                return (act_out, sbuf, loss_sum, met_sum), None

            carry0 = jax.tree_util.tree_map(_vary, (
                jnp.zeros((mb, maxA), jnp.float32),
                s_row[0],
                jnp.float32(0.0),
                jnp.zeros((K,), jnp.float32),
            ))
            (act, sbuf, loss_sum, met_sum), _ = jax.lax.scan(
                step, carry0, jnp.arange(T))
            return loss_sum[None], met_sum[None], sbuf[None]

        sm = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("pipe"), P("pipe"), P(None), P(None), P()),
            out_specs=(P("pipe"), P("pipe"), P("pipe")),
            axis_names={"pipe"})

        def fused(pstack, sstack, imgs_flat, pids_all, hp):
            loss_rows, met_rows, sbuf_rows = sm(
                pstack, sstack, imgs_flat, pids_all, hp)
            # rows != last contribute 0; grads flow into EVERY stage's
            # params through the ppermute chain
            total = jnp.sum(loss_rows) / M
            return total, (met_rows[S - 1] / M, sbuf_rows)

        return jax.jit(jax.value_and_grad(fused, has_aux=True),
                       **self._jit_opts)

    def _build_update(self, i: int):
        eng = self.engine
        tx = eng.optimizer
        pspec, sspec = self.pspecs[i], self.sspecs[i]

        def update(gbuf, sbuf, p, os_, lr, mask_, old_stats, stats_mask_):
            from ..engine.engine import _apply_optimizer

            # the fused loss is already the microbatch MEAN -> gbuf is the
            # averaged gradient (no /n_micro here, unlike the host gsum)
            grads = pspec.unflatten(gbuf[0])
            new_stats = sspec.unflatten(sbuf[0])
            return _apply_optimizer(tx, p, grads, os_, lr, mask_,
                                    old_stats, new_stats, stats_mask_)

        return jax.jit(update, **self._jit_opts)

    # --- zero-copy stack/split across submeshes -------------------------
    def _stack(self, bufs):
        """Per-stage (1, L) replicated submesh buffers -> one (S, L)
        P('pipe') array. Metadata-only (shards already on-device)."""
        L = bufs[0].shape[1]
        sh = NamedSharding(self.plan.mesh, P("pipe"))
        arrays = [s.data for b in bufs for s in b.addressable_shards]
        return jax.make_array_from_single_device_arrays(
            (self.S, L), sh, arrays)

    def _split(self, stacked):
        """(S, L) P('pipe') array -> per-stage (1, L) submesh-replicated
        views (zero-copy)."""
        outs = []
        by_dev = {s.device: s.data for s in stacked.addressable_shards}
        for i in range(self.S):
            sub = self.plan.submeshes[i]
            shards = [by_dev[d] for d in sub.devices.flat]
            outs.append(jax.make_array_from_single_device_arrays(
                (1, stacked.shape[1]),
                NamedSharding(sub, P()), shards))
        return outs

    # --- the step -------------------------------------------------------
    def __call__(self, state, imgs, pids, key, lr, mask, stats_mask=None,
                 hp=None, bn_eval=None):
        if bn_eval is not None:
            raise NotImplementedError(
                "fixbase_bn_eval is not supported under tpu.pipeline_parallel"
                " — set train.fixbase_bn_freeze instead")
        from .pipeline import PipelineTrainStep

        eng, plan = self.engine, self.plan
        S = plan.n_stages
        M = self.n_micro
        k_tfm = getattr(eng.datamanager, "k_tfm", 1)

        if self._transform_jit is None:
            self._transform_jit = PipelineTrainStep._get_transform(self)
        imgs_t = self._transform_jit(key, imgs)
        b = (imgs_t[0] if isinstance(imgs_t, tuple) else imgs_t).shape[0]
        if b % M:
            raise ValueError(
                f"train batch {b} (incl. k_tfm draws) is not divisible by "
                f"pipeline_microbatches={M}")
        mb = b // M
        if self._built_mb != mb:
            self._build(state, imgs_t, mb)

        # (M, mb, maxA) flat microbatch images, lifted from stage-0's
        # submesh (where _put_batch landed them) onto the FULL mesh: the
        # one-program schedule spans every pipe row (row 0 reads them; the
        # pipe-replication is the price of SPMD homogeneity)
        imgs_flat = jax.device_put(
            self._flat_imgs(imgs_t),
            NamedSharding(plan.mesh, P(None, "data", None)))
        if k_tfm > 1:
            pids = jnp.repeat(pids, k_tfm)
        pids_all = jax.device_put(
            jnp.asarray(pids).reshape(M, mb),
            NamedSharding(plan.mesh, P()))

        p_trees = [plan.filter_tree(state.params, i) for i in range(S)]
        s_trees = [plan.filter_tree(state.batch_stats, i) for i in range(S)]
        pstack = self._stack([self._flat_p[i](p_trees[i]) for i in range(S)])
        sstack = self._stack([self._flat_s[i](s_trees[i]) for i in range(S)])

        (loss, (met_vec, sbuf_rows)), gstack = self._fused(
            pstack, sstack, imgs_flat, pids_all, hp)

        g_bufs = self._split(gstack)
        s_bufs = self._split(sbuf_rows)

        new_p, new_os, new_s = [], [], []
        for i in range(S):
            mask_i = None if mask is None else plan.filter_tree(mask, i)
            smask_i = (None if stats_mask is None
                       else plan.filter_tree(stats_mask, i))
            np_i, nos_i, ns_i = self._update[i](
                g_bufs[i], s_bufs[i], p_trees[i], state.opt_state[i],
                lr, mask_i, s_trees[i], smask_i)
            new_p.append(np_i)
            new_os.append(nos_i)
            new_s.append(ns_i)

        from ..engine.engine import TrainState

        metrics = {k: met_vec[j] for j, k in enumerate(self.metric_keys)}
        metrics["loss"] = loss
        new_state = TrainState(
            params=plan.merge_trees(new_p),
            batch_stats=plan.merge_trees(new_s),
            opt_state=tuple(new_os),
            step=state.step + 1,
        )
        return new_state, metrics
