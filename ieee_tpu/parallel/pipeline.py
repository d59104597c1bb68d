"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (its one strategy is
``nn.DataParallel``, ``scripts/mainMultiModal.py:219-220``); this is
TPU-native extra capability alongside tensor/spatial parallelism: the model
splits into S contiguous stages, each stage's parameters and optimizer
moments live ONLY on its own slice of the device mesh, and microbatches
flow through the stages with activations crossing stage boundaries over
ICI. Within each stage slice the batch additionally shards over the
``data`` axis (pp x dp).

Design (TPU/JAX-first, not a port of any torch pipeline):
 - The model exposes a ``pp_units`` argument (models/resnet.py,
   models/ieee3modal.py): 5 logical units — stem+layer1, layer2, layer3,
   layer4, head — grouped contiguously into S stages. Module names are
   explicit, so a stage's parameters are exactly a path-filtered subtree of
   the full tree; stage placement is pure dict filtering (no copies once
   leaves are placed).
 - One jitted forward per non-final stage, one jitted loss+grad for the
   final stage, one jitted (rematerializing) backward per non-final stage,
   one jitted optimizer update per stage. The host dispatches the GPipe
   fill/drain schedule; JAX's async dispatch + dataflow dependencies give
   the cross-stage overlap, and inter-stage ``device_put`` rides ICI.
 - Microbatch semantics are EXACTLY ``cfg.train.accum_steps=M`` (engine
   ``_accum_grads``): BN batch statistics chain through the microbatches in
   order within each stage, gradients average over microbatches, and the
   optimizer steps once — parity-tested against the accumulation path in
   tests/test_pipeline.py.
 - The backward rematerializes its stage's forward from the saved stage
   input and the saved BN-stat carry (GPipe rematerialization): activation
   memory per device is one stage's, not the model's.

Out of scope (validated in the engine): combining with tensor/spatial
parallelism, per-replica BN (``sync_batchnorm=False``), multi-host, and the
fixbase ``bn_eval`` interceptor.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["PipelinePlan", "PipelineTrainStep"]

_LAYER_RE = re.compile(r"^layer(\d+)_\d+$")
_N_UNITS = 5  # stem+layer1, layer2, layer3, layer4, head
_HEAD = 4


def _trunk_unit(key: str):
    """Unit index of a trunk-internal module name, or None if unknown."""
    if key == "stem":
        return 0
    m = _LAYER_RE.match(key)
    if m:
        return int(m.group(1)) - 1
    return None


class PipelinePlan:
    """Static description of the stage split: which param paths belong to
    which stage, the per-stage sub-meshes, and the per-stage apply fns."""

    def __init__(self, module, n_stages: int, mesh: Mesh):
        from ..models.ieee3modal import IEEE3modalPart
        from ..models.resnet import ReIDResNet

        if isinstance(module, IEEE3modalPart):
            self._trunk_tops = ("backbone_R", "backbone_N", "backbone_T")
        elif isinstance(module, ReIDResNet):
            self._trunk_tops = ("trunk",)
        else:
            raise ValueError(
                "tpu.pipeline_parallel supports ieee3modalPart and the "
                f"ResNet family, got {type(module).__name__}"
            )
        if not (2 <= n_stages <= _N_UNITS):
            raise ValueError(
                f"pipeline_parallel must be in [2, {_N_UNITS}] (got "
                f"{n_stages}): 5 logical units — stem+layer1, layer2, "
                "layer3, layer4, head")
        if mesh.axis_names[0] != "pipe" or mesh.shape["pipe"] != n_stages:
            raise ValueError(
                "pipeline_parallel needs a mesh whose FIRST axis is 'pipe' "
                f"with size {n_stages}, got axes {dict(mesh.shape)}"
            )
        self.module = module
        self.n_stages = n_stages
        self.mesh = mesh
        # contiguous unit groups, e.g. S=2 -> [(0,1,2), (3,4)]
        self.groups = [
            tuple(int(u) for u in part)
            for part in np.array_split(np.arange(_N_UNITS), n_stages)
        ]
        self._stage_of_unit = {
            u: i for i, grp in enumerate(self.groups) for u in grp
        }
        # one sub-mesh per stage: row i of the (pipe, ...) device array,
        # flattened onto a 'data' axis (pp x dp when the mesh is 2-D)
        self.submeshes = [
            Mesh(np.asarray(mesh.devices[i]).reshape(-1), ("data",))
            for i in range(n_stages)
        ]

    # --- tree filtering ------------------------------------------------
    def _unit_of(self, path):
        """Unit id for a module path, or None if undecidable yet (need to
        descend into a trunk top-level)."""
        top = path[0]
        if top in self._trunk_tops:
            if len(path) < 2:
                return None
            u = _trunk_unit(path[1])
            return _HEAD if u is None else u
        return _HEAD

    def stage_of(self, path) -> int:
        u = self._unit_of(tuple(path))
        if u is None:
            raise ValueError(f"cannot assign a stage to path {path}")
        return self._stage_of_unit[u]

    def filter_tree(self, tree, stage: int):
        """Subtree of ``tree`` (module-path-structured nested dict) owned by
        ``stage``. Leaves are the SAME arrays (no copies)."""

        def rec(node, path):
            u = self._unit_of(path) if path else None
            if path and u is not None:
                return node if self._stage_of_unit[u] == stage else None
            out = {}
            for k, v in node.items():
                r = rec(v, path + (k,))
                if r is not None:
                    out[k] = r
            return out if out else None

        got = rec(tree, ())
        return got if got is not None else {}

    def merge_trees(self, parts: Sequence[dict]):
        """Union of disjoint per-stage subtrees back into one full tree."""

        def rec(nodes):
            out = {}
            for node in nodes:
                for k, v in node.items():
                    if k in out:
                        if not isinstance(v, dict):
                            raise ValueError(f"overlapping leaf {k!r} in merge")
                        out[k] = rec([out[k], v])
                    else:
                        out[k] = v
            return out

        return rec([p for p in parts if p])

    # --- placement ------------------------------------------------------
    def stage_replicated(self, stage: int) -> NamedSharding:
        return NamedSharding(self.submeshes[stage], P())

    def stage_batch(self, stage: int) -> NamedSharding:
        return NamedSharding(self.submeshes[stage], P("data"))

    def place_tree(self, tree):
        """device_put a full module-path tree leaf-wise onto each leaf's
        owning stage slice (replicated within the slice)."""
        parts = []
        for i in range(self.n_stages):
            sub = self.filter_tree(tree, i)
            sub = jax.tree_util.tree_map(
                lambda x, s=self.stage_replicated(i): jax.device_put(x, s), sub
            )
            parts.append(sub)
        return self.merge_trees(parts)

    def apply_stage(self, variables, x, stage: int, train: bool = True,
                    mutable=("batch_stats",)):
        """Run stage ``stage``'s unit group. ``variables`` holds only the
        stage's param/stat subtrees (flax binds lazily)."""
        return self.module.apply(
            variables, x, train=train, pp_units=self.groups[stage],
            mutable=list(mutable),
        )


class PipelineTrainStep:
    """Host-scheduled GPipe train step with the engine step signature:
    ``step(state, imgs, pids, key, lr, mask, stats_mask, hp, bn_eval)``.

    Per-stage jits are built lazily and cached; the schedule is
    forward-fill (stage-major, microbatch-chained BN stats) then
    backward-drain with rematerialization. Gradients accumulate inside the
    jits (donated running sums), average over microbatches, and each
    stage's optimizer update runs on that stage's devices only
    (``state.opt_state`` is a per-stage tuple — optimizer moments are
    pipeline-sharded)."""

    def __init__(self, engine):
        self.engine = engine
        self.plan: PipelinePlan = engine._pp_plan
        self.n_micro = int(engine.pipeline_microbatches)
        # the measured cfg.tpu.compiler_options win applies to every stage
        # jit, same as Engine._build_train_step
        self._jit_opts = dict(
            compiler_options=(engine.compiler_options or None))
        self._transform_jit = None
        self._fwd = {}      # (stage, mb) -> jit
        self._bwd = {}      # (stage, mb) -> jit
        self._last = {}     # mb -> final-stage loss+grad jit
        self._update = {}   # stage -> jit

    # --- jit builders ---------------------------------------------------
    def _get_transform(self):
        if self._transform_jit is None:
            eng = self.engine
            k_tfm = getattr(eng.datamanager, "k_tfm", 1)

            def transform(key, imgs):
                imgs = eng._transform_train(key, imgs)
                if k_tfm > 1:
                    if isinstance(imgs, tuple):
                        imgs = tuple(eng._fold_k_tfm(m) for m in imgs)
                    else:
                        imgs = eng._fold_k_tfm(imgs)
                return imgs

            self._transform_jit = jax.jit(transform)
        return self._transform_jit

    @staticmethod
    def _slice_mb(x, m, mb):
        return jax.lax.dynamic_slice_in_dim(x, m * mb, mb, 0)

    def _stage_in(self, x, m, mb, stage):
        """Stage input for microbatch m: stage 0 slices the full transformed
        batch; later stages receive per-microbatch activations."""
        if stage == 0:
            sl = lambda a: self._slice_mb(a, m, mb)
            return (jax.tree_util.tree_map(sl, x)
                    if isinstance(x, tuple) else sl(x))
        return x

    def _warn_new_mb(self, mb: int):
        """The (stage, mb) jit caches recompile ALL stage programs per new
        microbatch size — minutes each through a remote-compile tunnel. A
        ragged tail batch silently doubling the compile set is the classic
        cause; make it visible (use drop_last / a fixed train batch)."""
        seen = getattr(self, "_mb_sizes_seen", set())
        if mb not in seen and seen:
            import warnings

            warnings.warn(
                f"pipeline_parallel: new microbatch size {mb} after "
                f"{sorted(seen)} — every stage program recompiles for it. "
                "Fix the train batch size (drop_last) to avoid this.",
                stacklevel=3)
        seen.add(mb)
        self._mb_sizes_seen = seen

    def _get_fwd(self, stage: int, mb: int):
        if (stage, mb) not in self._fwd:
            self._warn_new_mb(mb)
            plan = self.plan

            def fwd(p, s, x, m):
                xin = self._stage_in(x, m, mb, stage)
                y, upd = plan.apply_stage(
                    {"params": p, "batch_stats": s}, xin, stage)
                return y, upd.get("batch_stats", {})

            self._fwd[(stage, mb)] = jax.jit(fwd, **self._jit_opts)
        return self._fwd[(stage, mb)]

    def _get_bwd(self, stage: int, mb: int):
        """Rematerializing backward: recompute the stage forward from the
        saved (stats, input) pair, then pull (d_params, d_input) back
        through it. ``gsum`` is the donated running gradient sum."""
        if (stage, mb) not in self._bwd:
            plan = self.plan
            # stage 0's input is the raw image batch — no upstream stage
            # wants d_input, so don't spend the MXU computing it
            want_dx = stage > 0

            def bwd(p, s, x, m, dy, gsum):
                def f(*args):
                    pp = args[0]
                    xx = args[1] if want_dx else x
                    xin = self._stage_in(xx, m, mb, stage)
                    y, _ = plan.apply_stage(
                        {"params": pp, "batch_stats": s}, xin, stage)
                    return y

                if want_dx:
                    _, vjp = jax.vjp(f, p, x)
                    dp, dx = vjp(dy)
                else:
                    _, vjp = jax.vjp(f, p)
                    (dp,), dx = vjp(dy), None
                gsum = jax.tree_util.tree_map(jnp.add, gsum, dp)
                return gsum, dx

            self._bwd[(stage, mb)] = jax.jit(
                bwd, donate_argnums=(5,), **self._jit_opts)
        return self._bwd[(stage, mb)]

    def _get_last(self, mb: int):
        if mb not in self._last:
            eng = self.engine
            plan = self.plan
            last = plan.n_stages - 1
            k_tfm = getattr(eng.datamanager, "k_tfm", 1)

            def f(p, x, s, pids_mb, hp):
                out, upd = plan.apply_stage(
                    {"params": p, "batch_stats": s}, x, last)
                loss, metrics = eng.compute_loss(out, pids_mb, hp)
                return loss, (metrics, upd.get("batch_stats", {}))

            def last_step(p, s, x, pids, m, hp, gsum):
                if k_tfm > 1:
                    pids = jnp.repeat(pids, k_tfm)
                pids_mb = self._slice_mb(pids, m, mb)
                (loss, (metrics, new_s)), (dp, dx) = jax.value_and_grad(
                    f, argnums=(0, 1), has_aux=True
                )(p, x, s, pids_mb, hp)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, dp)
                return loss, metrics, new_s, gsum, dx

            self._last[mb] = jax.jit(
                last_step, donate_argnums=(6,), **self._jit_opts)
        return self._last[mb]

    def _get_update(self, stage: int):
        if stage not in self._update:
            eng = self.engine
            tx = eng.optimizer
            n_micro = self.n_micro

            def update(p, gsum, os_, lr, mask_, old_stats, new_stats,
                       stats_mask_):
                # shared optimizer tail — one implementation with the
                # engine step (lr inject, apply, fixbase/stats-mask blends)
                from ..engine.engine import _apply_optimizer

                grads = jax.tree_util.tree_map(lambda g: g / n_micro, gsum)
                return _apply_optimizer(tx, p, grads, os_, lr, mask_,
                                        old_stats, new_stats, stats_mask_)

            self._update[stage] = jax.jit(update, **self._jit_opts)
        return self._update[stage]

    # --- the step ---------------------------------------------------------
    def __call__(self, state, imgs, pids, key, lr, mask, stats_mask=None,
                 hp=None, bn_eval=None):
        if bn_eval is not None:
            raise NotImplementedError(
                "fixbase_bn_eval is not supported under tpu.pipeline_parallel"
                " — set train.fixbase_bn_freeze instead (stats pinning works;"
                " only the frozen-BN .eval() forward interceptor doesn't)")
        plan = self.plan
        S = plan.n_stages
        M = self.n_micro
        eng = self.engine
        k_tfm = getattr(eng.datamanager, "k_tfm", 1)

        imgs_t = self._get_transform()(key, imgs)
        b = (imgs_t[0] if isinstance(imgs_t, tuple) else imgs_t).shape[0]
        if b % M:
            raise ValueError(
                f"train batch {b} (incl. k_tfm draws) is not divisible by "
                f"pipeline_microbatches={M}")
        mb = b // M

        p = [plan.filter_tree(state.params, i) for i in range(S)]
        s = [plan.filter_tree(state.batch_stats, i) for i in range(S)]
        os_ = list(state.opt_state)
        mask_i = [None if mask is None else plan.filter_tree(mask, i)
                  for i in range(S)]
        smask_i = [None if stats_mask is None
                   else plan.filter_tree(stats_mask, i) for i in range(S)]

        gsum = [jax.tree_util.tree_map(jnp.zeros_like, p[i]) for i in range(S)]
        # saved per-microbatch (stage input, BN-stat carry) for remat backward
        xin = [[None] * M for _ in range(S)]
        sin = [[None] * M for _ in range(S)]
        # microbatch index: an UNCOMMITTED host scalar (follows each stage's
        # devices) traced as an argument, so one compiled program serves all
        # M microbatches
        m_idx = [np.int32(m) for m in range(M)]

        # ---- forward fill (stage-major; per-stage BN stats chain in m) ----
        acts = [imgs_t] * M  # stage-0 "input" is the full batch + an m index
        losses, metrics_list = [], []
        for i in range(S - 1):
            fwd = self._get_fwd(i, mb)
            nxt = []
            for m in range(M):
                xin[i][m], sin[i][m] = acts[m], s[i]
                y, s[i] = fwd(p[i], s[i], acts[m], m_idx[m])
                nxt.append(jax.tree_util.tree_map(
                    lambda a, sh=plan.stage_batch(i + 1): jax.device_put(a, sh),
                    y))
            acts = nxt

        # ---- final stage: loss + grads per microbatch ----
        last = self._get_last(mb)
        dys = [None] * M
        i = S - 1
        for m in range(M):
            loss_m, metrics_m, s[i], gsum[i], dx = last(
                p[i], s[i], acts[m], pids, m_idx[m], hp, gsum[i])
            losses.append(loss_m)
            metrics_list.append(metrics_m)
            dys[m] = dx

        # ---- backward drain (rematerialized) ----
        for i in range(S - 2, -1, -1):
            bwd = self._get_bwd(i, mb)
            for m in range(M):
                dy = jax.tree_util.tree_map(
                    lambda a, sh=plan.stage_batch(i): jax.device_put(a, sh),
                    dys[m])
                gsum[i], dx = bwd(p[i], sin[i][m], xin[i][m], m_idx[m], dy,
                                  gsum[i])
                dys[m] = dx if i > 0 else None

        # ---- per-stage optimizer updates ----
        new_p, new_os, new_s = [], [], []
        for i in range(S):
            np_i, nos_i, ns_i = self._get_update(i)(
                p[i], gsum[i], os_[i], lr, mask_i[i],
                plan.filter_tree(state.batch_stats, i), s[i], smask_i[i])
            new_p.append(np_i)
            new_os.append(nos_i)
            new_s.append(ns_i)

        from ..engine.engine import TrainState

        metrics = jax.tree_util.tree_map(
            lambda *xs: jnp.mean(jnp.stack(xs)), *metrics_list)
        metrics = dict(metrics)
        metrics["loss"] = jnp.mean(jnp.stack(losses))
        new_state = TrainState(
            params=plan.merge_trees(new_p),
            batch_stats=plan.merge_trees(new_s),
            opt_state=tuple(new_os),
            step=state.step + 1,
        )
        return new_state, metrics
