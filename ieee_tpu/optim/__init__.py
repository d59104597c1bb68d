"""Optimizers and LR schedulers on optax.

Reference analog: ``torchreid/optim/optimizer.py:11-157`` (adam / amsgrad /
sgd / rmsprop / radam with optional staged_lr) and ``lr_scheduler.py:7-68``
(single_step / multi_step / cosine, stepped per epoch).

Torch-semantic notes:
 - weight_decay is L2-into-gradient (torch SGD/Adam style), i.e.
   ``add_decayed_weights`` BEFORE the moment transforms — not AdamW —
   except radam, whose vendored reference applies decoupled step-gated
   decay (see ``optim/radam.py``).
 - the scheduler steps per EPOCH; we expose ``lr(epoch)`` and inject it as an
   optax hyperparam the engine updates at each epoch boundary, so the whole
   train step stays one compiled program (lr is a traced scalar, not a
   recompile trigger).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import optax

AVAI_OPTIMS = ["adam", "amsgrad", "sgd", "rmsprop", "radam"]
AVAI_SCH = ["single_step", "multi_step", "cosine"]

__all__ = ["build_optimizer", "build_lr_scheduler", "AVAI_OPTIMS", "AVAI_SCH"]


def _base_tx(optim, learning_rate, weight_decay, momentum, sgd_dampening,
             sgd_nesterov, rmsprop_alpha, adam_beta1, adam_beta2):
    parts = []
    if weight_decay and weight_decay > 0 and optim != "radam":
        # torch L2-into-grad semantics; radam handles decay itself
        # (decoupled + step-gated, see optim/radam.py)
        parts.append(optax.add_decayed_weights(weight_decay))
    if optim == "sgd":
        if momentum and momentum > 0:
            if sgd_dampening:
                # optax.trace has no dampening knob and pre/post-scaling is
                # not equivalent; the reference default is dampening=0
                raise NotImplementedError("sgd dampening != 0 not supported")
            parts.append(optax.trace(decay=momentum, nesterov=sgd_nesterov))
    elif optim == "adam":
        parts.append(optax.scale_by_adam(b1=adam_beta1, b2=adam_beta2, eps=1e-8))
    elif optim == "amsgrad":
        parts.append(optax.scale_by_amsgrad(b1=adam_beta1, b2=adam_beta2,
                                            eps=1e-8))
    elif optim == "rmsprop":
        parts.append(optax.scale_by_rms(decay=rmsprop_alpha, eps=1e-8))
        if momentum and momentum > 0:
            parts.append(optax.trace(decay=momentum))
    elif optim == "radam":
        from .radam import scale_by_ref_radam

        parts.append(scale_by_ref_radam(
            b1=adam_beta1, b2=adam_beta2, eps=1e-8,
            weight_decay=weight_decay or 0.0))
    else:
        raise ValueError(f"Unsupported optimizer: {optim} (one of {AVAI_OPTIMS})")
    parts.append(optax.scale(-learning_rate))
    return optax.chain(*parts)


def build_optimizer(
    params=None,
    optim: str = "adam",
    lr: float = 0.0003,
    weight_decay: float = 5e-4,
    momentum: float = 0.9,
    sgd_dampening: float = 0.0,
    sgd_nesterov: bool = False,
    rmsprop_alpha: float = 0.99,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    staged_lr: bool = False,
    new_layers: Sequence[str] = ("classifier",),
    base_lr_mult: float = 0.1,
    **kwargs,
) -> optax.GradientTransformation:
    """Build an optax transformation with an injected ``learning_rate``
    hyperparam (update via ``opt_state.hyperparams['learning_rate']``).

    ``staged_lr``: params whose TOP-LEVEL module name contains one of
    ``new_layers`` train at full lr; everything else at ``lr * base_lr_mult``
    (reference ``optimizer.py:78-145``; module-name matching replaces
    named_children traversal).
    """
    if optim not in AVAI_OPTIMS:
        raise ValueError(f"Unsupported optimizer: {optim} (one of {AVAI_OPTIMS})")

    kw = dict(
        weight_decay=weight_decay, momentum=momentum,
        sgd_dampening=sgd_dampening, sgd_nesterov=sgd_nesterov,
        rmsprop_alpha=rmsprop_alpha, adam_beta1=adam_beta1,
        adam_beta2=adam_beta2,
    )

    if not staged_lr:
        return optax.inject_hyperparams(
            lambda learning_rate: _base_tx(optim, learning_rate, **kw)
        )(learning_rate=lr)

    if params is None:
        raise ValueError("staged_lr requires params to derive the partition")
    new_layers = [new_layers] if isinstance(new_layers, str) else list(new_layers)

    def label_fn(tree):
        import jax

        def top_label(path_key):
            top = path_key[0].key if hasattr(path_key[0], "key") else str(path_key[0])
            return "new" if any(nl in top for nl in new_layers) else "base"

        return jax.tree_util.tree_map_with_path(
            lambda path, _: top_label(path), tree
        )

    def make(learning_rate):
        return optax.multi_transform(
            {
                "new": _base_tx(optim, learning_rate, **kw),
                "base": _base_tx(optim, learning_rate * base_lr_mult, **kw),
            },
            label_fn,
        )

    return optax.inject_hyperparams(make)(learning_rate=lr)


def set_lr(opt_state, lr: float):
    """Update the injected learning_rate hyperparam in an opt_state."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def build_lr_scheduler(
    lr_scheduler: str = "single_step",
    stepsize=1,
    gamma: float = 0.1,
    max_epoch: int = 1,
    base_lr: float = 0.0003,
    **kwargs,
) -> Callable[[int], float]:
    """Returns ``lr(epoch) -> float`` (reference ``lr_scheduler.py:38-68``)."""
    if lr_scheduler not in AVAI_SCH:
        raise ValueError(f"Unsupported scheduler: {lr_scheduler} (one of {AVAI_SCH})")

    if lr_scheduler == "single_step":
        if isinstance(stepsize, (list, tuple)):
            stepsize = stepsize[-1]
        if not isinstance(stepsize, int):
            raise TypeError(f"stepsize must be an int, got {type(stepsize)}")
        step = int(stepsize)
        return lambda epoch: base_lr * (gamma ** (epoch // step))

    if lr_scheduler == "multi_step":
        if not isinstance(stepsize, (list, tuple)):
            raise TypeError(f"stepsize must be a list, got {type(stepsize)}")
        milestones = sorted(int(s) for s in stepsize)
        return lambda epoch: base_lr * (
            gamma ** sum(1 for m in milestones if epoch >= m)
        )

    # cosine
    return lambda epoch: 0.5 * base_lr * (1 + math.cos(math.pi * epoch / max_epoch))
