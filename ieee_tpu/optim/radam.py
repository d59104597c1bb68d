"""Faithful port of the reference's vendored RAdam.

Reference: ``torchreid/optim/radam.py:19-129`` (LiyuanLucasLiu/RAdam,
arXiv:1908.03265), which differs from ``optax.scale_by_radam`` in three
load-bearing ways (verified by step-for-step comparison):

1. **Weight decay is decoupled and gated**: ``p -= wd * lr * p`` is applied
   at step time only when an update is actually taken (``radam.py:114-117,
   124-127``), not L2-into-grad before the moment accumulators.
2. **eps placement**: the rectified update is
   ``sqrt(1-b2^t) * r_t * m_t / ((1-b1^t) * (sqrt(v_t) + eps))``
   (``radam.py:102-105,118-121``) — eps is added to the *unrectified*
   ``sqrt(v_t)``; optax adds it to ``sqrt(v_t/(1-b2^t))``.
3. **Threshold inclusivity**: the rectified branch fires at ``N_sma >= 5``
   (``radam.py:101,113``); optax uses a strict ``rho_t > threshold``.

The per-step scalars (N_sma, step_size) depend only on the step count; the
reference computes them in f64 Python (``radam.py:94-107``) and caches them
in a host-side buffer. We precompute them in f64 numpy for the first
``_TABLE`` steps (where ``N_sma = N_max - 2t b2^t/(1-b2^t)`` suffers f32
cancellation) and fall back to the f32 formula beyond (where b2^t is small
and the cancellation is gone), so the jitted step matches the reference to
f32 rounding at every t.

The transform emits ``step_size * m / (sqrt(v) + eps) + wd * p`` (or the
degenerated-SGD / zero variants) so that the engine's trailing
``optax.scale(-lr)`` realizes exactly the reference's parameter delta,
keeping lr an injected hyperparameter (no recompile on schedule steps).
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["scale_by_ref_radam"]

_TABLE = 4096


class ScaleByRefRAdamState(NamedTuple):
    count: chex.Array  # scalar int32
    mu: optax.Updates
    nu: optax.Updates


def _scalar_tables(b1: float, b2: float, degenerated_to_sgd: bool):
    """f64 (use_rect, rect, sgd_step, took_step) for t = 1.._TABLE."""
    t = np.arange(1, _TABLE + 1, dtype=np.float64)
    beta2_t = b2 ** t
    n_max = 2.0 / (1.0 - b2) - 1.0
    n_sma = n_max - 2.0 * t * beta2_t / (1.0 - beta2_t)
    bias1 = 1.0 - b1 ** t
    with np.errstate(invalid="ignore"):
        rect = np.sqrt(
            (1.0 - beta2_t) * (n_sma - 4.0) / (n_max - 4.0)
            * (n_sma - 2.0) / n_sma * n_max / (n_max - 2.0)
        ) / bias1
    use_rect = n_sma >= 5.0
    rect = np.where(use_rect, rect, 0.0)
    sgd = (1.0 / bias1) if degenerated_to_sgd else np.zeros_like(bias1)
    took = np.where(use_rect, 1.0, 1.0 if degenerated_to_sgd else 0.0)
    return (use_rect, rect.astype(np.float32), np.asarray(sgd, np.float32)
            * np.ones_like(rect, np.float32), took.astype(np.float32))


def scale_by_ref_radam(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    degenerated_to_sgd: bool = True,
) -> optax.GradientTransformation:
    """Reference-exact RAdam update direction (to be scaled by ``-lr``)."""
    import math

    tbl_use, tbl_rect, tbl_sgd, tbl_took = _scalar_tables(
        b1, b2, degenerated_to_sgd)

    def init_fn(params):
        return ScaleByRefRAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("scale_by_ref_radam requires params")
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, updates)

        # table lookup for t <= _TABLE (f64-precise); f32 formula beyond
        idx = jnp.clip(count, 1, _TABLE) - 1
        in_tbl = count <= _TABLE
        t = count.astype(jnp.float32)
        beta2_t = jnp.exp(t * math.log(b2))
        omb2t = -jnp.expm1(t * math.log(b2))
        n_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_max - 2.0 * t * beta2_t / omb2t
        bias1 = -jnp.expm1(t * math.log(b1))
        use_rect_f = n_sma >= 5.0
        rect_f = jnp.where(
            use_rect_f,
            jnp.sqrt(jnp.abs(
                omb2t * (n_sma - 4.0) / (n_max - 4.0)
                * (n_sma - 2.0) / n_sma * n_max / (n_max - 2.0))) / bias1,
            0.0)
        sgd_f = (1.0 / bias1) if degenerated_to_sgd else jnp.zeros_like(bias1)
        took_f = jnp.where(use_rect_f, 1.0,
                           1.0 if degenerated_to_sgd else 0.0)

        use_rect = jnp.where(in_tbl, jnp.asarray(tbl_use)[idx], use_rect_f)
        rect = jnp.where(in_tbl, jnp.asarray(tbl_rect)[idx], rect_f)
        sgd_step = jnp.where(in_tbl, jnp.asarray(tbl_sgd)[idx], sgd_f)
        took_step = jnp.where(in_tbl, jnp.asarray(tbl_took)[idx], took_f)

        def upd(m, v, p):
            rectified = rect * m / (jnp.sqrt(v) + eps)
            degenerated = sgd_step * m
            out = jnp.where(use_rect, rectified, degenerated)
            if weight_decay:
                out = out + took_step * weight_decay * p
            return out

        new_updates = jax.tree_util.tree_map(upd, mu, nu, params)
        return new_updates, ScaleByRefRAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
