"""Optimizer: optax Adam + global-norm clip + the reference LR schedule.

The reference wraps torch Adam with clip-before-step
(ref: modules/optim.py:31-36) and drives LR per-step from
`lr_scheduler` (ref: trainer/trainer_base.py:135-154):

    warmup_steps <= 0 : scheduler disabled, lr stays learning_rate_init
                        (and rollback LR-halving persists)
    step <= warmup    : lr = step * (peak - init) / warmup + init
    step  > warmup    : lr = peak * step^-0.5 * warmup^0.5

Note the reference's 'warmup' can interpolate DOWNWARD when peak < init
(the default flag values, ref: train.py:105-106); the formula is implemented,
not the name. With warmup enabled, the reference's rollback LR-halving is
overwritten by the scheduler on the next step — the trainer reproduces that
by recomputing the LR from the schedule every step.

Freezing uses a boolean mask pytree (True = trainable): frozen leaves get
optax.set_to_zero(), the optax equivalent of the reference's per-parameter
requires_grad=False policies (ref: trainer_base.py:185-414).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import optax
from optax import tree_utils as otu


def reference_lr(step, init_lr: float, peak_lr: float,
                 warmup_steps: int) -> float:
    """ref: trainer_base.py:135-154. Pure host math: the trainer calls this
    every step, and jnp scalar ops here would dispatch a device op plus a
    blocking readback per step (~28 ms on a remote-attached chip)."""
    if warmup_steps <= 0:
        return float(init_lr)
    step = float(step)
    if step <= warmup_steps:
        return step * (peak_lr - init_lr) / warmup_steps + init_lr
    return peak_lr * max(step, 1.0) ** -0.5 * warmup_steps ** 0.5


def make_optimizer(
    max_grad_norm: float = 1.0,
    trainable_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """clip-by-global-norm -> Adam(torch defaults) -> -lr scale.

    The LR lives in the opt state as an injected hyperparam ('step_size');
    the train step writes it each update via `set_lr`, mirroring the
    reference's per-step param_group['lr'] write.
    """
    txs = []
    if max_grad_norm and max_grad_norm > 0:
        txs.append(optax.clip_by_global_norm(max_grad_norm))
    txs.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    # hyperparam_dtype pinned: without it optax re-emits step_size in the
    # params' dtype after the first update, so a bf16 train step would flip
    # the opt-state signature f32->bf16 and trigger a full recompile on the
    # second step (set_lr always writes f32)
    txs.append(optax.inject_hyperparams(
        optax.scale, hyperparam_dtype=jnp.float32)(step_size=-1.0))
    tx = optax.chain(*txs)
    if trainable_mask is None:
        return tx
    import jax

    labels = jax.tree_util.tree_map(
        lambda t: "train" if t else "freeze", trainable_mask
    )
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )


def set_lr(opt_state, lr):
    """Write the learning rate into the injected 'step_size' hyperparam.
    Works inside jit (lr may be traced)."""
    return otu.tree_set(opt_state, step_size=-jnp.asarray(lr, jnp.float32))


def get_lr(opt_state) -> float:
    return -float(otu.tree_get(opt_state, "step_size"))


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)
