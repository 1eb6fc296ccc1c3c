"""Optimizer + LR schedule.

Mirrors the reference recipe (reference: `main.py` Adam + grad clip +
epoch-based LR decay behind --learning_rate_decay_start/every/rate;
SURVEY.md §2 "Experiment driver"): Adam, global-norm clipping, staircase
exponential decay in epoch units — expressed as a step-indexed optax
schedule so it lives inside the compiled update.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def lr_schedule(train_cfg, steps_per_epoch: int):
    """Staircase decay with the reference lineage's exact semantics:
    lr * rate^floor((epoch - start)/every), active only once
    epoch > start and start >= 0 (GVD / self-critical `main.py`:
    ``frac = (epoch - start) // every`` guarded by ``epoch > start``)."""
    base = train_cfg.learning_rate
    start = train_cfg.learning_rate_decay_start
    every = max(train_cfg.learning_rate_decay_every, 1)
    rate = train_cfg.learning_rate_decay_rate
    if start < 0:
        return lambda step: base  # decay disabled (reference: start = -1)

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        k = jnp.where(epoch > start, (epoch - start) // every, 0)
        return base * jnp.power(rate, k.astype(jnp.float32))

    return schedule


def make_optimizer(train_cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = lr_schedule(train_cfg, steps_per_epoch)
    tx = [optax.clip_by_global_norm(train_cfg.grad_clip)] \
        if train_cfg.grad_clip and train_cfg.grad_clip > 0 else []
    if train_cfg.optimizer == "adamw" or train_cfg.weight_decay > 0:
        tx.append(optax.adamw(sched, b1=train_cfg.adam_b1, b2=train_cfg.adam_b2,
                              eps=train_cfg.adam_eps,
                              weight_decay=train_cfg.weight_decay))
    else:
        tx.append(optax.adam(sched, b1=train_cfg.adam_b1, b2=train_cfg.adam_b2,
                             eps=train_cfg.adam_eps))
    return optax.chain(*tx)
