"""LR schedules (SURVEY.md C13): SGD-momentum with multi-factor decay.

The reference used MXNet's MultiFactorScheduler (drop LR by a factor at given
epochs) with optional warmup; this builds the optax equivalent from
TrainConfig.
"""

from __future__ import annotations

import optax

from fastvideotagging_tpu.config import TrainConfig


def multifactor_schedule(cfg: TrainConfig, steps_per_epoch: int) -> optax.Schedule:
    """base_lr, x lr_decay at each epoch in lr_steps, with linear warmup.

    join_schedules passes (step - warmup_steps) into the post-warmup schedule,
    so the decay boundaries are expressed relative to the end of warmup —
    otherwise every lr_steps epoch would fire warmup_epochs late.
    """
    warmup_steps = (max(1, int(cfg.warmup_epochs * steps_per_epoch))
                    if cfg.warmup_epochs > 0 else 0)
    if cfg.lr_steps and cfg.warmup_epochs >= min(cfg.lr_steps):
        # A boundary at or before the end of warmup would otherwise clamp
        # to <= 0 and silently apply that decay factor from the first
        # post-warmup step.
        raise ValueError(
            f"warmup_epochs={cfg.warmup_epochs} must end before the first "
            f"lr_steps decay epoch {min(cfg.lr_steps)}")
    boundaries = {
        int(e * steps_per_epoch) - warmup_steps: cfg.lr_decay
        for e in cfg.lr_steps
    }
    sched = optax.piecewise_constant_schedule(cfg.base_lr, boundaries)
    if warmup_steps:
        warmup = optax.linear_schedule(0.0, cfg.base_lr, warmup_steps)
        return optax.join_schedules([warmup, sched], [warmup_steps])
    return sched


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """SGD + momentum + decoupled weight decay, with optional grad accumulation."""
    steps = []
    if cfg.clip_grad_norm > 0:
        # Clip BEFORE decoupled weight decay so the decay term is not
        # scaled down with the gradient (decay is a function of weights,
        # not of gradient magnitude).
        steps.append(optax.clip_by_global_norm(cfg.clip_grad_norm))
    steps += [
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(
            learning_rate=multifactor_schedule(cfg, steps_per_epoch),
            momentum=cfg.momentum,
            nesterov=False,
        ),
    ]
    tx = optax.chain(*steps)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx
