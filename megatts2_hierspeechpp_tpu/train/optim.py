"""Optimizers matching the reference training recipes.

- AdamW(lr=1e-4..2e-4, betas=(0.8, 0.99), eps=1e-9) with per-epoch exponential
  lr decay gamma (configs/config.json:8-14, train_ms.py:150-173).
- ScaledAdam (k2/icefall) used by the alternative AR stack
  (/root/reference/AR/modules/optim.py) is provided as a simplified
  optax-composable variant in train/scaled_adam.py.
"""
from __future__ import annotations

import optax


def exponential_epoch_decay(base_lr: float, gamma: float, steps_per_epoch: int):
    """lr = base * gamma^epoch, stepped per-epoch like torch ExponentialLR."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (gamma**epoch)

    return schedule


def adamw(
    lr: float = 1e-4,
    betas=(0.8, 0.99),
    eps: float = 1e-9,
    weight_decay: float = 0.01,
    lr_decay: float | None = None,
    steps_per_epoch: int = 1000,
    max_grad_norm: float | None = None,
):
    sched = (
        exponential_epoch_decay(lr, lr_decay, steps_per_epoch)
        if lr_decay is not None
        else lr
    )
    tx = optax.adamw(
        learning_rate=sched, b1=betas[0], b2=betas[1], eps=eps,
        weight_decay=weight_decay,
    )
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
