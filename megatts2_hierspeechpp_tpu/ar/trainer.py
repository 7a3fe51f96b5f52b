"""AR-stack trainer (s1_train.py / t2s_lightning_module.py equivalent):
CE training of Text2Semantic with ScaledAdam + warmup-cosine, optional
gradient accumulation (reference uses 4, t2s_lightning_module.py:35-49)."""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from megatts2_hierspeechpp_tpu.ar.t2s import Text2Semantic


class ARTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt: Any
    accum: Any
    accum_count: jnp.ndarray


def create_state(model: Text2Semantic, tx, rng, nx=8, ny=16) -> ARTrainState:
    params = jax.jit(model.init)(
        {"params": rng},
        jnp.zeros((1, nx), jnp.int32), jnp.full((1,), nx, jnp.int32),
        jnp.zeros((1, ny), jnp.int32), jnp.full((1,), ny, jnp.int32),
        jnp.zeros((1, nx, 1024)),
    )["params"]
    return ARTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt=tx.init(params),
        accum=jax.tree.map(jnp.zeros_like, params),
        accum_count=jnp.zeros((), jnp.int32),
    )


def make_train_step(model: Text2Semantic, tx, grad_accum: int = 1):
    def train_step(state: ARTrainState, batch: Dict, rng) -> Tuple[ARTrainState, Dict]:
        def loss_fn(params):
            out = model.apply(
                {"params": params},
                batch["x_ids"], batch["x_lens"], batch["y_ids"], batch["y_lens"],
                batch["bert_feature"],
                deterministic=False, rngs={"dropout": rng},
            )
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        accum = jax.tree.map(lambda a, g: a + g, state.accum, grads)
        count = state.accum_count + 1

        def apply_update(_):
            mean_grads = jax.tree.map(lambda a: a / grad_accum, accum)
            upd, new_opt = tx.update(mean_grads, state.opt, state.params)
            new_params = optax.apply_updates(state.params, upd)
            zeros = jax.tree.map(jnp.zeros_like, accum)
            return new_params, new_opt, zeros, jnp.zeros((), jnp.int32)

        def keep_accumulating(_):
            return state.params, state.opt, accum, count

        new_params, new_opt, new_accum, new_count = jax.lax.cond(
            count >= grad_accum, apply_update, keep_accumulating, None
        )

        metrics = {"loss/t2s": loss, "acc/t2s": out["acc"]}
        return (
            state.replace(step=state.step + 1, params=new_params, opt=new_opt,
                          accum=new_accum, accum_count=new_count),
            metrics,
        )

    return train_step
