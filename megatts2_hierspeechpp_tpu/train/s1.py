"""s1-stage (prosody LM) trainer.

Replicates /root/reference/train_ms_s1.py:213-295: the frozen s2 acoustic model
extracts (x_frame, lr_codes) per batch (extract_tc_latent_code), then the PLM
is trained with CE (go=1024) and AdamW. One jitted step; DP via GSPMD like the
s2 trainer.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from megatts2_hierspeechpp_tpu.models.plm import ProsodyLM
from megatts2_hierspeechpp_tpu.models.ttv import TTVModel


class S1TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params_plm: Any
    opt_plm: Any
    ttv_vars: Any  # frozen s2 variables ({'params':..., 'vq':...})


def create_state(plm: ProsodyLM, tx, rng, ttv_vars, example_latent_dim=256,
                 t=16) -> S1TrainState:
    params = jax.jit(plm.init)(
        {"params": rng},
        jnp.zeros((1, t, example_latent_dim)),
        jnp.zeros((1, t), jnp.int32),
        jnp.full((1,), t, jnp.int32),
    )["params"]
    return S1TrainState(
        step=jnp.zeros((), jnp.int32),
        params_plm=params,
        opt_plm=tx.init(params),
        ttv_vars=ttv_vars,
    )


def make_train_step(ttv: TTVModel, plm: ProsodyLM, tx):
    def train_step(state: S1TrainState, batch: Dict, rng) -> Tuple[S1TrainState, Dict]:
        # frozen s2: extract frame-level text latents + code targets
        x_frame, lr_codes = ttv.apply(
            state.ttv_vars,
            batch["x_ids"], batch["tone"], batch["language"], batch["x_lengths"],
            batch["mel"], batch["mel_lengths"], batch["dur"],
            batch["mrte_mel"], batch["mrte_mel_lengths"],
            method=TTVModel.extract_tc_latent_code,
        )
        x_frame = jax.lax.stop_gradient(x_frame)
        lr_codes = jax.lax.stop_gradient(lr_codes)

        def loss_fn(params):
            out = plm.apply(
                {"params": params}, x_frame, lr_codes, batch["mel_lengths"],
                deterministic=False, rngs={"dropout": rng},
            )
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params_plm
        )
        upd, new_opt = tx.update(grads, state.opt_plm, state.params_plm)
        new_params = optax.apply_updates(state.params_plm, upd)

        metrics = {
            "loss/plm": out["loss_log"],
            "acc/plm_top10": out["acc"],
            "grad_norm": optax.global_norm(grads),
        }
        return state.replace(step=state.step + 1, params_plm=new_params,
                             opt_plm=new_opt), metrics

    return train_step
