"""s2-stage (acoustic model) GAN trainer.

Replicates the optimization of /root/reference/train_ms.py:195-312 TPU-natively:
  - D step: MRSD on (w2v, stop_grad(w2v_pred)), LSGAN loss, AdamW update.
  - G step: re-apply the *updated* D, total loss
        2.0 * dur + pitch + (MSE+L1)(w2v)*1024/sum(mask)*c_mel
        + feature_matching + LSGAN gen + 100 * commit            (:275-296)
  - bf16-able forward with fp32 loss island; VQ EMA stats update inside the
    G forward (mutable 'vq'); under pjit over the `data` mesh axis the batch
    reductions are global, so codebooks stay replica-consistent (the fix for
    the reference's commented-out broadcast, SURVEY.md §5).

The whole (D update, G update) pair is one jitted function; gradient
all-reduces are inserted by GSPMD.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from megatts2_hierspeechpp_tpu.models.discriminators import MultiResSpecDiscriminator
from megatts2_hierspeechpp_tpu.models.ttv import TTVModel
from megatts2_hierspeechpp_tpu.train import losses as L


class S2TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params_g: Any
    vq: Any
    opt_g: Any
    params_d: Any
    spectral: Any
    opt_d: Any


def create_state(ttv: TTVModel, disc: MultiResSpecDiscriminator, tx_g, tx_d,
                 rng, example_batch) -> S2TrainState:
    # jit the inits: eager per-op dispatch is pathological on remote backends
    g_vars = jax.jit(ttv.init)(
        {"params": rng, "dropout": rng},
        example_batch["x_ids"], example_batch["tone"], example_batch["language"],
        example_batch["x_lengths"], example_batch["w2v"],
        example_batch["w2v_lengths"], example_batch["mel"],
        example_batch["mel_lengths"], example_batch["pitch"],
        example_batch["pitch_lengths"], example_batch["dur"],
        example_batch["mrte_mel"], example_batch["mrte_mel_lengths"],
    )
    w2v_t = jnp.swapaxes(jnp.asarray(example_batch["w2v"]), 1, 2)
    d_vars = jax.jit(disc.init)(rng, w2v_t, w2v_t)
    return S2TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=g_vars["params"],
        vq=g_vars["vq"],
        opt_g=tx_g.init(g_vars["params"]),
        params_d=d_vars["params"],
        spectral=d_vars["spectral"],
        opt_d=tx_d.init(d_vars["params"]),
    )


def make_train_step(ttv: TTVModel, disc: MultiResSpecDiscriminator, tx_g, tx_d,
                    c_mel: float = 1.0, c_commit: float = 100.0):
    def g_forward(params_g, vq, batch, rng, teacher_force, train_vq):
        out, mut = ttv.apply(
            {"params": params_g, "vq": vq},
            batch["x_ids"], batch["tone"], batch["language"], batch["x_lengths"],
            batch["w2v"], batch["w2v_lengths"], batch["mel"], batch["mel_lengths"],
            batch["pitch"], batch["pitch_lengths"], batch["dur"],
            batch["mrte_mel"], batch["mrte_mel_lengths"],
            teacher_force_w2v=teacher_force,
            deterministic=False,
            vq_rng=rng, train_vq=train_vq,
            rngs={"dropout": rng},
            mutable=["vq"],
        )
        return out, mut["vq"]

    def train_step(state: S2TrainState, batch: Dict, rng) -> Tuple[S2TrainState, Dict]:
        rng_fwd, rng_tf, rng_vq = jax.random.split(rng, 3)
        teacher_force = jax.random.uniform(rng_tf) <= 0.5

        # ---- single generator forward, linearized for the later G pullback ----
        # The reference holds one torch graph and reuses it for both the D step
        # (detached) and the G step; re-tracing the forward twice here costs a
        # full extra TTV forward per step, so instead we jax.vjp once and pull
        # the G-loss cotangents back through the saved linearization.
        def g_diff(params_g):
            out, new_vq = g_forward(params_g, state.vq, batch, rng_fwd,
                                    teacher_force, train_vq=True)
            diff = {
                "w2v_pred": out["w2v_pred"],
                "l_length": out["l_length"],
                "l_pitch": out["l_pitch"],
                "commit_loss": out["commit_loss"],
            }
            return diff, (new_vq, out["y_mask"])

        diff_out, g_vjp, (new_vq, y_mask) = jax.vjp(
            g_diff, state.params_g, has_aux=True
        )

        # ---- D step (generator output detached) ----
        w2v_pred_const = jax.lax.stop_gradient(diff_out["w2v_pred"])
        w2v_real = jnp.swapaxes(batch["w2v"], 1, 2)  # (B, 1024, T)
        w2v_fake = jnp.swapaxes(w2v_pred_const, 1, 2)

        def d_loss_fn(params_d, spectral):
            (dr, dg, _, _), mut = disc.apply(
                {"params": params_d, "spectral": spectral},
                w2v_real, w2v_fake, update_u=True, mutable=["spectral"],
            )
            loss, r_losses, g_losses = L.discriminator_loss(dr, dg)
            return loss, (mut["spectral"], r_losses, g_losses)

        (loss_d, (new_spectral, _, _)), grads_d = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.params_d, state.spectral)
        upd_d, new_opt_d = tx_d.update(grads_d, state.opt_d, state.params_d)
        new_params_d = optax.apply_updates(state.params_d, upd_d)

        # ---- G step against the updated D (cotangents through the saved vjp) ----
        def g_loss_fn(diff):
            w2v_pred = diff["w2v_pred"]
            dr, dg, fr, fg = disc.apply(
                {"params": new_params_d, "spectral": new_spectral},
                w2v_real, jnp.swapaxes(w2v_pred, 1, 2), update_u=False,
            )
            mask_sum = jnp.sum(y_mask)
            loss_dur = diff["l_length"].astype(jnp.float32) * 2.0
            loss_pitch = diff["l_pitch"].astype(jnp.float32)
            mse = jnp.mean(jnp.square(batch["w2v"] - w2v_pred).astype(jnp.float32))
            l1 = jnp.mean(jnp.abs(batch["w2v"] - w2v_pred).astype(jnp.float32))
            l_w2v = mse * 1024.0 / mask_sum * c_mel
            l_w2v1 = l1 * 1024.0 / mask_sum * c_mel
            loss_fm = L.feature_loss(fr, fg)
            loss_gen, _ = L.generator_loss(dg)
            commit = diff["commit_loss"] * c_commit
            total = (loss_dur + loss_pitch + l_w2v + l_w2v1 + loss_fm + loss_gen
                     + commit)
            metrics = {
                "loss/g/total": total, "loss/g/dur": loss_dur,
                "loss/g/pitch": loss_pitch, "loss/g/w2v_mse": l_w2v,
                "loss/g/w2v_l1": l_w2v1, "loss/g/fm": loss_fm,
                "loss/g/gen": loss_gen, "loss/g/commit": commit,
            }
            return total, metrics

        (loss_g, metrics), grads_out = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(diff_out)
        (grads_g,) = g_vjp(grads_out)
        upd_g, new_opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        new_params_g = optax.apply_updates(state.params_g, upd_g)

        metrics["loss/d/total"] = loss_d
        metrics["grad_norm_g"] = optax.global_norm(grads_g)
        metrics["grad_norm_d"] = optax.global_norm(grads_d)

        return (
            state.replace(
                step=state.step + 1,
                params_g=new_params_g, vq=new_vq, opt_g=new_opt_g,
                params_d=new_params_d, spectral=new_spectral, opt_d=new_opt_d,
            ),
            metrics,
        )

    return train_step
