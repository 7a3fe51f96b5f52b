"""MP-SENet denoiser trainer.

Capability parity with the MP-SENet recipe referenced by
/root/reference/denoiser/{generator.py,config.json}: magnitude L2 + phase
(instantaneous/group-delay/IAF anti-wrapping) + complex losses on compressed
STFTs, plus time-domain L1 (the upstream metric-GAN discriminator is replaced
by these deterministic objectives; PESQ scoring is an external metric).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from megatts2_hierspeechpp_tpu.models.denoiser import MPNet
from megatts2_hierspeechpp_tpu.ops import stft as jstft


class DenoiserTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt: Any


def anti_wrapping(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(x - jnp.round(x / (2 * math.pi)) * 2 * math.pi)


def phase_losses(pha_r: jnp.ndarray, pha_g: jnp.ndarray):
    """ip/gd/iaf anti-wrapping losses (denoiser/generator.py:150-170);
    pha: (B, T, F). Group delay = diff over freq; IAF = diff over time."""
    ip = jnp.mean(anti_wrapping(pha_r - pha_g))
    gd = jnp.mean(anti_wrapping(jnp.diff(pha_r, axis=2) - jnp.diff(pha_g, axis=2)))
    iaf = jnp.mean(anti_wrapping(jnp.diff(pha_r, axis=1) - jnp.diff(pha_g, axis=1)))
    return ip, gd, iaf


def create_state(model: MPNet, tx, rng, t=10, f=201) -> DenoiserTrainState:
    v = jax.jit(partial(model.init, train=True))(rng, jnp.zeros((1, t, f)), jnp.zeros((1, t, f)))
    return DenoiserTrainState(
        step=jnp.zeros((), jnp.int32),
        params=v["params"],
        batch_stats=v.get("batch_stats", {}),
        opt=tx.init(v["params"]),
    )


def make_train_step(model: MPNet, tx, n_fft=400, hop=100, win=400,
                    compress=0.3):
    def train_step(state: DenoiserTrainState, batch: Dict, rng) -> Tuple:
        """batch: {'noisy': (B, T) wav, 'clean': (B, T) wav}."""
        mag_n, pha_n = jstft.mag_pha_stft(batch["noisy"], n_fft, hop, win, compress)
        mag_c, pha_c = jstft.mag_pha_stft(batch["clean"], n_fft, hop, win, compress)

        def loss_fn(params):
            (mag_g, pha_g), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                mag_n, pha_n, train=True, mutable=["batch_stats"],
            )
            l_mag = jnp.mean(jnp.square(mag_g - mag_c))
            ip, gd, iaf = phase_losses(pha_c, pha_g)
            l_pha = ip + gd + iaf
            com_g = jnp.stack(
                [mag_g * jnp.cos(pha_g), mag_g * jnp.sin(pha_g)], axis=-1
            )
            com_c = jnp.stack(
                [mag_c * jnp.cos(pha_c), mag_c * jnp.sin(pha_c)], axis=-1
            )
            l_com = jnp.mean(jnp.square(com_g - com_c))
            spec = (mag_g ** (1.0 / compress)) * jnp.exp(1j * pha_g)
            wav_g = jstft.istft(spec, n_fft, hop, win,
                                length=batch["clean"].shape[-1])
            l_time = jnp.mean(jnp.abs(wav_g - batch["clean"]))
            total = 0.9 * l_mag + 0.3 * l_pha + 0.1 * l_com + 0.2 * l_time
            metrics = {"loss/total": total, "loss/mag": l_mag, "loss/pha": l_pha,
                       "loss/com": l_com, "loss/time": l_time}
            return total, (mut["batch_stats"], metrics)

        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        upd, new_opt = tx.update(grads, state.opt, state.params)
        new_params = optax.apply_updates(state.params, upd)
        return (
            state.replace(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt=new_opt),
            metrics,
        )

    return train_step
