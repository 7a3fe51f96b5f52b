"""SpeechSR trainer: GAN on (16 kHz in, 24/48 kHz out) waveform pairs.

Capability parity with the speechsr training config
(/root/reference/speechsr48k/config.json: segment 9600, c_mel 45, AdamW
lr 1e-4, decay 0.995) and its in-file MPD (6 STFT resolutions + 5 periods,
speechsr48k/speechsr.py:190-216): LSGAN + feature matching + mel L1 at the
target rate.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from megatts2_hierspeechpp_tpu.models.discriminators import MultiPeriodDiscriminator
from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR
from megatts2_hierspeechpp_tpu.ops import stft as jstft
from megatts2_hierspeechpp_tpu.train import losses as L


class SRTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params_g: Any
    opt_g: Any
    params_d: Any
    opt_d: Any


def create_state(gen: SpeechSR, disc: MultiPeriodDiscriminator, tx_g, tx_d, rng,
                 seg_in: int = 3200) -> SRTrainState:
    seg_out = seg_in * gen.rate_num // gen.rate_den
    gv = jax.jit(gen.init)(rng, jnp.zeros((1, seg_in, 1)))
    dv = jax.jit(disc.init)(rng, jnp.zeros((1, seg_out, 1)), jnp.zeros((1, seg_out, 1)))
    return SRTrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=gv["params"], opt_g=tx_g.init(gv["params"]),
        params_d=dv["params"], opt_d=tx_d.init(dv["params"]),
    )


def make_train_step(gen: SpeechSR, disc: MultiPeriodDiscriminator, tx_g, tx_d,
                    c_mel: float = 45.0, sr_out: int = 48000,
                    n_fft: int = 1280, hop: int = 320, n_mels: int = 128):
    def mel_of(wav):
        spec = jstft.linear_spectrogram(wav[..., 0], n_fft, hop, n_fft)
        return jstft.spec_to_mel(spec, sr_out, n_fft, n_mels, 0.0, None)

    def train_step(state: SRTrainState, batch: Dict, rng) -> Tuple[SRTrainState, Dict]:
        """batch: {'lo': (B, T, 1) 16 kHz, 'hi': (B, T*r, 1) target rate}."""
        lo, hi = batch["lo"], batch["hi"]

        def d_loss_fn(params_d):
            fake = jax.lax.stop_gradient(gen.apply({"params": state.params_g}, lo))
            dr, dg, _, _ = disc.apply({"params": params_d}, hi, fake)
            loss, _, _ = L.discriminator_loss(dr, dg)
            return loss

        loss_d, grads_d = jax.value_and_grad(d_loss_fn)(state.params_d)
        upd_d, new_opt_d = tx_d.update(grads_d, state.opt_d, state.params_d)
        new_params_d = optax.apply_updates(state.params_d, upd_d)

        def g_loss_fn(params_g):
            fake = gen.apply({"params": params_g}, lo)
            dr, dg, fr, fg = disc.apply({"params": new_params_d}, hi, fake)
            loss_mel = jnp.mean(jnp.abs(mel_of(fake) - mel_of(hi))) * c_mel
            loss_fm = L.feature_loss(fr, fg)
            loss_gen, _ = L.generator_loss(dg)
            total = loss_mel + loss_fm + loss_gen
            return total, {"loss/g/total": total, "loss/g/mel": loss_mel,
                           "loss/g/fm": loss_fm, "loss/g/gen": loss_gen}

        (loss_g, metrics), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params_g
        )
        upd_g, new_opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        new_params_g = optax.apply_updates(state.params_g, upd_g)
        metrics["loss/d/total"] = loss_d
        return (
            state.replace(step=state.step + 1, params_g=new_params_g,
                          opt_g=new_opt_g, params_d=new_params_d, opt_d=new_opt_d),
            metrics,
        )

    return train_step
