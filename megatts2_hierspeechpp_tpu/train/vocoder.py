"""Vocoder (HierSpeech++) GAN+VAE trainer.

The reference ships no vocoder training code (README.md:53) but includes all
training-side modules (PosteriorAudioEncoder, MultiPeriodDiscriminator,
MelDecoder, forward flows). This trainer completes the capability with the
standard hierarchical-VAE + GAN objective (HierSpeech++ / VITS family):

  - z_q ~ enc_q(linear spec, raw wav);  wav_hat = dec(z_q, sn(z_q), g)
    on random `segment_frames` windows (commons.rand_slice_segments
    equivalent, /root/reference/commons.py:48-71) to bound waveform length;
  - mel reconstruction L1 (slaney mel of wav) * c_mel (45);
  - dual KL: flow(z_q) against the SF posterior prior (m_p, logs_p) and
    flow_l(flow(z_q)) against (m_l, logs_l), * c_kl;
  - MPD adversarial (LSGAN) + feature matching on the wav slices;
  - MelDecoder 20-bin prosody distillation L1;
  - excitation/f0 supervision: the SourceNetwork predictor head `e_`
    (hierspeechpp_speechsynthesizer.py:307-308, exposed as the model's
    f0_extraction output, :701-715) is regressed to log(1+f0) on the slice
    window — same scale/L1 convention as the TTV pitch predictor
    (t2w2v_transformer.py:869-873).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from megatts2_hierspeechpp_tpu.models.discriminators import MultiPeriodDiscriminator
from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder
from megatts2_hierspeechpp_tpu.ops import stft as jstft
from megatts2_hierspeechpp_tpu.train import losses as L


class VocTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params_g: Any
    opt_g: Any
    params_d: Any
    opt_d: Any


def rand_slice_indices(rng, lengths, segment: int):
    """Per-utterance random start frames (commons.rand_slice_segments)."""
    max_start = jnp.maximum(lengths - segment, 0)
    u = jax.random.uniform(rng, lengths.shape)
    return (u * (max_start + 1)).astype(jnp.int32)


def slice_frames(x, starts, segment):
    """x: (B, T, C); starts: (B,) -> (B, segment, C)."""
    def one(xb, s):
        return jax.lax.dynamic_slice_in_dim(xb, s, segment, axis=0)

    return jax.vmap(one)(x, starts)


def create_state(voc: HierVocoder, disc: MultiPeriodDiscriminator, tx_g, tx_d,
                 rng, spec_ch=641, t=16) -> VocTrainState:
    gv = jax.jit(partial(voc.init, method=HierVocoder.init_all))(
        rng,
        jnp.zeros((1, t, spec_ch)), jnp.zeros((1, 320 * t, 1)),
        jnp.zeros((1, t, 80)), jnp.zeros((1, t, 1024)),
        jnp.zeros((1, 4 * t, 1)), jnp.ones((1, t, 1)),
        {"z_q": rng, "z_p": rng, "z_l": rng},
    )
    dv = jax.jit(disc.init)(rng, jnp.zeros((1, 320 * 8, 1)), jnp.zeros((1, 320 * 8, 1)))
    return VocTrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=gv["params"], opt_g=tx_g.init(gv["params"]),
        params_d=dv["params"], opt_d=tx_d.init(dv["params"]),
    )


def make_train_step(voc: HierVocoder, disc: MultiPeriodDiscriminator, tx_g, tx_d,
                    segment_frames: int = 32, hop: int = 320,
                    c_mel: float = 45.0, c_kl: float = 1.0, c_f0: float = 1.0,
                    sr: int = 16000, n_fft: int = 1280, n_mels: int = 80):
    def encode(params_g, batch, rngs):
        # The vocoder consumes f0 in log1p domain: serving passes the TTV's
        # log(f0+1) pitch straight through (reference inference_vc.py:115
        # `denorm_f0 = torch.log(f0+1)`, inference_plm.py:169-173), so
        # training must feed log1p(Hz) too or the posterior/prior encoders
        # see a ~200x input-scale shift at serve time. Unvoiced stays 0.
        return voc.apply(
            {"params": params_g},
            batch["spec"], batch["audio"][..., None], batch["mel"], batch["w2v"],
            jnp.log1p(batch["f0"][..., None]), batch["mask"],
            {"z_q": rngs[0], "z_p": rngs[1], "z_l": rngs[2]},
            method=HierVocoder.train_encode,
        )

    def mel_of(wav):
        spec = jstft.linear_spectrogram(wav[..., 0], n_fft, hop, n_fft)
        return jstft.spec_to_mel(spec, sr, n_fft, n_mels, 0.0, None)

    def train_step(state: VocTrainState, batch: Dict, rng) -> Tuple[VocTrainState, Dict]:
        rngs = jax.random.split(rng, 5)
        starts = rand_slice_indices(rngs[3], batch["lengths"], segment_frames)

        wav_gt_sl = slice_frames(
            batch["audio"][..., None], starts * hop, segment_frames * hop
        )

        def gen_slice(params_g):
            # decode only the window: slice z_q, then source net + decoder
            out = encode(params_g, batch, rngs)
            z_sl = slice_frames(out["z_q"], starts, segment_frames)
            wav_hat_sl, e_sl = voc.apply(
                {"params": params_g}, z_sl, out["g"],
                method=HierVocoder.decode_slice,
            )
            return out, wav_hat_sl, e_sl

        # ---- D step ----
        _, wav_hat_sl, _ = gen_slice(state.params_g)
        wav_hat_const = jax.lax.stop_gradient(wav_hat_sl)

        def d_loss_fn(params_d):
            dr, dg, _, _ = disc.apply({"params": params_d}, wav_gt_sl, wav_hat_const)
            loss, _, _ = L.discriminator_loss(dr, dg)
            return loss

        loss_d, grads_d = jax.value_and_grad(d_loss_fn)(state.params_d)
        upd_d, new_opt_d = tx_d.update(grads_d, state.opt_d, state.params_d)
        new_params_d = optax.apply_updates(state.params_d, upd_d)

        # ---- G step ----
        # GT f0 on the same window (f0 is at 4x frame rate, 200 Hz)
        f0_gt_sl = slice_frames(batch["f0"][..., None], starts * 4,
                                segment_frames * 4)

        def g_loss_fn(params_g):
            out, wav_hat_sl, e_sl = gen_slice(params_g)
            dr, dg, fr, fg = disc.apply(
                {"params": new_params_d}, wav_gt_sl, wav_hat_sl
            )
            loss_mel = jnp.mean(jnp.abs(mel_of(wav_hat_sl) - mel_of(wav_gt_sl)))
            # excitation/f0 supervision on the SourceNetwork predictor head
            lf0_gt = jnp.log1p(f0_gt_sl.astype(jnp.float32))
            loss_f0 = jnp.mean(jnp.abs(e_sl.astype(jnp.float32) - lf0_gt))
            kl1 = L.kl_loss(out["z_f"], out["logs_q"], out["m_p"], out["logs_p"],
                            batch["mask"])
            kl2 = L.kl_loss(out["z_fl"], out["logs_q"], out["m_l"], out["logs_l"],
                            batch["mask"])
            mel20 = batch["mel"][..., :20]
            loss_prosody = jnp.mean(jnp.abs(out["mel_rec"] - mel20))
            loss_fm = L.feature_loss(fr, fg)
            loss_gen, _ = L.generator_loss(dg)
            total = (loss_mel * c_mel + (kl1 + kl2) * c_kl + loss_fm + loss_gen
                     + loss_prosody + loss_f0 * c_f0)
            return total, {
                "loss/g/total": total, "loss/g/mel": loss_mel,
                "loss/g/kl1": kl1, "loss/g/kl2": kl2,
                "loss/g/fm": loss_fm, "loss/g/gen": loss_gen,
                "loss/g/prosody": loss_prosody, "loss/g/f0": loss_f0,
            }

        (loss_g, metrics), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params_g
        )
        upd_g, new_opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        new_params_g = optax.apply_updates(state.params_g, upd_g)

        metrics["loss/d/total"] = loss_d
        return (
            state.replace(step=state.step + 1, params_g=new_params_g,
                          opt_g=new_opt_g, params_d=new_params_d,
                          opt_d=new_opt_d),
            metrics,
        )

    return train_step
