"""Periodic-eval hooks for the training CLIs.

The reference runs evaluate() + TensorBoard f0/spectrogram images every
eval_interval (/root/reference/train_ms.py:345-405, utils.py:79-154). Here the
hook renders PNGs into <model_dir>/eval/ and returns scalars that the loop
prefixes with "eval/" into scalars.jsonl.
"""
from __future__ import annotations

import os
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from megatts2_hierspeechpp_tpu.models.plm import ProsodyLM
from megatts2_hierspeechpp_tpu.models.ttv import TTVModel
from megatts2_hierspeechpp_tpu.utils.plotting import (
    save_f0_plot,
    save_spectrogram_plot,
)


def _masked_l1(pred, target, mask):
    # broadcast the (B, T, 1) mask to the full diff shape BEFORE summing the
    # denominator, else the scalar comes out C-times too large
    mask = jnp.broadcast_to(mask.astype(pred.dtype), pred.shape)
    return jnp.sum(jnp.abs(pred - target) * mask) / jnp.maximum(
        jnp.sum(mask), 1.0
    )


def make_s2_eval_fn(ttv: TTVModel, eval_batch: Dict[str, np.ndarray],
                    plot: bool = True) -> Callable:
    """GT-duration inference on a fixed held-out batch: w2v L1 + lf0 L1
    scalars and (optionally) gt/pred w2v spectrograms + f0 overlay PNGs —
    the s2 analogue of the reference's evaluate() images."""
    batch = {k: jnp.asarray(v) for k, v in eval_batch.items()}

    @jax.jit
    def _run(params_g, vq):
        w2v_pred, pred_lf0 = ttv.apply(
            {"params": params_g, "vq": vq},
            batch["x_ids"], batch["tone"], batch["language"],
            batch["x_lengths"], batch["mel"], batch["mel_lengths"],
            batch["dur"], batch["mrte_mel"], batch["mrte_mel_lengths"],
            method=TTVModel.infer_gt_dur,
        )
        t = batch["w2v"].shape[1]
        w2v_mask = (jnp.arange(t)[None] < batch["w2v_lengths"][:, None])
        l1_w2v = _masked_l1(w2v_pred, batch["w2v"], w2v_mask[..., None])
        tp = batch["pitch"].shape[1]
        p_mask = (jnp.arange(tp)[None] < batch["pitch_lengths"][:, None])
        lf0_t = jnp.log(batch["pitch"] + 1.0)
        l1_lf0 = _masked_l1(pred_lf0, lf0_t, p_mask)
        return w2v_pred, pred_lf0, l1_w2v, l1_lf0

    def eval_fn(state, step: int, model_dir: str) -> Dict[str, float]:
        w2v_pred, pred_lf0, l1_w2v, l1_lf0 = _run(state.params_g, state.vq)
        scalars = {"w2v_l1": float(l1_w2v), "lf0_l1": float(l1_lf0)}
        if plot:
            out = os.path.join(model_dir, "eval")
            n0 = int(eval_batch["w2v_lengths"][0])
            save_spectrogram_plot(np.asarray(w2v_pred)[0, :n0],
                                  os.path.join(out, f"w2v_pred_{step}.png"),
                                  title=f"w2v pred @ step {step}")
            save_spectrogram_plot(eval_batch["w2v"][0, :n0],
                                  os.path.join(out, "w2v_gt.png"),
                                  title="w2v ground truth")
            p0 = int(eval_batch["pitch_lengths"][0])
            f0_t = eval_batch["pitch"][0, :p0]
            f0_p = np.exp(np.asarray(pred_lf0)[0, :p0]) - 1.0
            save_f0_plot(f0_t, f0_p, os.path.join(out, f"f0_{step}.png"))
        return scalars

    return eval_fn


def make_vocoder_eval_fn(voc, eval_batch: Dict[str, np.ndarray],
                         plot: bool = True) -> Callable:
    """Held-out full-inference eval for the vocoder trainer (capability
    addition; the reference ships no vocoder trainer): synthesize from
    (mel-style, w2v, f0) with the inference path and report the log-mel L1
    between the synthesized and ground-truth audio — the actual perceptual
    proxy — plus an excitation-vs-f0 overlay PNG."""
    from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder
    from megatts2_hierspeechpp_tpu.ops.stft import mel_spectrogram_fixed

    batch = {k: jnp.asarray(v) for k, v in eval_batch.items()}

    @jax.jit
    def _run(params_g):
        wav_hat, e_ = voc.apply(
            {"params": params_g}, batch["mel"], batch["w2v"],
            batch["mask"], jnp.log1p(batch["f0"][..., None]),
            method=HierVocoder.infer,
        )  # log1p: the serving-domain f0 (see train/vocoder.py encode)
        mel_hat = mel_spectrogram_fixed(wav_hat[..., 0].astype(jnp.float32))
        mel_gt = mel_spectrogram_fixed(batch["audio"])
        t = min(mel_hat.shape[1], mel_gt.shape[1], batch["mask"].shape[1])
        l1 = _masked_l1(mel_hat[:, :t], mel_gt[:, :t], batch["mask"][:, :t])
        return wav_hat, e_, l1

    def eval_fn(state, step: int, model_dir: str) -> Dict[str, float]:
        wav_hat, e_, l1 = _run(state.params_g)
        scalars = {"mel_l1": float(l1)}
        if plot:
            out = os.path.join(model_dir, "eval")
            n0 = int(eval_batch["lengths"][0])
            # e_ predicts log1p(f0) (~0-6); bring it back to Hz so both
            # curves share a scale on the overlay (round-2 ADVICE #4)
            save_f0_plot(
                eval_batch["f0"][0, : 4 * n0],
                np.expm1(np.asarray(e_)[0, : 4 * n0, 0]),
                os.path.join(out, f"excitation_{step}.png"),
            )
        return scalars

    return eval_fn


def make_ar_eval_fn(model, eval_batch: Dict[str, np.ndarray]) -> Callable:
    """Held-out CE loss + top-10 accuracy for the AR (text-to-semantic)
    trainer — same observability contract as the other CLIs."""
    batch = {k: jnp.asarray(v) for k, v in eval_batch.items()}

    @jax.jit
    def _run(params):
        out = model.apply(
            {"params": params},
            batch["x_ids"], batch["x_lens"], batch["y_ids"], batch["y_lens"],
            batch["bert_feature"], deterministic=True,
        )
        return out["loss"], out["acc"]

    def eval_fn(state, step: int, model_dir: str) -> Dict[str, float]:
        loss, acc = _run(state.params)
        return {"t2s_loss": float(loss), "t2s_acc_top10": float(acc)}

    return eval_fn


def make_s1_eval_fn(ttv: TTVModel, plm: ProsodyLM,
                    eval_batch: Dict[str, np.ndarray]) -> Callable:
    """Held-out PLM CE loss + top-10 accuracy at fixed shapes (the s1
    analogue of the reference's periodic eval, train_ms_s1.py:288-295)."""
    batch = {k: jnp.asarray(v) for k, v in eval_batch.items()}

    @jax.jit
    def _run(params_plm, ttv_vars):
        x_frame, lr_codes = ttv.apply(
            ttv_vars,
            batch["x_ids"], batch["tone"], batch["language"],
            batch["x_lengths"], batch["mel"], batch["mel_lengths"],
            batch["dur"], batch["mrte_mel"], batch["mrte_mel_lengths"],
            method=TTVModel.extract_tc_latent_code,
        )
        out = plm.apply({"params": params_plm}, x_frame, lr_codes,
                        batch["mel_lengths"], deterministic=True)
        return out["loss_log"], out["acc"]

    def eval_fn(state, step: int, model_dir: str) -> Dict[str, float]:
        loss, acc = _run(state.params_plm, state.ttv_vars)
        return {"plm_loss": float(loss), "plm_acc_top10": float(acc)}

    return eval_fn


def make_sr_eval_fn(gen, eval_batch: Dict[str, np.ndarray], sr_out: int,
                    plot: bool = True) -> Callable:
    """Held-out eval for the SpeechSR trainer: full-segment super-resolution
    mel L1 at the target rate plus time-domain SNR (the perceptual proxies
    the reference logs for its speechsr runs, speechsr48k/config.json), and
    a gt-vs-pred spectrogram PNG pair."""
    from megatts2_hierspeechpp_tpu.ops.stft import linear_spectrogram, spec_to_mel

    batch = {k: jnp.asarray(v) for k, v in eval_batch.items()}
    n_fft, hop = 1280, 320

    def _mel(wav):
        spec = linear_spectrogram(wav[..., 0], n_fft, hop, n_fft)
        return spec_to_mel(spec, sr_out, n_fft, 128, 0.0, None)

    @jax.jit
    def _run(params_g):
        fake = gen.apply({"params": params_g}, batch["lo"])
        mel_f, mel_r = _mel(fake), _mel(batch["hi"])
        l1 = jnp.mean(jnp.abs(mel_f - mel_r))
        err = jnp.sum(jnp.square(fake - batch["hi"]))
        snr = 10.0 * jnp.log10(
            jnp.sum(jnp.square(batch["hi"])) / jnp.maximum(err, 1e-12))
        return fake, mel_f, mel_r, l1, snr

    def eval_fn(state, step: int, model_dir: str) -> Dict[str, float]:
        _, mel_f, mel_r, l1, snr = _run(state.params_g)
        if plot:
            out = os.path.join(model_dir, "eval")
            save_spectrogram_plot(
                np.log(np.asarray(mel_f[0], np.float32) + 1e-5),
                os.path.join(out, f"sr_pred_{step}.png"), title="pred")
            save_spectrogram_plot(
                np.log(np.asarray(mel_r[0], np.float32) + 1e-5),
                os.path.join(out, f"sr_gt_{step}.png"), title="gt")
        return {"mel_l1": float(l1), "snr_db": float(snr)}

    return eval_fn


def make_denoiser_eval_fn(model, eval_batch: Dict[str, np.ndarray],
                          n_fft: int = 400, hop: int = 100, win: int = 400,
                          compress: float = 0.3) -> Callable:
    """Held-out eval for the MP-SENet trainer: denoised-vs-clean compressed
    magnitude MSE and time-domain SNR improvement over the noisy input
    (PESQ — the reference's metric, denoiser train ecosystem — needs a
    licensed wheel that isn't in this image; SNR-i is the stand-in)."""
    from megatts2_hierspeechpp_tpu.ops import stft as jstft

    batch = {k: jnp.asarray(v) for k, v in eval_batch.items()}

    @jax.jit
    def _run(params, batch_stats):
        mag_n, pha_n = jstft.mag_pha_stft(batch["noisy"], n_fft, hop, win,
                                          compress)
        mag_c, _ = jstft.mag_pha_stft(batch["clean"], n_fft, hop, win,
                                      compress)
        mag_g, pha_g = model.apply(
            {"params": params, "batch_stats": batch_stats},
            mag_n, pha_n, train=False)
        l_mag = jnp.mean(jnp.square(mag_g - mag_c))
        spec = (mag_g ** (1.0 / compress)) * jnp.exp(1j * pha_g)
        wav_g = jstft.istft(spec, n_fft, hop, win,
                            length=batch["clean"].shape[-1])

        def _snr(x):
            err = jnp.sum(jnp.square(x - batch["clean"]))
            return 10.0 * jnp.log10(
                jnp.sum(jnp.square(batch["clean"])) / jnp.maximum(err, 1e-12))

        return l_mag, _snr(wav_g) - _snr(batch["noisy"])

    def eval_fn(state, step: int, model_dir: str) -> Dict[str, float]:
        l_mag, snr_i = _run(state.params, state.batch_stats)
        return {"mag_mse": float(l_mag), "snr_improvement_db": float(snr_i)}

    return eval_fn
