"""End-to-end inference pipelines.

Equivalents of the reference CLIs (/root/reference/inference_plm.py:103-201
tts(), inference_vc.py:70-172 VC(), inference_speechsr.py), re-composed as
jit-compiled stages with length bucketing:

  text -> frontend -> TTV latent (inf_extract_tc_latent) -> PLM KV-cached
  decode -> (w2v, f0) -> vocoder voice_conversion(+noise control/denoise
  interpolation) -> 16 kHz wav -> SpeechSR 24k/48k.

Reference checkpoints load through models/convert (torch .pth dicts,
{model, iteration, ...}, utils.py:19-57).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.data import text as text_frontend
from megatts2_hierspeechpp_tpu.models import convert as C
from megatts2_hierspeechpp_tpu.models.denoiser import MPNet
from megatts2_hierspeechpp_tpu.models.plm import ProsodyLM, decode as plm_decode
from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR
from megatts2_hierspeechpp_tpu.models.ttv import TTVModel
from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder
from megatts2_hierspeechpp_tpu.models.wav2vec2 import Wav2Vec2
from megatts2_hierspeechpp_tpu.ops import stft as jstft
from megatts2_hierspeechpp_tpu.ops.f0 import yin_f0


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth checkpoint's model state_dict (CPU, no grads)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt)
    return {k: v for k, v in sd.items()}


def _bucket(n: int, sizes=(200, 400, 600, 800, 1200, 1600, 2000)) -> int:
    for s in sizes:
        if n <= s:
            return s
    return ((n + 399) // 400) * 400


@dataclass
class TTSPipeline:
    """Holds all model defs + params; stages are jitted per shape bucket."""

    ttv: TTVModel
    ttv_vars: Dict
    plm: ProsodyLM
    plm_params: Dict
    vocoder: HierVocoder
    vocoder_params: Dict
    speechsr: Optional[SpeechSR] = None
    speechsr_params: Optional[Dict] = None
    denoiser: Optional[MPNet] = None
    denoiser_vars: Optional[Dict] = None
    denoiser_cfg: Dict = field(
        default_factory=lambda: dict(n_fft=400, hop=100, win=400, compress=0.3)
    )

    # ---------- feature front-ends ----------

    def prompt_mel(self, audio: np.ndarray) -> jnp.ndarray:
        """audio: (T,) float in [-1, 1] at 16 kHz -> (1, frames, 80)."""
        return jstft.mel_spectrogram_fixed(jnp.asarray(audio)[None])

    def denoise(self, audio: np.ndarray) -> np.ndarray:
        """MP-SENet denoising (denoiser/infer.py:4-11)."""
        assert self.denoiser is not None
        cfg = self.denoiser_cfg
        wav = jnp.asarray(audio)[None]
        norm = jnp.sqrt(wav.shape[-1] / jnp.sum(wav**2))
        wavn = wav * norm
        mag, pha = jstft.mag_pha_stft(
            wavn, cfg["n_fft"], cfg["hop"], cfg["win"], cfg["compress"]
        )
        mag_g, pha_g = self.denoiser.apply(self.denoiser_vars, mag, pha)
        mag_g = mag_g ** (1.0 / cfg["compress"])
        spec = mag_g * jnp.exp(1j * pha_g)
        out = jstft.istft(spec, cfg["n_fft"], cfg["hop"], cfg["win"],
                          length=wav.shape[-1])
        return np.asarray(out / norm)[0]

    # ---------- main pipelines ----------

    def tts(
        self,
        text: str,
        prompt_audio: np.ndarray,
        denoise_ratio: float = 0.0,
        noise_scale_vc: float = 0.333,
        length_scale: float = 1.0,
        output_sr: int = 16000,
        seed: int = 1234,
        top_k: int = 0,
        use_plm: bool = True,
    ) -> np.ndarray:
        ids, tones, langs = text_frontend.process_text(text)
        n = len(ids)

        # prompt prep: pad to a 1600 multiple for the mel/denoiser hops,
        # optional denoise, then stack [orig; denoised] for style interpolation
        t_a = len(prompt_audio)
        pad = (t_a // 1600 + 1) * 1600 - t_a
        padded = np.pad(prompt_audio, (0, pad))
        mel_ttv = self.prompt_mel(padded)

        if denoise_ratio > 0 and self.denoiser is not None:
            den = self.denoise(padded)[:t_a]
        else:
            den = prompt_audio
        pair = np.stack([prompt_audio, den[:t_a]], axis=0)
        mel_pair = jstft.mel_spectrogram_fixed(jnp.asarray(pair))

        # TTV latent with predicted durations (bucketed frame budget)
        x_ids = jnp.asarray(np.asarray(ids, np.int32))[None]
        tone = jnp.asarray(np.asarray(tones, np.int32))[None]
        lang = jnp.asarray(np.asarray(langs, np.int32))[None]
        x_len = jnp.asarray([n], jnp.int32)
        mel_len = jnp.asarray([mel_ttv.shape[1]], jnp.int32)
        out_budget = _bucket(int(n * 40 * length_scale))  # ~20 frames/phone cap

        x_frame, g, frame_lengths, frame_mask = self.ttv.apply(
            self.ttv_vars, x_ids, tone, lang, x_len, mel_ttv, mel_len,
            out_budget, length_scale=length_scale,
            method=TTVModel.inf_extract_tc_latent,
        )

        if use_plm:
            codes = plm_decode(
                self.plm_params, x_frame,
                n_layers=self.plm.n_layers, n_heads=self.plm.n_heads,
                go_id=self.plm.go_id, rng=jax.random.PRNGKey(seed), top_k=top_k,
            )
        else:
            # inference.py-equivalent no-PLM path: prosody codes from the
            # prompt's own RVQ codes, tiled to the predicted frame length
            pc = self.ttv.apply(
                self.ttv_vars, mel_ttv,
                jnp.asarray([mel_ttv.shape[1]], jnp.int32),
                method=TTVModel.prompt_codes,
            )  # (1, T_prompt)
            t_need = x_frame.shape[1]
            reps = -(-t_need // pc.shape[1])
            codes = jnp.tile(pc, (1, reps))[:, :t_need]
        w2v_pred, pred_lf0 = self.ttv.apply(
            self.ttv_vars, x_frame, g, codes[None], frame_lengths, frame_mask,
            method=TTVModel.inf_plm_gen,
        )

        # pitch clipping: anything below log(55) -> 0 (inference_plm.py:169)
        pred_lf0 = jnp.where(pred_lf0 < math.log(55.0), 0.0, pred_lf0)

        t_frames = int(frame_lengths[0])
        wav = self.vocoder.apply(
            self.vocoder_params,
            w2v_pred[:, :_bucket(t_frames)],
            frame_mask[:, :_bucket(t_frames)],
            mel_pair,
            jnp.ones((mel_pair.shape[0], mel_pair.shape[1], 1), jnp.float32),
            pred_lf0[:, : 4 * _bucket(t_frames), None],
            noise_scale_vc,
            jax.random.PRNGKey(seed + 1),
            denoise_ratio,
            method=HierVocoder.voice_conversion,
        )
        wav = np.asarray(wav)[0, : 320 * t_frames, 0]

        if output_sr in (24000, 48000) and self.speechsr is not None:
            up = self.speechsr.apply(
                {"params": self.speechsr_params}, jnp.asarray(wav)[None, :, None]
            )
            wav = np.asarray(up)[0, :, 0]

        peak = np.abs(wav).max()
        return (wav / max(peak, 1e-8) * 0.999).astype(np.float32)

    def vc(
        self,
        source_audio: np.ndarray,
        target_audio: np.ndarray,
        w2v_model: Wav2Vec2,
        w2v_params: Dict,
        denoise_ratio: float = 0.0,
        noise_scale_vc: float = 0.333,
        output_sr: int = 16000,
        seed: int = 1234,
    ) -> np.ndarray:
        """Voice conversion (inference_vc.py): source w2v + speaker-normalized
        f0, target style."""
        t_s = len(source_audio)
        pad = (t_s // 1280 + 1) * 1280 - t_s
        src = np.pad(source_audio, (0, pad))

        f0 = np.asarray(yin_f0(jnp.asarray(src)[None]))[0]
        t_f0 = np.asarray(yin_f0(jnp.asarray(target_audio)[None]))[0]
        ii = f0 != 0
        jj = t_f0 != 0
        if ii.any() and jj.any():
            f0[ii] = (f0[ii] - f0[ii].mean()) / max(f0[ii].std(), 1e-6)
            f0[ii] = np.clip(f0[ii] * t_f0[jj].std() + t_f0[jj].mean(), 0, None)
        denorm_lf0 = np.log(f0 + 1.0)

        # w2v features with reflect-pad 40 (inference_vc.py:93, extract_w2v.py)
        src_pad = np.pad(src, (40, 40), mode="reflect")
        w2v = w2v_model.apply({"params": w2v_params}, jnp.asarray(src_pad)[None])
        t_frames = w2v.shape[1]

        t_t = len(target_audio)
        pad_t = (t_t // 1600 + 1) * 1600 - t_t
        padded_t = np.pad(target_audio, (0, pad_t))
        if denoise_ratio > 0 and self.denoiser is not None:
            den = self.denoise(padded_t)[:t_t]
        else:
            den = target_audio
        pair = np.stack([target_audio, den[:t_t]], axis=0)
        trg_mel = jstft.mel_spectrogram_fixed(jnp.asarray(pair))

        mask = jnp.ones((1, t_frames, 1), jnp.float32)
        lf0 = jnp.asarray(denorm_lf0[: 4 * t_frames], jnp.float32)
        if lf0.shape[0] < 4 * t_frames:
            lf0 = jnp.pad(lf0, (0, 4 * t_frames - lf0.shape[0]))
        wav = self.vocoder.apply(
            self.vocoder_params, w2v, mask, trg_mel,
            jnp.ones((trg_mel.shape[0], trg_mel.shape[1], 1), jnp.float32),
            lf0[None, :, None], noise_scale_vc, jax.random.PRNGKey(seed),
            denoise_ratio, method=HierVocoder.voice_conversion,
        )
        wav = np.asarray(wav)[0, :, 0]
        if output_sr in (24000, 48000) and self.speechsr is not None:
            up = self.speechsr.apply(
                {"params": self.speechsr_params}, jnp.asarray(wav)[None, :, None]
            )
            wav = np.asarray(up)[0, :, 0]
        peak = np.abs(wav).max()
        return (wav / max(peak, 1e-8) * 0.999).astype(np.float32)


def build_pipeline_from_reference_ckpts(
    ttv_ckpt: str, plm_ckpt: str, vocoder_ckpt: str,
    speechsr_ckpt: Optional[str] = None, denoiser_ckpt: Optional[str] = None,
    speechsr_rate: int = 48000,
) -> TTSPipeline:
    """Construct a pipeline from reference torch checkpoints."""
    ttv = TTVModel(n_vocab=text_frontend.N_VOCAB, n_tone=text_frontend.N_TONE,
                   n_language=text_frontend.N_LANGUAGE)
    ttv_vars = C.convert_ttv(load_torch_checkpoint(ttv_ckpt))
    plm = ProsodyLM()
    plm_params = C.convert_plm(load_torch_checkpoint(plm_ckpt))
    voc = HierVocoder()
    voc_params = {"params": C.convert_vocoder(load_torch_checkpoint(vocoder_ckpt))}

    sr_model = sr_params = None
    if speechsr_ckpt:
        num, den = (3, 1) if speechsr_rate == 48000 else (3, 2)
        sr_model = SpeechSR(rate_num=num, rate_den=den)
        sr_params = C.convert_speechsr(load_torch_checkpoint(speechsr_ckpt), "dec")

    den_model = den_vars = None
    if denoiser_ckpt:
        import torch

        ckpt = torch.load(denoiser_ckpt, map_location="cpu", weights_only=True)
        sd = ckpt.get("generator", ckpt.get("model", ckpt))
        den_model = MPNet()
        den_vars = C.convert_denoiser(sd)

    return TTSPipeline(
        ttv=ttv, ttv_vars=ttv_vars, plm=plm, plm_params=plm_params,
        vocoder=voc, vocoder_params=voc_params,
        speechsr=sr_model, speechsr_params=sr_params,
        denoiser=den_model, denoiser_vars=den_vars,
    )
