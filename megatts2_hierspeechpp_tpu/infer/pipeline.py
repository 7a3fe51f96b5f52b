"""End-to-end inference pipelines.

Equivalents of the reference CLIs (/root/reference/inference_plm.py:103-201
tts(), inference_vc.py:70-172 VC(), inference_speechsr.py), re-composed as
jit-compiled stages with length bucketing.

Serving design (TPU): the hot path is THREE device dispatches per utterance —

  [mel front-end jit] -> [acoustic jit: TTV latent -> PLM KV-cached decode ->
  w2v/f0 generation -> pitch clip] -> [vocoder VC jit (+SpeechSR jit)]

Each stage is a `jax.jit` whose executable is cached per shape bucket (text
length and frame budget are padded onto coarse grids; prompt length pads to
the reference's 100 ms grid by default, or a 1 s grid with
`prepare_prompt(bucket=True)` for many-speaker serving), so
repeated calls re-use compiled programs; with the persistent compilation cache
(utils/runtime.enable_compile_cache) executables survive process restarts.
Scalars that vary per request (length_scale, noise_scale, denoise_ratio, PRNG
seed) are traced arguments, NOT static — changing them never recompiles.

The single host sync per call is reading `frame_lengths` after the acoustic
stage, which is required to pick the vocoder's frame bucket; everything else
stays on device.

`exact=True` disables bucketing and runs the acoustic stage twice (first to
measure the predicted length, then at exactly that length) so there are zero
padded frames anywhere — this reproduces the reference composition
numerically (used by the composed-pipeline parity oracle,
tests/test_pipeline_parity.py).

Reference checkpoints load through models/convert (torch .pth dicts,
{model, iteration, ...}, utils.py:19-57).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
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


def _bucket_text(n: int, sizes=(16, 32, 64, 96, 128, 192, 256, 384, 512)) -> int:
    for s in sizes:
        if n <= s:
            return s
    return ((n + 63) // 64) * 64


@dataclass
class PromptFeatures:
    """Per-prompt device features, computed once and reused across requests."""

    mel_ttv: jnp.ndarray   # (1, T_pad, 80) mel of the 1600-padded prompt
    mel_pair: jnp.ndarray  # (2, T, 80) mel of [orig; denoised] at true length
    t_samples: int
    # (1, 2, C) [orig; denoised] vocoder style pair, filled lazily by
    # TTSPipeline.prompt_style (cached per enrolled speaker; pooled at the
    # prompt's OWN length — see HierVocoder.style_pairs)
    style_pair: Optional[jnp.ndarray] = None


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
    # directory for AOT-persisted per-bucket executables (infer/aot.py):
    # restart loads compiled programs directly — zero trace/lower/compile
    aot_dir: Optional[str] = None
    aot_version: str = ""
    _jits: Dict = field(default_factory=dict, repr=False, compare=False)
    _aot_store: Optional[object] = field(
        default=None, repr=False, compare=False)

    # ---------- jitted stage builders (one executable per shape bucket) ----------

    def _stage(self, name: str):
        """Lazily build + memoize the jitted stage function `name`."""
        fn = self._jits.get(name)
        if fn is not None:
            return fn
        if name == "mel":
            fn = jax.jit(jstft.mel_spectrogram_fixed)
        elif name == "denoise":
            cfg = self.denoiser_cfg

            def _denoise(dvars, wav):  # wav: (1, T), T a 1600-multiple
                norm = jnp.sqrt(wav.shape[-1] / jnp.sum(wav**2))
                wavn = wav * norm
                mag, pha = jstft.mag_pha_stft(
                    wavn, cfg["n_fft"], cfg["hop"], cfg["win"], cfg["compress"]
                )
                mag_g, pha_g = self.denoiser.apply(dvars, mag, pha)
                mag_g = mag_g ** (1.0 / cfg["compress"])
                spec = mag_g * jnp.exp(1j * pha_g)
                out = jstft.istft(spec, cfg["n_fft"], cfg["hop"], cfg["win"],
                                  length=wav.shape[-1])
                return out / norm

            fn = jax.jit(_denoise)
        elif name == "acoustic":
            def _acoustic(ttv_vars, plm_params, x_ids, tone, lang, x_len,
                          mel_ttv, mel_len, length_scale, rng, given_codes,
                          out_budget, top_k, mode):
                x_frame, g, frame_lengths, frame_mask = self.ttv.apply(
                    ttv_vars, x_ids, tone, lang, x_len, mel_ttv, mel_len,
                    out_budget, length_scale=length_scale,
                    method=TTVModel.inf_extract_tc_latent,
                )
                if mode == "plm":
                    # NOTE: decode's compute_dtype=bf16 fast path is NOT used
                    # here — hardware A/B (tools/bench_plm_decode.py, r3)
                    # showed the scan step is op-dispatch-bound, not
                    # bandwidth-bound: bf16 measured 0.87-1.0x (the extra
                    # converts lose) while costing ~2% greedy-token flips.
                    codes = plm_decode(
                        plm_params, x_frame,
                        n_layers=self.plm.n_layers, n_heads=self.plm.n_heads,
                        go_id=self.plm.go_id, rng=rng, top_k=top_k,
                    )
                elif mode == "given":
                    # externally supplied codes (eval/parity harnesses)
                    t_need = x_frame.shape[1]
                    codes = jnp.zeros((x_frame.shape[0], t_need), jnp.int32)
                    codes = jax.lax.dynamic_update_slice(
                        codes, given_codes[:, :t_need], (0, 0)
                    )
                else:  # "prompt"
                    # inference.py-equivalent no-PLM path: prosody codes from
                    # the prompt's own RVQ codes, tiled to the frame budget
                    pc = self.ttv.apply(
                        ttv_vars, mel_ttv, mel_len, method=TTVModel.prompt_codes
                    )  # (1, T_prompt)
                    t_need = x_frame.shape[1]
                    reps = -(-t_need // pc.shape[1])
                    codes = jnp.tile(pc, (1, reps))[:, :t_need]
                w2v_pred, pred_lf0 = self.ttv.apply(
                    ttv_vars, x_frame, g, codes[None], frame_lengths, frame_mask,
                    method=TTVModel.inf_plm_gen,
                )
                # pitch clipping: below log(55) -> 0 (inference_plm.py:169)
                pred_lf0 = jnp.where(pred_lf0 < math.log(55.0), 0.0, pred_lf0)
                return w2v_pred, pred_lf0, frame_lengths, frame_mask, x_frame, codes

            fn = jax.jit(_acoustic,
                         static_argnames=("out_budget", "top_k", "mode"))
        elif name == "duration":
            # cheap pre-pass (text enc + MRTE + duration predictor) so the
            # acoustic/vocoder buckets are sized from the TRUE predicted
            # length — without it the PLM decode scan and the vocoder always
            # run at the worst-case frames-per-phone budget
            def _duration(ttv_vars, x_ids, tone, lang, x_len, mel_ttv,
                          mel_len, length_scale):
                return self.ttv.apply(
                    ttv_vars, x_ids, tone, lang, x_len, mel_ttv, mel_len,
                    length_scale, method=TTVModel.predict_frame_lengths,
                )

            fn = jax.jit(_duration)
        elif name == "vocode":
            def _vocode(voc_params, w2v, mask, mel_pair, f0, noise_scale, rng,
                        denoise_ratio):
                trg_mask = jnp.ones(
                    (mel_pair.shape[0], mel_pair.shape[1], 1), jnp.float32
                )
                return self.vocoder.apply(
                    voc_params, w2v, mask, mel_pair, trg_mask, f0,
                    noise_scale, rng, denoise_ratio,
                    method=HierVocoder.voice_conversion,
                )

            # w2v/f0 are per-request intermediates: donate their buffers
            fn = jax.jit(_vocode, donate_argnums=(1, 4))
        elif name == "style":
            def _style(voc_params, mel_pair):  # (2, T, 80) -> (1, 2, C)
                trg_mask = jnp.ones(
                    (mel_pair.shape[0], mel_pair.shape[1], 1), jnp.float32)
                return self.vocoder.apply(
                    voc_params, mel_pair, trg_mask,
                    method=HierVocoder.style_pairs)

            fn = jax.jit(_style)
        elif name == "vocode_style":
            # cross-prompt batched vocode: per-row precomputed style pairs
            def _vocode_style(voc_params, w2v, mask, g_pair, f0, noise_scale,
                              rng, denoise_ratio):
                return self.vocoder.apply(
                    voc_params, w2v, mask, g_pair, f0,
                    noise_scale, rng, denoise_ratio,
                    method=HierVocoder.voice_conversion_from_style,
                )

            fn = jax.jit(_vocode_style, donate_argnums=(1, 4))
        elif name == "vocode_latent":
            def _vocode_latent(voc_params, w2v, mask, mel_pair, f0, noise_scale,
                               rng, denoise_ratio):
                trg_mask = jnp.ones(
                    (mel_pair.shape[0], mel_pair.shape[1], 1), jnp.float32
                )
                return self.vocoder.apply(
                    voc_params, w2v, mask, mel_pair, trg_mask, f0,
                    noise_scale, rng, denoise_ratio,
                    method=HierVocoder.vc_latent,
                )

            fn = jax.jit(_vocode_latent, donate_argnums=(1, 4))
        elif name.startswith("vocode_dec:"):
            # Streaming decoder chunk executables. Boundary alignment is what
            # makes streamed == full decode: a zero-INPUT halo is not the same
            # as the full decode's per-layer zero padding (conv biases + the
            # global style conditioning make padded activations nonzero), so
            # the first/last chunks carry no outer halo — their array edge IS
            # the sequence edge, and XLA's layer padding reproduces the
            # monolithic decode bit-for-structure. Interior halos read real z,
            # so with halo >= the Generator's receptive field the kept centers
            # match to float accumulation.
            _, kind, chunk_s, halo_s = name.split(":")
            chunk, halo = int(chunk_s), int(halo_s)

            if kind == "first":  # z[:, :chunk+halo] -> keep [:320*chunk]
                def _dec_first(voc_params, z, e, g):
                    wav = self.vocoder.apply(
                        voc_params, z, e, g, method=HierVocoder.decode_latent)
                    return wav[:, : 320 * chunk]

                fn = jax.jit(_dec_first)
            elif kind == "full":  # whole z in one call (short utterance)
                def _dec_full(voc_params, z, e, g):
                    return self.vocoder.apply(
                        voc_params, z, e, g, method=HierVocoder.decode_latent)

                fn = jax.jit(_dec_full)
            elif kind == "mid":  # slice [start-halo, start+chunk+halo)
                def _dec_mid(voc_params, z, e, g, start):
                    t = chunk + 2 * halo
                    zc = jax.lax.dynamic_slice(
                        z, (0, start - halo, 0), (1, t, z.shape[2]))
                    ec = jax.lax.dynamic_slice(
                        e, (0, 4 * (start - halo), 0), (1, 4 * t, e.shape[2]))
                    wav = self.vocoder.apply(
                        voc_params, zc, ec, g, method=HierVocoder.decode_latent)
                    return wav[:, 320 * halo: 320 * (halo + chunk)]

                fn = jax.jit(_dec_mid)
            else:  # "last": z[:, -(chunk+halo):] -> keep [320*halo:]
                def _dec_last(voc_params, z, e, g):
                    wav = self.vocoder.apply(
                        voc_params, z, e, g, method=HierVocoder.decode_latent)
                    return wav[:, 320 * halo:]

                fn = jax.jit(_dec_last)
        elif name == "sr":
            def _sr(sr_params, wav):  # wav: (B, T, 1)
                return self.speechsr.apply({"params": sr_params}, wav)

            fn = jax.jit(_sr, donate_argnums=(1,))
        elif name.startswith("sr_chunk:"):
            # streaming SR piece: same edge-alignment rules as vocode_dec
            # (first/last pieces own the true sequence edge; interiors carry
            # real-sample halos >= the AMP stack's receptive field)
            _, kind, ln_s, halo_s = name.split(":")
            ln, hs = int(ln_s), int(halo_s)
            num = self.speechsr.rate_num
            den = self.speechsr.rate_den

            def _sr_chunk(sr_params, x):  # x: (1, L, 1), halos per `kind`
                y = self.speechsr.apply({"params": sr_params}, x)
                start = hs * num // den if kind in ("mid", "last") else 0
                return y[:, start: start + ln * num // den]

            fn = jax.jit(_sr_chunk)
        else:  # pragma: no cover
            raise KeyError(name)
        if self.aot_dir is not None:
            if self._aot_store is None:
                from megatts2_hierspeechpp_tpu.infer.aot import ExecutableStore

                self._aot_store = ExecutableStore(
                    self.aot_dir, version=self.aot_version)
            statics = (("out_budget", "top_k", "mode")
                       if name == "acoustic" else ())
            fn = self._aot_store.wrap(fn, name, static_argnames=statics)
        self._jits[name] = fn
        return fn

    def aot_stats(self) -> Dict[str, int]:
        """Executable-store hit/miss counters (restart test: misses == 0)."""
        if self._aot_store is None:
            return {"hits": 0, "misses": 0}
        return self._aot_store.stats()

    def jit_stats(self) -> Dict[str, int]:
        """Compiled-executable count per stage (tests assert one per bucket)."""
        return {k: v._cache_size() for k, v in self._jits.items()}

    def _check_output_sr(self, output_sr: int) -> float:
        """Validate output_sr against the ATTACHED SpeechSR model and return
        the sample-count ratio vs the native 16 kHz.

        The reference couples these only by CLI convention (inference_plm.py
        picks the ckpt from --output_sr); here a 24k-model pipeline asked for
        48 kHz raises instead of silently returning wrong-rate audio."""
        if output_sr == 16000:
            return 1.0
        if self.speechsr is None:
            raise ValueError(f"output_sr={output_sr} needs a SpeechSR model")
        num, den = self.speechsr.rate_num, self.speechsr.rate_den
        model_sr = 16000 * num // den
        if output_sr != model_sr:
            raise ValueError(
                f"output_sr={output_sr} does not match the loaded SpeechSR "
                f"model (x{num}/{den} -> {model_sr} Hz); load the matching "
                "checkpoint or request output_sr=16000")
        return num / den

    # ---------- feature front-ends ----------

    def prompt_mel(self, audio: np.ndarray) -> jnp.ndarray:
        """audio: (T,) float in [-1, 1] at 16 kHz -> (1, frames, 80)."""
        return self._stage("mel")(jnp.asarray(audio)[None])

    def prompt_style(self, prompt: "PromptFeatures") -> jnp.ndarray:
        """(1, 2, C) vocoder style pair for a prompt, computed once and cached
        on the PromptFeatures (per enrolled speaker). One jit per distinct
        mel_pair length."""
        if prompt.style_pair is None:
            prompt.style_pair = self._stage("style")(
                self.vocoder_params, prompt.mel_pair)
        return prompt.style_pair

    def denoise(self, audio: np.ndarray) -> np.ndarray:
        """MP-SENet denoising (denoiser/infer.py:4-11)."""
        assert self.denoiser is not None
        out = self._stage("denoise")(self.denoiser_vars, jnp.asarray(audio)[None])
        return np.asarray(out)[0]

    def prepare_prompt(
        self, prompt_audio: np.ndarray, denoise_ratio: float = 0.0,
        bucket: bool = False,
    ) -> PromptFeatures:
        """Prompt prep (inference_plm.py:131-156): pad to a 1600 multiple for
        the mel/denoiser hops, mel for TTV on the padded audio, optional
        denoise, then mel of [orig; denoised] (padding stripped) for style
        interpolation. Compute once per prompt and reuse across requests.

        Prompt-length shapes feed the duration/acoustic/vocode jits, so every
        distinct padded length compiles fresh executables. The default 1600
        (100 ms) grid reproduces the reference numerically; serving
        deployments with many enrolled speakers should pass bucket=True to
        round prompt lengths onto a coarse 1 s grid instead (zero-pad beyond
        the reference's — slight style-vector deviation, bounded compile
        count)."""
        t_a = len(prompt_audio)
        grid = 16000 if bucket else 1600
        pad = (t_a // grid + 1) * grid - t_a
        padded = np.pad(prompt_audio, (0, pad))
        mel_ttv = self.prompt_mel(padded)

        if denoise_ratio > 0 and self.denoiser is not None:
            den = self.denoise(padded)[:t_a]
        else:
            den = prompt_audio
        pair = np.stack([prompt_audio, den[:t_a]], axis=0)
        mel_pair = self._stage("mel")(jnp.asarray(pair))
        return PromptFeatures(mel_ttv=mel_ttv, mel_pair=mel_pair, t_samples=t_a)

    # ---------- main pipelines ----------

    def tts(
        self,
        text: str,
        prompt_audio: Optional[np.ndarray] = None,
        denoise_ratio: float = 0.0,
        noise_scale_vc: float = 0.333,
        length_scale: float = 1.0,
        output_sr: int = 16000,
        seed: int = 1234,
        top_k: int = 0,
        use_plm: bool = True,
        prompt: Optional[PromptFeatures] = None,
        exact: bool = False,
        codes: Optional[np.ndarray] = None,
        return_intermediates: bool = False,
    ):
        ratio = self._check_output_sr(output_sr)  # fail fast, before compute
        if prompt is None:
            assert prompt_audio is not None, "need prompt_audio or prompt features"
            prompt = self.prepare_prompt(prompt_audio, denoise_ratio)

        ids, tones, langs = text_frontend.process_text(text)
        n = len(ids)
        n_pad = n if exact else _bucket_text(n)
        x_ids = np.zeros((1, n_pad), np.int32)
        tone = np.zeros((1, n_pad), np.int32)
        lang = np.zeros((1, n_pad), np.int32)
        x_ids[0, :n], tone[0, :n], lang[0, :n] = ids, tones, langs
        x_len = jnp.asarray([n], jnp.int32)
        mel_len = jnp.asarray([prompt.mel_ttv.shape[1]], jnp.int32)

        mode = "given" if codes is not None else ("plm" if use_plm else "prompt")
        given = (jnp.asarray(codes, jnp.int32).reshape(1, -1)
                 if codes is not None else jnp.zeros((1, 1), jnp.int32))
        acoustic = self._stage("acoustic")
        args = (self.ttv_vars, self.plm_params, jnp.asarray(x_ids),
                jnp.asarray(tone), jnp.asarray(lang), x_len,
                prompt.mel_ttv, mel_len,
                jnp.float32(length_scale), jax.random.PRNGKey(seed), given)
        # duration pre-pass: size the (static) acoustic budget from the true
        # predicted length, not a frames-per-phone worst case — the PLM decode
        # scan and the vocoder otherwise burn the whole padded budget
        t_frames = int(jax.device_get(self._stage("duration")(
            self.ttv_vars, jnp.asarray(x_ids), jnp.asarray(tone),
            jnp.asarray(lang), x_len, prompt.mel_ttv, mel_len,
            jnp.float32(length_scale)))[0])
        t_voc = t_frames if exact else _bucket(t_frames)
        w2v_pred, pred_lf0, frame_lengths, frame_mask, x_frame, codes_out = acoustic(
            *args, out_budget=2 * t_voc, top_k=top_k, mode=mode
        )

        if return_intermediates:
            # the vocode jit donates its w2v/f0 buffers, and with the
            # duration pre-pass the slices below are full-extent (may alias
            # the donated buffer): materialize host copies BEFORE the call
            inter_host = dict(
                x_frame=np.asarray(x_frame)[:, :t_frames],
                codes=np.asarray(codes_out)[:, :t_frames],
                w2v=np.asarray(w2v_pred)[:, :t_frames],
                lf0=np.asarray(pred_lf0)[:, : 4 * t_frames],
                frame_lengths=t_frames,
            )
        wav = self._stage("vocode")(
            self.vocoder_params,
            w2v_pred[:, :t_voc],
            frame_mask[:, :t_voc],
            prompt.mel_pair,
            pred_lf0[:, : 4 * t_voc, None],
            jnp.float32(noise_scale_vc),
            jax.random.PRNGKey(seed + 1),
            jnp.float32(denoise_ratio),
        )

        if ratio != 1.0:
            up = self._stage("sr")(self.speechsr_params, wav)
            wav = np.asarray(up)[0, : int(320 * t_frames * ratio), 0]
        else:
            wav = np.asarray(wav)[0, : 320 * t_frames, 0]

        peak = np.abs(wav).max()
        out = (wav / max(peak, 1e-8) * 0.999).astype(np.float32)
        if return_intermediates:
            return out, inter_host
        return out

    def tts_stream(
        self,
        text: str,
        prompt_audio: Optional[np.ndarray] = None,
        denoise_ratio: float = 0.0,
        noise_scale_vc: float = 0.333,
        length_scale: float = 1.0,
        seed: int = 1234,
        top_k: int = 0,
        use_plm: bool = True,
        prompt: Optional[PromptFeatures] = None,
        chunk_frames: int = 200,
        halo_frames: int = 32,
        output_sr: int = 16000,
        sr_halo: int = 512,
    ):
        """Streaming TTS: yields float32 wav chunks (4 s of audio per chunk at
        the default) as the vocoder decodes them.

        The vocoder is split at the Generator boundary (HierVocoder.vc_latent /
        decode_latent): style, the DiT flows (full-sequence attention) and the
        SourceNetwork run once over the whole utterance; the purely
        convolutional BigVGAN Generator then decodes overlapping chunks with a
        `halo_frames` halo on each side, whose outputs are discarded. The halo
        covers the Generator's receptive field, so the concatenated stream
        matches the non-streaming tts() output except for float accumulation
        at chunk edges (pinned by tests/test_pipeline.py). Chunks are raw tanh
        output (|x| <= 1), NOT peak-normalized — global peak is unknowable
        mid-stream.

        output_sr 24000/48000 applies SpeechSR per chunk with ONE chunk of
        lookahead (the all-conv SR stack needs a right halo of future
        samples), so the first SR'd chunk arrives after the second raw chunk
        decodes; edge pieces are again edge-aligned for exactness.

        Reference equivalent: none (the reference's tts() is monolithic,
        inference_plm.py:103-201); this is a serving capability addition.
        """
        if prompt is None:
            assert prompt_audio is not None, "need prompt_audio or prompt features"
            prompt = self.prepare_prompt(prompt_audio, denoise_ratio)

        ids, tones, langs = text_frontend.process_text(text)
        n = len(ids)
        n_pad = _bucket_text(n)
        x_ids = np.zeros((1, n_pad), np.int32)
        tone = np.zeros((1, n_pad), np.int32)
        lang = np.zeros((1, n_pad), np.int32)
        x_ids[0, :n], tone[0, :n], lang[0, :n] = ids, tones, langs
        x_len = jnp.asarray([n], jnp.int32)
        mel_len = jnp.asarray([prompt.mel_ttv.shape[1]], jnp.int32)

        t_frames = int(jax.device_get(self._stage("duration")(
            self.ttv_vars, jnp.asarray(x_ids), jnp.asarray(tone),
            jnp.asarray(lang), x_len, prompt.mel_ttv, mel_len,
            jnp.float32(length_scale)))[0])
        t_voc = _bucket(t_frames)

        mode = "plm" if use_plm else "prompt"
        given = jnp.zeros((1, 1), jnp.int32)
        w2v_pred, pred_lf0, frame_lengths, frame_mask, _, _ = self._stage(
            "acoustic"
        )(
            self.ttv_vars, self.plm_params, jnp.asarray(x_ids),
            jnp.asarray(tone), jnp.asarray(lang), x_len,
            prompt.mel_ttv, mel_len,
            jnp.float32(length_scale), jax.random.PRNGKey(seed), given,
            out_budget=2 * t_voc, top_k=top_k, mode=mode,
        )

        z, e, g = self._stage("vocode_latent")(
            self.vocoder_params,
            w2v_pred[:, :t_voc],
            frame_mask[:, :t_voc],
            prompt.mel_pair,
            pred_lf0[:, : 4 * t_voc, None],
            jnp.float32(noise_scale_vc),
            jax.random.PRNGKey(seed + 1),
            jnp.float32(denoise_ratio),
        )

        # Decode the full t_voc grid in segments. Plan: chunk 0 ("first") and
        # the tail ("last") are edge-aligned; interior chunks need their full
        # [start-h, start+ck+h) window inside [0, t_voc) (dynamic_slice would
        # silently clamp an overrun), so the tail segment absorbs up to
        # ck+h-1 extra frames. All interior chunks share ONE executable with
        # a traced start offset.
        ck, h = chunk_frames, halo_frames
        assert ck >= h, "chunk_frames must be >= halo_frames (interior slices)"
        if t_voc <= ck + h:
            segments = [("full", 0, t_voc)]
        else:
            s = ck
            starts = []
            while s + ck + h <= t_voc:
                starts.append(s)
                s += ck
            segments = ([("first", 0, ck)]
                        + [("mid", x, ck) for x in starts]
                        + [("last", s, t_voc - s)])

        def raw_chunks():
            emitted = 0
            for kind, start, length in segments:
                if kind == "full":
                    dec = self._stage(f"vocode_dec:full:{ck}:{h}")
                    out = dec(self.vocoder_params, z, e, g)
                elif kind == "first":
                    dec = self._stage(f"vocode_dec:first:{ck}:{h}")
                    out = dec(self.vocoder_params, z[:, : ck + h],
                              e[:, : 4 * (ck + h)], g)
                elif kind == "mid":
                    dec = self._stage(f"vocode_dec:mid:{ck}:{h}")
                    out = dec(self.vocoder_params, z, e, g, jnp.int32(start))
                else:  # last
                    dec = self._stage(f"vocode_dec:last:{length}:{h}")
                    out = dec(self.vocoder_params, z[:, start - h:],
                              e[:, 4 * (start - h):], g)
                chunk = np.asarray(out)[0, :, 0]
                take = min(len(chunk), 320 * t_frames - emitted)
                if take <= 0:
                    break
                emitted += take
                yield chunk[:take].astype(np.float32)

        if self._check_output_sr(output_sr) == 1.0:
            yield from raw_chunks()
            return
        hs = sr_halo

        def sr_piece(mid, left, right):
            kind = ("full" if left is None and right is None else
                    "first" if left is None else
                    "last" if right is None else "mid")
            parts = [p for p in (left, mid, right) if p is not None]
            x = jnp.asarray(np.concatenate(parts))[None, :, None]
            fn = self._stage(f"sr_chunk:{kind}:{len(mid)}:{hs}")
            return np.asarray(fn(self.speechsr_params, x))[0, :, 0]

        prev, prev_left = None, None
        for r in raw_chunks():
            if prev is not None:
                if len(r) < hs:
                    # a too-short final raw chunk can't supply a full right
                    # halo (the SR stack's receptive field): absorb it into
                    # the previous piece, emitted edge-aligned at the end
                    # (round-2 ADVICE #5)
                    prev = np.concatenate([prev, r])
                    continue
                yield sr_piece(prev, prev_left, r[:hs])
                prev_left = prev[-hs:]
            prev = r
        if prev is not None:
            yield sr_piece(prev, prev_left, None)

    def tts_batch(
        self,
        texts: list,
        prompt_audio: Optional[np.ndarray] = None,
        prompt: Optional[PromptFeatures] = None,
        prompts: Optional[list] = None,
        **kw,
    ) -> list:
        """Batched request path: pad all texts to one bucket, run the acoustic
        and vocoder stages at B=len(texts), slice per-utterance wavs.

        Prompt modes (the zero-shot serving shapes):
          - `prompt`/`prompt_audio`: ONE prompt shared across the batch
            (many texts per enrolled speaker);
          - `prompts`: one PromptFeatures PER ROW (multi-speaker traffic in
            one device call). All rows must share the padded prompt-mel
            length — use prepare_prompt(bucket=True) so distinct speakers
            land on a common grid. Per-row style pairs are cached on the
            PromptFeatures and fed through the vocoder directly, so each
            row's audio is the same as its individual tts() call (the style
            pooling runs at each prompt's own length, never at a batch max).

        Unknown kwargs raise (rather than silently producing different audio
        than the equivalent tts() call — e.g. a dropped output_sr)."""
        supported = {"denoise_ratio", "noise_scale_vc", "length_scale",
                     "seed", "top_k", "use_plm", "output_sr"}
        unknown = set(kw) - supported
        if unknown:
            raise ValueError(
                f"tts_batch does not support kwargs {sorted(unknown)}; "
                "use tts() for per-request options")
        output_sr = kw.get("output_sr", 16000)
        ratio = self._check_output_sr(output_sr)
        b = len(texts)
        if prompts is not None:
            if prompt is not None or prompt_audio is not None:
                raise ValueError("pass either `prompts` (per-row) or a shared "
                                 "`prompt`/`prompt_audio`, not both")
            if len(prompts) != b:
                raise ValueError(f"{len(prompts)} prompts for {b} texts")
            f_lens = {int(p.mel_ttv.shape[1]) for p in prompts}
            if len(f_lens) != 1:
                raise ValueError(
                    "per-row prompts must share the padded prompt-mel length "
                    f"(got {sorted(f_lens)}); prepare_prompt(bucket=True) "
                    "puts speakers on a common 1 s grid")
        elif prompt is None:
            assert prompt_audio is not None
            prompt = self.prepare_prompt(prompt_audio, kw.get("denoise_ratio", 0.0))
        seqs = [text_frontend.process_text(t) for t in texts]
        n_max = max(len(s[0]) for s in seqs)
        n_pad = _bucket_text(n_max)
        x_ids = np.zeros((b, n_pad), np.int32)
        tone = np.zeros((b, n_pad), np.int32)
        lang = np.zeros((b, n_pad), np.int32)
        lens = np.zeros((b,), np.int32)
        for i, (ids, tn, lg) in enumerate(seqs):
            n = len(ids)
            x_ids[i, :n], tone[i, :n], lang[i, :n], lens[i] = ids, tn, lg, n
        length_scale = kw.get("length_scale", 1.0)
        seed = kw.get("seed", 1234)

        if prompts is not None:
            mel_ttv = jnp.concatenate([p.mel_ttv for p in prompts], axis=0)
        else:
            mel_ttv = jnp.tile(prompt.mel_ttv, (b, 1, 1))
        mel_len = jnp.full((b,), mel_ttv.shape[1], jnp.int32)
        # duration pre-pass sizes the shared batch bucket from the longest
        # predicted utterance (see tts())
        t_pred = np.asarray(jax.device_get(self._stage("duration")(
            self.ttv_vars, jnp.asarray(x_ids), jnp.asarray(tone),
            jnp.asarray(lang), jnp.asarray(lens), mel_ttv, mel_len,
            jnp.float32(length_scale))))
        t_voc = _bucket(int(t_pred.max()))
        w2v_pred, pred_lf0, frame_lengths, frame_mask, _, _ = self._stage("acoustic")(
            self.ttv_vars, self.plm_params, jnp.asarray(x_ids),
            jnp.asarray(tone), jnp.asarray(lang), jnp.asarray(lens),
            mel_ttv, mel_len, jnp.float32(length_scale),
            jax.random.PRNGKey(seed), jnp.zeros((1, 1), jnp.int32),
            out_budget=2 * t_voc, top_k=kw.get("top_k", 0),
            mode="plm" if kw.get("use_plm", True) else "prompt",
        )
        t_frames = t_pred
        if prompts is not None:
            # per-row cached style pairs -> (B, 2, C) through the vocoder
            g_pair = jnp.concatenate(
                [self.prompt_style(p) for p in prompts], axis=0)
            wav = self._stage("vocode_style")(
                self.vocoder_params, w2v_pred[:, :t_voc],
                frame_mask[:, :t_voc], g_pair, pred_lf0[:, : 4 * t_voc, None],
                jnp.float32(kw.get("noise_scale_vc", 0.333)),
                jax.random.PRNGKey(seed + 1),
                jnp.float32(kw.get("denoise_ratio", 0.0)),
            )
        else:
            # one shared prompt: the 2-row [orig; denoised] mel pair yields a
            # (1, C) style vector that broadcasts over the batch inside the
            # vocoder
            wav = self._stage("vocode")(
                self.vocoder_params, w2v_pred[:, :t_voc],
                frame_mask[:, :t_voc], prompt.mel_pair,
                pred_lf0[:, : 4 * t_voc, None],
                jnp.float32(kw.get("noise_scale_vc", 0.333)),
                jax.random.PRNGKey(seed + 1),
                jnp.float32(kw.get("denoise_ratio", 0.0)),
            )
        if ratio != 1.0:
            wav = self._stage("sr")(self.speechsr_params, wav)
        wav = np.asarray(wav)
        outs = []
        for i in range(b):
            w = wav[i, : int(320 * int(t_frames[i]) * ratio), 0]
            peak = np.abs(w).max()
            outs.append((w / max(peak, 1e-8) * 0.999).astype(np.float32))
        return outs

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
        src_f0: Optional[np.ndarray] = None,
        trg_f0: Optional[np.ndarray] = None,
        return_intermediates: bool = False,
    ):
        """Voice conversion (inference_vc.py): source w2v + speaker-normalized
        f0, target style. src_f0/trg_f0 (Hz @200 Hz frame rate, 0=unvoiced)
        override the built-in YIN tracker — for sidecar f0 or parity harnesses."""
        t_s = len(source_audio)
        pad = (t_s // 1280 + 1) * 1280 - t_s
        src = np.pad(source_audio, (0, pad))

        if "vc_front" not in self._jits:
            def _vc_front(w2v_p, src_pad, src_plain, trg):
                w2v = w2v_model.apply({"params": w2v_p}, src_pad)
                return w2v, yin_f0(src_plain), yin_f0(trg)

            self._jits["vc_front"] = jax.jit(_vc_front)
        # w2v features with reflect-pad 40 (inference_vc.py:93, extract_w2v.py)
        src_pad = np.pad(src, (40, 40), mode="reflect")
        w2v, f0_d, t_f0_d = self._jits["vc_front"](
            w2v_params, jnp.asarray(src_pad)[None], jnp.asarray(src)[None],
            jnp.asarray(target_audio)[None],
        )
        f0 = (np.asarray(src_f0, np.float32).copy() if src_f0 is not None
              else np.array(f0_d)[0])
        t_f0 = (np.asarray(trg_f0, np.float32) if trg_f0 is not None
                else np.asarray(t_f0_d)[0])
        t_frames = w2v.shape[1]
        ii = f0 != 0
        jj = t_f0 != 0
        if ii.any() and jj.any():
            f0[ii] = (f0[ii] - f0[ii].mean()) / max(f0[ii].std(), 1e-6)
            f0[ii] = np.clip(f0[ii] * t_f0[jj].std() + t_f0[jj].mean(), 0, None)
        denorm_lf0 = np.log(f0 + 1.0)

        t_t = len(target_audio)
        pad_t = (t_t // 1600 + 1) * 1600 - t_t
        padded_t = np.pad(target_audio, (0, pad_t))
        if denoise_ratio > 0 and self.denoiser is not None:
            den = self.denoise(padded_t)[:t_t]
        else:
            den = target_audio
        pair = np.stack([target_audio, den[:t_t]], axis=0)
        trg_mel = self._stage("mel")(jnp.asarray(pair))

        mask = jnp.ones((1, t_frames, 1), jnp.float32)
        lf0 = jnp.asarray(denorm_lf0[: 4 * t_frames], jnp.float32)
        if lf0.shape[0] < 4 * t_frames:
            lf0 = jnp.pad(lf0, (0, 4 * t_frames - lf0.shape[0]))
        # the vocode jit donates its w2v buffer: materialize the copy the
        # return_intermediates contract needs BEFORE the call
        w2v_host = np.asarray(w2v) if return_intermediates else None
        wav = self._stage("vocode")(
            self.vocoder_params, w2v, mask, trg_mel, lf0[None, :, None],
            jnp.float32(noise_scale_vc), jax.random.PRNGKey(seed),
            jnp.float32(denoise_ratio),
        )
        if self._check_output_sr(output_sr) != 1.0:
            wav = self._stage("sr")(self.speechsr_params, wav)
        wav = np.asarray(wav)[0, :, 0]
        peak = np.abs(wav).max()
        out = (wav / max(peak, 1e-8) * 0.999).astype(np.float32)
        if return_intermediates:
            return out, dict(
                w2v=w2v_host, lf0=denorm_lf0, t_frames=t_frames,
            )
        return out


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
