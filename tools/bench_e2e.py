"""Honest end-to-end serving benchmark: text -> 16 kHz wav through the real
TTSPipeline (the same code path cli/infer_tts.py uses), random weights.

Methodology: `pipeline.tts` returns host numpy, so wall-clock around it
includes the device->host readback — the only trustworthy completion barrier
over the axon tunnel (see bench.py:_best_of). Warmup calls absorb all
per-bucket compiles first; timing then reports best-of-N single-utterance
latency (serving) and tts_batch throughput (offline).

Also re-measures the feature-extraction pipeline (mel + linear spec + YIN f0)
with an explicit readback barrier.

Prints one JSON line (not the driver bench -- see bench.py for that).
"""
import json
import time

import numpy as np


def build_pipeline(dtype=None):
    import jax
    import jax.numpy as jnp

    from megatts2_hierspeechpp_tpu.data import text as text_frontend
    from megatts2_hierspeechpp_tpu.infer.pipeline import TTSPipeline
    from megatts2_hierspeechpp_tpu.models.plm import ProsodyLM
    from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR
    from megatts2_hierspeechpp_tpu.models.ttv import TTVModel
    from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder

    rng = jax.random.PRNGKey(0)
    kw = {} if dtype is None else {"dtype": dtype}
    ttv = TTVModel(n_vocab=text_frontend.N_VOCAB, n_tone=text_frontend.N_TONE,
                   n_language=text_frontend.N_LANGUAGE, **kw)
    b, n, t = 1, 4, 16
    ttv_vars = jax.jit(ttv.init)(
        {"params": rng},
        jnp.zeros((b, n), jnp.int32), jnp.zeros((b, n), jnp.int32),
        jnp.zeros((b, n), jnp.int32), jnp.full((b,), n, jnp.int32),
        jnp.zeros((b, t, 1024)), jnp.full((b,), t, jnp.int32),
        jnp.zeros((b, t, 80)), jnp.full((b,), t, jnp.int32),
        jnp.zeros((b, 4 * t)), jnp.full((b,), 4 * t, jnp.int32),
        jnp.full((b, n), 2 * t / n, jnp.float32),
        jnp.zeros((b, 24, 80)), jnp.full((b,), 24, jnp.int32),
    )
    plm = ProsodyLM(**kw)
    plm_params = jax.jit(plm.init)(
        {"params": rng}, jnp.zeros((1, 8, 256)), jnp.zeros((1, 8), jnp.int32),
        jnp.full((1,), 8, jnp.int32),
    )["params"]
    voc = HierVocoder(**kw)
    voc_vars = jax.jit(voc.init)(
        rng, jnp.zeros((1, 8, 80)), jnp.zeros((1, 8, 1024)),
        jnp.ones((1, 8, 1)), jnp.zeros((1, 32, 1)),
    )
    sr = SpeechSR(rate_num=3, rate_den=1, **kw)
    sr_params = jax.jit(sr.init)(rng, jnp.zeros((1, 320, 1)))["params"]
    return TTSPipeline(
        ttv=ttv, ttv_vars=ttv_vars, plm=plm, plm_params=plm_params,
        vocoder=voc, vocoder_params={"params": voc_vars["params"]},
        speechsr=sr, speechsr_params=sr_params,
    )


def main():
    import jax
    import jax.numpy as jnp

    from megatts2_hierspeechpp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    on_tpu = jax.default_backend() == "tpu"
    pipe = build_pipeline(dtype=jnp.bfloat16 if on_tpu else None)

    # ~64 phonemes like the round-1 e2e config; random duration weights
    # predict ~1 frame/phone, so length_scale approximates the trained
    # models' ~20 frames/phone (8-20 s utterances)
    text = " ".join(["sil"] + ["zh ang1 h ao3 n in2 sp"] * 10 + ["sil"])
    ls = 10.0
    prompt = np.random.default_rng(0).uniform(-0.3, 0.3, 48000).astype(np.float32)
    pf = pipe.prepare_prompt(prompt)

    # ---- warm all shape buckets (compiles happen here) ----
    wav = pipe.tts(text, prompt=pf, seed=0, output_sr=16000, length_scale=ls)
    audio_s = len(wav) / 16000.0

    # ---- B=1 serving latency ----
    best = float("inf")
    for seed in range(5):
        t0 = time.perf_counter()
        wav = pipe.tts(text, prompt=pf, seed=seed, output_sr=16000,
                       length_scale=ls)
        best = min(best, time.perf_counter() - t0)
    out = {
        "e2e_b1_latency_ms": round(best * 1e3, 1),
        "e2e_b1_audio_s": round(audio_s, 2),
        "e2e_b1_rtf": round(audio_s / best, 1),
    }

    # ---- B=1 serving at 48 kHz (vocoder + SpeechSR chain) ----
    wav48 = pipe.tts(text, prompt=pf, seed=0, output_sr=48000,
                     length_scale=ls)  # warm the SR bucket
    audio_s48 = len(wav48) / 48000.0
    best = float("inf")
    for seed in range(5):
        t0 = time.perf_counter()
        wav48 = pipe.tts(text, prompt=pf, seed=seed, output_sr=48000,
                         length_scale=ls)
        best = min(best, time.perf_counter() - t0)
    out["e2e_b1_48k_latency_ms"] = round(best * 1e3, 1)
    out["e2e_b1_48k_rtf"] = round(audio_s48 / best, 1)

    # ---- batched offline throughput ----
    texts = [text] * 8
    outs = pipe.tts_batch(texts, prompt_audio=prompt, seed=0,
                          length_scale=ls)  # warm
    total_audio = sum(len(w) for w in outs) / 16000.0
    best = float("inf")
    for seed in range(3):
        t0 = time.perf_counter()
        outs = pipe.tts_batch(texts, prompt_audio=prompt, seed=seed,
                              length_scale=ls)
        best = min(best, time.perf_counter() - t0)
    out["e2e_b8_rtf"] = round(total_audio / best, 1)
    out["e2e_b8_audio_s"] = round(total_audio, 2)

    # ---- cross-prompt batched serving: 8 DISTINCT speakers, one device call
    # (zero-shot multi-speaker traffic; VERDICT r2 #3 measured row) ----
    rngp = np.random.default_rng(2)
    prompts = [
        pipe.prepare_prompt(
            rngp.uniform(-0.3, 0.3, 48000).astype(np.float32), bucket=True)
        for _ in range(8)
    ]
    outs = pipe.tts_batch(texts, prompts=prompts, seed=0,
                          length_scale=ls)  # warm
    total_audio = sum(len(w) for w in outs) / 16000.0
    best = float("inf")
    for seed in range(3):
        t0 = time.perf_counter()
        outs = pipe.tts_batch(texts, prompts=prompts, seed=seed,
                              length_scale=ls)
        best = min(best, time.perf_counter() - t0)
    out["e2e_b8_multispeaker_rtf"] = round(total_audio / best, 1)
    out["e2e_b8_multispeaker_audio_s"] = round(total_audio, 2)

    # ---- feature pipeline (mel + linear spec + YIN f0), readback barrier ----
    from megatts2_hierspeechpp_tpu.ops import stft as jstft
    from megatts2_hierspeechpp_tpu.ops.f0 import yin_f0

    b, n = 32, 160000  # 32 x 10 s
    wavs = jnp.asarray(
        np.random.default_rng(1).uniform(-0.3, 0.3, (b, n)).astype(np.float32))

    @jax.jit
    def feats(w):
        mel = jstft.mel_spectrogram_fixed(w)
        spec = jstft.linear_spectrogram(w)
        f0 = yin_f0(w)
        return mel, spec, f0

    r = feats(wavs)
    jax.tree.map(np.asarray, r)  # warm + readback
    n_iter, best = 5, float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            r = feats(wavs)
        jax.tree.map(np.asarray, r)
        best = min(best, time.perf_counter() - t0)
    out["feature_pipeline_audio_s_per_s"] = round(b * n / 16000.0 * n_iter / best)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
