"""Zero-shot TTS inference CLI (inference_plm.py equivalent).

Usage:
  python -m megatts2_hierspeechpp_tpu.cli.infer_tts \
    --input_txt texts.txt --input_prompt prompt.wav --output_dir out \
    --ckpt_ttv ttv_G.pth --ckpt_plm P1.pth --ckpt_voc hierspeechpp.pth \
    [--ckpt_sr speechsr48k/G_100000.pth] [--ckpt_denoiser g_best] \
    [--output_sr 48000] [--denoise_ratio 0.8]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from scipy.io import wavfile

from megatts2_hierspeechpp_tpu.infer.pipeline import build_pipeline_from_reference_ckpts


def load_wav_16k(path: str) -> np.ndarray:
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data[:, 0]
    if sr != 16000:
        # kaiser-windowed sinc resample to 16 kHz
        from math import gcd

        import jax.numpy as jnp

        from megatts2_hierspeechpp_tpu.ops.resample import downsample1d, upsample1d

        g = gcd(sr, 16000)
        up, down = 16000 // g, sr // g
        x = jnp.asarray(data)[None, :, None]
        if up > 1:
            x = upsample1d(x, up)
        if down > 1:
            x = downsample1d(x, down)
        data = np.asarray(x)[0, :, 0]
    return data


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_txt", required=True)
    p.add_argument("--input_prompt", required=True)
    p.add_argument("--output_dir", default="output")
    p.add_argument("--ckpt_ttv", required=True)
    p.add_argument("--ckpt_plm", required=True)
    p.add_argument("--ckpt_voc", required=True)
    p.add_argument("--ckpt_sr", default=None)
    p.add_argument("--ckpt_denoiser", default=None)
    p.add_argument("--output_sr", type=int, default=16000)
    p.add_argument("--denoise_ratio", type=float, default=0.0)
    p.add_argument("--noise_scale_vc", type=float, default=0.333)
    p.add_argument("--length_scale", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--batch", type=int, default=1,
                   help="batch N texts per device call (16 kHz output only)")
    p.add_argument("--stream", action="store_true",
                   help="stream each utterance to disk chunk-by-chunk as the "
                        "vocoder decodes it (16/24/48 kHz; raw gain, no peak "
                        "normalization; SR'd streams add one chunk of "
                        "lookahead latency)")
    p.add_argument("--stream_chunk_frames", type=int, default=200)
    args = p.parse_args()

    from megatts2_hierspeechpp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    pipe = build_pipeline_from_reference_ckpts(
        args.ckpt_ttv, args.ckpt_plm, args.ckpt_voc,
        speechsr_ckpt=args.ckpt_sr, denoiser_ckpt=args.ckpt_denoiser,
        speechsr_rate=args.output_sr if args.output_sr != 16000 else 48000,
    )
    prompt = load_wav_16k(args.input_prompt)
    # prompt features (mel + optional denoise) computed once, shared by requests
    feats = pipe.prepare_prompt(prompt, args.denoise_ratio)

    with open(args.input_txt, encoding="utf-8") as f:
        lines = [l.strip() for l in f if l.strip()]

    os.makedirs(args.output_dir, exist_ok=True)
    kw = dict(
        denoise_ratio=args.denoise_ratio, noise_scale_vc=args.noise_scale_vc,
        length_scale=args.length_scale, seed=args.seed, top_k=args.top_k,
    )
    if args.stream:
        import time

        for i, text in enumerate(lines):
            path = os.path.join(args.output_dir, f"{i:03d}.wav")
            t0 = time.perf_counter()
            parts, t_first = [], None
            for chunk in pipe.tts_stream(
                text, prompt=feats, output_sr=args.output_sr,
                chunk_frames=args.stream_chunk_frames, **kw
            ):
                if t_first is None:
                    t_first = time.perf_counter() - t0
                parts.append(chunk)
            wav = np.concatenate(parts)
            wavfile.write(path, args.output_sr,
                          (wav * 32767.0).astype(np.int16))
            print(f"{path}  first-chunk {t_first*1e3:.0f} ms "
                  f"({len(parts)} chunks, {len(wav)/args.output_sr:.1f} s)")
        return
    if args.batch > 1 and args.output_sr == 16000:
        for i0 in range(0, len(lines), args.batch):
            chunk = lines[i0 : i0 + args.batch]
            wavs = pipe.tts_batch(chunk, prompt=feats, **kw)
            for j, wav in enumerate(wavs):
                out = (wav * 32767.0).astype(np.int16)
                path = os.path.join(args.output_dir, f"{i0 + j:03d}.wav")
                wavfile.write(path, args.output_sr, out)
                print(path)
    else:
        for i, text in enumerate(lines):
            wav = pipe.tts(text, prompt=feats, output_sr=args.output_sr, **kw)
            out = (wav * 32767.0).astype(np.int16)
            path = os.path.join(args.output_dir, f"{i:03d}.wav")
            wavfile.write(path, args.output_sr, out)
            print(path)


if __name__ == "__main__":
    main()
