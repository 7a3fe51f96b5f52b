"""Streaming-serving latency: time-to-first-audio + per-chunk cadence.

Measures `TTSPipeline.tts_stream` (the serving flagship for interactive
traffic): wall-clock to the FIRST yielded chunk (duration pre-pass + acoustic
stage + first Generator chunk), then the cadence of subsequent chunks, at
16 kHz and through the SpeechSR 48 kHz tail. Chunk arrival is a host numpy
yield, so each timestamp is readback-honest (CLAUDE.md methodology).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_stream.py
       [--chunk-frames 100] [--iters 3]
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk-frames", type=int, default=100,
                    help="Generator frames per chunk (100 = 2 s of audio)")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from megatts2_hierspeechpp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax

    from tools.bench_e2e import build_pipeline

    on_tpu = jax.default_backend() == "tpu"
    pipe = build_pipeline(dtype=jnp.bfloat16 if on_tpu else None)

    text = " ".join(["sil"] + ["zh ang1 h ao3 n in2 sp"] * 10 + ["sil"])
    ls = 10.0
    prompt = np.random.default_rng(0).uniform(-0.3, 0.3, 48000).astype(np.float32)
    pf = pipe.prepare_prompt(prompt)

    out = {"backend": jax.default_backend(), "chunk_frames": args.chunk_frames}
    for sr in (16000, 48000):
        # warm all buckets (compiles happen here)
        for _ in pipe.tts_stream(text, prompt=pf, seed=0, output_sr=sr,
                                 length_scale=ls,
                                 chunk_frames=args.chunk_frames):
            pass
        first, gaps, total_audio, total_s = float("inf"), [], 0.0, float("inf")
        for seed in range(args.iters):
            t0 = time.perf_counter()
            last = t0
            audio = 0.0
            it_gaps = []
            for i, chunk in enumerate(
                pipe.tts_stream(text, prompt=pf, seed=seed, output_sr=sr,
                                length_scale=ls,
                                chunk_frames=args.chunk_frames)):
                now = time.perf_counter()
                if i == 0:
                    first = min(first, now - t0)
                else:
                    it_gaps.append(now - last)
                last = now
                audio += len(chunk) / sr
            total_audio = audio
            total_s = min(total_s, last - t0)
            gaps = it_gaps
        tag = f"{sr // 1000}k"
        out[f"first_chunk_ms_{tag}"] = round(first * 1e3, 1)
        out[f"chunk_gap_ms_p50_{tag}"] = round(
            float(np.percentile(gaps, 50)) * 1e3, 1) if gaps else None
        out[f"chunk_gap_ms_max_{tag}"] = round(
            float(np.max(gaps)) * 1e3, 1) if gaps else None
        out[f"stream_rtf_{tag}"] = round(total_audio / total_s, 1)
        out[f"audio_s_{tag}"] = round(total_audio, 2)
        chunk_audio_s = args.chunk_frames * 320 / 16000
        out[f"realtime_ok_{tag}"] = bool(
            gaps and max(gaps) < chunk_audio_s)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
