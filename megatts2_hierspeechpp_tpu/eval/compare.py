"""Evaluation utilities: mel-L1 / waveform comparison against reference outputs.

Implements the BASELINE.md acceptance metric — mel-spectrogram L1 between two
waveforms (e.g. our synthesis vs the reference's golden wavs in
/root/reference/results/) — plus SNR-style waveform diffs.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.ops.stft import mel_spectrogram_fixed


def mel_l1(wav_a: np.ndarray, wav_b: np.ndarray, sr: int = 16000) -> float:
    """Mean absolute log-mel difference; wavs are trimmed to the common length.

    Framing (n_fft/hop/win/fmax) scales with sr so 24 k/48 k comparisons (e.g.
    SpeechSR outputs) keep the reference's 80 ms window / 20 ms hop contract
    instead of silently reusing 16 k framing with an 8 kHz-capped filterbank."""
    scale = sr / 16000  # 24 kHz -> 1.5: still integral framing (1920/480)
    n_fft, hop = 1280 * scale, 320 * scale
    assert n_fft == int(n_fft) and hop == int(hop), f"unsupported rate {sr}"
    n = min(len(wav_a), len(wav_b))
    a = jnp.asarray(wav_a[:n], jnp.float32)[None]
    b = jnp.asarray(wav_b[:n], jnp.float32)[None]
    kw = dict(sr=sr, n_fft=int(n_fft), hop=int(hop),
              win_length=int(n_fft), fmax=8000.0 * scale)
    mel_a = mel_spectrogram_fixed(a, **kw)
    mel_b = mel_spectrogram_fixed(b, **kw)
    return float(jnp.mean(jnp.abs(mel_a - mel_b)))


def waveform_metrics(wav_a: np.ndarray, wav_b: np.ndarray) -> Dict[str, float]:
    n = min(len(wav_a), len(wav_b))
    a, b = wav_a[:n].astype(np.float64), wav_b[:n].astype(np.float64)
    diff = a - b
    denom = np.sum(b**2) + 1e-12
    return {
        "max_abs_diff": float(np.abs(diff).max()) if n else float("nan"),
        "rms_diff": float(np.sqrt(np.mean(diff**2))),
        "snr_db": float(10 * np.log10(denom / (np.sum(diff**2) + 1e-12))),
        "corr": float(
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        ),
    }


def main():
    import argparse

    import jax

    # host-side metric tool: seconds on CPU vs minutes of tunnel compile on
    # the axon TPU backend; must run before any backend initialization
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from scipy.io import wavfile

    p = argparse.ArgumentParser(description="Compare two wavs (mel L1 + SNR)")
    p.add_argument("wav_a")
    p.add_argument("wav_b")
    args = p.parse_args()

    def load(path):
        sr, data = wavfile.read(path)
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        return sr, data

    sr_a, a = load(args.wav_a)
    sr_b, b = load(args.wav_b)
    if sr_a != sr_b:
        # upsample the lower-rate wav with the kaiser-sinc AA resampler so
        # cross-rate comparisons (e.g. SpeechSR 48k output vs its 16k input)
        # share one framing
        from math import gcd

        from megatts2_hierspeechpp_tpu.ops.resample import (
            downsample1d,
            upsample1d,
        )

        lo_is_a = sr_a < sr_b
        lo, hi = (sr_a, sr_b) if lo_is_a else (sr_b, sr_a)
        g = gcd(hi, lo)
        up_f, down_f = hi // g, lo // g  # e.g. 24k vs 16k -> up 3, down 2
        wav_lo = a if lo_is_a else b
        x = jnp.asarray(wav_lo, jnp.float32)[None, :, None]
        if up_f > 1:
            x = upsample1d(x, ratio=up_f)
        if down_f > 1:
            x = downsample1d(x, ratio=down_f)
        up = np.asarray(x)[0, :, 0]
        a, b = (up, b) if lo_is_a else (a, up)
        sr_a = sr_b = hi
    out = {"mel_l1": mel_l1(a, b, sr=sr_a)}
    out.update(waveform_metrics(a, b))
    import json

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
