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
    """Mean absolute log-mel difference; wavs are trimmed to the common length."""
    n = min(len(wav_a), len(wav_b))
    a = jnp.asarray(wav_a[:n], jnp.float32)[None]
    b = jnp.asarray(wav_b[:n], jnp.float32)[None]
    mel_a = mel_spectrogram_fixed(a, sr=sr)
    mel_b = mel_spectrogram_fixed(b, sr=sr)
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
    assert sr_a == sr_b, (sr_a, sr_b)
    out = {"mel_l1": mel_l1(a, b, sr=sr_a)}
    out.update(waveform_metrics(a, b))
    import json

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
