"""Statistical validation of the YIN f0 extractor."""
import numpy as np

import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.ops.f0 import yin_f0


def _harmonic(freqs, sr=16000, t=1.0, harmonics=4):
    """Piecewise-constant-pitch harmonic signal."""
    n = int(sr * t)
    f_curve = np.repeat(freqs, n // len(freqs))[:n]
    phase = 2 * np.pi * np.cumsum(f_curve) / sr
    sig = sum((1.0 / h) * np.sin(h * phase) for h in range(1, harmonics + 1))
    return sig.astype(np.float32), f_curve


def test_recovers_constant_pitch():
    for f in [80.0, 150.0, 220.0, 440.0]:
        sig, _ = _harmonic([f])
        f0 = np.asarray(yin_f0(jnp.asarray(sig)[None]))[0]
        mid = f0[20:-20]
        voiced = mid[mid > 0]
        assert len(voiced) > 0.9 * len(mid)
        err = np.abs(voiced - f) / f
        assert np.median(err) < 0.02, (f, np.median(err))


def test_tracks_pitch_changes():
    sig, f_curve = _harmonic([120.0, 200.0, 160.0])
    f0 = np.asarray(yin_f0(jnp.asarray(sig)[None]))[0]
    target = f_curve[::80][: len(f0)]
    # ignore transition regions
    ok = 0
    tot = 0
    for i in range(10, len(f0) - 10):
        if abs(target[i] - target[i - 5]) < 1 and abs(target[i] - target[i + 5]) < 1:
            tot += 1
            if f0[i] > 0 and abs(f0[i] - target[i]) / target[i] < 0.05:
                ok += 1
    assert ok / tot > 0.85, ok / tot


def test_silence_and_noise_mostly_unvoiced():
    rng = np.random.default_rng(0)
    silence = np.zeros((1, 16000), np.float32)
    f0_sil = np.asarray(yin_f0(jnp.asarray(silence)))[0]
    assert (f0_sil == 0).mean() > 0.95

    noise = rng.standard_normal((1, 16000)).astype(np.float32) * 0.1
    f0_noise = np.asarray(yin_f0(jnp.asarray(noise)))[0]
    assert (f0_noise == 0).mean() > 0.6


def test_output_shape_contract():
    sig = np.zeros((2, 3200), np.float32)
    f0 = yin_f0(jnp.asarray(sig))
    assert f0.shape == (2, 40)  # 200 Hz: 4 samples per 50 Hz w2v frame
