"""Eval/observability utility tests."""
import numpy as np

from megatts2_hierspeechpp_tpu.eval.compare import mel_l1, waveform_metrics
from megatts2_hierspeechpp_tpu.utils.profiling import Throughput


def test_waveform_metrics_identical_and_noisy():
    rng = np.random.default_rng(0)
    a = rng.uniform(-0.5, 0.5, 16000).astype(np.float32)
    m = waveform_metrics(a, a)
    assert m["max_abs_diff"] == 0
    assert m["corr"] > 0.999999
    assert m["snr_db"] > 100

    noisy = a + 0.01 * rng.standard_normal(16000).astype(np.float32)
    m2 = waveform_metrics(a, noisy)
    assert 20 < m2["snr_db"] < 40
    assert m2["corr"] > 0.99


def test_mel_l1_scale():
    rng = np.random.default_rng(1)
    a = rng.uniform(-0.5, 0.5, 16000).astype(np.float32)
    assert mel_l1(a, a) < 1e-6
    b = rng.uniform(-0.5, 0.5, 16000).astype(np.float32)
    assert mel_l1(a, b) > 0.1


def test_throughput_counters():
    t = Throughput()
    t.add(audio_seconds=10.0, tokens=500)
    t.add(audio_seconds=10.0, tokens=500)
    r = t.report()
    assert r["audio_seconds_per_sec"] > 0
    assert r["tokens_per_sec"] > 0
    assert r["steps_per_sec"] > 0


def test_mel_l1_sr_scaled_framing():
    """24k/48k comparisons scale n_fft/hop/fmax with sr (same 80 ms / 20 ms
    contract) instead of silently reusing 16k framing."""
    import numpy as np

    rng = np.random.default_rng(3)
    t = np.arange(48000) / 48000.0
    a48 = (np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(t.size)
           ).astype(np.float32)
    assert mel_l1(a48, a48, sr=48000) < 1e-6
    # identical content at 16k vs 48k framing gives comparable magnitudes:
    # a 3x-framing mismatch would triple the frame count; check frame parity
    # indirectly via a self-vs-noise distance being O(1), not degenerate
    b48 = rng.standard_normal(48000).astype(np.float32) * 0.3
    d = mel_l1(a48, b48, sr=48000)
    assert 0.05 < d < 20.0


def test_mel_l1_24k():
    """24 kHz is a first-class pipeline output rate (in-repo SpeechSR 24k
    checkpoints): framing 1920/480 must be accepted (regression: an
    sr % 16000 == 0 assert rejected it)."""
    import numpy as np

    rng = np.random.default_rng(4)
    a = rng.standard_normal(24000).astype(np.float32) * 0.2
    assert mel_l1(a, a, sr=24000) < 1e-6
    b = rng.standard_normal(24000).astype(np.float32) * 0.2
    assert mel_l1(a, b, sr=24000) > 0.05
