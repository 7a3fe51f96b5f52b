"""DSP parity tests: STFT/mel vs torch.stft + transformers' filterbank oracle."""
import numpy as np
import torch

import jax.numpy as jnp

from tests import torch_ref
from megatts2_hierspeechpp_tpu.ops import stft as jstft

torch_ref.add_reference_path()


def _rand_audio(b=2, t=16000, seed=0):
    return (np.random.default_rng(seed).uniform(-0.8, 0.8, (b, t))).astype(np.float32)


def test_stft_mag_center_matches_torch():
    y = _rand_audio()
    n_fft, hop = 1280, 320
    yt = torch.stft(
        torch.from_numpy(y),
        n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    ref = (yt.abs() ** 2).numpy().transpose(0, 2, 1)  # (B, F, bins)
    out = np.asarray(jstft.stft_mag(jnp.asarray(y), n_fft, hop, center=True, power=2.0))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-2, rtol=1e-4)


def test_mel_filterbank_htk_matches_transformers():
    from transformers.audio_utils import mel_filter_bank

    fb_ref = mel_filter_bank(
        num_frequency_bins=1280 // 2 + 1,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm=None,
        mel_scale="htk",
    )
    fb = jstft.mel_filterbank(16000, 1280, 80, 0.0, 8000.0, htk=True)
    np.testing.assert_allclose(fb, fb_ref, atol=1e-5, rtol=1e-4)


def test_mel_filterbank_slaney_matches_transformers():
    from transformers.audio_utils import mel_filter_bank

    fb_ref = mel_filter_bank(
        num_frequency_bins=1280 // 2 + 1,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )
    fb = jstft.mel_filterbank(16000, 1280, 80, 0.0, 8000.0, htk=False, slaney_norm=True)
    np.testing.assert_allclose(fb, fb_ref, atol=1e-5, rtol=1e-4)


def test_linear_spectrogram_matches_reference():
    # replicates mel_processing.spectrogram_torch (its torch.stft call uses the
    # pre-2.0 API that current torch rejects): manual (n_fft-hop)/2 reflect pad,
    # center=False, sqrt(|S|^2 + 1e-6)
    y = _rand_audio(b=1, t=6400, seed=1)
    n_fft, hop = 1280, 320
    yp = torch.nn.functional.pad(
        torch.from_numpy(y).unsqueeze(1),
        (int((n_fft - hop) / 2), int((n_fft - hop) / 2)),
        mode="reflect",
    ).squeeze(1)
    spec = torch.stft(
        yp,
        n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft),
        center=False,
        pad_mode="reflect",
        return_complex=True,
    )
    ref = torch.sqrt(spec.abs() ** 2 + 1e-6).numpy().transpose(0, 2, 1)
    out = np.asarray(jstft.linear_spectrogram(jnp.asarray(y), 1280, 320, 1280))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)


def test_mel_spectrogram_fixed_shape_and_torch_stft_parity():
    """Full path: power-2 STFT x HTK fbank -> log(+1e-3), drop last frame."""
    from transformers.audio_utils import mel_filter_bank

    y = _rand_audio(b=2, t=16000, seed=2)
    out = np.asarray(jstft.mel_spectrogram_fixed(jnp.asarray(y)))
    # torch-side oracle
    spec = torch.stft(
        torch.from_numpy(y),
        1280,
        hop_length=320,
        win_length=1280,
        window=torch.hann_window(1280),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    p2 = (spec.abs() ** 2).numpy()  # (B, bins, F)
    fb = mel_filter_bank(
        num_frequency_bins=641,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm=None,
        mel_scale="htk",
    )
    ref = np.log(np.einsum("bkf,km->bfm", p2, fb) + 1e-3)[:, :-1, :]
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)


def test_istft_roundtrip_matches_torch():
    y = _rand_audio(b=1, t=4000, seed=3)
    n_fft, hop = 400, 100
    spec_t = torch.stft(
        torch.from_numpy(y),
        n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    rec_t = torch.istft(
        spec_t, n_fft, hop_length=hop, win_length=n_fft, window=torch.hann_window(n_fft)
    ).numpy()

    spec_j = jstft.stft_complex(jnp.asarray(y), n_fft, hop)
    rec_j = np.asarray(jstft.istft(spec_j, n_fft, hop, n_fft, length=rec_t.shape[-1]))
    assert rec_j.shape == rec_t.shape
    np.testing.assert_allclose(rec_j, rec_t, atol=1e-4, rtol=1e-4)
    # and the roundtrip reproduces the input
    np.testing.assert_allclose(rec_j[0, : y.shape[1]], y[0], atol=1e-4)
