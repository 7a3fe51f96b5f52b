"""STFT / mel-spectrogram / iSTFT ops (jit-friendly, channels-last).

Behavior parity targets:
  - MelSpectrogramFixed (/root/reference/Mels_preprocess.py:8-18): torchaudio
    MelSpectrogram (center=True, reflect pad, power=2, hann periodic window,
    HTK mel scale, no filterbank norm), then log(mel + 0.001), drop last frame.
  - spectrogram_torch (/root/reference/mel_processing.py:51-70): center=False
    with manual (n_fft-hop)/2 reflect pre-pad, magnitude sqrt(pow2+1e-6).
  - spec_to_mel_torch (/root/reference/mel_processing.py:73-82): librosa slaney
    filterbank + log-clamp compression.
  - mag_pha_stft/istft (/root/reference/denoiser/infer.py:13-33): center=True,
    magnitude compression, complex iSTFT with window-sum normalization.

Frames are gathered with a strided reshape and transformed with one batched
rfft; the mel projection is a single (F_bins x n_mels) matmul on the MXU.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    if periodic:
        n = np.arange(win_length)
        return (0.5 - 0.5 * np.cos(2 * np.pi * n / win_length)).astype(np.float32)
    return np.hanning(win_length).astype(np.float32)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    # np.where evaluates both branches: clamp keeps log() off f=0 (warning-free)
    f_log = np.maximum(f, min_log_hz)
    return np.where(f >= min_log_hz, min_log_mel + np.log(f_log / min_log_hz) / logstep, mel)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


@lru_cache(maxsize=32)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: float,
    htk: bool = True,
    slaney_norm: bool = False,
) -> np.ndarray:
    """(n_freqs, n_mels) filterbank.

    htk=True, slaney_norm=False  == torchaudio melscale_fbanks defaults
    htk=False, slaney_norm=True  == librosa.filters.mel defaults
    """
    if fmax is None:
        fmax = sr / 2
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sr / 2, n_freqs)
    to_mel = _hz_to_mel_htk if htk else _hz_to_mel_slaney
    to_hz = _mel_to_hz_htk if htk else _mel_to_hz_slaney
    m_pts = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    f_pts = to_hz(m_pts)

    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if slaney_norm:
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """y: (B, T) already padded -> frames (B, F, n_fft) via gather."""
    b, t = y.shape
    n_frames = 1 + (t - n_fft) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]  # (F, n_fft)
    return y[:, idx]


def stft_mag(
    y: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    center: bool = True,
    power: float = 2.0,
    pad_amount: int | None = None,
) -> jnp.ndarray:
    """y: (B, T) -> (B, F, n_freqs) magnitude^power (note: frames-first layout)."""
    win_length = win_length or n_fft
    window = jnp.asarray(hann_window(win_length))
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    elif pad_amount:
        y = jnp.pad(y, ((0, 0), (pad_amount, pad_amount)), mode="reflect")
    frames = frame_signal(y, n_fft, hop) * window[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)
    mag2 = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if power == 2.0:
        return mag2
    if power == 1.0:
        return jnp.sqrt(mag2)
    return mag2 ** (power / 2.0)


def stft_complex(
    y: jnp.ndarray, n_fft: int, hop: int, win_length: int | None = None,
    center: bool = True,
) -> jnp.ndarray:
    win_length = win_length or n_fft
    window = jnp.asarray(hann_window(win_length))
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(y, n_fft, hop) * window[None, None, :]
    return jnp.fft.rfft(frames, axis=-1)  # (B, F, n_freqs)


def mel_spectrogram_fixed(
    y: jnp.ndarray,
    sr: int = 16000,
    n_fft: int = 1280,
    hop: int = 320,
    win_length: int = 1280,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> jnp.ndarray:
    """Reference MelSpectrogramFixed: log(mel + 1e-3), last frame dropped.

    Returns (B, F-1, n_mels) — frames-first (channels-last) layout.
    """
    p2 = stft_mag(y, n_fft, hop, win_length, center=True, power=2.0)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk=True))
    mel = jnp.einsum("bfk,km->bfm", p2, fb, precision=jax.lax.Precision.HIGHEST)
    mel = jnp.log(mel + 0.001)
    return mel[:, :-1, :]


def linear_spectrogram(
    y: jnp.ndarray, n_fft: int = 1280, hop: int = 320, win_length: int = 1280
) -> jnp.ndarray:
    """Reference spectrogram_torch: center=False, manual (n_fft-hop)/2 reflect pad,
    sqrt(power + 1e-6). Returns (B, F, n_freqs)."""
    pad = (n_fft - hop) // 2
    p2 = stft_mag(y, n_fft, hop, win_length, center=False, power=2.0, pad_amount=pad)
    return jnp.sqrt(p2 + 1e-6)


def spec_to_mel(
    spec: jnp.ndarray, sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> jnp.ndarray:
    """Reference spec_to_mel_torch: slaney filterbank + log clamp(1e-5)."""
    fb = jnp.asarray(
        mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk=False, slaney_norm=True)
    )
    mel = jnp.einsum("bfk,km->bfm", spec, fb, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=1e-5))


def mag_pha_stft(
    y: jnp.ndarray, n_fft: int, hop: int, win_length: int, compress_factor: float = 1.0
):
    """Denoiser front-end: center=True STFT -> compressed magnitude + phase."""
    spec = stft_complex(y, n_fft, hop, win_length, center=True)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-12)
    pha = jnp.arctan2(jnp.imag(spec), jnp.real(spec))
    mag = mag**compress_factor
    return mag, pha


def istft(
    spec: jnp.ndarray, n_fft: int, hop: int, win_length: int, length: int | None = None
) -> jnp.ndarray:
    """Inverse STFT with window-sum normalization (torch.istft center=True parity).

    spec: (B, F, n_freqs) complex -> (B, T).
    Overlap-add runs as a strided scatter expressed with conv_transpose on an
    (n_fft x n_fft) diagonal window kernel — static shapes, TPU-friendly.
    """
    window = jnp.asarray(hann_window(win_length))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window[None, None, :]
    b, f, _ = frames.shape

    # OLA via conv_transpose: input (B, F, n_fft) channels=n_fft, kernel diag(window-free)
    eye = jnp.eye(n_fft, dtype=frames.dtype)[:, :, None]  # (K=n_fft, Cin=n_fft, Cout=1)
    dn = jax.lax.conv_dimension_numbers((b, f, n_fft), eye.shape, ("NWC", "WIO", "NWC"))

    def ola(x):
        return jax.lax.conv_general_dilated(
            x,
            eye,
            window_strides=(1,),
            padding=[(n_fft - 1, n_fft - 1)],
            lhs_dilation=(hop,),
            dimension_numbers=dn,
        )[..., 0]

    y = ola(frames[:, :, ::-1])
    wsq = ola(jnp.broadcast_to((window**2)[None, None, ::-1], frames.shape))
    y = y / jnp.maximum(wsq, 1e-11)
    pad = n_fft // 2
    y = y[:, pad:]
    if length is not None:
        y = y[:, :length]
    else:
        y = y[:, : y.shape[1] - pad]
    return y
