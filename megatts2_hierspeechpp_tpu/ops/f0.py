"""f0 extraction: vectorized YIN at 200 Hz (YAAPT-compatible framing).

The reference extracts f0 with amfm_decompy pYAAPT (frame 20 ms, hop 5 ms,
f0_max 1100, zero-padded by half a frame; /root/reference/extract_f0.py:26-41,
data_utils.py:122-140), yielding 4 samples per w2v frame with 0 at unvoiced
frames. Classical YAAPT is a multi-stage dynamic-programming tracker; exact
numerical parity is not meaningful, so this is a YIN (cumulative mean
normalized difference) extractor with the same framing/voicing contract,
validated statistically (tests/test_f0.py). Training pipelines may also consume
precomputed reference .hf0.npy sidecars unchanged.

Everything is one batched jit graph: framing by gather, the difference
function via cumulative sums + one batched FFT autocorrelation (MXU/FFT fused),
then an argmin + parabolic refinement.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("sr", "hop", "fmin", "fmax", "win"))
def yin_f0(
    x: jnp.ndarray,
    sr: int = 16000,
    hop: int = 80,
    fmin: float = 60.0,
    fmax: float = 1100.0,
    win: int = 400,
    threshold: float = 0.15,
) -> jnp.ndarray:
    """x: (B, T) -> f0 (B, T // hop), 0 where unvoiced."""
    b, t = x.shape
    tau_max = int(sr / fmin) + 1  # 267 for 60 Hz
    tau_min = max(int(sr / fmax), 2)  # 14 for 1100 Hz
    seg = win + tau_max

    pad = 160  # half a 20 ms frame, matching the reference's zero pad
    xp = jnp.pad(x, ((0, 0), (pad, pad + seg)))
    n_frames = t // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(seg)[None, :]
    frames = xp[:, idx]  # (B, F, seg)

    # d(tau) = p(0) + p(tau) - 2 * ac(tau), over window of length `win`
    csum2 = jnp.cumsum(jnp.square(frames), axis=-1)
    csum2 = jnp.pad(csum2, ((0, 0), (0, 0), (1, 0)))
    p0 = csum2[..., win] - csum2[..., 0]
    taus = jnp.arange(tau_max)
    p_tau = (
        jnp.take_along_axis(csum2, (taus + win)[None, None, :].repeat(n_frames, 1), axis=-1)
        - jnp.take_along_axis(csum2, taus[None, None, :].repeat(n_frames, 1), axis=-1)
    )

    nfft = 1
    while nfft < 2 * seg:
        nfft *= 2
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    win_spec = jnp.fft.rfft(frames[..., :win], n=nfft, axis=-1)
    ac_full = jnp.fft.irfft(win_spec.conj() * spec, n=nfft, axis=-1)
    ac = ac_full[..., :tau_max]

    d = p0[..., None] + p_tau - 2 * ac  # (B, F, tau_max)
    d = jnp.maximum(d, 0.0)

    # cumulative mean normalized difference
    csum_d = jnp.cumsum(d[..., 1:], axis=-1)
    cmndf = jnp.concatenate(
        [jnp.ones_like(d[..., :1]),
         d[..., 1:] * taus[1:] / jnp.maximum(csum_d, 1e-9)],
        axis=-1,
    )
    valid = (taus >= tau_min)[None, None, :]
    cmndf = jnp.where(valid, cmndf, jnp.inf)

    # YIN step 4: first tau under threshold, descended to its local minimum
    # (cmndf stops decreasing), else the global argmin
    cmndf_next = jnp.concatenate(
        [cmndf[..., 1:], jnp.full_like(cmndf[..., :1], jnp.inf)], axis=-1
    )
    under = (cmndf < threshold) & (cmndf <= cmndf_next)
    first_under = jnp.argmax(under, axis=-1)
    any_under = jnp.any(under, axis=-1)
    best = jnp.argmin(cmndf, axis=-1)
    tau_star = jnp.where(any_under, first_under, best)

    # parabolic interpolation around tau_star
    tm1 = jnp.clip(tau_star - 1, 0, tau_max - 1)
    tp1 = jnp.clip(tau_star + 1, 0, tau_max - 1)
    d0 = jnp.take_along_axis(cmndf, tm1[..., None], axis=-1)[..., 0]
    d1 = jnp.take_along_axis(cmndf, tau_star[..., None], axis=-1)[..., 0]
    d2 = jnp.take_along_axis(cmndf, tp1[..., None], axis=-1)[..., 0]
    denom = d0 + d2 - 2 * d1
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (d0 - d2) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    tau_ref = tau_star + delta

    f0 = sr / jnp.maximum(tau_ref, 1e-3)
    voiced = (d1 < threshold * 2.5) & (f0 >= fmin) & (f0 <= fmax)
    # frames with negligible energy are unvoiced
    energetic = p0 > 1e-6 * win
    f0 = jnp.where(voiced & energetic, f0, 0.0)
    return f0


def log_f0_plus1(f0: jnp.ndarray) -> jnp.ndarray:
    """LF0 convention used throughout the reference: log(f0 + 1)."""
    return jnp.log(f0 + 1.0)
