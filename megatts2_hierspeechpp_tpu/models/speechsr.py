"""Speech super-resolution heads (16k -> 24k / 48k).

Parity with /root/reference/speechsr48k/speechsr.py and speechsr24k/speechsr.py
(near-identical; ratio 3 vs 1.5, one extra discriminator resolution): raw-wave
input, WN conv_pre, linear interpolation upsample, 3 anti-aliased SnakeBeta AMP
blocks, conv_post -> tanh. In-repo reference checkpoints: speechsr24k/G_340000,
speechsr48k/G_100000.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.activations import AASnakeBeta
from megatts2_hierspeechpp_tpu.nn.conv import Conv1d, Dtype, WNConv1d
from megatts2_hierspeechpp_tpu.nn.resblocks import AMPBlock


def interp_linear(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) on (B, T, C).

    Source positions are computed EXACTLY via the rational ratio out_len/t
    (decompose i = q*num + s; pos = q*den + table[s]) instead of
    (i+0.5)*scale-0.5 in fp32 — the fp32 form accumulates index error ~i*eps
    (a quarter sample at 80 s of 48 kHz!) and makes the result depend on the
    absolute offset, which breaks chunked/streamed equivalence. torch computes
    these indices in double; the exact table matches it."""
    b, t, c = x.shape
    if out_len == t:
        return x
    from math import gcd

    g = gcd(out_len, t)
    num, den = out_len // g, t // g
    # pos(i) = (i + 0.5) * den/num - 0.5; i = q*num + s -> q*den + pos_s[s]
    pos_s = (np.arange(num) + 0.5) * den / num - 0.5  # float64, one period
    lo_s = np.floor(pos_s).astype(np.int64)
    w_s = pos_s - lo_s
    i = jnp.arange(out_len)
    q, s = i // num, i % num
    lo = q * den + jnp.asarray(lo_s, jnp.int32)[s]
    w = jnp.asarray(w_s, jnp.float32)[s]
    # edge clamp (same semantics as clip(pos, 0, t-1))
    w = jnp.where(lo < 0, 0.0, w)
    lo = jnp.clip(lo, 0, t - 1)
    hi = jnp.minimum(lo + 1, t - 1)
    w = w[None, :, None].astype(x.dtype)
    return x[:, lo, :] * (1 - w) + x[:, hi, :] * w


class SpeechSR(nn.Module):
    """Generator; rate_num/rate_den = 3/1 for 48k, 3/2 for 24k."""

    upsample_initial_channel: int = 32
    rate_num: int = 3
    rate_den: int = 1
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, 1) 16 kHz waveform -> (B, T*rate, 1)."""
        ch = self.upsample_initial_channel
        y = WNConv1d(ch, 7, padding=3, dtype=self.dtype, name="conv_pre")(x)
        out_len = int(y.shape[1] * self.rate_num // self.rate_den)
        y = interp_linear(y, out_len)
        xs = None
        for j, (k, d) in enumerate(
            zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
        ):
            r = AMPBlock(ch, k, tuple(d), dtype=self.dtype, name=f"resblocks_{j}")(y)
            xs = r if xs is None else xs + r
        y = xs / len(self.resblock_kernel_sizes)
        y = AASnakeBeta(ch, alpha_logscale=True, name="activation_post")(y)
        y = Conv1d(1, 7, padding=3, use_bias=False, dtype=self.dtype, name="conv_post")(y)
        return jnp.tanh(y)
