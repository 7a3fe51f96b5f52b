"""Global style/speaker encoder over mel frames.

Parity: /root/reference/styleencoder.py:33-91 — spectral 1x1 convs with Mish,
two Conv1dGLU temporal blocks, one self-attention layer, 1x1 fc, masked
temporal average pool -> (B, C) style vector.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.attention import MultiHeadAttention
from megatts2_hierspeechpp_tpu.nn.basic import Dense, mish
from megatts2_hierspeechpp_tpu.nn.conv import Conv1d, Dtype


class Conv1dGLU(nn.Module):
    out_channels: int
    kernel_size: int = 5
    p_dropout: float = 0.1
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        residual = x
        y = Conv1d(
            2 * self.out_channels,
            self.kernel_size,
            padding=2,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y1, y2 = y[..., : self.out_channels], y[..., self.out_channels :]
        y = y1 * jax.nn.sigmoid(y2)
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        return residual + y


class StyleEncoder(nn.Module):
    in_dim: int = 80
    hidden_dim: int = 256
    out_dim: int = 256
    dtype: Dtype | None = None
    p_dropout: float = 0.1

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """x: (B, T, in_dim) mel; mask: (B, T, 1) float -> (B, out_dim)."""
        y = Dense(self.hidden_dim, dtype=self.dtype, name="spectral_0")(x)
        y = mish(y)
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = Dense(self.hidden_dim, dtype=self.dtype, name="spectral_1")(y)
        y = mish(y)
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = y * mask

        y = Conv1dGLU(self.hidden_dim, dtype=self.dtype, name="temporal_0")(
            y, deterministic=deterministic
        )
        y = Conv1dGLU(self.hidden_dim, dtype=self.dtype, name="temporal_1")(
            y, deterministic=deterministic
        )
        y = y * mask

        attn_mask = (mask[:, None, :, 0:1] * mask[:, None, None, :, 0]).astype(bool)
        a = MultiHeadAttention(
            self.hidden_dim,
            self.hidden_dim,
            2,
            window_size=None,
            p_dropout=self.p_dropout,
            dtype=self.dtype,
            name="slf_attn",
        )(y, y, attn_mask, deterministic=deterministic)
        a = nn.Dropout(self.p_dropout)(a, deterministic=deterministic)
        y = y + a

        y = Dense(self.out_dim, dtype=self.dtype, name="fc")(y)

        # temporal average pool — replicates the reference exactly
        # (styleencoder.py:83-91): the sum runs over *all* frames (padded
        # positions included; with fully-masked attention rows those carry the
        # uniform-attention mean) while the denominator is the true length.
        denom = jnp.sum(mask, axis=1)  # (B, 1)
        w = jnp.sum(y, axis=1) / denom
        return w
