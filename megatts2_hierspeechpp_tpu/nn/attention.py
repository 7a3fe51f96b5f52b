"""VITS-style relative-position multi-head attention + transformer encoder.

Behavior-parity targets (shapes/masking/eps identical, layout re-designed):
  - attentions.MultiHeadAttention (/root/reference/attentions.py:109-263):
    1x1-conv q/k/v/o projections, optional windowed relative-position bias
    (window_size=4, heads share one table), additive -1e4 masking.
  - attentions.Encoder (/root/reference/attentions.py:13-50): post-norm blocks
    of self-attention + conv-FFN, masks multiplied through.

All activations channels-last (B, T, C); attention contractions run on the MXU.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.basic import Dense, LayerNorm
from megatts2_hierspeechpp_tpu.nn.conv import Conv1d, Dtype, _precision_for

MASK_VALUE = -1e4  # matches the reference's masked_fill value exactly


def _rel_to_abs(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, 2L-1) relative logits -> (B, H, L, L) absolute."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, l * 2 * l)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l + 1, 2 * l - 1)
    return x[:, :, :l, l - 1:]


def _abs_to_rel(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, L) absolute weights -> (B, H, L, 2L-1) relative."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l * l + l * (l - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (l, 0)))
    x = x.reshape(b, h, l, 2 * l)
    return x[:, :, :, 1:]


def _slice_rel_emb(emb: jnp.ndarray, length: int, window_size: int) -> jnp.ndarray:
    """(Hr, 2w+1, D) table -> (Hr, 2L-1, D) centered slice (static shapes)."""
    pad_len = max(length - (window_size + 1), 0)
    start = max((window_size + 1) - length, 0)
    if pad_len > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_len, pad_len), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


class MultiHeadAttention(nn.Module):
    channels: int
    out_channels: int
    n_heads: int
    window_size: Optional[int] = None
    heads_share: bool = True
    dtype: Dtype | None = None
    p_dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        c: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: queries (B, Tq, C); c: keys/values (B, Tk, C);
        attn_mask: (B, 1|H, Tq, Tk) bool or {0,1}."""
        h = self.n_heads
        k_ch = self.channels // h
        q = Dense(self.channels, dtype=self.dtype, name="conv_q")(x)
        k = Dense(self.channels, dtype=self.dtype, name="conv_k")(c)
        v = Dense(self.channels, dtype=self.dtype, name="conv_v")(c)

        b, tq, _ = q.shape
        tk = k.shape[1]
        # (B, H, T, Dk)
        q = q.reshape(b, tq, h, k_ch).transpose(0, 2, 1, 3)
        k = k.reshape(b, tk, h, k_ch).transpose(0, 2, 1, 3)
        v = v.reshape(b, tk, h, k_ch).transpose(0, 2, 1, 3)

        scale = 1.0 / jnp.sqrt(k_ch).astype(q.dtype)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k, precision=_precision_for(self.dtype)
        )

        if self.window_size is not None:
            assert tq == tk, "relative attention needs self-attention"
            n_rel = 1 if self.heads_share else h
            rel_k = self.param(
                "emb_rel_k",
                nn.initializers.normal(k_ch**-0.5),
                (n_rel, 2 * self.window_size + 1, k_ch),
            )
            rel_k_sliced = _slice_rel_emb(rel_k, tk, self.window_size)
            rel_logits = jnp.einsum(
                "bhqd,gmd->bhqm",
                q * scale,
                rel_k_sliced.astype(q.dtype),
                precision=_precision_for(self.dtype),
            )
            scores = scores + _rel_to_abs(rel_logits)

        if attn_mask is not None:
            scores = jnp.where(attn_mask.astype(bool), scores, MASK_VALUE)

        p = jax.nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.p_dropout)(p, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v, precision=_precision_for(self.dtype))

        if self.window_size is not None:
            rel_v = self.param(
                "emb_rel_v",
                nn.initializers.normal(k_ch**-0.5),
                (1 if self.heads_share else h, 2 * self.window_size + 1, k_ch),
            )
            rel_w = _abs_to_rel(p)
            rel_v_sliced = _slice_rel_emb(rel_v, tk, self.window_size)
            out = out + jnp.einsum(
                "bhqm,gmd->bhqd",
                rel_w,
                rel_v_sliced.astype(out.dtype),
                precision=_precision_for(self.dtype),
            )

        out = out.transpose(0, 2, 1, 3).reshape(b, tq, self.channels)
        return Dense(self.out_channels, dtype=self.dtype, name="conv_o")(out)


class FFN(nn.Module):
    """Conv-FFN with torch-style asymmetric 'same' padding (pad_l=(k-1)//2, pad_r=k//2)."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    activation: Optional[str] = None
    causal: bool = False
    dtype: Dtype | None = None

    def _pad(self) -> tuple:
        if self.kernel_size == 1:
            return (0, 0)
        if self.causal:
            return (self.kernel_size - 1, 0)
        return ((self.kernel_size - 1) // 2, self.kernel_size // 2)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, x_mask: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        pad = self._pad()
        y = Conv1d(
            self.filter_channels, self.kernel_size, padding=pad, dtype=self.dtype,
            name="conv_1",
        )(x * x_mask)
        if self.activation == "gelu":
            y = y * jax.nn.sigmoid(1.702 * y)
        else:
            y = jax.nn.relu(y)
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = Conv1d(
            self.out_channels, self.kernel_size, padding=pad, dtype=self.dtype,
            name="conv_2",
        )(y * x_mask)
        return y * x_mask


class Encoder(nn.Module):
    """Post-norm transformer encoder with windowed relative attention."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4
    dtype: Dtype | None = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, x_mask: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """x: (B, T, C); x_mask: (B, T, 1) float."""
        attn_mask = (x_mask[:, None, :, 0:1] * x_mask[:, None, None, :, 0]).astype(bool)
        x = x * x_mask
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                window_size=self.window_size,
                p_dropout=self.p_dropout,
                dtype=self.dtype,
                name=f"attn_{i}",
            )(x, x, attn_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(name=f"norm1_{i}", dtype=self.dtype)(x + y)

            y = FFN(
                self.hidden_channels,
                self.filter_channels,
                self.kernel_size,
                p_dropout=self.p_dropout,
                dtype=self.dtype,
                name=f"ffn_{i}",
            )(x, x_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(name=f"norm2_{i}", dtype=self.dtype)(x + y)
        return x * x_mask
