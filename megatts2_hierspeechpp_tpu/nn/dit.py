"""DiT-style adaLN-zero transformer blocks and the coupling-flow layers built
from them.

Parity targets (/root/reference/modules.py:346-488):
  - modulate(x, shift, scale), DiTConVBlock (LayerNorm w/o affine, timm-style
    fused-qkv attention, conv-FFN with GELU-tanh, adaLN-zero 6-way modulation)
  - ResidualCouplingLayer_Transformer_simple (mean-only affine coupling)
  - the Flip permutation between flow steps.
Conditioning g is a per-utterance vector (B, C).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.basic import Dense, LayerNorm, gelu_tanh
from megatts2_hierspeechpp_tpu.nn.conv import Conv1d, Dtype, _precision_for


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, C); shift/scale: (B, C)."""
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class TimmAttention(nn.Module):
    """timm vision_transformer.Attention equivalent: fused qkv, no masking."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, t, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, T, H, D)
        scale = head_dim**-0.5
        attn = jnp.einsum(
            "bqhd,bkhd->bhqk", q * scale, k, precision=_precision_for(self.dtype)
        )
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, v, precision=_precision_for(self.dtype)
        )
        out = out.reshape(b, t, c)
        return Dense(self.dim, dtype=self.dtype, name="proj")(out)


class FFNConv(nn.Module):
    """Conv-FFN of the DiT block (fc1 conv k, GELU-tanh, fc2 1x1)."""

    hidden_features: int
    out_features: int
    kernel: int = 5
    p_dropout: float = 0.1
    dtype: Dtype | None = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, x_mask: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        y = Conv1d(
            self.hidden_features,
            self.kernel,
            padding=(self.kernel - 1) // 2,
            dtype=self.dtype,
            name="fc1",
        )(x)
        y = gelu_tanh(y)
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = Conv1d(self.out_features, 1, dtype=self.dtype, name="fc2")(y * x_mask)
        y = y * x_mask
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        return y


class DiTConVBlock(nn.Module):
    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    kernel: int = 9
    p_dropout: float = 0.1
    dtype: Dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        c: jnp.ndarray,
        x_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: (B, T, C); c: (B, C) conditioning; x_mask: (B, T, 1)."""
        x = x * x_mask
        mod = Dense(6 * self.hidden_size, dtype=self.dtype, name="adaLN_modulation")(
            jax.nn.silu(c)
        )
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp) = jnp.split(
            mod, 6, axis=-1
        )
        norm1 = LayerNorm(epsilon=1e-6, use_scale=False, use_bias=False, name="norm1")
        norm2 = LayerNorm(epsilon=1e-6, use_scale=False, use_bias=False, name="norm2")
        attn_out = TimmAttention(
            self.hidden_size, self.num_heads, dtype=self.dtype, name="attn"
        )(modulate(norm1(x) * x_mask, shift_msa, scale_msa))
        x = x + gate_msa[:, None, :] * attn_out * x_mask
        mlp_out = FFNConv(
            int(self.hidden_size * self.mlp_ratio),
            self.hidden_size,
            kernel=self.kernel,
            p_dropout=self.p_dropout,
            dtype=self.dtype,
            name="mlp",
        )(modulate(norm2(x), shift_mlp, scale_mlp), x_mask, deterministic=deterministic)
        x = x + gate_mlp[:, None, :] * mlp_out
        return x


class ResidualCouplingLayerTransformer(nn.Module):
    """Mean-only affine coupling with a DiT transformer as the shift network."""

    channels: int
    hidden_channels: int
    n_layers: int
    attention_heads: int = 2
    kernel: int = 5
    p_dropout: float = 0.1
    dtype: Dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: jnp.ndarray,
        reverse: bool = False,
        deterministic: bool = True,
    ):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, dtype=self.dtype, name="pre")(x0) * x_mask
        for i in range(self.n_layers):
            h = DiTConVBlock(
                self.hidden_channels,
                self.attention_heads,
                mlp_ratio=4.0,
                kernel=self.kernel,
                p_dropout=self.p_dropout,
                dtype=self.dtype,
                name=f"enc_{i}",
            )(h, g, x_mask, deterministic=deterministic)
        m = Conv1d(half, 1, dtype=self.dtype, name="post")(h) * x_mask

        if not reverse:
            x1 = (m + x1) * x_mask
            return jnp.concatenate([x0, x1], axis=-1), jnp.zeros(x.shape[0], x.dtype)
        x1 = (x1 - m) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlockTransformer(nn.Module):
    """n_flows x (DiT coupling + Flip), with a SiLU-MLP conditioning block.

    Parity: hierspeechpp_speechsynthesizer.ResidualCouplingBlock_Transformer
    (/root/reference/hierspeechpp_speechsynthesizer.py:53-88).
    """

    channels: int
    hidden_channels: int
    n_layers: int = 3
    n_flows: int = 4
    gin_channels: int = 256
    attention_heads: int = 2
    dtype: Dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: jnp.ndarray,
        reverse: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: (B, T, C); g: (B, Gin) global conditioning vector."""
        c = Dense(4 * self.hidden_channels, dtype=self.dtype, name="cond_0")(g)
        c = Dense(self.hidden_channels, dtype=self.dtype, name="cond_1")(
            jax.nn.silu(c)
        )

        flows = [
            ResidualCouplingLayerTransformer(
                self.channels,
                self.hidden_channels,
                self.n_layers,
                attention_heads=self.attention_heads,
                dtype=self.dtype,
                name=f"flow_{i}",
            )
            for i in range(self.n_flows)
        ]
        if not reverse:
            for flow in flows:
                x, _ = flow(x, x_mask, c, reverse=False, deterministic=deterministic)
                x = jnp.flip(x, axis=-1)  # Flip over channels
            return x
        for flow in reversed(flows):
            x = jnp.flip(x, axis=-1)
            x = flow(x, x_mask, c, reverse=True, deterministic=deterministic)
        return x
