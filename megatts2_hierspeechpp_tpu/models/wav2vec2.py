"""wav2vec2 (facebook/mms-300m / xls-r-300m) feature encoder, inference-only.

The reference wraps HF Wav2Vec2ForPreTraining frozen and takes
hidden_states[7] — the output of the 7th transformer layer — as the 1024-d
50 Hz semantic feature (/root/reference/hierspeechpp_speechsynthesizer.py:21-51,
extract_w2v.py). The model is frozen there (requires_grad=False), so this is a
pure-inference re-implementation: conv feature extractor (layer-norm variant),
feature projection, convolutional relative positions, N pre-norm (stable
layer-norm) transformer layers, truncated at `output_layer`.

Weight-norm on the positional conv is fused at conversion time. Only the first
`output_layer` transformer layers are instantiated/ported — 7/24 of the
encoder FLOPs, a deliberate TPU-side saving over running all 24 layers.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.basic import Dense, LayerNorm
from megatts2_hierspeechpp_tpu.nn.conv import Conv1d, Dtype, _precision_for


class ConvFeatureExtractor(nn.Module):
    """7 conv blocks, layer-norm variant (conv_bias=True, LN over channels)."""

    conv_dim: Sequence[int] = (512,) * 7
    kernels: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    strides: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T) waveform -> (B, T', 512)."""
        y = x[:, :, None]
        for i, (c, k, s) in enumerate(zip(self.conv_dim, self.kernels, self.strides)):
            y = Conv1d(c, k, stride=s, dtype=self.dtype, name=f"conv_{i}")(y)
            y = LayerNorm(name=f"ln_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
        return y


class W2VAttention(nn.Module):
    dim: int
    n_heads: int
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.n_heads
        hd = self.dim // h
        b, t, _ = x.shape
        q = Dense(self.dim, dtype=self.dtype, name="q_proj")(x) * (hd**-0.5)
        k = Dense(self.dim, dtype=self.dtype, name="k_proj")(x)
        v = Dense(self.dim, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, t, h, hd)
        k = k.reshape(b, t, h, hd)
        v = v.reshape(b, t, h, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            precision=_precision_for(self.dtype))
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                       precision=_precision_for(self.dtype)).reshape(b, t, self.dim)
        return Dense(self.dim, dtype=self.dtype, name="out_proj")(o)


class W2VEncoderLayer(nn.Module):
    """Stable-layer-norm (pre-norm) transformer layer."""

    dim: int
    n_heads: int
    ffn_dim: int
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = LayerNorm(name="attn_ln")(x)
        x = x + W2VAttention(self.dim, self.n_heads, dtype=self.dtype, name="attn")(y)
        y = LayerNorm(name="ffn_ln")(x)
        y = Dense(self.ffn_dim, dtype=self.dtype, name="ff1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = Dense(self.dim, dtype=self.dtype, name="ff2")(y)
        return x + y


class Wav2Vec2(nn.Module):
    hidden_size: int = 1024
    n_heads: int = 16
    ffn_dim: int = 4096
    output_layer: int = 7  # reference uses hidden_states[7]
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    conv_dim: tuple = (512,) * 7
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T) raw 16 kHz waveform -> (B, T/320, hidden)."""
        feats = ConvFeatureExtractor(conv_dim=self.conv_dim, dtype=self.dtype,
                                     name="feature_extractor")(x)
        y = LayerNorm(name="fp_ln")(feats)
        y = Dense(self.hidden_size, dtype=self.dtype, name="fp_proj")(y)

        # convolutional positions: conv k=128 groups=16, pad 64, crop last, gelu
        pos = Conv1d(
            self.hidden_size, self.pos_conv_kernel, padding=self.pos_conv_kernel // 2,
            groups=self.pos_conv_groups, dtype=self.dtype, name="pos_conv",
        )(y)
        if self.pos_conv_kernel % 2 == 0:  # HF SamePadLayer drops the last frame
            pos = pos[:, :-1]
        pos = jax.nn.gelu(pos, approximate=False)
        y = y + pos

        for i in range(self.output_layer):
            y = W2VEncoderLayer(
                self.hidden_size, self.n_heads, self.ffn_dim, dtype=self.dtype,
                name=f"layer_{i}",
            )(y)
        return y


class GroupNormConvFeatureExtractor(nn.Module):
    """7 conv blocks, group-norm variant (HF *base* SSL models: conv_bias
    False, per-channel GroupNorm on block 0 only, all blocks gelu)."""

    conv_dim: Sequence[int] = (512,) * 7
    kernels: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    strides: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T) waveform -> (B, T', conv_dim[-1])."""
        y = x[:, :, None]
        for i, (c, k, s) in enumerate(zip(self.conv_dim, self.kernels, self.strides)):
            y = Conv1d(c, k, stride=s, use_bias=False, dtype=self.dtype,
                       name=f"conv_{i}")(y)
            if i == 0:
                # HF GroupNorm(groups=C, channels=C): per-channel over time
                y = nn.GroupNorm(num_groups=c, epsilon=1e-5, name="gn_0")(y)
            y = jax.nn.gelu(y, approximate=False)
        return y


class HubertEncoderLayer(nn.Module):
    """Post-norm transformer layer (do_stable_layer_norm=False variant)."""

    dim: int
    n_heads: int
    ffn_dim: int
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = LayerNorm(name="attn_ln")(
            x + W2VAttention(self.dim, self.n_heads, dtype=self.dtype,
                             name="attn")(x)
        )
        y = Dense(self.ffn_dim, dtype=self.dtype, name="ff1")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = Dense(self.dim, dtype=self.dtype, name="ff2")(y)
        return LayerNorm(name="ffn_ln")(x + y)


class Hubert(nn.Module):
    """HF HubertModel *base* variant (e.g. TencentGameMate/chinese-hubert-base,
    the `feature_extractor/cnhubert.py` model GPT-SoVITS' dataset stage 2
    expects — absent from the reference repo, making
    /root/reference/prepare_datasets/2-get-hubert-wav2k.py dead code there).

    Differences from Wav2Vec2 above (the mms-300m *large* variant):
    group-norm conv extractor (first block only, no conv bias), post-norm
    encoder layers, and the encoder LayerNorm applied after the positional
    convolution *before* the layer stack. Inference-only; returns
    last_hidden_state at 50 Hz."""

    hidden_size: int = 768
    n_heads: int = 12
    ffn_dim: int = 3072
    n_layers: int = 12
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    conv_dim: tuple = (512,) * 7
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T) raw 16 kHz waveform -> (B, T/320, hidden)."""
        feats = GroupNormConvFeatureExtractor(conv_dim=self.conv_dim,
                                              dtype=self.dtype,
                                              name="feature_extractor")(x)
        y = LayerNorm(name="fp_ln")(feats)
        y = Dense(self.hidden_size, dtype=self.dtype, name="fp_proj")(y)

        pos = Conv1d(
            self.hidden_size, self.pos_conv_kernel, padding=self.pos_conv_kernel // 2,
            groups=self.pos_conv_groups, dtype=self.dtype, name="pos_conv",
        )(y)
        if self.pos_conv_kernel % 2 == 0:  # HF SamePadLayer drops the last frame
            pos = pos[:, :-1]
        pos = jax.nn.gelu(pos, approximate=False)
        y = LayerNorm(name="enc_ln")(y + pos)

        for i in range(self.n_layers):
            y = HubertEncoderLayer(
                self.hidden_size, self.n_heads, self.ffn_dim, dtype=self.dtype,
                name=f"layer_{i}",
            )(y)
        return y
