"""MP-SENet denoiser (MPNet): magnitude mask + phase decoder over compressed STFT.

Parity with /root/reference/denoiser/{generator.py,conformer.py}: DenseEncoder
(dilated dense conv2d blocks with InstanceNorm+PReLU), 4 TSConformerBlocks
(time conformer + freq conformer), MaskDecoder (ConvTranspose2d + learnable
sigmoid, beta=2) and PhaseDecoder (atan2 over two conv heads). Config:
denoiser/config.json (dense_channel 64, n_fft 400, hop 100, compress 0.3).

Layout: (B, T, F, C) channels-last. Quirk preserved for checkpoint parity: the
reference feeds (N, T, C) tensors to torch MultiheadAttention with
batch_first=False, so attention actually mixes axis 0 (batch*freq for the time
conformer); we replicate that exact contraction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.basic import Dense, LayerNorm
from megatts2_hierspeechpp_tpu.nn.conv import Conv1d, Conv2d, Dtype


class InstanceNorm2d(nn.Module):
    """torch InstanceNorm2d(affine=True): per-sample, per-channel over (H, W)."""

    channels: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, H, W, C)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return y * scale + bias


class PReLU(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = self.param("alpha", nn.initializers.constant(0.25), (self.channels,))
        return jnp.where(x >= 0, x, a * x)


class DenseBlock(nn.Module):
    """4 dilated conv2d stages over concatenated skip features."""

    channels: int
    depth: int = 4
    kernel: tuple = (3, 3)
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        skip = x
        out = x
        for i in range(self.depth):
            dil = 2**i
            pad = ((self.kernel[0] * dil - dil) // 2, (self.kernel[1] - 1) // 2)
            y = Conv2d(
                self.channels, self.kernel, dilation=(dil, 1), padding=pad,
                dtype=self.dtype, name=f"conv_{i}",
            )(skip)
            y = InstanceNorm2d(self.channels, name=f"norm_{i}")(y)
            out = PReLU(self.channels, name=f"act_{i}")(y)
            skip = jnp.concatenate([out, skip], axis=-1)
        return out


class DenseEncoder(nn.Module):
    channels: int = 64
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = Conv2d(self.channels, (1, 1), dtype=self.dtype, name="conv1")(x)
        y = InstanceNorm2d(self.channels, name="norm1")(y)
        y = PReLU(self.channels, name="act1")(y)
        y = DenseBlock(self.channels, dtype=self.dtype, name="dense")(y)
        y = Conv2d(
            self.channels, (1, 3), stride=(1, 2), dtype=self.dtype, name="conv2"
        )(y)
        y = InstanceNorm2d(self.channels, name="norm2")(y)
        y = PReLU(self.channels, name="act2")(y)
        return y


def _attn_dense(q, k, v):
    """q pre-scaled; q/k/v: (L, N, H, Hd) -> (L, N, H, Hd)."""
    scores = jnp.einsum(
        "qnhd,knhd->nhqk", q, k, precision=jax.lax.Precision.HIGHEST
    )
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "nhqk,knhd->qnhd", p, v, precision=jax.lax.Precision.HIGHEST
    )


def _attn_q_chunked(q, k, v, chunk: int):
    """Query-chunked attention, checkpointed per chunk.

    Each chunk sees the FULL key axis, so every softmax row is complete and
    the result equals `_attn_dense` exactly (same einsums, same reductions) —
    no online-softmax bookkeeping needed. What changes is memory: the
    (N, H, L, L) score/probability tensors never materialize, and
    jax.checkpoint makes the backward recompute them one (N, H, chunk, L)
    slab at a time. This is what lets the denoiser train at the reference's
    B=8 x 2 s segments on one 16 GB chip: the dense attention backward of a
    SINGLE TSConformerBlock at (L=321, N=1608) wants ~33 GB (measured via
    AOT compile, BASELINE.md r4) — block-level remat cannot help because one
    block already exceeds HBM."""
    import functools

    l = q.shape[0]
    pad = (-l) % chunk
    qp = jnp.pad(q, ((0, pad),) + ((0, 0),) * (q.ndim - 1))
    qc = qp.reshape(-1, chunk, *q.shape[1:])
    body = functools.partial(jax.checkpoint, prevent_cse=False)(_attn_dense)
    out = jax.lax.map(lambda qq: body(qq, k, v), qc)
    return out.reshape(-1, *q.shape[1:])[:l]


class TorchMHA(nn.Module):
    """torch nn.MultiheadAttention with packed in_proj; applied with
    batch_first=False semantics on (L, N, E) inputs.

    attn_chunk: if set, use the q-chunked (exact) attention — the training
    memory path; None keeps the single-einsum dense form (inference)."""

    dim: int
    n_heads: int
    dtype: Dtype | None = None
    attn_chunk: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        l, n, e = x.shape
        h, hd = self.n_heads, self.dim // self.n_heads
        w = self.param("in_proj_weight", nn.initializers.lecun_normal(), (3 * e, e))
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        qkv = jnp.einsum("lne,fe->lnf", x, w, precision=jax.lax.Precision.HIGHEST) + b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = hd**-0.5
        # heads over E; batch axis is N; sequence axis is L
        q = q.reshape(l, n, h, hd) * scale
        k = k.reshape(l, n, h, hd)
        v = v.reshape(l, n, h, hd)
        if self.attn_chunk is not None and l > self.attn_chunk:
            att = _attn_q_chunked(q, k, v, self.attn_chunk)
        else:
            att = _attn_dense(q, k, v)
        att = att.reshape(l, n, e)
        return Dense(self.dim, dtype=self.dtype, name="out_proj")(att)


class BatchNorm1d(nn.Module):
    """Inference-mode BatchNorm1d over the channel axis of (B, T, C) using
    running statistics (loaded from the reference checkpoint); training mode
    uses batch statistics and updates the running buffers."""

    channels: int
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        mean_v = self.variable("batch_stats", "mean",
                               lambda: jnp.zeros((self.channels,)))
        var_v = self.variable("batch_stats", "var",
                              lambda: jnp.ones((self.channels,)))
        if train:
            mean = jnp.mean(x, axis=(0, 1))
            var = jnp.mean(jnp.square(x - mean), axis=(0, 1))
            n = x.shape[0] * x.shape[1]
            unbiased = var * n / max(n - 1, 1)
            mean_v.value = (1 - self.momentum) * mean_v.value + self.momentum * mean
            var_v.value = (1 - self.momentum) * var_v.value + self.momentum * unbiased
        else:
            mean, var = mean_v.value, var_v.value
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class FeedForwardModule(nn.Module):
    dim: int
    mult: int = 4
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x):
        y = LayerNorm(name="norm")(x)
        y = Dense(self.dim * self.mult, dtype=self.dtype, name="fc1")(y)
        y = jax.nn.silu(y)
        y = Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return y


class ConformerConvModule(nn.Module):
    dim: int
    expansion: int = 2
    kernel: int = 31
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inner = self.dim * self.expansion
        y = LayerNorm(name="norm")(x)
        y = Conv1d(inner * 2, 1, dtype=self.dtype, name="pw1")(y)
        a, b = y[..., :inner], y[..., inner:]
        y = a * jax.nn.sigmoid(b)  # GLU over channels
        y = Conv1d(
            inner, self.kernel, padding=(self.kernel - 1) // 2, groups=inner,
            dtype=self.dtype, name="dw",
        )(y)
        y = BatchNorm1d(inner, name="bn")(y, train=train)
        y = jax.nn.silu(y)
        y = Conv1d(self.dim, 1, dtype=self.dtype, name="pw2")(y)
        return y


class ConformerBlock(nn.Module):
    dim: int
    n_heads: int = 4
    dtype: Dtype | None = None
    attn_chunk: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + 0.5 * FeedForwardModule(self.dim, dtype=self.dtype, name="ffm1")(x)
        y = LayerNorm(name="attn_norm")(x)
        x = x + TorchMHA(self.dim, self.n_heads, dtype=self.dtype,
                         attn_chunk=self.attn_chunk, name="attn")(y)
        x = x + ConformerConvModule(self.dim, dtype=self.dtype, name="ccm")(x, train)
        x = x + 0.5 * FeedForwardModule(self.dim, dtype=self.dtype, name="ffm2")(x)
        return LayerNorm(name="post_norm")(x)


class TSConformerBlock(nn.Module):
    """Time conformer then frequency conformer over (B, T, F, C)."""

    dim: int
    dtype: Dtype | None = None
    attn_chunk: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, f, c = x.shape
        # time: reference view (b*f, t, c)
        y = x.transpose(0, 2, 1, 3).reshape(b * f, t, c)
        y = ConformerBlock(self.dim, dtype=self.dtype,
                           attn_chunk=self.attn_chunk, name="time")(y, train) + y
        # freq: (b*t, f, c)
        y = y.reshape(b, f, t, c).transpose(0, 2, 1, 3).reshape(b * t, f, c)
        y = ConformerBlock(self.dim, dtype=self.dtype,
                           attn_chunk=self.attn_chunk, name="freq")(y, train) + y
        return y.reshape(b, t, f, c)


class LearnableSigmoid2d(nn.Module):
    features: int
    beta: float = 2.0

    @nn.compact
    def __call__(self, x):
        slope = self.param("slope", nn.initializers.ones, (self.features,))
        return self.beta * jax.nn.sigmoid(slope * x)


class MaskDecoder(nn.Module):
    channels: int = 64
    n_freqs: int = 201
    beta: float = 2.0
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x):
        y = DenseBlock(self.channels, dtype=self.dtype, name="dense")(x)
        # ConvTranspose2d (1,3) stride (1,2) over the freq axis
        b, t, f, c = y.shape
        y2 = y.reshape(b * t, f, c)
        from megatts2_hierspeechpp_tpu.nn.conv import conv_transpose1d_op

        kernel = self.param(
            "up_kernel", nn.initializers.lecun_normal(), (3, c, self.channels)
        )
        bias = self.param("up_bias", nn.initializers.zeros, (self.channels,))
        y2 = conv_transpose1d_op(y2, kernel, bias, stride=2, padding=0)
        y = y2.reshape(b, t, -1, self.channels)
        y = Conv2d(1, (1, 1), dtype=self.dtype, name="conv1")(y)
        y = InstanceNorm2d(1, name="norm")(y)
        y = PReLU(1, name="act")(y)
        y = Conv2d(1, (1, 1), dtype=self.dtype, name="conv2")(y)
        y = y[..., 0]  # (B, T, F')
        y = LearnableSigmoid2d(self.n_freqs, beta=self.beta, name="lsigmoid")(y)
        return y


class PhaseDecoder(nn.Module):
    channels: int = 64
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x):
        y = DenseBlock(self.channels, dtype=self.dtype, name="dense")(x)
        b, t, f, c = y.shape
        y2 = y.reshape(b * t, f, c)
        from megatts2_hierspeechpp_tpu.nn.conv import conv_transpose1d_op

        kernel = self.param(
            "up_kernel", nn.initializers.lecun_normal(), (3, c, self.channels)
        )
        bias = self.param("up_bias", nn.initializers.zeros, (self.channels,))
        y2 = conv_transpose1d_op(y2, kernel, bias, stride=2, padding=0)
        y = y2.reshape(b, t, -1, self.channels)
        y = InstanceNorm2d(self.channels, name="norm")(y)
        y = PReLU(self.channels, name="act")(y)
        yr = Conv2d(1, (1, 1), dtype=self.dtype, name="conv_r")(y)
        yi = Conv2d(1, (1, 1), dtype=self.dtype, name="conv_i")(y)
        return jnp.arctan2(yi[..., 0], yr[..., 0])


class MPNet(nn.Module):
    dense_channel: int = 64
    num_tsblocks: int = 4
    n_freqs: int = 201
    beta: float = 2.0
    dtype: Dtype | None = None
    # Training-memory knobs (param tree unchanged either way, so checkpoints
    # port): `remat` rematerializes each TSConformerBlock in the backward;
    # `attn_chunk` switches TorchMHA to the exact q-chunked attention. BOTH
    # are needed for the reference's B=8 x 2 s segments on one 16 GB chip:
    # a SINGLE block's dense attention backward wants ~33 GB (measured via
    # AOT compile — the (N, H, L, L) probs and their gradients), so remat
    # alone cannot fit it.
    remat: bool = False
    attn_chunk: int | None = None

    @nn.compact
    def __call__(self, noisy_mag, noisy_pha, train: bool = False):
        """noisy_mag/pha: (B, T, F) -> (denoised_mag, denoised_pha)."""
        block_cls = (nn.remat(TSConformerBlock, static_argnums=(2,))
                     if self.remat else TSConformerBlock)
        x = jnp.stack([noisy_mag, noisy_pha], axis=-1)  # (B, T, F, 2)
        x = DenseEncoder(self.dense_channel, dtype=self.dtype, name="dense_encoder")(x)
        for i in range(self.num_tsblocks):
            x = block_cls(self.dense_channel, dtype=self.dtype,
                          attn_chunk=self.attn_chunk, name=f"ts_{i}")(x, train)
        mask = MaskDecoder(self.dense_channel, self.n_freqs, self.beta,
                           dtype=self.dtype, name="mask_decoder")(x)
        mag = noisy_mag * mask
        pha = PhaseDecoder(self.dense_channel, dtype=self.dtype,
                           name="phase_decoder")(x)
        return mag, pha
