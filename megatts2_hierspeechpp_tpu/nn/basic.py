"""Small shared building blocks: Dense/LayerNorm/activations with torch-compatible
semantics and channels-last layout."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.conv import Dtype, _precision_for

LRELU_SLOPE = 0.1


class Dense(nn.Module):
    """torch.nn.Linear equivalent; kernel stored (In, Out)."""

    features: int
    use_bias: bool = True
    dtype: Dtype | None = None
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = jnp.dot(x, kernel, precision=_precision_for(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis; torch eps default 1e-5.

    Equivalent to the reference's channels-first modules.LayerNorm
    (/root/reference/modules.py:19-31) in our channels-last layout.
    """

    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            y = y + bias
        out_dtype = self.dtype or orig_dtype
        return y.astype(out_dtype)


class Embed(nn.Module):
    """torch.nn.Embedding equivalent; table (N, C)."""

    num_embeddings: int
    features: int
    dtype: Dtype | None = None
    embedding_init: nn.initializers.Initializer = nn.initializers.normal(1.0)

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding", self.embedding_init, (self.num_embeddings, self.features)
        )
        y = jnp.take(table, ids, axis=0)
        if self.dtype is not None:
            y = y.astype(self.dtype)
        return y


def leaky_relu(x: jnp.ndarray, slope: float = LRELU_SLOPE) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=slope)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """torch GELU(approximate='tanh')."""
    return jax.nn.gelu(x, approximate=True)


def fused_add_tanh_sigmoid_multiply(a: jnp.ndarray, b: jnp.ndarray, n: int) -> jnp.ndarray:
    """WaveNet gate on channels-last tensors: split 2C into tanh/sigmoid halves.

    Reference: commons.fused_add_tanh_sigmoid_multiply (/root/reference/commons.py:107).
    XLA fuses this chain into the surrounding convs on TPU.
    """
    s = a + b
    t_act = jnp.tanh(s[..., :n])
    s_act = jax.nn.sigmoid(s[..., n:])
    return t_act * s_act
