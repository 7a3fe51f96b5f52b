"""Snake-family periodic activations (BigVGAN).

Parity with /root/reference/activations.py: Snake(x) = x + sin^2(a*x)/a,
SnakeBeta(x) = x + sin^2(a*x)/b, with optional log-scale parameterization.
Channels-last: alpha/beta broadcast over (B, T, C) via the last axis.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.conv import Dtype

_EPS = 1e-9  # reference no_div_by_zero


class Snake(nn.Module):
    channels: int
    alpha_logscale: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
        alpha = alpha.astype(x.dtype)
        return x + (1.0 / (alpha + _EPS)) * jnp.square(jnp.sin(x * alpha))


class SnakeBeta(nn.Module):
    channels: int
    alpha_logscale: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        beta = self.param("beta", init, (self.channels,))
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
            beta = jnp.exp(beta)
        alpha = alpha.astype(x.dtype)
        beta = beta.astype(x.dtype)
        return x + (1.0 / (beta + _EPS)) * jnp.square(jnp.sin(x * alpha))
