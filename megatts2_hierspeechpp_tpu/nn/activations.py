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


class AASnakeBeta(nn.Module):
    """Anti-aliased SnakeBeta: up2 -> snake -> down2 as one op.

    Same parameters (alpha/beta) and numerics as Activation1d(SnakeBeta)
    (reference AMPBlock activations); on TPU dispatches to the fused Pallas
    kernel (ops/pallas_snake.py — single VMEM pass instead of three HBM
    round-trips), elsewhere to the composed ops/resample path.
    """

    channels: int
    alpha_logscale: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_params: bool = False):
        import os

        import jax

        from megatts2_hierspeechpp_tpu.ops.pallas_snake import fused_aa_snakebeta
        from megatts2_hierspeechpp_tpu.ops.resample import activation1d

        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        beta = self.param("beta", init, (self.channels,))
        if self.alpha_logscale:
            alpha_v = jnp.exp(alpha)
            beta_v = jnp.exp(beta)
        else:
            alpha_v, beta_v = alpha, beta
        if return_params:
            # post-exp (alpha, beta) for fused kernels (ops/pallas_ampblock)
            return alpha_v, beta_v

        # Default on TPU: the fused Pallas kernel. Measured on v5e with
        # readback-honest timing (BASELINE.md): 2.1-2.2x per-AMPBlock at the
        # C<=64 stages (the transposed-tile kernel packs full 128-lane vregs
        # where the native (T, C<=64) layout wastes them) and 1.1-1.2x at
        # C>=128. Opt out with MEGATTS_PALLAS=0.
        use_pallas = (
            jax.default_backend() == "tpu"
            and os.environ.get("MEGATTS_PALLAS", "1") != "0"
        )
        if use_pallas:
            return fused_aa_snakebeta(x, alpha_v, beta_v)
        a = alpha_v.astype(x.dtype)
        b = beta_v.astype(x.dtype)
        return activation1d(
            x, lambda v: v + jnp.square(jnp.sin(v * a)) / (b + _EPS)
        )
