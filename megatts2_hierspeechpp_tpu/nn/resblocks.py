"""HiFiGAN/BigVGAN residual conv blocks.

Parity targets:
  - ResBlock1/ResBlock2 (/root/reference/modules.py:187-256): leaky-relu blocks.
  - AMPBlock1 (/root/reference/hierspeechpp_speechsynthesizer.py:344-392) and
    AMPBlock0 (/root/reference/speechsr48k/speechsr.py:16-64): anti-aliased
    SnakeBeta activations around weight-normalized dilated convs. AMPBlock0 and
    AMPBlock1 are architecturally identical (both 3+3 convs); both map here to
    AMPBlock.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.activations import AASnakeBeta
from megatts2_hierspeechpp_tpu.nn.basic import leaky_relu
from megatts2_hierspeechpp_tpu.nn.conv import Dtype, WNConv1d, get_padding


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x)
            if x_mask is not None:
                xt = xt * x_mask
            xt = WNConv1d(
                self.channels,
                self.kernel_size,
                padding=get_padding(self.kernel_size, d),
                dilation=d,
                dtype=self.dtype,
                name=f"convs1_{i}",
            )(xt)
            xt = leaky_relu(xt)
            if x_mask is not None:
                xt = xt * x_mask
            xt = WNConv1d(
                self.channels,
                self.kernel_size,
                padding=get_padding(self.kernel_size, 1),
                dtype=self.dtype,
                name=f"convs2_{i}",
            )(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3)
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x)
            if x_mask is not None:
                xt = xt * x_mask
            xt = WNConv1d(
                self.channels,
                self.kernel_size,
                padding=get_padding(self.kernel_size, d),
                dilation=d,
                dtype=self.dtype,
                name=f"convs_{i}",
            )(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class AMPBlock(nn.Module):
    """Anti-aliased Multi-Periodicity block (BigVGAN AMPBlock1 topology)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.dilation)
        for i, d in enumerate(self.dilation):
            a1 = AASnakeBeta(self.channels, alpha_logscale=True, name=f"act_{2 * i}")
            a2 = AASnakeBeta(self.channels, alpha_logscale=True, name=f"act_{2 * i + 1}")
            xt = a1(x)
            xt = WNConv1d(
                self.channels,
                self.kernel_size,
                padding=get_padding(self.kernel_size, d),
                dilation=d,
                dtype=self.dtype,
                name=f"convs1_{i}",
            )(xt)
            xt = a2(xt)
            xt = WNConv1d(
                self.channels,
                self.kernel_size,
                padding=get_padding(self.kernel_size, 1),
                dtype=self.dtype,
                name=f"convs2_{i}",
            )(xt)
            x = xt + x
        return x
