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


def fused_triple_enabled(channels: int) -> bool:
    """Gate for whole-stage fusion (ops/pallas_amp_triple): TPU only, and
    only at the narrow stages where all three blocks' weights fit VMEM
    alongside the activation tiles. Opt out with MEGATTS_FUSED_TRIPLE=0
    (or MEGATTS_PALLAS=0 for all Pallas kernels)."""
    import os

    import jax

    return (
        jax.default_backend() == "tpu"
        and channels <= 64
        and os.environ.get("MEGATTS_PALLAS", "1") != "0"
        and os.environ.get("MEGATTS_FUSED_TRIPLE", "1") == "1"
    )


class AMPBlock(nn.Module):
    """Anti-aliased Multi-Periodicity block (BigVGAN AMPBlock1 topology)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_weights: bool = False):
        import os

        import jax

        # Fused whole-block Pallas path (TPU, small-C stages): one VMEM pass
        # for the 6 convs + 6 anti-aliased snakes instead of ~12 HBM round
        # trips; exact vs the composed path (stitched edges), differentiable
        # (ops/pallas_ampblock). DEFAULT-ON since the round-3 hardware A/B
        # (tools/bench_ampblock.py: full vocoder 359.8 vs 287.1 audio-s/s,
        # +25% over snake-only, 2.67x over pure XLA); opt out with
        # MEGATTS_FUSED_AMPBLOCK=0.
        #
        # return_weights=True skips the compute and returns the stacked
        # post-exp/normalized weight tuple (a1, ib1, w1, b1, a2, ib2, w2, b2)
        # — the ops/pallas_ampblock contract — for whole-stage fusion
        # (ops/pallas_amp_triple); x is used only for shape inference.
        use_fused = return_weights or (
            jax.default_backend() == "tpu"
            and x.shape[-1] <= 128
            and os.environ.get("MEGATTS_PALLAS", "1") != "0"
            and os.environ.get("MEGATTS_FUSED_AMPBLOCK", "1") == "1"
        )
        acts1, ibs1, ks1, bs1 = [], [], [], []
        acts2, ibs2, ks2, bs2 = [], [], [], []
        for i, d in enumerate(self.dilation):
            a1 = AASnakeBeta(self.channels, alpha_logscale=True, name=f"act_{2 * i}")
            a2 = AASnakeBeta(self.channels, alpha_logscale=True, name=f"act_{2 * i + 1}")
            c1 = WNConv1d(
                self.channels,
                self.kernel_size,
                padding=get_padding(self.kernel_size, d),
                dilation=d,
                dtype=self.dtype,
                name=f"convs1_{i}",
            )
            c2 = WNConv1d(
                self.channels,
                self.kernel_size,
                padding=get_padding(self.kernel_size, 1),
                dtype=self.dtype,
                name=f"convs2_{i}",
            )
            if use_fused:
                al1, be1 = a1(x, return_params=True)
                al2, be2 = a2(x, return_params=True)
                k1, b1 = c1(x, return_kernel=True)
                k2, b2 = c2(x, return_kernel=True)
                acts1.append(al1)
                ibs1.append(1.0 / (be1 + 1e-9))
                ks1.append(jnp.transpose(k1, (0, 2, 1)))  # (k, Cout, Cin)
                bs1.append(b1)
                acts2.append(al2)
                ibs2.append(1.0 / (be2 + 1e-9))
                ks2.append(jnp.transpose(k2, (0, 2, 1)))
                bs2.append(b2)
            else:
                xt = a1(x)
                xt = c1(xt)
                xt = a2(xt)
                xt = c2(xt)
                x = xt + x
        if return_weights:
            return (
                jnp.stack(acts1), jnp.stack(ibs1), jnp.stack(ks1),
                jnp.stack(bs1), jnp.stack(acts2), jnp.stack(ibs2),
                jnp.stack(ks2), jnp.stack(bs2),
            )
        if use_fused:
            from megatts2_hierspeechpp_tpu.ops.pallas_ampblock import fused_ampblock

            x = fused_ampblock(
                x,
                jnp.stack(acts1), jnp.stack(ibs1), jnp.stack(ks1), jnp.stack(bs1),
                jnp.stack(acts2), jnp.stack(ibs2), jnp.stack(ks2), jnp.stack(bs2),
                kernel_size=self.kernel_size, dilations=tuple(self.dilation),
            )
        return x
