"""WaveNet (WN) residual gated-conv stack.

Behavior parity with /root/reference/modules.py:111-176: weight-normalized
dilated in-convs producing 2C gated channels, global conditioning via a single
1x1 cond conv projected per layer, fused tanh/sigmoid gate, res+skip 1x1 convs
(last layer skip-only). Channels-last; the gate chain is an elementwise epilogue
XLA fuses into the conv GEMMs on TPU.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.basic import fused_add_tanh_sigmoid_multiply
from megatts2_hierspeechpp_tpu.nn.conv import Dtype, WNConv1d


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0
    dtype: Dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: (B, T, C); x_mask: (B, T, 1); g: (B, 1, Gin) or (B, T, Gin)."""
        hc = self.hidden_channels
        output = jnp.zeros_like(x)

        if g is not None:
            g_all = WNConv1d(
                2 * hc * self.n_layers, 1, dtype=self.dtype, name="cond_layer"
            )(g)

        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            padding = (self.kernel_size * dilation - dilation) // 2
            x_in = WNConv1d(
                2 * hc,
                self.kernel_size,
                padding=padding,
                dilation=dilation,
                dtype=self.dtype,
                name=f"in_{i}",
            )(x)
            if g is not None:
                g_l = g_all[..., i * 2 * hc : (i + 1) * 2 * hc]
            else:
                g_l = jnp.zeros_like(x_in)

            acts = fused_add_tanh_sigmoid_multiply(x_in, g_l, hc)
            acts = nn.Dropout(self.p_dropout)(acts, deterministic=deterministic)

            res_skip_ch = 2 * hc if i < self.n_layers - 1 else hc
            res_skip = WNConv1d(
                res_skip_ch, 1, dtype=self.dtype, name=f"res_skip_{i}"
            )(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :hc]) * x_mask
                output = output + res_skip[..., hc:]
            else:
                output = output + res_skip
        return output * x_mask
