"""LSTM layers via lax.scan, with torch-compatible gate ordering (i, f, g, o).

Needed for the reference's DurationPredictor (2-layer BiLSTM over the *padded*
batch, /root/reference/ttv_v1/vits_models.py:89-142) and RangePredictor
(1-layer BiLSTM over packed sequences, /root/reference/ttv_v1/Gaussian.py:79-117).

`length_aware=True` reproduces pack_padded_sequence semantics: the backward
direction starts at each sequence's true last frame and outputs are zeroed at
padding. `length_aware=False` reproduces a plain padded-batch LSTM (the
duration predictor's behavior, where the backward pass consumes padding zeros).

These recurrences are tiny (H<=256, phoneme-rate) compared to the conv stacks;
a scan keeps them on-device without blocking jit.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.conv import Dtype


def _lstm_scan(x, w_ih, w_hh, b, h0, c0):
    """x: (B, T, In); w_ih: (In, 4H); w_hh: (H, 4H); b: (4H,). Returns (B, T, H)."""
    hdim = w_hh.shape[0]

    # Precompute input projections for all steps in one big MXU matmul.
    xp = jnp.einsum("bti,ih->bth", x, w_ih, precision=jax.lax.Precision.HIGHEST) + b

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + jnp.einsum(
            "bh,hk->bk", h, w_hh, precision=jax.lax.Precision.HIGHEST
        )
        i = jax.nn.sigmoid(gates[..., :hdim])
        f = jax.nn.sigmoid(gates[..., hdim : 2 * hdim])
        g = jnp.tanh(gates[..., 2 * hdim : 3 * hdim])
        o = jax.nn.sigmoid(gates[..., 3 * hdim :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (_, _), hs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(xp, 0, 1))
    return jnp.swapaxes(hs, 0, 1)


def _flip_by_length(x: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Reverse each (B, T, C) sequence within its true length; zeros beyond."""
    b, t, c = x.shape
    if lengths is None:
        return jnp.flip(x, axis=1)
    pos = jnp.arange(t)[None, :]
    idx = jnp.clip(lengths[:, None] - 1 - pos, 0, t - 1)
    out = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    return out * (pos < lengths[:, None])[:, :, None].astype(x.dtype)


class BiLSTM(nn.Module):
    """Single bidirectional LSTM layer; output (B, T, 2H)."""

    hidden_size: int
    length_aware: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        b, t, in_dim = x.shape
        h = self.hidden_size

        def mk(name, shape):
            return self.param(name, nn.initializers.uniform(scale=h**-0.5), shape)

        params = {}
        for d in ("fwd", "bwd"):
            params[d] = (
                mk(f"w_ih_{d}", (in_dim, 4 * h)),
                mk(f"w_hh_{d}", (h, 4 * h)),
                mk(f"b_{d}", (4 * h,)),
            )

        h0 = jnp.zeros((b, h), x.dtype)
        c0 = jnp.zeros((b, h), x.dtype)

        out_f = _lstm_scan(x, *params["fwd"], h0, c0)

        lens = lengths if self.length_aware else None
        xr = _flip_by_length(x, lens)
        out_b = _lstm_scan(xr, *params["bwd"], h0, c0)
        out_b = _flip_by_length(out_b, lens)

        out = jnp.concatenate([out_f, out_b], axis=-1)
        if self.length_aware and lengths is not None:
            mask = (jnp.arange(t)[None, :] < lengths[:, None])[:, :, None]
            out = out * mask.astype(out.dtype)
        return out


class StackedBiLSTM(nn.Module):
    """Multi-layer BiLSTM (torch nn.LSTM(num_layers=N, bidirectional=True))."""

    hidden_size: int
    num_layers: int
    length_aware: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = BiLSTM(
                self.hidden_size,
                length_aware=self.length_aware,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, lengths)
        return x
