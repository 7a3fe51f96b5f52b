"""Duration/range predictors and Gaussian upsampling (Non-Attentive Tacotron).

Parity targets:
  - DurationPredictor (/root/reference/ttv_v1/vits_models.py:89-142): cond(g) add,
    2-layer BiLSTM over the padded batch, LayerNorm, relu, 1x1 conv, softplus.
  - RangePredictor (/root/reference/ttv_v1/Gaussian.py:79-117): concat durations,
    packed 1-layer BiLSTM, linear proj, softplus.
  - GaussianUpsampling (/root/reference/ttv_v1/Gaussian.py:24-77): per-phone
    Gaussian kernels, softmax over phones, one (B,T,N)x(B,N,H) batched matmul.
    T is a static bound here (jit-friendly); the reference derives it from
    sum(durations) at runtime.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.basic import Dense, LayerNorm
from megatts2_hierspeechpp_tpu.nn.conv import Dtype
from megatts2_hierspeechpp_tpu.nn.lstm import BiLSTM, StackedBiLSTM

MASK_SCORE = -1e15


class DurationPredictor(nn.Module):
    filter_channels: int = 256
    gin_channels: int = 256
    p_dropout: float = 0.5
    dtype: Dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: (B, N, C); x_mask: (B, N, 1); g: (B, Gin). Returns (B, N, 1) softplus'd."""
        if g is not None:
            x = x + Dense(x.shape[-1], dtype=self.dtype, name="cond")(g)[:, None, :]
        y = StackedBiLSTM(
            self.filter_channels, 2, length_aware=False, dtype=self.dtype, name="lstms"
        )(x * x_mask)
        y = LayerNorm(name="norm_2")(y)
        y = jax.nn.relu(y)
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = Dense(1, dtype=self.dtype, name="proj")(y * x_mask)
        y = jax.nn.softplus(y)
        return y * x_mask


class RangePredictor(nn.Module):
    out_channel: int = 256
    dtype: Dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        durations: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: (B, N, C); durations: (B, N). Returns ranges (B, N)."""
        inp = jnp.concatenate([x, durations[:, :, None].astype(x.dtype)], axis=-1)
        y = BiLSTM(self.out_channel, length_aware=True, dtype=self.dtype, name="lstm")(
            inp, lengths
        )
        y = Dense(1, dtype=self.dtype, name="proj")(y)
        y = jax.nn.softplus(y)
        return y[..., 0]


def gaussian_upsample(
    x: jnp.ndarray,
    durations: jnp.ndarray,
    ranges: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray],
    out_length: int,
) -> jnp.ndarray:
    """x: (B, N, H); durations/ranges: (B, N) -> (B, out_length, H).

    w[b, n, t] = softmax_n(-0.5 * (log 2pi + log var + (t - c)^2 / var)),
    c = cumsum(dur) - dur/2. Runs as one einsum on the MXU.
    """
    c = jnp.cumsum(durations, axis=1).astype(jnp.float32) - 0.5 * durations
    t = jnp.arange(out_length, dtype=jnp.float32)[None, None, :]  # (1, 1, T)
    var = ranges[:, :, None].astype(jnp.float32)
    diff = t - c[:, :, None]
    w = -0.5 * (math.log(2.0 * math.pi) + jnp.log(var) + diff * diff / var)
    if input_lengths is not None:
        n = x.shape[1]
        in_mask = jnp.arange(n)[None, :] < input_lengths[:, None]
        w = jnp.where(in_mask[:, :, None], w, MASK_SCORE)
    w = jax.nn.softmax(w, axis=1)  # over phones
    out = jnp.einsum(
        "bnt,bnh->bth", w.astype(x.dtype), x, precision=jax.lax.Precision.HIGHEST
    )
    return out


def length_regulate(
    x: jnp.ndarray, durations: jnp.ndarray, out_length: int
) -> jnp.ndarray:
    """Hard FastSpeech-style expansion (reference LengthRegulator,
    ttv_v1/vits_models.py:45-87, python-loop there; vectorized here):
    frame t copies phone n where cumsum(dur)[n-1] <= t < cumsum(dur)[n].

    x: (B, N, H); durations: (B, N) int -> (B, out_length, H); frames beyond
    sum(dur) are zero.
    """
    csum = jnp.cumsum(durations, axis=1)  # (B, N)
    t = jnp.arange(out_length)[None, :, None]  # (1, T, 1)
    # one-hot selection: phone n active when csum[n-1] <= t < csum[n]
    upper = csum[:, None, :]  # (B, 1->T, N)
    lower = jnp.concatenate(
        [jnp.zeros_like(csum[:, :1]), csum[:, :-1]], axis=1
    )[:, None, :]
    sel = (t >= lower) & (t < upper)  # (B, T, N)
    out = jnp.einsum(
        "btn,bnh->bth", sel.astype(x.dtype), x,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out
