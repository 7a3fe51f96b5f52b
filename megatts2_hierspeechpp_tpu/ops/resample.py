"""Anti-aliased resampling (kaiser-windowed sinc low-pass), BigVGAN-style.

Parity with /root/reference/alias_free_torch/{filter.py,resample.py,act.py}:
  - kaiser_sinc_filter1d: same beta/A formulas, even/odd kernel handling,
    sum-normalized.
  - UpSample1d: replicate-pad, x ratio via transposed depthwise conv, crop.
  - DownSample1d: replicate-pad + strided depthwise low-pass.
  - Activation1d: up2 -> pointwise activation -> down2 sandwich.

Filters are static numpy buffers (no trainable params). Channels-last (B, T, C);
the depthwise convs are grouped lax convs, which XLA maps well on TPU. The
up->snake->down sandwich is the vocoder's HBM-bandwidth hot spot — kept as one
jit region so XLA can fuse the elementwise snake between the two convs.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from megatts2_hierspeechpp_tpu.nn.conv import _precision_for


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Returns (K,) float32 filter, sum-normalized."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2

    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)

    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros_like(time, dtype=np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


def _depthwise_kernel(filt: np.ndarray, channels: int) -> jnp.ndarray:
    """(K,) -> (K, 1, C) depthwise kernel (feature_group_count=C)."""
    return jnp.asarray(np.tile(filt[:, None, None], (1, 1, channels)))


def upsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    """x: (B, T, C) -> (B, T*ratio, C)."""
    c = x.shape[-1]
    kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)

    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    # torch conv_transpose1d(padding=0) == lhs-dilated conv with flipped kernel
    kernel = _depthwise_kernel(filt[::-1].copy(), c).astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NWC", "WIO", "NWC"))
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(kernel_size - 1, kernel_size - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=dn,
        feature_group_count=c,
        precision=_precision_for(x.dtype),
    )
    y = ratio * y
    return y[:, pad_left : y.shape[1] - pad_right, :]


def lowpass1d(
    x: jnp.ndarray,
    cutoff: float,
    half_width: float,
    stride: int = 1,
    kernel_size: int = 12,
) -> jnp.ndarray:
    """Replicate-padded depthwise low-pass; x: (B, T, C)."""
    c = x.shape[-1]
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    filt = kaiser_sinc_filter1d(cutoff, half_width, kernel_size)
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    kernel = _depthwise_kernel(filt, c).astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NWC", "WIO", "NWC"))
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[(0, 0)],
        dimension_numbers=dn,
        feature_group_count=c,
        precision=_precision_for(x.dtype),
    )


def downsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    return lowpass1d(x, 0.5 / ratio, 0.6 / ratio, stride=ratio, kernel_size=kernel_size)


def activation1d(x: jnp.ndarray, act_fn, up_ratio: int = 2, down_ratio: int = 2) -> jnp.ndarray:
    """Anti-aliased activation: upsample -> act -> downsample."""
    return downsample1d(act_fn(upsample1d(x, up_ratio)), down_ratio)
