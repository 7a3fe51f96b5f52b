"""1-D/2-D convolution primitives with explicit, torch-compatible semantics.

Why hand-rolled instead of flax.linen.Conv: the reference framework's entire
parameter surface is (transposed) convs, most of them weight-normalized
(/root/reference/modules.py, hierspeechpp_speechsynthesizer.py). We need
  (a) exact output-shape/padding semantics of torch Conv1d/ConvTranspose1d so
      reference checkpoints can be ported and validated activation-by-activation,
  (b) a weight-norm parameterization (g, v) that trains identically,
  (c) channels-last (B, T, C) layout so XLA tiles the contraction onto the MXU.

Kernel layouts:
  Conv1d:           kernel (K, Cin/groups, Cout)   [lax 'WIO']
  ConvTranspose1d:  kernel (K, Cin, Cout) already *spatially flipped* relative
                    to torch's ConvTranspose1d weight, so it runs as a plain
                    dilated-lhs conv (torch W[i,o,k] -> ours V[K-1-k,i,o]).
  Conv2d:           kernel (Kh, Kw, Cin/groups, Cout)  [lax 'HWIO']
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _precision_for(compute_dtype: Dtype | None):
    """fp32 compute means *real* fp32 on TPU (HIGHEST avoids the default
    bf16-pass matmul/conv lowering); bf16 compute uses the fast default."""
    if compute_dtype is None or jnp.dtype(compute_dtype) == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def conv1d_op(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    stride: int = 1,
    padding: Union[int, Tuple[int, int]] = 0,
    dilation: int = 1,
    groups: int = 1,
    compute_dtype: Dtype | None = None,
) -> jnp.ndarray:
    """x: (B, T, C); kernel: (K, Cin/groups, Cout)."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    pad = _pair(padding) if not isinstance(padding, int) else (padding, padding)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NWC", "WIO", "NWC"))
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[pad],
        rhs_dilation=(dilation,),
        dimension_numbers=dn,
        feature_group_count=groups,
        precision=_precision_for(compute_dtype),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose1d_op(
    x: jnp.ndarray,
    kernel_flipped: jnp.ndarray,
    bias: jnp.ndarray | None,
    stride: int = 1,
    padding: int = 0,
    compute_dtype: Dtype | None = None,
) -> jnp.ndarray:
    """Torch-semantics transposed conv via lhs-dilated conv.

    x: (B, T, C); kernel_flipped: (K, Cin, Cout) spatially flipped.
    Output length = (T - 1) * stride - 2 * padding + K   (torch formula).
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel_flipped = kernel_flipped.astype(compute_dtype)
    k = kernel_flipped.shape[0]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel_flipped.shape, ("NWC", "WIO", "NWC")
    )
    y = jax.lax.conv_general_dilated(
        x,
        kernel_flipped,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=dn,
        precision=_precision_for(compute_dtype),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _wn_direction(v: jnp.ndarray, axes: Sequence[int], eps: float = 0.0) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=tuple(axes), keepdims=True))
    return v / (norm + eps)


class Conv1d(nn.Module):
    """Plain torch-compatible Conv1d on (B, T, C)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Dtype | None = None  # compute dtype; params stay fp32
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_kernel: bool = False):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (self.kernel_size, cin // self.groups, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if return_kernel:
            # raw (K, Cin/groups, Cout) weights for fused kernels
            # (ops/pallas_amp_triple); x is used only for cin inference
            return kernel, bias
        return conv1d_op(
            x, kernel, bias, self.stride, self.padding, self.dilation, self.groups,
            compute_dtype=self.dtype,
        )


class WNConv1d(nn.Module):
    """Weight-normalized Conv1d: w = g * v / ||v||, norm per out-channel over (K, Cin).

    Matches torch.nn.utils.weight_norm(Conv1d(...), dim=0)
    (/root/reference/modules.py:111-146 and all HiFiGAN-style stacks).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Dtype | None = None
    kernel_init: nn.initializers.Initializer = nn.initializers.normal(stddev=0.01)

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_kernel: bool = False):
        cin = x.shape[-1]
        v = self.param(
            "v",
            self.kernel_init,
            (self.kernel_size, cin // self.groups, self.features),
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1))),
            (self.features,),
        )
        kernel = _wn_direction(v, (0, 1)) * g[None, None, :]
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if return_kernel:
            # effective (normalized) weights for fused kernels
            # (ops/pallas_ampblock); x is used only for cin inference
            return kernel, bias
        return conv1d_op(
            x, kernel, bias, self.stride, self.padding, self.dilation, self.groups,
            compute_dtype=self.dtype,
        )


class ConvTranspose1d(nn.Module):
    """Torch-compatible ConvTranspose1d (no weight norm)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype | None = None
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (self.kernel_size, cin, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return conv_transpose1d_op(
            x, kernel, bias, self.stride, self.padding, compute_dtype=self.dtype
        )


class WNConvTranspose1d(nn.Module):
    """Weight-normalized ConvTranspose1d.

    torch weight_norm(ConvTranspose1d, dim=0) normalizes per *input* channel
    over (Cout, K); our flipped kernel is (K, Cin, Cout) so the norm runs over
    axes (0, 2) and g has shape (Cin,).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype | None = None
    kernel_init: nn.initializers.Initializer = nn.initializers.normal(stddev=0.01)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        v = self.param(
            "v", self.kernel_init, (self.kernel_size, cin, self.features)
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2))),
            (cin,),
        )
        kernel = _wn_direction(v, (0, 2)) * g[None, :, None]
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return conv_transpose1d_op(
            x, kernel, bias, self.stride, self.padding, compute_dtype=self.dtype
        )


class Conv2d(nn.Module):
    """Torch-compatible Conv2d on (B, H, W, C)."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: Dtype | None = None
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init, (kh, kw, cin, self.features))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return conv2d_op(
            x, kernel, bias, self.stride, self.padding, self.dilation,
            compute_dtype=self.dtype,
        )


def conv2d_op(x, kernel, bias, stride=(1, 1), padding=(0, 0), dilation=(1, 1),
              compute_dtype=None):
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    ph, pw = padding
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=tuple(stride),
        padding=[(ph, ph), (pw, pw)],
        rhs_dilation=tuple(dilation),
        dimension_numbers=dn,
        precision=_precision_for(compute_dtype),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class WNConv2d(nn.Module):
    """Weight-normalized Conv2d (norm per out-channel over (Kh, Kw, Cin))."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: Dtype | None = None
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kh, kw = self.kernel_size
        v = self.param("v", self.kernel_init, (kh, kw, cin, self.features))
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2))),
            (self.features,),
        )
        kernel = _wn_direction(v, (0, 1, 2)) * g[None, None, None, :]
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return conv2d_op(
            x, kernel, bias, self.stride, self.padding, self.dilation,
            compute_dtype=self.dtype,
        )


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    """'same' padding for odd kernels (reference commons.get_padding)."""
    return (kernel_size * dilation - dilation) // 2
