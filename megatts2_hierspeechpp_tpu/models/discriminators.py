"""GAN discriminators.

Parity targets:
  - DiscriminatorP / DiscriminatorR / MultiPeriodDiscriminator
    (/root/reference/hierspeechpp_speechsynthesizer.py:463-560; speechsr48k
    variant adds a 6th STFT resolution, speechsr48k/speechsr.py:190-216).
  - SpecDiscriminator / MultiResSpecDiscriminator over the w2v feature map
    (/root/reference/ttv_v1/msd.py) used by the s2 trainer.

DiscriminatorR computes a *normalized* complex STFT (torchaudio Spectrogram
normalized=True == window-L2 normalization, center=False) and stacks
real/imag as channels.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.basic import leaky_relu
from megatts2_hierspeechpp_tpu.nn.conv import Dtype, WNConv2d, get_padding
from megatts2_hierspeechpp_tpu.ops.stft import frame_signal, hann_window


class SNConv2d(nn.Module):
    """Spectral-normalized Conv2d (one power iteration per call, torch-style).

    The power-iteration vector u lives in the 'spectral' variable collection.
    """

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_u: bool = False) -> jnp.ndarray:
        cin = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # torch layout for the power iteration: (Cout, Cin*Kh*Kw)
        w_mat = kernel.transpose(3, 2, 0, 1).reshape(self.features, -1)
        u_var = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(jax.random.PRNGKey(0), (self.features,)),
        )
        v_var = self.variable(
            "spectral", "v",
            lambda: jax.random.normal(jax.random.PRNGKey(1), (w_mat.shape[1],)),
        )
        u, v = u_var.value, v_var.value
        if update_u:  # torch training mode: one power iteration, buffers updated
            v = w_mat.T @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u = w_mat @ v
            u = u / (jnp.linalg.norm(u) + 1e-12)
            u_var.value = jax.lax.stop_gradient(u)
            v_var.value = jax.lax.stop_gradient(v)
        sigma = jnp.dot(u, w_mat @ v)
        kernel = kernel / sigma
        from megatts2_hierspeechpp_tpu.nn.conv import conv2d_op

        return conv2d_op(x, kernel, bias, self.stride, self.padding, self.dilation,
                         compute_dtype=self.dtype)


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, T, 1) waveform -> (logits (B, N), fmap list)."""
        b, t, c = x.shape
        p = self.period
        if t % p != 0:
            n_pad = p - (t % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        y = x.reshape(b, t // p, p, c)  # (B, H=T/p, W=p, C=1)

        fmap = []
        chans = [32, 128, 512, 1024]
        for i, ch in enumerate(chans):
            y = WNConv2d(
                ch, (self.kernel_size, 1), (self.stride, 1),
                (get_padding(self.kernel_size), 0), dtype=self.dtype,
                name=f"convs_{i}",
            )(y)
            y = leaky_relu(y)
            fmap.append(y)
        y = WNConv2d(
            1024, (self.kernel_size, 1), (1, 1),
            (get_padding(self.kernel_size), 0), dtype=self.dtype, name="convs_4",
        )(y)
        y = leaky_relu(y)
        fmap.append(y)
        y = WNConv2d(1, (3, 1), (1, 1), (1, 0), dtype=self.dtype, name="conv_post")(y)
        fmap.append(y)
        return y.reshape(b, -1), fmap


def _normalized_complex_stft(y: jnp.ndarray, n_fft: int, hop: int, win: int):
    """(B, T) -> (B, F, bins) complex, window-L2-normalized, center=False."""
    window = jnp.asarray(hann_window(win))
    frames = frame_signal(y, n_fft, hop) * window[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)
    return spec / jnp.sqrt(jnp.sum(window**2))


class DiscriminatorR(nn.Module):
    resolution: Sequence[int]  # (n_fft, hop, win)
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, T, 1) -> (logits, fmap). Internal layout (B, T_frames, F, C)."""
        n_fft, hop, win = self.resolution
        spec = _normalized_complex_stft(x[..., 0], n_fft, hop, win)
        y = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)  # (B, F, bins, 2)

        fmap = []
        specs = [
            ((3, 9), (1, 1), (1, 1), (1, 4)),
            ((3, 9), (1, 2), (1, 1), (1, 4)),
            ((3, 9), (1, 2), (2, 1), (2, 4)),
            ((3, 9), (1, 2), (4, 1), (4, 4)),
            ((3, 3), (1, 1), (1, 1), (1, 1)),
        ]
        for i, (k, s, d, p) in enumerate(specs):
            y = WNConv2d(32, k, s, p, d, dtype=self.dtype, name=f"convs_{i}")(y)
            y = leaky_relu(y)
            fmap.append(y)
        y = WNConv2d(1, (3, 3), (1, 1), (1, 1), dtype=self.dtype, name="conv_post")(y)
        fmap.append(y)
        return y.reshape(y.shape[0], -1), fmap


VOCODER_RESOLUTIONS = [
    (2048, 512, 2048), (1024, 256, 1024), (512, 128, 512),
    (256, 64, 256), (128, 32, 128),
]
SPEECHSR48_RESOLUTIONS = [(4096, 1024, 4096)] + VOCODER_RESOLUTIONS
PERIODS = [2, 3, 5, 7, 11]


class MultiPeriodDiscriminator(nn.Module):
    resolutions: tuple = tuple(VOCODER_RESOLUTIONS)
    periods: tuple = tuple(PERIODS)
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for i, res in enumerate(self.resolutions):
            d = DiscriminatorR(res, dtype=self.dtype, name=f"disc_r_{i}")
            lr, fr = d(y)
            lg, fg = d(y_hat)
            outs_r.append(lr); outs_g.append(lg)
            fmaps_r.append(fr); fmaps_g.append(fg)
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(p, dtype=self.dtype, name=f"disc_p_{i}")
            lr, fr = d(y)
            lg, fg = d(y_hat)
            outs_r.append(lr); outs_g.append(lg)
            fmaps_r.append(fr); fmaps_g.append(fg)
        return outs_r, outs_g, fmaps_r, fmaps_g


class SpecDiscriminator(nn.Module):
    """2-D conv discriminator over a feature map treated as a spectrogram
    (ttv_v1/msd.py:9-41); input (B, H, W, 1)."""

    use_spectral_norm: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, y: jnp.ndarray, update_u: bool = False):
        conv = SNConv2d if self.use_spectral_norm else WNConv2d
        fmap = []
        specs = [
            ((3, 9), (1, 1), (1, 4)),
            ((3, 9), (1, 2), (1, 4)),
            ((3, 9), (1, 2), (1, 4)),
            ((3, 3), (1, 1), (1, 1)),
        ]
        for i, (k, s, p) in enumerate(specs):
            kw = {"update_u": update_u} if self.use_spectral_norm else {}
            y = conv(32, k, s, p, dtype=self.dtype, name=f"convs_{i}")(y, **kw)
            y = leaky_relu(y)
            fmap.append(y)
        kw = {"update_u": update_u} if self.use_spectral_norm else {}
        y = conv(1, (3, 3), (1, 1), (1, 1), dtype=self.dtype, name="out")(y, **kw)
        fmap.append(y)
        return y.reshape(y.shape[0], -1), fmap


def avg_pool2d(x: jnp.ndarray, kw: int) -> jnp.ndarray:
    """AvgPool2d((1, kw)) over (B, H, W, C)."""
    b, h, w, c = x.shape
    wk = (w // kw) * kw
    return jnp.mean(x[:, :, :wk].reshape(b, h, wk // kw, kw, c), axis=3)


class MultiResSpecDiscriminator(nn.Module):
    """2 SpecDiscriminators (first spectral-normed) over progressively
    avg-pooled inputs (ttv_v1/msd.py:43-75); input (B, C_feat, T) as (B,H,W)."""

    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray, update_u: bool = False):
        """y, y_hat: (B, H, W) feature maps (e.g. w2v (B, 1024, T))."""
        y = y[..., None]
        y_hat = y_hat[..., None]
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        pools = [None, 2]
        for i, pool in enumerate(pools):
            if pool is not None:
                y = avg_pool2d(y, pool)
                y_hat = avg_pool2d(y_hat, pool)
            d = SpecDiscriminator(use_spectral_norm=(i == 0), dtype=self.dtype,
                                  name=f"disc_{i}")
            lr, fr = d(y, update_u=update_u)
            lg, fg = d(y_hat, update_u=False)
            outs_r.append(lr); outs_g.append(lg)
            fmaps_r.append(fr); fmaps_g.append(fg)
        return outs_r, outs_g, fmaps_r, fmaps_g
