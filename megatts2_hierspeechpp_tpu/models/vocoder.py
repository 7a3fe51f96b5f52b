"""HierSpeech++ hierarchical-VAE vocoder, TPU-native.

Re-design of /root/reference/hierspeechpp_speechsynthesizer.py (SynthesizerTrn,
:562-716) in channels-last JAX: dual source-filter posteriors, DiT coupling
flows, harmonic source network and BigVGAN-style decoder with anti-aliased
SnakeBeta activations.

Inference data flow (reference :635-651):
  g = StyleEncoder(mel)                     (B, 256)
  z ~ enc_p_l(w2v, f0)                      (B, T, C_inter)   50 Hz
  z -> flow_l^-1 -> flow^-1
  e, e_ = SourceNetwork(z, g)               e: (B, 4T, C), e_: (B, 4T, 1)
  wav = Generator(z, e, g)                  (B, 320T, 1)      16 kHz

Training members (PosteriorAudioEncoder over linear spec + raw wave, the
forward-direction flows, MelDecoder aux head) are included for full capability
parity even though the reference ships inference only (README.md:53).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.activations import AASnakeBeta
from megatts2_hierspeechpp_tpu.nn.attention import Encoder
from megatts2_hierspeechpp_tpu.nn.basic import Dense, leaky_relu
from megatts2_hierspeechpp_tpu.nn.conv import (
    Conv1d,
    Dtype,
    WNConv1d,
    WNConvTranspose1d,
)
from megatts2_hierspeechpp_tpu.nn.dit import ResidualCouplingBlockTransformer
from megatts2_hierspeechpp_tpu.nn.resblocks import AMPBlock
from megatts2_hierspeechpp_tpu.nn.styleencoder import StyleEncoder
from megatts2_hierspeechpp_tpu.nn.wavenet import WN


class PosteriorSFEncoder(nn.Module):
    """Source-filter semantic posterior: w2v branch + strided-f0 branch -> WN."""

    src_channels: int = 1024
    out_channels: int = 192
    hidden_channels: int = 192
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 256
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x_src, x_ftr, x_mask, g, rng=None, sample: bool = True):
        """x_src: (B, T, 1024) w2v; x_ftr: (B, 4T, 1) f0; x_mask: (B, T, 1);
        g: (B, Gin). Returns (z, m, logs) each (B, T, C_out)."""
        g2 = g[:, None, :]
        src = Dense(self.hidden_channels, dtype=self.dtype, name="pre_source")(x_src)
        src = src * x_mask
        ftr = Conv1d(
            self.hidden_channels, 9, stride=4, padding=4, dtype=self.dtype,
            name="pre_filter",
        )(x_ftr)
        ftr = ftr * x_mask
        half = self.n_layers // 2
        src = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate, half,
            gin_channels=self.gin_channels, dtype=self.dtype, name="source_enc",
        )(src, x_mask, g=g2)
        ftr = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate, half,
            gin_channels=self.gin_channels, dtype=self.dtype, name="filter_enc",
        )(ftr, x_mask, g=g2)
        h = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate, half,
            gin_channels=self.gin_channels, dtype=self.dtype, name="enc",
        )(src + ftr, x_mask, g=g2)
        stats = Dense(2 * self.out_channels, dtype=self.dtype, name="proj")(h) * x_mask
        m, logs = stats[..., : self.out_channels], stats[..., self.out_channels :]
        if sample and rng is not None:
            z = (m + jax.random.normal(rng, m.shape, m.dtype) * jnp.exp(logs)) * x_mask
        else:
            z = m * x_mask
        return z, m, logs


class PosteriorAudioEncoder(nn.Module):
    """Acoustic posterior over linear spec (WN) + raw-wave downsampling branch."""

    in_channels: int = 641
    out_channels: int = 192
    hidden_channels: int = 192
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 256
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x_spec, x_audio, x_mask, g, rng=None, sample: bool = True):
        """x_spec: (B, T, 641); x_audio: (B, 320T, 1); returns (z, m, logs)."""
        down_rates = [8, 5, 4, 2]
        down_kernels = [17, 10, 8, 4]
        chans = [16, 32, 64, 128, 192]
        a = Conv1d(16, 7, padding=3, dtype=self.dtype, name="down_pre")(x_audio)
        for i, (u, k) in enumerate(zip(down_rates, down_kernels)):
            a = WNConv1d(
                chans[i + 1], k, stride=u, padding=(k - 1) // 2, dtype=self.dtype,
                name=f"downs_{i}",
            )(a)
            xs = None
            for j in range(3):
                r = AMPBlock(
                    chans[i + 1], [3, 7, 11][j], (1, 3, 5), dtype=self.dtype,
                    name=f"resblocks_{i * 3 + j}",
                )(a)
                xs = r if xs is None else xs + r
            a = xs / 3.0
        a = AASnakeBeta(chans[-1], alpha_logscale=True, name="activation_post")(a)
        a = Conv1d(self.hidden_channels, 7, padding=3, dtype=self.dtype, name="conv_post")(a)

        x = Dense(self.hidden_channels, dtype=self.dtype, name="pre")(x_spec) * x_mask
        x = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate, self.n_layers,
            gin_channels=self.gin_channels, dtype=self.dtype, name="enc",
        )(x, x_mask, g=g[:, None, :])
        a = a * x_mask
        h = jnp.concatenate([x, a], axis=-1)
        stats = Dense(2 * self.out_channels, dtype=self.dtype, name="proj")(h) * x_mask
        m, logs = stats[..., : self.out_channels], stats[..., self.out_channels :]
        if sample and rng is not None:
            z = (m + jax.random.normal(rng, m.shape, m.dtype) * jnp.exp(logs)) * x_mask
        else:
            z = m * x_mask
        return z, m, logs


class MelDecoder(nn.Module):
    """Aux transformer head decoding z -> 20-bin prosody mel (training distill)."""

    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 2
    kernel_size: int = 5
    p_dropout: float = 0.1
    mel_size: int = 20
    gin_channels: int = 256
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic: bool = True):
        y = Conv1d(self.hidden_channels, 3, padding=1, dtype=self.dtype, name="conv_pre")(
            x * x_mask
        )
        if g is not None:
            y = y + Dense(self.hidden_channels, dtype=self.dtype, name="cond")(g)[:, None, :]
        y = Encoder(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            dtype=self.dtype,
            name="encoder",
        )(y * x_mask, x_mask, deterministic=deterministic)
        y = Dense(self.mel_size, use_bias=False, dtype=self.dtype, name="proj")(y)
        return y * x_mask


class SourceNetwork(nn.Module):
    """Harmonic excitation generator from z (x4 upsampling)."""

    upsample_initial_channel: int = 256
    initial_channel: int = 192
    gin_channels: int = 256
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, g) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, T, C_in); g: (B, Gin) -> (e: (B, 4T, C/4), e_: (B, 4T, 1))."""
        resblock_kernels = [3, 5, 7]
        up_rates = [2, 2]
        up_kernels = [4, 4]
        uic = self.upsample_initial_channel

        from megatts2_hierspeechpp_tpu.nn.resblocks import fused_triple_enabled

        y = WNConv1d(uic, 7, padding=3, dtype=self.dtype, name="conv_pre")(x)
        y = y + Dense(uic, dtype=self.dtype, name="cond")(g)[:, None, :]
        ch = uic
        for i, (u, k) in enumerate(zip(up_rates, up_kernels)):
            ch = uic // (2 ** (i + 1))
            y = WNConvTranspose1d(
                ch, k, stride=u, padding=(k - u) // 2, dtype=self.dtype, name=f"ups_{i}"
            )(y)
            blocks = [
                AMPBlock(ch, rk, (1, 3, 5), dtype=self.dtype,
                         name=f"resblocks_{i * 3 + j}")
                for j, rk in enumerate(resblock_kernels)
            ]
            if fused_triple_enabled(ch):
                from megatts2_hierspeechpp_tpu.ops.pallas_amp_triple import (
                    fused_amp_triple,
                )

                bws = [blk(y, return_weights=True) for blk in blocks]
                y = fused_amp_triple(
                    y, bws, tuple(resblock_kernels), ((1, 3, 5),) * 3)
            else:
                xs = None
                for blk in blocks:
                    r = blk(y)
                    xs = r if xs is None else xs + r
                y = xs / 3.0
        y = AASnakeBeta(ch, alpha_logscale=True, name="activation_post")(y)
        e_ = Conv1d(1, 7, padding=3, use_bias=False, dtype=self.dtype, name="conv_post")(y)
        return y, e_


class DBlock(nn.Module):
    """Pitch/excitation downsampling block of the Generator."""

    hidden_size: int
    factor: int
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        size = x.shape[1] // self.factor
        residual = WNConv1d(self.hidden_size, 1, dtype=self.dtype, name="residual_dense")(x)
        residual = _interp_linear(residual, size)
        y = _interp_linear(x, size)
        for i, d in enumerate([1, 2, 4]):
            y = leaky_relu(y)
            y = WNConv1d(
                self.hidden_size, 3, dilation=d, padding=d, dtype=self.dtype,
                name=f"conv_{i}",
            )(y)
        return y + residual


def _interp_linear(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) on (B, T, C)."""
    b, t, c = x.shape
    if out_len == t:
        return x
    scale = t / out_len
    pos = (jnp.arange(out_len) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, t - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = (pos - lo)[None, :, None].astype(x.dtype)
    return x[:, lo, :] * (1 - w) + x[:, hi, :] * w


class Generator(nn.Module):
    """BigVGAN-style decoder with source excitation conditioning."""

    initial_channel: int = 192
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Sequence[int] = (4, 5, 4, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (8, 11, 8, 4, 4)
    gin_channels: int = 256
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, pitch, g=None) -> jnp.ndarray:
        """x: (B, T, C); pitch (excitation e): (B, 4T, C_e); g: (B, Gin)."""
        uic = self.upsample_initial_channel
        num_kernels = len(self.resblock_kernel_sizes)

        y = WNConv1d(uic, 7, padding=3, dtype=self.dtype, name="conv_pre")(x)
        y = y + DBlock(uic, 4, dtype=self.dtype, name="downs")(pitch)
        if g is not None:
            y = y + Dense(uic, dtype=self.dtype, name="cond")(g)[:, None, :]

        from megatts2_hierspeechpp_tpu.nn.resblocks import fused_triple_enabled

        ks = tuple(self.resblock_kernel_sizes)
        dils = tuple(tuple(rd) for rd in self.resblock_dilation_sizes)
        n_stages = len(self.upsample_rates)
        ch = uic
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = uic // (2 ** (i + 1))
            y = WNConvTranspose1d(
                ch, k, stride=u, padding=(k - u) // 2, dtype=self.dtype, name=f"ups_{i}"
            )(y)
            if i == 0:
                p = Conv1d(uic // 2, 7, padding=3, dtype=self.dtype, name="proj")(pitch)
                y = y + p
            blocks = [
                AMPBlock(ch, rk, rd, dtype=self.dtype,
                         name=f"resblocks_{i * num_kernels + j}")
                for j, (rk, rd) in enumerate(zip(ks, dils))
            ]
            last = i == n_stages - 1
            if last:
                act_post = AASnakeBeta(ch, alpha_logscale=True,
                                       name="activation_post")
                conv_post = Conv1d(1, 7, padding=3, use_bias=False,
                                   dtype=self.dtype, name="conv_post")
            if fused_triple_enabled(ch):
                # whole stage (3 AMPBlocks + avg [+ tail on the last stage])
                # as ONE Pallas pass — ops/pallas_amp_triple
                from megatts2_hierspeechpp_tpu.ops.pallas_amp_triple import (
                    fused_amp_triple,
                )

                bws = [blk(y, return_weights=True) for blk in blocks]
                if last:
                    pa, pb = act_post(y, return_params=True)
                    pk, _ = conv_post(y, return_kernel=True)
                    return fused_amp_triple(
                        y, bws, ks, dils,
                        post=(pa, 1.0 / (pb + 1e-9), pk[:, :, 0]))
                y = fused_amp_triple(y, bws, ks, dils)
            else:
                xs = None
                for blk in blocks:
                    r = blk(y)
                    xs = r if xs is None else xs + r
                y = xs / num_kernels

        y = act_post(y)
        y = conv_post(y)
        return jnp.tanh(y)


class HierVocoder(nn.Module):
    """Full HierSpeech++ vocoder (SynthesizerTrn equivalent)."""

    spec_channels: int = 641
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Sequence[int] = (4, 5, 4, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (8, 11, 8, 4, 4)
    gin_channels: int = 256
    prosody_size: int = 20
    posterior_wn_layers: int = 16  # reference-fixed; reducible for small tests
    n_flows: int = 4
    flow_layers: int = 3
    dtype: Dtype | None = None

    def setup(self):
        self.enc_p_l = PosteriorSFEncoder(
            1024, self.inter_channels, self.hidden_channels, 5, 1,
            self.posterior_wn_layers,
            gin_channels=self.gin_channels, dtype=self.dtype,
        )
        self.flow_l = ResidualCouplingBlockTransformer(
            self.inter_channels, self.hidden_channels, n_layers=self.flow_layers,
            n_flows=self.n_flows,
            gin_channels=self.gin_channels, attention_heads=2, dtype=self.dtype,
        )
        self.enc_p = PosteriorSFEncoder(
            1024, self.inter_channels, self.hidden_channels, 5, 1,
            self.posterior_wn_layers,
            gin_channels=self.gin_channels, dtype=self.dtype,
        )
        self.enc_q = PosteriorAudioEncoder(
            self.spec_channels, self.inter_channels, self.hidden_channels, 5, 1,
            self.posterior_wn_layers,
            gin_channels=self.gin_channels, dtype=self.dtype,
        )
        self.flow = ResidualCouplingBlockTransformer(
            self.inter_channels, self.hidden_channels, n_layers=self.flow_layers,
            n_flows=self.n_flows,
            gin_channels=self.gin_channels, attention_heads=2, dtype=self.dtype,
        )
        self.mel_decoder = MelDecoder(
            self.inter_channels, self.filter_channels, n_heads=2, n_layers=2,
            kernel_size=5, p_dropout=0.1, mel_size=self.prosody_size,
            gin_channels=self.gin_channels, dtype=self.dtype,
        )
        self.dec = Generator(
            self.inter_channels, self.resblock_kernel_sizes,
            self.resblock_dilation_sizes, self.upsample_rates,
            self.upsample_initial_channel, self.upsample_kernel_sizes,
            gin_channels=self.gin_channels, dtype=self.dtype,
        )
        self.sn = SourceNetwork(
            self.upsample_initial_channel // 2, self.inter_channels,
            self.gin_channels, dtype=self.dtype,
        )
        self.emb_g = StyleEncoder(80, 256, self.gin_channels, dtype=self.dtype)

    def __call__(self, x_mel, w2v, x_mask, f0, rng=None):
        """Inference path (reference infer :635-651). x_mel: (B, T, 80);
        w2v: (B, T, 1024); x_mask: (B, T, 1); f0: (B, 4T, 1)."""
        g = self.emb_g(x_mel, x_mask)
        z, m, logs = self.enc_p_l(w2v, f0, x_mask, g, rng=rng, sample=rng is not None)
        z = self.flow_l(z, x_mask, g, reverse=True)
        z = self.flow(z, x_mask, g, reverse=True)
        e, e_ = self.sn(z, g)
        o = self.dec(z, e, g=g)
        return o, e_

    def infer(self, x_mel, w2v, x_mask, f0, rng=None):
        return self(x_mel, w2v, x_mask, f0, rng=rng)

    def vc_latent(
        self, src_w2v, src_mask, trg_mel, trg_mask, f0, noise_scale=0.333, rng=None,
        denoise_ratio: float = 0.0,
    ):
        """Frame-level half of voice_conversion: everything whose context is
        global (style, DiT flows with full-sequence attention, SourceNetwork).
        Returns (z, e, g) for the purely-convolutional Generator, which can
        then be decoded in overlapping chunks (streaming serving path,
        TTSPipeline.tts_stream)."""
        g_all = self.emb_g(trg_mel, trg_mask)  # (2, C) or (B, C)
        if g_all.shape[0] > 1:
            g = (1 - denoise_ratio) * g_all[:1] + denoise_ratio * g_all[1:2]
        else:
            g = g_all
        return self._vc_core(src_w2v, src_mask, g, f0, noise_scale, rng)

    def _vc_core(self, src_w2v, src_mask, g, f0, noise_scale, rng):
        """vc_latent body after the style vector is known. g: (1 or B, C)."""
        _, m_p, logs_p = self.enc_p_l(src_w2v, f0, src_mask, g, sample=False)
        if rng is not None:
            z = (
                m_p
                + jax.random.normal(rng, m_p.shape, m_p.dtype)
                * jnp.exp(logs_p)
                * noise_scale
            ) * src_mask
        else:
            z = m_p * src_mask
        z = self.flow_l(z, src_mask, g, reverse=True)
        z = self.flow(z, src_mask, g, reverse=True)
        e, _ = self.sn(z, g)
        return z, e, g

    def style_pairs(self, trg_mel, trg_mask):
        """Style pairs for cached-prompt serving: trg_mel (2B, T, 80) with
        rows [orig_i; denoised_i] stacked per prompt -> (B, 2, C).

        Computed once per enrolled speaker at its OWN mel length (the
        reference StyleEncoder's sum-over-all-frames pooling makes the style
        vector padding-sensitive, styleencoder.py:83-91 — so batched serving
        must NOT re-pool prompt mels padded to a batch max)."""
        g_all = self.emb_g(trg_mel, trg_mask)
        return g_all.reshape(-1, 2, g_all.shape[-1])

    def vc_latent_from_style(
        self, src_w2v, src_mask, g_pair, f0, noise_scale=0.333, rng=None,
        denoise_ratio: float = 0.0,
    ):
        """vc_latent with precomputed style pairs (cross-prompt batched
        serving): g_pair (1 or B, 2, C) from style_pairs(); the
        [orig; denoised] interpolation happens here so denoise_ratio stays a
        traced per-call scalar."""
        g = (1 - denoise_ratio) * g_pair[:, 0] + denoise_ratio * g_pair[:, 1]
        return self._vc_core(src_w2v, src_mask, g, f0, noise_scale, rng)

    def voice_conversion_from_style(
        self, src_w2v, src_mask, g_pair, f0, noise_scale=0.333, rng=None,
        denoise_ratio: float = 0.0,
    ):
        """voice_conversion with precomputed per-row style pairs (B rows of
        src_w2v, 1-or-B rows of g_pair). Reference equivalent: none — its
        tts()/VC() recompute the style encoder every call
        (inference_plm.py:159, hierspeechpp_speechsynthesizer.py:674-699)."""
        z, e, g = self.vc_latent_from_style(
            src_w2v, src_mask, g_pair, f0, noise_scale, rng, denoise_ratio)
        return self.dec(z, e, g=g)

    def decode_latent(self, z, e, g):
        """Generator-only decode of vc_latent outputs (finite receptive
        field -> valid on overlapping chunks)."""
        return self.dec(z, e, g=g)

    def voice_conversion(
        self, src_w2v, src_mask, trg_mel, trg_mask, f0, noise_scale=0.333, rng=None,
        denoise_ratio: float = 0.0,
    ):
        """Reference voice_conversion_noise_control (:674-699): style from a
        2-row mel batch [orig; denoised], interpolated by denoise_ratio."""
        z, e, g = self.vc_latent(
            src_w2v, src_mask, trg_mel, trg_mask, f0, noise_scale, rng,
            denoise_ratio,
        )
        return self.dec(z, e, g=g)

    def f0_extraction(self, x_spec, x_mel, x_mask, x_audio, noise_scale=0.333, rng=None):
        """Excitation-signal extraction from the acoustic posterior (:700-715)."""
        g = self.emb_g(x_mel, x_mask)
        _, m_q, logs_q = self.enc_q(x_spec, x_audio, x_mask, g, sample=False)
        if rng is not None:
            z = m_q + jax.random.normal(rng, m_q.shape, m_q.dtype) * jnp.exp(
                logs_q
            ) * noise_scale
        else:
            z = m_q
        _, e_ = self.sn(z, g)
        return e_

    def train_encode(self, x_spec, x_audio, x_mel, w2v, f0, x_mask, rngs):
        """Training-side encoders (capability addition; reference ships no
        vocoder trainer): acoustic + source-filter posteriors, forward flows,
        prosody-mel distillation head and the style vector. The decoder runs
        separately on random slices (decode_slice) to bound waveform length."""
        g = self.emb_g(x_mel, x_mask)
        z_q, m_q, logs_q = self.enc_q(
            x_spec, x_audio, x_mask, g, rng=rngs["z_q"], sample=True
        )
        _, m_p, logs_p = self.enc_p(w2v, f0, x_mask, g, sample=False)
        _, m_l, logs_l = self.enc_p_l(w2v, f0, x_mask, g, sample=False)
        # acoustic z -> semantic prior space
        z_f = self.flow(z_q, x_mask, g, reverse=False)
        z_fl = self.flow_l(z_f, x_mask, g, reverse=False)
        mel_rec = self.mel_decoder(z_q, x_mask, g=g)
        return {
            "g": g,
            "mel_rec": mel_rec,
            "z_q": z_q, "m_q": m_q, "logs_q": logs_q,
            "z_f": z_f, "m_p": m_p, "logs_p": logs_p,
            "z_fl": z_fl, "m_l": m_l, "logs_l": logs_l,
        }

    def decode_slice(self, z: jnp.ndarray, g: jnp.ndarray):
        """z: (B, T_seg, C) latent slice -> (wav (B, 320*T_seg, 1), e_)."""
        e, e_ = self.sn(z, g)
        return self.dec(z, e, g=g), e_

    def init_all(self, x_spec, x_audio, x_mel, w2v, f0, x_mask, rngs):
        """Touches every submodule so `init(..., method=init_all)` creates the
        full training parameter set (enc_q etc. are unused by __call__)."""
        out = self.train_encode(x_spec, x_audio, x_mel, w2v, f0, x_mask, rngs)
        wav, e_ = self.decode_slice(out["z_q"], out["g"])
        return wav
