"""MegaTTS2-style acoustic model ("text-to-w2v", the s2-stage generator).

Re-design of /root/reference/ttv_v1/t2w2v_transformer.py SynthesizerTrn
(:721-1112) in channels-last JAX. Pipeline:

  text + tone + language --TextEncoder--> x (B, N, C)           phoneme rate
  prompt mel --MelEncoder--> keys; MRTE cross-attention adds prompt context
  + global style cond_g                                          (:819-826)
  durations --RangePredictor + GaussianUpsampling--> x_frame     100 Hz
  --stride-2 conv--> 50 Hz w2v rate                              (:836-841)
  prosody RVQ: mel[:, :, :20] -> convs -> maxpool8 -> convs -> RVQ codes,
  upsampled x8 and projected, added to x_frame                   (:843-859)
  --W2VEncoder/W2VDecoder(WN)--> 1024-d wav2vec2 prediction      (:862-863)
  --PitchPredictor--> log-f0 at 200 Hz                           (:867-875)

All sequence lengths are static bounds with explicit masks (bucketed at the
data-pipeline level) so jit caches stay small on TPU.
"""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.attention import Encoder, MultiHeadAttention
from megatts2_hierspeechpp_tpu.nn.basic import Dense, Embed, leaky_relu
from megatts2_hierspeechpp_tpu.nn.conv import Conv1d, Dtype, WNConvTranspose1d
from megatts2_hierspeechpp_tpu.nn.duration import (
    DurationPredictor,
    RangePredictor,
    gaussian_upsample,
)
from megatts2_hierspeechpp_tpu.nn.quantize import ResidualVectorQuantizer
from megatts2_hierspeechpp_tpu.nn.resblocks import ResBlock1
from megatts2_hierspeechpp_tpu.nn.styleencoder import StyleEncoder
from megatts2_hierspeechpp_tpu.nn.wavenet import WN
from megatts2_hierspeechpp_tpu.utils.masking import feature_mask


class TextEncoder(nn.Module):
    n_vocab: int
    n_tone: int
    n_language: int
    hidden_channels: int = 256
    filter_channels: int = 1024
    n_heads: int = 4
    n_layers: int = 3
    kernel_size: int = 9
    p_dropout: float = 0.2
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x_ids, tone, language, x_mask, deterministic=True):
        h = self.hidden_channels
        scale = math.sqrt(h)
        init = nn.initializers.normal(h**-0.5)
        x = Embed(self.n_vocab, h, embedding_init=init, name="emb")(x_ids) * scale
        x = x + Embed(self.n_tone, h, embedding_init=init, name="emb_tone")(tone) * scale
        x = x + Embed(self.n_language, h, embedding_init=init, name="emb_language")(
            language
        ) * scale
        x = x.astype(self.dtype or x.dtype)
        x = Encoder(
            h, self.filter_channels, self.n_heads, self.n_layers, self.kernel_size,
            self.p_dropout, dtype=self.dtype, name="encoder",
        )(x * x_mask, x_mask, deterministic=deterministic)
        x = Encoder(
            h, self.filter_channels, self.n_heads, 1, self.kernel_size,
            self.p_dropout, dtype=self.dtype, name="encoder2",
        )(x * x_mask, x_mask, deterministic=deterministic)
        return x


class MelEncoder(nn.Module):
    out_channels: int = 256
    hidden_channels: int = 80
    filter_channels: int = 320
    n_heads: int = 4
    n_layers: int = 2
    kernel_size: int = 9
    p_dropout: float = 0.2
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, mel, mel_mask, deterministic=True):
        x = Encoder(
            self.hidden_channels, self.filter_channels, self.n_heads, self.n_layers,
            self.kernel_size, self.p_dropout, dtype=self.dtype, name="encoder",
        )(mel * mel_mask, mel_mask, deterministic=deterministic)
        x = Dense(self.out_channels, dtype=self.dtype, name="proj")(x) * mel_mask
        return x


class W2VEncoder(nn.Module):
    hidden_channels: int = 256
    filter_channels: int = 1024
    n_heads: int = 4
    n_layers: int = 3
    kernel_size: int = 9
    p_dropout: float = 0.2
    gin_channels: int = 256
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, x_mask, g, deterministic=True):
        x = x + Dense(self.hidden_channels, dtype=self.dtype, name="cond")(g)[:, None, :]
        x = Encoder(
            self.hidden_channels, self.filter_channels, self.n_heads, self.n_layers,
            self.kernel_size, self.p_dropout, dtype=self.dtype, name="encoder",
        )(x * x_mask, x_mask, deterministic=deterministic)
        x = Encoder(
            self.hidden_channels, self.filter_channels, self.n_heads, 1,
            self.kernel_size, self.p_dropout, dtype=self.dtype, name="encoder2",
        )(x * x_mask, x_mask, deterministic=deterministic)
        return x


class W2VDecoder(nn.Module):
    hidden_channels: int = 512
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 8
    output_size: int = 1024
    gin_channels: int = 256
    p_dropout: float = 0.1
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, x_mask, g, deterministic=True):
        y = Dense(self.hidden_channels, dtype=self.dtype, name="pre")(x * x_mask)
        y = y * x_mask
        y = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate, self.n_layers,
            gin_channels=self.gin_channels, p_dropout=self.p_dropout, dtype=self.dtype,
            name="enc",
        )(y, x_mask, g=g[:, None, :], deterministic=deterministic)
        y = Dense(self.output_size, dtype=self.dtype, name="proj")(y) * x_mask
        return y


class PitchPredictor(nn.Module):
    """HiFiGAN-style mini-generator: w2v (50 Hz) -> log-f0 (200 Hz)."""

    initial_channel: int = 1024
    upsample_initial_channel: int = 256
    gin_channels: int = 256
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, g):
        uic = self.upsample_initial_channel
        resblock_kernels = [3, 5, 7]
        y = Conv1d(uic, 7, padding=3, dtype=self.dtype, name="conv_pre")(x)
        y = y + Dense(uic, dtype=self.dtype, name="cond")(g)[:, None, :]
        ch = uic
        for i in range(2):
            ch = uic // (2 ** (i + 1))
            y = leaky_relu(y)
            y = WNConvTranspose1d(ch, 4, stride=2, padding=1, dtype=self.dtype,
                                  name=f"ups_{i}")(y)
            xs = None
            for j, rk in enumerate(resblock_kernels):
                r = ResBlock1(ch, rk, (1, 3, 5), dtype=self.dtype,
                              name=f"resblocks_{i * 3 + j}")(y)
                xs = r if xs is None else xs + r
            y = xs / 3.0
        y = leaky_relu(y, 0.01)  # final act uses torch's default slope (:458)
        y = Conv1d(1, 7, padding=3, use_bias=False, dtype=self.dtype, name="conv_post")(y)
        return y


class PLMConv(nn.Module):
    hidden_channels: int = 20
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, mask):
        x = Conv1d(self.hidden_channels, 5, padding=2, dtype=self.dtype, name="conv1")(
            x * mask
        )
        x = Conv1d(self.hidden_channels, 5, padding=2, dtype=self.dtype, name="conv2")(
            x * mask
        )
        return x * mask


def max_pool8(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool1d(kernel=8, stride=8) on (B, T, C); T truncated to multiple of 8."""
    b, t, c = x.shape
    t8 = (t // 8) * 8
    return jnp.max(x[:, :t8].reshape(b, t8 // 8, 8, c), axis=2)


def upsample_codes(x: jnp.ndarray, stride: int, out_len: int) -> jnp.ndarray:
    """Repeat code frames x8 back to mel rate and truncate (:852-854)."""
    b, t = x.shape[0], x.shape[1]
    y = jnp.repeat(x, stride, axis=1)
    return y[:, :out_len]


class TTVModel(nn.Module):
    """SynthesizerTrn equivalent (acoustic stage)."""

    n_vocab: int = 200
    n_tone: int = 10
    n_language: int = 3
    spec_channels: int = 641
    inter_channels: int = 256
    hidden_channels: int = 256
    filter_channels: int = 1024
    gin_channels: int = 256
    prosody_size: int = 20
    vq_bins: int = 1024
    stride: int = 8
    # reference-fixed depths; reducible for fast tests
    text_layers: int = 3
    mel_enc_layers: int = 2
    w2v_enc_layers: int = 3
    w2v_dec_layers: int = 8
    dtype: Dtype | None = None

    def setup(self):
        ic = self.inter_channels
        self.enc_p = TextEncoder(
            self.n_vocab, self.n_tone, self.n_language, ic, ic * 4,
            n_heads=4, n_layers=self.text_layers, kernel_size=9, p_dropout=0.2,
            dtype=self.dtype,
        )
        self.mel_encoder = MelEncoder(
            out_channels=256, hidden_channels=80, filter_channels=80 * 4,
            n_heads=4, n_layers=self.mel_enc_layers, kernel_size=9, p_dropout=0.2,
            dtype=self.dtype,
        )
        self.mha = MultiHeadAttention(ic, ic, 4, window_size=None, p_dropout=0.2,
                                      dtype=self.dtype)
        self.cond_g = Dense(ic, dtype=self.dtype)
        self.w2v_encoder = W2VEncoder(
            ic, ic * 4, 4, self.w2v_enc_layers, 9, 0.2, self.gin_channels,
            dtype=self.dtype,
        )
        self.w2v_decoder = W2VDecoder(
            ic * 2, 5, 1, self.w2v_dec_layers, output_size=1024,
            gin_channels=256, p_dropout=0.1, dtype=self.dtype,
        )
        self.emb_g = StyleEncoder(80, 256, 256, dtype=self.dtype)
        self.duration_predictor = DurationPredictor(
            filter_channels=256, gin_channels=self.gin_channels, p_dropout=0.5,
            dtype=self.dtype,
        )
        self.range_predictor = RangePredictor(256, dtype=self.dtype)
        self.dur_downsample = Conv1d(
            self.hidden_channels, 1, stride=2, padding=0, dtype=self.dtype
        )
        self.pp = PitchPredictor(1024, 256, self.gin_channels, dtype=self.dtype)
        self.plm_conv1 = PLMConv(self.prosody_size, dtype=self.dtype)
        self.plm_conv2 = PLMConv(self.prosody_size, dtype=self.dtype)
        self.quantizer = ResidualVectorQuantizer(
            dimension=self.prosody_size, n_q=1, bins=self.vq_bins
        )
        self.ssl_proj = Dense(ic, dtype=self.dtype)

    # ---------- shared sub-paths ----------

    def _text_mrte(self, x_ids, tone, language, x_mask, mrte_mel, mrte_mel_mask, g,
                   deterministic=True):
        x = self.enc_p(x_ids, tone, language, x_mask, deterministic=deterministic)
        mel_enc = self.mel_encoder(mrte_mel, mrte_mel_mask, deterministic=deterministic)
        attn_mask = (x_mask[:, None, :, 0:1] * mrte_mel_mask[:, None, None, :, 0]).astype(bool)
        mha_out = self.mha(x, mel_enc, attn_mask, deterministic=deterministic)
        x = x + mha_out + self.cond_g(g)[:, None, :]
        return x

    def _upsample_to_frames(self, x, dur, x_lengths, out_length):
        rng_pred = self.range_predictor(x, dur, x_lengths)
        rng_pred = jnp.minimum(rng_pred, dur * 2)
        rng_pred = jnp.maximum(rng_pred, 1e-5)
        x_frame = gaussian_upsample(x, dur, rng_pred, x_lengths, out_length)
        x_frame = self.dur_downsample(x_frame)  # ceil(out_length / 2)
        return x_frame

    def _prosody_codes(self, mel, mel_mask, mel_pool_mask, train=False, rng=None):
        """mel: (B, T, 80) -> (quantized (B, T//8, 20), codes, commit)."""
        m = mel[..., : self.prosody_size].astype(jnp.float32)
        m = self.plm_conv1(m, mel_mask)
        m = max_pool8(m)
        m = self.plm_conv2(m, mel_pool_mask)
        quantized, codes, commit = self.quantizer(m, train=train, rng=rng)
        return quantized, codes, commit

    def pre_vq_features(self, mel, mel_lengths):
        """Quantizer *input* features (plm_conv1 -> pool8 -> plm_conv2) for
        k-means codebook init — the reference fits k-means on exactly these
        first-batch activations inside the forward (quantize_spectrogram.py
        kmeans_init path), not on raw pooled mel."""
        mel_len = mel.shape[1]
        mel_mask = feature_mask(mel_lengths, mel_len)
        mel_pool_mask = feature_mask(
            jnp.ceil(mel_lengths / 8).astype(jnp.int32), mel_len // 8
        )
        m = mel[..., : self.prosody_size].astype(jnp.float32)
        m = self.plm_conv1(m, mel_mask)
        m = max_pool8(m)
        m = self.plm_conv2(m, mel_pool_mask)
        return m, mel_pool_mask

    # ---------- training forward (:807-885) ----------

    def __call__(
        self,
        x_ids, tone, language, x_lengths,
        w2v, w2v_lengths,
        mel, mel_lengths,
        pitch, pitch_lengths,
        dur,
        mrte_mel, mrte_mel_lengths,
        teacher_force_w2v: bool = True,
        deterministic: bool = True,
        vq_rng=None,
        train_vq: bool = False,
    ):
        n = x_ids.shape[1]
        mel_len = mel.shape[1]
        x_mask = feature_mask(x_lengths, n)
        mel_mask = feature_mask(mel_lengths, mel_len)
        mrte_mask = feature_mask(mrte_mel_lengths, mrte_mel.shape[1])
        pool_len = mel_len // 8
        mel_pool_mask = feature_mask(
            jnp.ceil(mel_lengths / 8).astype(jnp.int32), pool_len
        )
        pitch_mask = feature_mask(pitch_lengths, pitch.shape[1])

        g = self.emb_g(mrte_mel, mrte_mask, deterministic=deterministic)
        x = self._text_mrte(
            x_ids, tone, language, x_mask, mrte_mel, mrte_mask, g,
            deterministic=deterministic,
        )

        # duration loss (log-domain MSE vs MFA durations, :830-834)
        logw_ = jnp.log(dur.astype(jnp.float32) + 1)[:, :, None] * x_mask
        logw = self.duration_predictor(x, x_mask, g, deterministic=deterministic)
        l_length = jnp.sum(jnp.square(logw - logw_)) / jnp.sum(x_mask)

        x_frame = self._upsample_to_frames(x, dur, x_lengths, mel_len * 2)
        x_frame = x_frame[:, :mel_len]

        quantized, codes, commit_loss = self._prosody_codes(
            mel, mel_mask, mel_pool_mask, train=train_vq, rng=vq_rng
        )
        q_up = upsample_codes(quantized, self.stride, mel_len) * mel_mask
        x_frame = x_frame + self.ssl_proj(q_up) * mel_mask

        y_mask = feature_mask(w2v_lengths, w2v.shape[1])
        x2v = self.w2v_encoder(x_frame, y_mask, g, deterministic=deterministic)
        w2v_pred = self.w2v_decoder(x2v, y_mask, g, deterministic=deterministic)

        # teacher_force_w2v may be a traced bool (sampled per step in training)
        if isinstance(teacher_force_w2v, bool):
            pp_in = w2v if teacher_force_w2v else w2v_pred
        else:
            pp_in = jnp.where(teacher_force_w2v, w2v, w2v_pred)
        pred_lf0 = self.pp(pp_in, g)[..., 0] * pitch_mask[..., 0]
        lf0 = jnp.log(pitch.astype(jnp.float32) + 1)
        l_pitch = jnp.mean(jnp.abs(pred_lf0 - lf0))

        return {
            "l_length": l_length,
            "l_pitch": l_pitch,
            "pred_lf0": pred_lf0,
            "w2v_pred": w2v_pred,
            "commit_loss": commit_loss,
            "codes": codes,
            "y_mask": y_mask,
            "x_mask": x_mask,
        }

    # ---------- s1-stage latent extraction (:888-930) ----------

    def extract_tc_latent_code(
        self, x_ids, tone, language, x_lengths, mel, mel_lengths, dur,
        mrte_mel, mrte_mel_lengths,
    ):
        n = x_ids.shape[1]
        mel_len = mel.shape[1]
        x_mask = feature_mask(x_lengths, n)
        mel_mask = feature_mask(mel_lengths, mel_len)
        mrte_mask = feature_mask(mrte_mel_lengths, mrte_mel.shape[1])
        pool_len = mel_len // 8
        mel_pool_mask = feature_mask(
            jnp.ceil(mel_lengths / 8).astype(jnp.int32), pool_len
        )

        g = self.emb_g(mrte_mel, mrte_mask)
        x = self._text_mrte(x_ids, tone, language, x_mask, mrte_mel, mrte_mask, g)
        x_frame = self._upsample_to_frames(x, dur, x_lengths, mel_len * 2)
        x_frame = x_frame[:, :mel_len]

        _, codes, _ = self._prosody_codes(mel, mel_mask, mel_pool_mask)
        # codes: (n_q=1, B, T/8) -> frame-rate code ids (B, T)
        lr_codes = upsample_codes(codes[0][..., None], self.stride, mel_len)[..., 0]
        lr_codes = (lr_codes * mel_mask[..., 0]).astype(jnp.int32)
        return x_frame, lr_codes

    def pooled_prosody_codes(self, mel, mel_lengths):
        """mel (B, T, 80) -> RVQ code ids at the pooled (T/8) rate — the
        3-get-semantic-s.py extraction contract (:76-99)."""
        mel_len = mel.shape[1]
        mel_mask = feature_mask(mel_lengths, mel_len)
        pool_len = mel_len // 8
        mel_pool_mask = feature_mask(
            jnp.ceil(mel_lengths / 8).astype(jnp.int32), pool_len
        )
        _, codes, _ = self._prosody_codes(mel, mel_mask, mel_pool_mask)
        return codes[0].astype(jnp.int32)  # (B, T/8)

    def prompt_codes(self, mel, mel_lengths):
        """Prompt-mel RVQ code ids at frame rate (the reference's no-PLM
        inference path derives prosody from the prompt's own codes,
        t2w2v_transformer.py infer :1042-1053)."""
        mel_len = mel.shape[1]
        mel_mask = feature_mask(mel_lengths, mel_len)
        pool_len = mel_len // 8
        mel_pool_mask = feature_mask(
            jnp.ceil(mel_lengths / 8).astype(jnp.int32), pool_len
        )
        _, codes, _ = self._prosody_codes(mel, mel_mask, mel_pool_mask)
        lr = upsample_codes(codes[0][..., None], self.stride, mel_len)[..., 0]
        return lr.astype(jnp.int32)  # (B, mel_len)

    def extract_latent(self, x):
        """mel-pooled features (B, T, 20) -> RVQ codes (B, n_q, T) (:932-935)."""
        codes = self.quantizer.encode(x)
        return jnp.swapaxes(codes, 0, 1)

    # ---------- inference (:938-994, :997-1077) ----------

    def inf_extract_tc_latent(
        self, x_ids, tone, language, x_lengths, y_mel, y_lengths, out_length,
        mrte_mel=None, mrte_mel_lengths=None, length_scale: float = 1.0,
    ):
        """Returns (x_frame (B, ceil(out_length/2), C), g, frame_lengths, frame_mask).

        out_length is the static frame budget (>= max total duration); the true
        length is sum(ceil(exp(logw)))/2 per utterance, returned as lengths.
        """
        n = x_ids.shape[1]
        x_mask = feature_mask(x_lengths, n)
        if mrte_mel is None:
            mrte_mel, mrte_mel_lengths = y_mel, y_lengths
        mrte_mask = feature_mask(mrte_mel_lengths, mrte_mel.shape[1])

        g = self.emb_g(mrte_mel, mrte_mask)
        x = self._text_mrte(x_ids, tone, language, x_mask, mrte_mel, mrte_mask, g)

        logw = self.duration_predictor(x, x_mask, g)
        w = jnp.exp(logw) * x_mask * length_scale
        dur = jnp.ceil(w)[..., 0]

        x_frame = self._upsample_to_frames(x, dur, x_lengths, out_length)

        total = jnp.sum(dur * x_mask[..., 0], axis=1)
        frame_lengths = jnp.ceil(total / 2).astype(jnp.int32)
        frame_lengths = jnp.minimum(frame_lengths, x_frame.shape[1])
        frame_mask = feature_mask(frame_lengths, x_frame.shape[1])
        return x_frame, g, frame_lengths, frame_mask

    def predict_frame_lengths(
        self, x_ids, tone, language, x_lengths, mrte_mel, mrte_mel_lengths,
        length_scale: float = 1.0,
    ):
        """Duration-only serving pre-pass: the first half of
        inf_extract_tc_latent (text encoder + MRTE + duration predictor),
        returning just the predicted 50 Hz frame lengths (B,). Lets the
        pipeline size the PLM-decode/vocoder buckets from the TRUE predicted
        length instead of a worst-case frames-per-phone budget — the decode
        scan and the vocoder otherwise run at the padded worst case."""
        n = x_ids.shape[1]
        x_mask = feature_mask(x_lengths, n)
        mrte_mask = feature_mask(mrte_mel_lengths, mrte_mel.shape[1])
        g = self.emb_g(mrte_mel, mrte_mask)
        x = self._text_mrte(x_ids, tone, language, x_mask, mrte_mel, mrte_mask, g)
        logw = self.duration_predictor(x, x_mask, g)
        w = jnp.exp(logw) * x_mask * length_scale
        dur = jnp.ceil(w)[..., 0]
        total = jnp.sum(dur * x_mask[..., 0], axis=1)
        return jnp.ceil(total / 2).astype(jnp.int32)

    def inf_plm_gen(self, x_frame, g, codes, frame_lengths, frame_mask):
        """codes (n_q, B, T) from the PLM -> (w2v_pred, pred_lf0) (:985-994)."""
        quantized = self.quantizer.decode(codes)
        x_frame = x_frame + self.ssl_proj(quantized)
        x2v = self.w2v_encoder(x_frame, frame_mask, g)
        w2v_pred = self.w2v_decoder(x2v, frame_mask, g)
        pred_lf0 = self.pp(w2v_pred, g)[..., 0]
        return w2v_pred, pred_lf0

    def infer_gt_dur(
        self, x_ids, tone, language, x_lengths, mel, mel_lengths, dur,
        mrte_mel=None, mrte_mel_lengths=None,
    ):
        """GT-duration inference with prompt-VQ prosody (reference infer,
        :997-1077, dur given)."""
        n = x_ids.shape[1]
        mel_len = mel.shape[1]
        x_mask = feature_mask(x_lengths, n)
        mel_mask = feature_mask(mel_lengths, mel_len)
        pool_len = mel_len // 8
        mel_pool_mask = feature_mask(
            jnp.ceil(mel_lengths / 8).astype(jnp.int32), pool_len
        )
        g = self.emb_g(mel, mel_mask)
        if mrte_mel is None:
            mrte_mel, mrte_mel_lengths = mel, mel_lengths
        mrte_mask = feature_mask(mrte_mel_lengths, mrte_mel.shape[1])
        x = self._text_mrte(x_ids, tone, language, x_mask, mrte_mel, mrte_mask, g)

        x_frame = self._upsample_to_frames(x, dur, x_lengths, mel_len * 2)
        x_frame = x_frame[:, :mel_len]

        quantized, _, _ = self._prosody_codes(mel, mel_mask, mel_pool_mask)
        q_up = upsample_codes(quantized, self.stride, mel_len) * mel_mask
        x_frame = x_frame + self.ssl_proj(q_up) * mel_mask

        y_mask = mel_mask
        x2v = self.w2v_encoder(x_frame, y_mask, g)
        w2v_pred = self.w2v_decoder(x2v, y_mask, g)
        pred_lf0 = self.pp(w2v_pred, g)[..., 0]
        return w2v_pred, pred_lf0
