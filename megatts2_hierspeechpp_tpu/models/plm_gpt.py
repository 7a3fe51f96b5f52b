"""Tortoise/XTTS-style GPT prosody stack (alternative PLM stack A, compact).

Capability re-design of /root/reference/plm/ (gpt.py:43-230,382-645,
gpt_inference.py, latent_encoder.py, dvae.py) — the reference keeps this stack
experimental and un-wired (inference_plm.py uses Megatts2PLM1), with its key
capabilities being (a) a GPT-2 mel-token LM with a mel ConditioningEncoder and
start/stop tokens, generated with an HF KV cache, and (b) a DiscreteVAE mel
codec. Here:

  - `ConditioningEncoder`: conv stem + attention blocks over a prompt mel,
    first-token readout (latent_encoder.py:119-141).
  - `GPTProsody`: token-embedding GPT-2-style causal decoder (pre-norm, gelu)
    over [cond, text tokens, mel tokens] with learned positions and
    start/stop-mel tokens; CE training loss; `gpt_generate` does KV-cached
    sampling (the HF `past_key_values` equivalent as a lax.scan).
  - `DiscreteVAE`: strided conv encoder -> EMA vector-quantizer (shared
    EuclideanCodebook) -> transposed-conv decoder over mels (dvae.py:201-381).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.basic import Dense, LayerNorm
from megatts2_hierspeechpp_tpu.nn.conv import Conv1d, ConvTranspose1d, Dtype
from megatts2_hierspeechpp_tpu.nn.quantize import EuclideanCodebook

NEG_INF = -1e9


class AttentionBlock(nn.Module):
    """GroupNorm + qkv attention + residual (plm/latent_encoder.py AttentionBlock)."""

    channels: int
    n_heads: int = 8

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C)
        g = nn.GroupNorm(num_groups=32 if self.channels % 32 == 0 else 1,
                         name="norm")(x)
        qkv = Conv1d(3 * self.channels, 1, name="qkv")(g)
        b, t, _ = qkv.shape
        h = self.n_heads
        hd = self.channels // h
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, hd)
        k = k.reshape(b, t, h, hd)
        v = v.reshape(b, t, h, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, self.channels)
        return x + Conv1d(self.channels, 1, name="proj_out")(o)


class ConditioningEncoder(nn.Module):
    """Prompt mel (B, T, n_mels) -> conditioning vector (B, C)."""

    channels: int = 512
    n_attn: int = 6
    n_heads: int = 8

    @nn.compact
    def __call__(self, mel):
        x = Conv1d(self.channels, 3, padding=1, name="init")(mel)
        for i in range(self.n_attn):
            x = AttentionBlock(self.channels, self.n_heads, name=f"attn_{i}")(x)
        return x[:, 0]  # first-token readout (latent_encoder.py:139)


class GPTBlock(nn.Module):
    dim: int
    n_heads: int
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, attn_bias):
        h, hd = self.n_heads, self.dim // self.n_heads
        b, t, _ = x.shape
        y = LayerNorm(name="ln_1")(x)
        qkv = Dense(3 * self.dim, name="c_attn")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd) + attn_bias
        p = jax.nn.softmax(s, axis=-1)
        att = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3)
        x = x + Dense(self.dim, name="c_proj")(att.reshape(b, t, self.dim))
        y = LayerNorm(name="ln_2")(x)
        y = Dense(4 * self.dim, name="mlp_fc")(y)
        y = jax.nn.gelu(y, approximate=True)
        return x + Dense(self.dim, name="mlp_proj")(y)


class GPTProsody(nn.Module):
    """Causal LM over [cond ; text tokens ; start, mel tokens, stop]."""

    dim: int = 512
    n_layers: int = 8
    n_heads: int = 8
    n_text_tokens: int = 256
    n_mel_tokens: int = 1024  # + start/stop appended
    max_text: int = 402
    max_mel: int = 604
    n_mels: int = 80
    dtype: Dtype | None = None

    @property
    def start_mel(self):
        return self.n_mel_tokens

    @property
    def stop_mel(self):
        return self.n_mel_tokens + 1

    def setup(self):
        init = nn.initializers.normal(0.02)
        self.cond_encoder = ConditioningEncoder(self.dim, n_attn=4,
                                                n_heads=self.n_heads)
        self.text_emb = nn.Embed(self.n_text_tokens, self.dim, embedding_init=init)
        self.mel_emb = nn.Embed(self.n_mel_tokens + 2, self.dim,
                                embedding_init=init)
        self.text_pos = self.param("text_pos", init, (self.max_text, self.dim))
        self.mel_pos = self.param("mel_pos", init, (self.max_mel, self.dim))
        self.blocks = [
            GPTBlock(self.dim, self.n_heads, dtype=self.dtype, name=f"h_{i}")
            for i in range(self.n_layers)
        ]
        self.ln_f = LayerNorm(name="ln_f")
        self.mel_head = Dense(self.n_mel_tokens + 2, name="mel_head")

    def _assemble(self, cond_mel, text_ids, mel_in):
        cond = self.cond_encoder(cond_mel)[:, None, :]  # (B, 1, C)
        te = self.text_emb(text_ids) + self.text_pos[: text_ids.shape[1]][None]
        me = self.mel_emb(mel_in) + self.mel_pos[: mel_in.shape[1]][None]
        return jnp.concatenate([cond, te, me], axis=1)

    def __call__(self, cond_mel, text_ids, mel_tokens, mel_lens):
        """Training: CE over mel tokens with start/stop framing.

        cond_mel: (B, Tc, n_mels); text_ids: (B, Nt); mel_tokens: (B, Nm)."""
        b, nm = mel_tokens.shape
        pos = jnp.arange(nm + 1)
        # input: [start, tokens]; target: [tokens, stop@len]
        mel_in = jnp.concatenate(
            [jnp.full((b, 1), self.start_mel, mel_tokens.dtype), mel_tokens], axis=1
        )
        stop_col = jnp.full((b, nm + 1), self.stop_mel, mel_tokens.dtype)
        tgt_base = jnp.concatenate(
            [mel_tokens, jnp.full((b, 1), self.stop_mel, mel_tokens.dtype)], axis=1
        )
        targets = jnp.where(pos[None, :] < mel_lens[:, None], tgt_base, stop_col)

        x = self._assemble(cond_mel, text_ids, mel_in)
        t = x.shape[1]
        causal = jnp.tril(jnp.ones((t, t), bool))
        bias = jnp.where(causal, 0.0, NEG_INF)[None, None]
        for blk in self.blocks:
            x = blk(x, bias)
        x = self.ln_f(x)
        prefix = 1 + text_ids.shape[1]
        logits = self.mel_head(x[:, prefix:])  # (B, nm+1, V)

        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        valid = (pos[None, :] <= mel_lens[:, None]).astype(jnp.float32)
        loss = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)
        return {"loss": loss, "logits": logits, "targets": targets}


def gpt_generate(
    params: dict,
    model: GPTProsody,
    cond_mel: jnp.ndarray,
    text_ids: jnp.ndarray,
    max_new: int = 300,
    top_k: int = 50,
    temperature: float = 1.0,
    rng: Optional[jax.Array] = None,
):
    """KV-cached sampling (HF past_key_values equivalent, plm/gpt_inference.py).

    Returns (tokens (B, max_new), lengths). Prefill runs [cond; text; start]
    once; each step attends to the cache."""
    bound = model.bind({"params": params})
    b = text_ids.shape[0]
    start = jnp.full((b, 1), model.start_mel, jnp.int32)
    x = bound._assemble(cond_mel, text_ids, start)
    prefix_len = x.shape[1]
    total = prefix_len + max_new
    nl, h = model.n_layers, model.n_heads
    d, hd = model.dim, model.dim // model.n_heads

    def lp(i):
        return params[f"h_{i}"]

    def _ln(p, v):
        mean = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v - mean), axis=-1, keepdims=True)
        return (v - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]

    def _dense(p, v):
        out = jnp.dot(v, p["kernel"])
        return out + p["bias"] if "bias" in p else out

    # prefill
    causal = jnp.tril(jnp.ones((prefix_len, prefix_len), bool))
    bias = jnp.where(causal, 0.0, NEG_INF)[None, None]
    k_cache = jnp.zeros((nl, b, h, total, hd), jnp.float32)
    v_cache = jnp.zeros_like(k_cache)
    cur = x
    for i in range(nl):
        p_i = lp(i)
        y = _ln(p_i["ln_1"], cur)
        qkv = _dense(p_i["c_attn"], y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        t = cur.shape[1]
        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k_cache = k_cache.at[i, :, :, :prefix_len].set(k)
        v_cache = v_cache.at[i, :, :, :prefix_len].set(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd) + bias
        att = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)
        cur = cur + _dense(p_i["c_proj"],
                           att.transpose(0, 2, 1, 3).reshape(b, t, d))
        y = _ln(p_i["ln_2"], cur)
        cur = cur + _dense(p_i["mlp_proj"],
                           jax.nn.gelu(_dense(p_i["mlp_fc"], y), approximate=True))
    logits0 = _dense(params["mel_head"],
                     _ln(params["ln_f"], cur[:, -1]))

    mel_table = params["mel_emb"]["embedding"]
    mel_pos = params["mel_pos"]
    positions = jnp.arange(total)
    rng0 = rng if rng is not None else jax.random.PRNGKey(0)

    def step(carry, step_i):
        k_cache, v_cache, logits, done, n_emitted, rng_c = carry
        rng_c, sub = jax.random.split(rng_c)
        logits = logits / temperature
        if top_k > 0:
            vals, idxs = jax.lax.top_k(logits, top_k)
            choice = jax.random.categorical(sub, vals, axis=-1)
            tok = jnp.take_along_axis(idxs, choice[:, None], axis=-1)[:, 0]
        else:
            tok = jax.random.categorical(sub, logits, axis=-1)
        tok = jnp.where(done, model.stop_mel, tok).astype(jnp.int32)
        new_done = done | (tok == model.stop_mel)
        n_emitted = n_emitted + (~new_done).astype(jnp.int32)

        cur = jnp.take(mel_table, tok, axis=0) + mel_pos[1 + step_i]
        pos_abs = prefix_len + step_i
        new_k, new_v = [], []
        for i in range(nl):
            p_i = lp(i)
            y = _ln(p_i["ln_1"], cur)
            qkv = _dense(p_i["c_attn"], y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, h, hd)
            k = k.reshape(b, h, hd)
            v = v.reshape(b, h, hd)
            kc = jax.lax.dynamic_update_index_in_dim(k_cache[i], k, pos_abs, axis=2)
            vc = jax.lax.dynamic_update_index_in_dim(v_cache[i], v, pos_abs, axis=2)
            new_k.append(kc)
            new_v.append(vc)
            s = jnp.einsum("bhd,bhkd->bhk", q, kc) / math.sqrt(hd)
            s = jnp.where(positions[None, None, :] <= pos_abs, s, NEG_INF)
            att = jnp.einsum("bhk,bhkd->bhd", jax.nn.softmax(s, -1), vc)
            cur = cur + _dense(p_i["c_proj"], att.reshape(b, d))
            y = _ln(p_i["ln_2"], cur)
            cur = cur + _dense(p_i["mlp_proj"],
                               jax.nn.gelu(_dense(p_i["mlp_fc"], y),
                                           approximate=True))
        logits_next = _dense(params["mel_head"], _ln(params["ln_f"], cur))
        return ((jnp.stack(new_k), jnp.stack(new_v), logits_next, new_done,
                 n_emitted, rng_c), tok)

    carry0 = (k_cache, v_cache, logits0, jnp.zeros((b,), bool),
              jnp.zeros((b,), jnp.int32), rng0)
    (_, _, _, _, n_emitted, _), tokens = jax.lax.scan(
        step, carry0, jnp.arange(max_new)
    )
    return jnp.swapaxes(tokens, 0, 1), n_emitted


class DiscreteVAE(nn.Module):
    """Tortoise DVAE mel codec (plm/dvae.py compact): strided conv encoder ->
    EMA codebook -> transposed-conv decoder; MSE recon + commit loss."""

    channels: int = 256
    codebook_size: int = 512
    codebook_dim: int = 256
    n_mels: int = 80
    downsamples: int = 2  # x4 temporal compression

    def setup(self):
        self.enc_layers = [
            Conv1d(self.channels, 4, stride=2, padding=1, name=f"enc_{i}")
            for i in range(self.downsamples)
        ]
        self.enc_out = Conv1d(self.codebook_dim, 3, padding=1, name="enc_out")
        self.codebook = EuclideanCodebook(self.codebook_dim, self.codebook_size)
        self.dec_in = Conv1d(self.channels, 3, padding=1, name="dec_in")
        self.dec_layers = [
            ConvTranspose1d(self.channels, 4, stride=2, padding=1, name=f"dec_{i}")
            for i in range(self.downsamples)
        ]
        self.dec_out = Conv1d(self.n_mels, 3, padding=1, name="dec_out")

    def encode(self, mel):
        x = mel
        for layer in self.enc_layers:
            x = jax.nn.relu(layer(x))
        x = self.enc_out(x)
        return self.codebook.encode(x)

    def decode(self, codes):
        x = self.codebook.decode(codes)
        x = jax.nn.relu(self.dec_in(x))
        for layer in self.dec_layers:
            x = jax.nn.relu(layer(x))
        return self.dec_out(x)

    def __call__(self, mel, train: bool = False, rng=None):
        x = mel
        for layer in self.enc_layers:
            x = jax.nn.relu(layer(x))
        z = self.enc_out(x)
        quantized, codes = self.codebook(z, train=train, rng=rng)
        commit = jnp.mean(jnp.square(jax.lax.stop_gradient(quantized) - z))
        quantized = z + jax.lax.stop_gradient(quantized - z)
        y = jax.nn.relu(self.dec_in(quantized))
        for layer in self.dec_layers:
            y = jax.nn.relu(layer(y))
        recon = self.dec_out(y)
        t = min(recon.shape[1], mel.shape[1])
        loss_recon = jnp.mean(jnp.square(recon[:, :t] - mel[:, :t]))
        return {"recon": recon, "codes": codes, "commit": commit,
                "loss": loss_recon + 0.25 * commit}
