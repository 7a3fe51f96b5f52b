"""GPT-SoVITS-style text-to-semantic AR decoder (alternative PLM stack B).

Behavior parity with /root/reference/AR/models/t2s_model.py Text2SemanticDecoder
(:34-148) and its vall-e transformer (AR/modules/transformer.py): phoneme +
BERT-feature embeddings with sine positions (trainable alpha), audio-token
embedding, joint [x; y] sequence through post-norm transformer layers with a
combined (text-sees-text, audio-causal) + padding mask, CE-sum loss over the
audio segment with EOS-padded targets, top-k accuracy.

The reference's `infer` re-runs the full prefix per token (t2s_model.py:151-218)
and `infer_panel` hand-rolls a per-layer KV-cache dict
(patched_mha_with_cache.py:304-322). Here `decode` is a static-shape scan:
one prefill pass fills the caches for [x; prompts], then per-step attention
reads the cache — with top-k/top-p sampling, repetition penalty and EOS stop.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.models.plm import sine_positions
from megatts2_hierspeechpp_tpu.nn.basic import Dense, LayerNorm
from megatts2_hierspeechpp_tpu.nn.conv import Dtype

NEG_INF = -1e9


class T2SLayer(nn.Module):
    """Post-norm torch TransformerEncoderLayer equivalent (relu FFN)."""

    dim: int
    n_heads: int
    ffn_dim: int
    p_dropout: float = 0.1
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool = True):
        h, hd = self.n_heads, self.dim // self.n_heads
        b, t, _ = x.shape
        w = self.param("in_proj_weight", nn.initializers.lecun_normal(),
                       (3 * self.dim, self.dim))
        bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * self.dim,))
        qkv = jnp.einsum("btd,fd->btf", x, w,
                         precision=jax.lax.Precision.HIGHEST) + bias
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            precision=jax.lax.Precision.HIGHEST) / math.sqrt(hd)
        if attn_bias is not None:
            scores = scores + attn_bias
        p = jax.nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.p_dropout)(p, deterministic=deterministic)
        att = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                         precision=jax.lax.Precision.HIGHEST)
        att = att.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        att = Dense(self.dim, dtype=self.dtype, name="out_proj")(att)
        att = nn.Dropout(self.p_dropout)(att, deterministic=deterministic)
        x = LayerNorm(name="norm1")(x + att)

        y = Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(x)
        y = jax.nn.relu(y)
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = Dense(self.dim, dtype=self.dtype, name="linear2")(y)
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        return LayerNorm(name="norm2")(x + y)


class Text2Semantic(nn.Module):
    hidden_dim: int = 512
    embedding_dim: int = 512
    n_heads: int = 8
    n_layers: int = 12
    vocab_size: int = 1025  # semantic bins + EOS
    phoneme_vocab_size: int = 512
    p_dropout: float = 0.0
    top_k_acc: int = 3
    dtype: Dtype | None = None

    @property
    def eos(self):
        return self.vocab_size - 1

    def setup(self):
        e = self.embedding_dim
        init = nn.initializers.normal(1.0)
        self.bert_proj = Dense(e, dtype=self.dtype, name="bert_proj")
        self.ar_text_embedding = nn.Embed(self.phoneme_vocab_size, e,
                                          embedding_init=init)
        self.ar_audio_embedding = nn.Embed(self.vocab_size, e,
                                           embedding_init=init)
        self.text_pos_alpha = self.param("text_pos_alpha", nn.initializers.ones, (1,))
        self.audio_pos_alpha = self.param("audio_pos_alpha", nn.initializers.ones, (1,))
        self.layers = [
            T2SLayer(self.hidden_dim, self.n_heads, self.hidden_dim * 4,
                     self.p_dropout, dtype=self.dtype, name=f"layer_{i}")
            for i in range(self.n_layers)
        ]
        self.ar_predict_layer = Dense(self.vocab_size, use_bias=False,
                                      dtype=self.dtype, name="ar_predict_layer")

    def _embed_text(self, x_ids, bert_feature):
        x = self.ar_text_embedding(x_ids)
        x = x + self.bert_proj(bert_feature)
        pe = sine_positions(x.shape[1], self.embedding_dim)
        return x + self.text_pos_alpha * pe[None]

    def _embed_audio(self, y_ids, offset: int = 0):
        y = self.ar_audio_embedding(y_ids)
        pe = sine_positions(offset + y.shape[1], self.embedding_dim)[offset:]
        return y + self.audio_pos_alpha * pe[None]

    def __call__(self, x_ids, x_lens, y_ids, y_lens, bert_feature,
                 deterministic: bool = True):
        """Training forward. x_ids: (B, Nx); y_ids: (B, Ny);
        bert_feature: (B, Nx, 1024). Returns dict(loss, acc, logits)."""
        b, x_len = x_ids.shape
        y_len = y_ids.shape[1]
        x = self._embed_text(x_ids, bert_feature)

        pos_y = jnp.arange(y_len)
        y_pad = pos_y[None, :] >= y_lens[:, None]
        codes = jnp.where(y_pad, 0, y_ids)
        # pad_y_eos: input keeps codes (EOS on pads), target shifts left w/ EOS
        eos_filled = codes + self.eos * y_pad.astype(codes.dtype)
        ext = jnp.concatenate(
            [eos_filled, jnp.full((b, 1), self.eos, codes.dtype)], axis=1
        )
        y_in, targets = ext[:, :-1], ext[:, 1:]

        y = self._embed_audio(y_in)
        xy = jnp.concatenate([x, y], axis=1)
        total = x_len + y_len

        pos_x = jnp.arange(x_len)
        x_pad = pos_x[None, :] >= x_lens[:, None]
        pad_k = jnp.concatenate([x_pad, y_pad], axis=1)  # (B, total)

        # text rows see text only; audio rows causal over audio + all text
        q = jnp.arange(total)[:, None]
        kpos = jnp.arange(total)[None, :]
        text_row = q < x_len
        allowed = jnp.where(
            text_row, kpos < x_len, (kpos < x_len) | (kpos <= q)
        )
        mask = allowed[None, None] & ~pad_k[:, None, None, :]
        bias = jnp.where(mask, 0.0, NEG_INF)

        for layer in self.layers:
            xy = layer(xy, bias, deterministic=deterministic)
        logits = self.ar_predict_layer(xy[:, x_len:])  # (B, Ny, V)

        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        loss = jnp.sum(nll)  # reference: CE sum over ALL positions incl. pads

        topk = jax.lax.top_k(logits, self.top_k_acc)[1]
        hit = jnp.any(topk == targets[..., None], axis=-1)
        valid = targets != self.eos
        acc = jnp.sum(hit & valid) / jnp.maximum(jnp.sum(valid), 1)
        return {"loss": loss, "acc": acc, "logits": logits, "targets": targets}


def t2s_decode(
    params: Dict,
    model: Text2Semantic,
    x_ids: jnp.ndarray,
    bert_feature: jnp.ndarray,
    prompts: jnp.ndarray,
    max_new: int = 600,
    top_k: int = 3,
    top_p: float = 1.0,
    temperature: float = 1.0,
    repetition_penalty: float = 1.0,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KV-cached AR decode (infer_panel equivalent), B=1 oriented but batched.

    Returns (tokens (B, max_new), lengths (B,)) where lengths mark EOS stop.
    """
    nl, h = model.n_layers, model.n_heads
    d = model.hidden_dim
    hd = d // h
    eos = model.eos
    b, x_len = x_ids.shape
    p_len = prompts.shape[1]
    prefix_len = x_len + p_len
    total = prefix_len + max_new

    bound = model.bind({"params": params})
    x = bound._embed_text(x_ids, bert_feature)
    y = bound._embed_audio(prompts)
    xy = jnp.concatenate([x, y], axis=1)

    # prefill with full-visibility-text + causal-audio mask
    q = jnp.arange(prefix_len)[:, None]
    kpos = jnp.arange(prefix_len)[None, :]
    text_row = q < x_len
    allowed = jnp.where(text_row, kpos < x_len, (kpos < x_len) | (kpos <= q))
    bias = jnp.where(allowed, 0.0, NEG_INF)[None, None]

    def lp(i):
        return params[f"layer_{i}"]

    def attn_full(lp_i, xy, bias):
        w, bb = lp_i["in_proj_weight"], lp_i["in_proj_bias"]
        qkv = jnp.einsum("btd,fd->btf", xy, w) + bb
        qq, kk, vv = jnp.split(qkv, 3, axis=-1)
        t = xy.shape[1]
        qq = qq.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        kk = kk.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        vv = vv.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", qq, kk) / math.sqrt(hd) + bias
        p = jax.nn.softmax(s, axis=-1)
        att = jnp.einsum("bhqk,bhkd->bhqd", p, vv).transpose(0, 2, 1, 3)
        return att.reshape(b, t, d), kk, vv

    def _ln(p, v):
        mean = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v - mean), axis=-1, keepdims=True)
        return (v - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]

    def _dense(p, v):
        out = jnp.dot(v, p["kernel"])
        return out + p["bias"] if "bias" in p else out

    k_cache = jnp.zeros((nl, b, h, total, hd), jnp.float32)
    v_cache = jnp.zeros_like(k_cache)

    cur = xy
    for i in range(nl):
        att, kk, vv = attn_full(lp(i), cur, bias)
        k_cache = k_cache.at[i, :, :, :prefix_len].set(kk)
        v_cache = v_cache.at[i, :, :, :prefix_len].set(vv)
        att = _dense(lp(i)["out_proj"], att)
        cur = _ln(lp(i)["norm1"], cur + att)
        f = jax.nn.relu(_dense(lp(i)["linear1"], cur))
        cur = _ln(lp(i)["norm2"], cur + _dense(lp(i)["linear2"], f))
    logits0 = _dense(params["ar_predict_layer"], cur[:, -1])

    emb_table = params["ar_audio_embedding"]["embedding"]
    audio_alpha = params["audio_pos_alpha"]
    pe = sine_positions(p_len + max_new + 1, model.embedding_dim)
    positions = jnp.arange(total)
    rng0 = rng if rng is not None else jax.random.PRNGKey(0)

    def sample_from(logits, prev_counts, rng_c):
        logits = logits.astype(jnp.float32)
        if repetition_penalty != 1.0:
            seen = prev_counts > 0
            pen = jnp.where(logits < 0, logits * repetition_penalty,
                            logits / repetition_penalty)
            logits = jnp.where(seen, pen, logits)
        logits = logits / temperature
        if top_k and top_k > 0:
            vals, idxs = jax.lax.top_k(logits, top_k)
            if top_p < 1.0:
                probs = jax.nn.softmax(vals, axis=-1)
                cum = jnp.cumsum(probs, axis=-1)
                keep = (cum - probs) <= top_p
                vals = jnp.where(keep, vals, NEG_INF)
            choice = jax.random.categorical(rng_c, vals, axis=-1)
            return jnp.take_along_axis(idxs, choice[:, None], axis=-1)[:, 0]
        return jax.random.categorical(rng_c, logits, axis=-1)

    def step(carry, step_i):
        k_cache, v_cache, logits, prev_counts, done, n_emitted, rng_c = carry
        rng_c, sub = jax.random.split(rng_c)
        tok = sample_from(logits, prev_counts, sub)
        tok = jnp.where(done, eos, tok)
        is_eos = tok == eos
        new_done = done | is_eos
        emit = jnp.where(new_done, eos, tok)
        n_emitted = n_emitted + (~new_done).astype(jnp.int32)
        prev_counts = prev_counts + jax.nn.one_hot(tok, model.vocab_size,
                                                   dtype=prev_counts.dtype)

        # embed the sampled token at audio position p_len + step_i + 1
        xv = jnp.take(emb_table, tok, axis=0) + audio_alpha * pe[p_len + step_i]
        pos_abs = prefix_len + step_i

        new_k, new_v = [], []
        cur = xv
        for i in range(nl):
            lpi = lp(i)
            qkv = jnp.einsum("bd,fd->bf", cur, lpi["in_proj_weight"]) + lpi["in_proj_bias"]
            qq, kk, vv = jnp.split(qkv, 3, axis=-1)
            qq = qq.reshape(b, h, hd)
            kk = kk.reshape(b, h, hd)
            vv = vv.reshape(b, h, hd)
            kc = jax.lax.dynamic_update_index_in_dim(k_cache[i], kk, pos_abs, axis=2)
            vc = jax.lax.dynamic_update_index_in_dim(v_cache[i], vv, pos_abs, axis=2)
            new_k.append(kc)
            new_v.append(vc)
            s = jnp.einsum("bhd,bhkd->bhk", qq, kc) / math.sqrt(hd)
            s = jnp.where(positions[None, None, :] <= pos_abs, s, NEG_INF)
            p = jax.nn.softmax(s, axis=-1)
            att = jnp.einsum("bhk,bhkd->bhd", p, vc).reshape(b, d)
            att = _dense(lpi["out_proj"], att)
            cur = _ln(lpi["norm1"], cur + att)
            f = jax.nn.relu(_dense(lpi["linear1"], cur))
            cur = _ln(lpi["norm2"], cur + _dense(lpi["linear2"], f))
        logits_next = _dense(params["ar_predict_layer"], cur)
        return (
            (jnp.stack(new_k), jnp.stack(new_v), logits_next, prev_counts,
             new_done, n_emitted, rng_c),
            emit,
        )

    prev_counts = jnp.zeros((b, model.vocab_size), jnp.float32)
    prev_counts = prev_counts + jax.nn.one_hot(prompts, model.vocab_size).sum(axis=1)
    done0 = jnp.zeros((b,), bool)
    n0 = jnp.zeros((b,), jnp.int32)
    carry0 = (k_cache, v_cache, logits0, prev_counts, done0, n0, rng0)
    (_, _, _, _, _, n_emitted, _), tokens = jax.lax.scan(
        step, carry0, jnp.arange(max_new)
    )
    return jnp.swapaxes(tokens, 0, 1), n_emitted
