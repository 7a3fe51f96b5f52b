"""Prosody language model (Megatts2PLM1) with a KV-cached decode loop.

Behavior parity with /root/reference/ttv_v1/t2w2v_transformer.py:627-718 and
ttv_v1/transformer_mega.py: a 4-layer pre-norm causal transformer over
concat(frame-level text latent 256, previous-prosody-code embedding 20) with
sinusoidal positions; CE loss (ignore_index=1025, go token 1024), top-10
accuracy; greedy decode.

The reference's `infer` re-runs the full transformer on the whole prefix every
step — O(T^2 * L) (inference_plm.py:162, SURVEY.md §3.3). Greedy decoding is
KV-cache invariant, so `decode_greedy` (a pure jittable function over the param
pytree) produces the *same* code sequence in O(T * L) with a static-shape
`lax.scan`: per step one token's q/k/v are computed, k/v are written into a
(T_max,) cache, and attention masks positions > t. Top-k sampling (capability
donor: /root/reference/AR/models/utils.py:81-160) is provided as an option.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from megatts2_hierspeechpp_tpu.nn.basic import Dense, LayerNorm
from megatts2_hierspeechpp_tpu.nn.conv import Dtype, _precision_for

NEG_INF = -1e9


def sine_positions(t_max: int, dim: int) -> jnp.ndarray:
    """(T, D) sinusoidal table (reference SinePositionalEmbedding :466-514)."""
    position = jnp.arange(t_max, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * -(math.log(10000.0) / dim)
    )
    pe = jnp.zeros((t_max, dim))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


class PLMLayer(nn.Module):
    """Pre-norm transformer encoder layer (transformer_mega.py:89-132)."""

    dim: int
    ff_dim: int
    n_heads: int
    p_dropout: float = 0.1
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool = True):
        h = self.n_heads
        hd = self.dim // h
        y = LayerNorm(name="norm1")(x)
        q = Dense(self.dim, dtype=self.dtype, name="w_q")(y)
        k = Dense(self.dim, dtype=self.dtype, name="w_k")(y)
        v = Dense(self.dim, dtype=self.dtype, name="w_v")(y)
        b, t, _ = q.shape
        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, precision=_precision_for(self.dtype)
        ) / math.sqrt(hd)
        if attn_bias is not None:
            scores = scores + attn_bias
        p = jax.nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.p_dropout)(p, deterministic=deterministic)
        att = jnp.einsum("bhqk,bhkd->bhqd", p, v, precision=_precision_for(self.dtype))
        att = att.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        att = Dense(self.dim, dtype=self.dtype, name="out_proj")(att)
        att = nn.Dropout(self.p_dropout)(att, deterministic=deterministic)
        x = x + att

        y = LayerNorm(name="norm2")(x)
        y = Dense(self.ff_dim, dtype=self.dtype, name="ff_0")(y)
        y = jax.nn.relu(y)
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = Dense(self.dim, dtype=self.dtype, name="ff_1")(y)
        return x + y


class ProsodyLM(nn.Module):
    """Megatts2PLM1 equivalent (training forward + naive greedy infer)."""

    n_layers: int = 4
    n_heads: int = 4
    vq_dim: int = 20
    tc_latent_dim: int = 256
    vq_bins: int = 1024
    p_dropout: float = 0.1
    dtype: Dtype | None = None

    @property
    def d_model(self):
        return self.vq_dim + self.tc_latent_dim

    @property
    def go_id(self):
        return self.vq_bins

    def setup(self):
        d = self.d_model
        self.pc_embedding = nn.Embed(
            self.vq_bins + 2, self.vq_dim,
            embedding_init=nn.initializers.normal(1.0), name="pc_embedding",
        )
        self.pos_alpha = self.param("pos_alpha", nn.initializers.ones, (1,))
        self.layers = [
            PLMLayer(d, d * 4, self.n_heads, self.p_dropout, dtype=self.dtype,
                     name=f"layer_{i}")
            for i in range(self.n_layers)
        ]
        self.predict_layer = Dense(self.vq_bins, use_bias=False, dtype=self.dtype,
                                   name="predict_layer")

    def _embed(self, tc_latent, codes):
        pc = self.pc_embedding(codes)
        x = jnp.concatenate([tc_latent, pc], axis=-1)
        pe = sine_positions(x.shape[1], self.d_model)
        return x + self.pos_alpha * pe[None]

    def __call__(self, tc_latent, p_codes, lens, deterministic: bool = True):
        """Training forward. tc_latent: (B, T, 256); p_codes: (B, T) int;
        lens: (B,). Returns dict(logits, targets, loss, loss_log, acc)."""
        b, t, _ = tc_latent.shape
        go = jnp.full((b, 1), self.go_id, p_codes.dtype)
        inputs = jnp.concatenate([go, p_codes[:, :-1]], axis=1)
        targets = p_codes

        x = self._embed(tc_latent, inputs)

        pos = jnp.arange(t)
        causal = pos[None, :] <= pos[:, None]  # (Tq, Tk) lower-tri
        key_ok = pos[None, :] < lens[:, None]  # (B, Tk)
        allowed = causal[None] & key_ok[:, None, :]
        bias = jnp.where(allowed, 0.0, NEG_INF)[:, None, :, :]  # (B, 1, Tq, Tk)

        for layer in self.layers:
            x = layer(x, bias, deterministic=deterministic)
        logits = self.predict_layer(x)  # (B, T, bins)

        valid = (pos[None, :] < lens[:, None]).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt_clip = jnp.clip(targets, 0, self.vq_bins - 1)
        nll = -jnp.take_along_axis(logp, tgt_clip[..., None], axis=-1)[..., 0]
        loss = jnp.sum(nll * valid)
        loss_log = loss / jnp.sum(lens)

        top10 = jax.lax.top_k(logits, 10)[1]
        hit = jnp.any(top10 == targets[..., None], axis=-1)
        acc = jnp.sum(hit * valid) / jnp.maximum(jnp.sum(valid), 1)

        return {
            "logits": logits,
            "targets": targets,
            "loss": loss,
            "loss_log": loss_log,
            "acc": acc,
        }

    def infer_naive(self, tc_latent):
        """Reference-style greedy loop re-running the prefix (parity oracle;
        only for small T — O(T^2))."""
        b, t, _ = tc_latent.shape
        codes = jnp.full((b, 1), self.go_id, jnp.int32)
        for step in range(t):
            x = self._embed(tc_latent[:, : step + 1], codes)
            pos = jnp.arange(step + 1)
            causal = (pos[None, :] <= pos[:, None])[None, None]
            bias = jnp.where(causal, 0.0, NEG_INF)
            for layer in self.layers:
                x = layer(x, bias)
            logits = self.predict_layer(x)[:, -1]
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            codes = jnp.concatenate([codes, nxt[:, None]], axis=1)
        return codes[:, 1:]


# ---------------- pure-function KV-cached decode ----------------


def _dense(p, x):
    y = jnp.dot(x, p["kernel"], precision=jax.lax.Precision.HIGHEST)
    if "bias" in p:
        y = y + p["bias"]
    return y


def _ln(p, x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def decode(
    params: dict,
    tc_latent: jnp.ndarray,
    n_layers: int = 4,
    n_heads: int = 4,
    go_id: int = 1024,
    rng: Optional[jax.Array] = None,
    top_k: int = 0,
    temperature: float = 1.0,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Fused KV-cached AR decode. params: ProsodyLM 'params' dict;
    tc_latent: (B, T, 256) -> codes (B, T) int32.

    Greedy when top_k == 0 (matches the reference greedy infer exactly);
    top-k sampling with temperature otherwise.

    Step-fusion over decode_unfused (the round-2 B=1 serving bottleneck,
    ~15k tok/s of overhead-dominated tiny matmuls):
      - q/k/v projections merge into ONE (B, d) @ (d, 3d) matmul per layer
        (identical per-column reductions -> bitwise-equal outputs);
      - the (L, B, H, T, hd) caches update IN PLACE via a sequential
        dynamic_update_slice chain on the scan carry — the old per-layer
        jnp.stack rebuilt both whole caches every step (~2 L·B·H·T·hd floats
        of pure copy traffic per token: ~35 MB/step at T=4000);
      - positional-encoding rows ride the scan xs instead of a per-step
        gather.

    compute_dtype=bfloat16 stores weights + KV caches bf16 (cast once outside
    the scan) with f32 accumulation everywhere. Hardware A/B verdict
    (tools/bench_plm_decode.py, v5e): 0.87-1.0x — i.e. NOT a win. Per-step
    time is ~70 us nearly independent of T, so the scan step is bound by
    per-op dispatch/sequencing, not by the ~33 MB/step of HBM traffic the
    bandwidth model predicts; the bf16 converts only add ops. Kept as an
    option + documentation of the negative result; serving uses the exact
    f32 path (compute_dtype=None).
    """
    import os

    # Persistent-kernel fast path (ops/pallas_plm_decode.py): the whole token
    # loop as ONE Pallas program — VMEM-resident weights, HBM KV cache with
    # chunked online-softmax attention. Greedy/B=1 only (the serving shape).
    # DEFAULT-ON since the round-3 hardware A/B (tools/bench_plm_decode.py:
    # 1.09-1.29x vs this scan across T=400..2400, bf16 weights, 96-98% token
    # agreement at near-tie argmax flips); opt out with
    # MEGATTS_PALLAS_DECODE=0.
    # compute_dtype is an explicit scan-path request (the documented bf16
    # A/B arm) — never reroute it to the Pallas kernel (ADVICE r3).
    if (top_k == 0 and tc_latent.shape[0] == 1 and compute_dtype is None
            and jax.default_backend() == "tpu"
            and os.environ.get("MEGATTS_PALLAS", "1") != "0"
            and os.environ.get("MEGATTS_PALLAS_DECODE", "1") == "1"):
        from megatts2_hierspeechpp_tpu.ops.pallas_plm_decode import (
            plm_decode_greedy,
        )

        return plm_decode_greedy(params, tc_latent, n_layers=n_layers,
                                 n_heads=n_heads, go_id=go_id)

    b, t, _ = tc_latent.shape
    emb_table = params["pc_embedding"]["embedding"]
    d = tc_latent.shape[-1] + emb_table.shape[-1]
    hd = d // n_heads
    pe = sine_positions(t, d)
    pos_alpha = params["pos_alpha"]
    hp = jax.lax.Precision.HIGHEST
    cd = compute_dtype

    def dot(x, wp, f32_out: bool = False):
        """Dense with the decode precision contract: HIGHEST for the exact
        f32 path; bf16 operands with f32 accumulation on the fast path."""
        if cd is None:
            y = jnp.dot(x, wp["kernel"], precision=hp)
        else:
            y = jnp.dot(x, wp["kernel"],
                        preferred_element_type=jnp.float32)
            if not f32_out:
                y = y.astype(cd)
        if "bias" in wp:
            y = y + (wp["bias"] if cd is None or f32_out
                     else wp["bias"].astype(cd))
        return y

    def ln(p, x):
        # layernorm math in f32 regardless of the stream dtype
        y = _ln(p, x.astype(jnp.float32))
        return y if cd is None else y.astype(cd)

    # merged/stacked layer weights (built once per call, outside the scan)
    lps = [params[f"layer_{i}"] for i in range(n_layers)]
    wqkv = jnp.stack([
        jnp.concatenate([lp["w_q"]["kernel"], lp["w_k"]["kernel"],
                         lp["w_v"]["kernel"]], axis=1) for lp in lps])
    bqkv = jnp.stack([
        jnp.concatenate([lp["w_q"]["bias"], lp["w_k"]["bias"],
                         lp["w_v"]["bias"]]) for lp in lps])
    if cd is not None:
        wqkv, bqkv = wqkv.astype(cd), bqkv.astype(cd)
        _wcast = lambda wp: {k: v.astype(cd) for k, v in wp.items()}  # noqa: E731
        lps = [{**lp, "out_proj": _wcast(lp["out_proj"]),
                "ff_0": _wcast(lp["ff_0"]), "ff_1": _wcast(lp["ff_1"])}
               for lp in lps]
        predict_w = _wcast(params["predict_layer"])
    else:
        predict_w = params["predict_layer"]

    # cache dtype must match what the dense projections PRODUCE: bf16 inputs
    # with f32 params promote to f32 (the serving pipeline feeds bf16
    # tc_latent from a bf16 TTV)
    cache_dtype = cd if cd is not None else jnp.result_type(
        tc_latent.dtype, emb_table.dtype)
    k_cache = jnp.zeros((n_layers, b, n_heads, t, hd), cache_dtype)
    v_cache = jnp.zeros_like(k_cache)
    prev = jnp.full((b,), go_id, jnp.int32)
    rng0 = rng if rng is not None else jax.random.PRNGKey(0)

    positions = jnp.arange(t)

    def step(carry, inp):
        k_cache, v_cache, prev, rng_c = carry
        step_t, tc_t, pe_t = inp
        pc = jnp.take(emb_table, prev, axis=0)
        x = jnp.concatenate([tc_t, pc], axis=-1) + pos_alpha * pe_t
        if cd is not None:
            x = x.astype(cd)

        for i in range(n_layers):
            lp = lps[i]
            yn = ln(lp["norm1"], x)
            if cd is None:
                qkv = jnp.dot(yn, wqkv[i], precision=hp) + bqkv[i]
            else:
                qkv = (jnp.dot(yn, wqkv[i],
                               preferred_element_type=jnp.float32)
                       .astype(cd) + bqkv[i])
            q = qkv[:, :d].reshape(b, n_heads, hd)
            k = qkv[:, d: 2 * d].reshape(b, n_heads, hd)
            v = qkv[:, 2 * d:].reshape(b, n_heads, hd)
            # in-place single-row writes on the carried caches (XLA aliases
            # the sequential def-use chain; no whole-cache copies)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k[None, :, :, None, :].astype(k_cache.dtype),
                (i, 0, 0, step_t, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v[None, :, :, None, :].astype(v_cache.dtype),
                (i, 0, 0, step_t, 0))
            kc, vc = k_cache[i], v_cache[i]  # (B, H, T, hd)
            if cd is None:
                scores = jnp.einsum("bhd,bhkd->bhk", q, kc) / math.sqrt(hd)
            else:
                scores = jnp.einsum(
                    "bhd,bhkd->bhk", q, kc,
                    preferred_element_type=jnp.float32) / math.sqrt(hd)
            scores = jnp.where(positions[None, None, :] <= step_t, scores,
                               NEG_INF)
            p = jax.nn.softmax(scores, axis=-1)  # f32
            if cd is None:
                att = jnp.einsum("bhk,bhkd->bhd", p, vc).reshape(b, d)
            else:
                att = jnp.einsum(
                    "bhk,bhkd->bhd", p.astype(cd), vc,
                    preferred_element_type=jnp.float32,
                ).reshape(b, d).astype(cd)
            x = x + dot(att, lp["out_proj"])
            yn = ln(lp["norm2"], x)
            x = x + dot(jax.nn.relu(dot(yn, lp["ff_0"])), lp["ff_1"])

        logits = dot(x, predict_w, f32_out=True)  # (B, bins) f32
        if top_k > 0:
            rng_c, sub = jax.random.split(rng_c)
            vals, idxs = jax.lax.top_k(logits / temperature, top_k)
            choice = jax.random.categorical(sub, vals, axis=-1)
            nxt = jnp.take_along_axis(idxs, choice[:, None], axis=-1)[:, 0]
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = nxt.astype(jnp.int32)
        return (k_cache, v_cache, nxt, rng_c), nxt

    inputs = (positions, jnp.swapaxes(tc_latent, 0, 1), pe)
    (_, _, _, _), codes = jax.lax.scan(step, (k_cache, v_cache, prev, rng0), inputs)
    return jnp.swapaxes(codes, 0, 1)


def decode_unfused(
    params: dict,
    tc_latent: jnp.ndarray,
    n_layers: int = 4,
    n_heads: int = 4,
    go_id: int = 1024,
    rng: Optional[jax.Array] = None,
    top_k: int = 0,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Round-2 decode (separate q/k/v matmuls; per-step jnp.stack cache
    rebuild). Kept as the A/B yardstick for the fused `decode`
    (tools/bench_plm_decode.py) and as a second parity witness."""
    b, t, _ = tc_latent.shape
    emb_table = params["pc_embedding"]["embedding"]
    d = tc_latent.shape[-1] + emb_table.shape[-1]
    hd = d // n_heads
    pe = sine_positions(t, d)
    pos_alpha = params["pos_alpha"]

    k_cache = jnp.zeros((n_layers, b, n_heads, t, hd),
                        jnp.result_type(tc_latent.dtype, emb_table.dtype))
    v_cache = jnp.zeros_like(k_cache)
    prev = jnp.full((b,), go_id, jnp.int32)
    rng0 = rng if rng is not None else jax.random.PRNGKey(0)

    positions = jnp.arange(t)

    def step(carry, inp):
        k_cache, v_cache, prev, rng_c = carry
        step_t, tc_t = inp
        pc = jnp.take(emb_table, prev, axis=0)
        x = jnp.concatenate([tc_t, pc], axis=-1) + pos_alpha * pe[step_t]

        new_k = []
        new_v = []
        for i in range(n_layers):
            lp = params[f"layer_{i}"]
            yn = _ln(lp["norm1"], x)
            q = _dense(lp["w_q"], yn).reshape(b, n_heads, hd)
            k = _dense(lp["w_k"], yn).reshape(b, n_heads, hd)
            v = _dense(lp["w_v"], yn).reshape(b, n_heads, hd)
            kc = jax.lax.dynamic_update_index_in_dim(k_cache[i], k, step_t, axis=2)
            vc = jax.lax.dynamic_update_index_in_dim(v_cache[i], v, step_t, axis=2)
            new_k.append(kc)
            new_v.append(vc)
            scores = jnp.einsum("bhd,bhkd->bhk", q, kc) / math.sqrt(hd)
            scores = jnp.where(positions[None, None, :] <= step_t, scores, NEG_INF)
            p = jax.nn.softmax(scores, axis=-1)
            att = jnp.einsum("bhk,bhkd->bhd", p, vc).reshape(b, d)
            x = x + _dense(lp["out_proj"], att)
            yn = _ln(lp["norm2"], x)
            x = x + _dense(lp["ff_1"], jax.nn.relu(_dense(lp["ff_0"], yn)))

        logits = _dense(params["predict_layer"], x)  # (B, bins)
        if top_k > 0:
            rng_c, sub = jax.random.split(rng_c)
            vals, idxs = jax.lax.top_k(logits / temperature, top_k)
            choice = jax.random.categorical(sub, vals, axis=-1)
            nxt = jnp.take_along_axis(idxs, choice[:, None], axis=-1)[:, 0]
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = nxt.astype(jnp.int32)
        return (jnp.stack(new_k), jnp.stack(new_v), nxt, rng_c), nxt

    inputs = (positions, jnp.swapaxes(tc_latent, 0, 1))
    (_, _, _, _), codes = jax.lax.scan(step, (k_cache, v_cache, prev, rng0), inputs)
    return jnp.swapaxes(codes, 0, 1)


class ProsodyLMNonCausal(nn.Module):
    """Megatts2PLM variant A (t2w2v_transformer.py:531-624): the rel-pos
    attentions.Encoder over the same concat input — kept for checkpoint
    compatibility; the reference notes it lacks a causal mask and ships
    Megatts2PLM1 instead."""

    n_layers: int = 4
    n_heads: int = 4
    vq_dim: int = 20
    tc_latent_dim: int = 256
    vq_bins: int = 1024
    kernel_size: int = 9
    p_dropout: float = 0.1
    dtype: Dtype | None = None

    @property
    def d_model(self):
        return self.vq_dim + self.tc_latent_dim

    @property
    def go_id(self):
        return self.vq_bins

    @nn.compact
    def __call__(self, tc_latent, p_codes, lens, deterministic: bool = True):
        from megatts2_hierspeechpp_tpu.nn.attention import Encoder

        b, t, _ = tc_latent.shape
        go = jnp.full((b, 1), self.go_id, p_codes.dtype)
        inputs = jnp.concatenate([go, p_codes[:, :-1]], axis=1)
        targets = p_codes

        emb = nn.Embed(self.vq_bins + 2, self.vq_dim,
                       embedding_init=nn.initializers.normal(1.0),
                       name="pc_embedding")(inputs)
        alpha = self.param("pos_alpha", nn.initializers.ones, (1,))
        x = jnp.concatenate([tc_latent, emb], axis=-1)
        x = x + alpha * sine_positions(t, self.d_model)[None]

        mask = (jnp.arange(t)[None, :] < lens[:, None])[:, :, None].astype(x.dtype)
        x = Encoder(self.d_model, self.d_model * 4, self.n_heads, self.n_layers,
                    self.kernel_size, self.p_dropout, dtype=self.dtype,
                    name="plm")(x * mask, mask, deterministic=deterministic)
        logits = Dense(self.vq_bins, use_bias=False, dtype=self.dtype,
                       name="predict_layer")(x)

        valid = mask[..., 0]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt_clip = jnp.clip(targets, 0, self.vq_bins - 1)
        nll = -jnp.take_along_axis(logp, tgt_clip[..., None], axis=-1)[..., 0]
        loss = jnp.sum(nll * valid)
        return {"logits": logits, "targets": targets, "loss": loss,
                "loss_log": loss / jnp.sum(lens)}
