"""Persistent Pallas kernel for the PLM greedy KV-cached decode.

Why a mega-kernel: the XLA `lax.scan` decode (models/plm.py:decode) costs a
~constant ~70 us per token nearly independent of T (hardware-profiled,
tools/bench_plm_decode.py) — i.e. it is bound by per-op dispatch/sequencing
of ~130 tiny HLO ops per step, not by FLOPs or HBM bandwidth (the bf16 A/B
proved bandwidth isn't it: 0.87-1.0x). The fix is ONE Pallas program that
owns the whole token loop:

  - grid = (): a single persistent program; the token loop is an in-kernel
    fori_loop, so there is no per-token pipeline bookkeeping at all (a first
    grid=(T,) variant still paid ~96 us/token in per-step grid overhead —
    measured, see BASELINE.md);
  - the transformer weights, tc_latent and the positional table are
    VMEM-resident for the entire decode (~13 MB bf16 at the shipped
    4-layer/276-dim config — fits the ~16 MB core VMEM with room for chunk
    buffers), so each step's matmuls read weights at VMEM bandwidth with
    zero launch overhead;
  - the KV caches are L input/output-aliased HBM arrays of (T_pad, 2, D_pad)
    tiles: K and V are the TWO SUBLANES of each token's tile, so every DMA
    moves whole (2, D_pad) tiles — Mosaic forbids slicing inside the tiled
    last-two dims (bf16 sublane granularity 2, lane granularity 128), which
    also forces D_pad = round_up(D, 128);
  - attention over the prefix streams CHUNK tokens per DMA into VMEM and
    maintains a flash-attention-style online softmax; the interleaved K/V
    rows are separated with an even/odd row mask and `pltpu.roll` (p of each
    K row rolled onto its V row) — never a sub-tile slice;
  - head splitting on the 276-lane axis (4 heads x 69 — nothing is
    128-aligned) is done with an (H, D_pad) one-hot segment matrix: per-head
    scores are `(k ⊙ q) @ mask^T` and head-broadcasts are `z @ mask`, both
    tiny MXU ops, so no unaligned lane slicing ever happens;
  - greedy state (prev token) and the emitted codes ride the fori_loop carry
    (codes as a (1, T) int32 vector updated with a lane mask, stored once at
    the end);
  - residual stream, layernorms, softmax and logits accumulate in f32;
    weights/caches are bf16 by default (f32 available for parity tests).

Reference being replaced: the prosody-LM AR loop the reference re-runs the
full prefix for, O(T^2 L) per utterance (`ttv_v1/t2w2v_transformer.py`
Megatts2PLM1.infer); capability match for its KV-cached alt stack
(plm/gpt_inference.py:24-53).

Greedy-only and B=1 by design (the zero-shot serving shape); sampling decode
stays on the XLA path (models/plm.py:decode).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30


def _kernel(
    *refs,
    n_layers: int,
    n_heads: int,
    go_id: int,
    chunk: int,
    t_total: int,
    eps: float = 1e-5,
):
    """Argument layout (positional, parsed below):

      [0] tc_ref   (T, D) f32 — tc_latent, padded to D on lanes
      [1] pe_ref   (T, D) f32 — positional table (pre-scaled by pos_alpha)
      [2..16] weights:
          emb (VOCAB, D) f32; wqkv (L, D, 3D) wdtype (ONE matmul per layer;
          q/k/v split back out with register lane slices); bqkv (L, 3D) f32;
          wo (L, D_pad, D) wdtype / bo (L, D) f32; ln1s/ln1b/ln2s/ln2b (L, D)
          f32; ff0 (L, D, F) / ff0b (L, F); ff1 (L, F, D) / ff1b (L, D);
          pred (D, BINS) wdtype; head mask (H, D_pad) f32
      [21 .. 21+L)  kv_hbm[i] cache inputs (aliased; unused — all access goes
                    through the aliased outputs), each (T_pad, 2, D_pad)
      then outputs: codes (1, T) int32 VMEM; kv_out[i] HBM
      then scratch: kvrow VMEM (L, 2, D_pad); kvbuf VMEM (2, CHUNK, 2,
                    D_pad) double-buffered; read sems (2,); write sems (L,)
    """
    n_w = 15
    tc_ref, pe_ref = refs[0], refs[1]
    (emb_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
     ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, ff0_ref, ff0b_ref, ff1_ref,
     ff1b_ref, pred_ref, mask_ref) = refs[2:2 + n_w]
    o0 = 2 + n_w + n_layers
    codes_ref = refs[o0]
    kv_out = refs[o0 + 1: o0 + 1 + n_layers]
    s0 = o0 + 1 + n_layers
    kvrow_ref, kvbuf_ref, read_sems, write_sems = refs[s0: s0 + 4]

    d = tc_ref.shape[-1]
    d_pad = kvrow_ref.shape[-1]      # cache lane width: round_up(d, 128)
    bins = pred_ref.shape[-1]
    hd = d // n_heads
    scale = 1.0 / math.sqrt(hd)
    cache_dtype = kvrow_ref.dtype
    mask = mask_ref[:]               # (H, D_pad)

    def pad_lanes(z):
        # DMA memrefs need 128-aligned lane sizes, so everything that
        # touches the cache is padded to d_pad (mask/wo rows are zero there)
        if d_pad == d:
            return z
        return jnp.concatenate(
            [z, jnp.zeros((z.shape[0], d_pad - d), z.dtype)], axis=1)

    def layernorm(xv, s_ref, b_ref, i):
        mu = jnp.mean(xv, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xv - mu), axis=-1, keepdims=True)
        return (xv - mu) * jax.lax.rsqrt(var + eps) * s_ref[i, :] + b_ref[i, :]

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, t_total), 1)

    def step(t, carry):
        prev, codes = carry          # int32 scalar, (1, T) int32

        pc = emb_ref[pl.ds(prev, 1), :]             # (1, D) f32
        x = tc_ref[pl.ds(t, 1), :] + pc + pe_ref[pl.ds(t, 1), :]

        for i in range(n_layers):
            yn = layernorm(x, ln1s_ref, ln1b_ref, i)
            ync = yn.astype(wqkv_ref.dtype)
            qkv = (jnp.dot(ync, wqkv_ref[i],
                           preferred_element_type=jnp.float32)
                   + bqkv_ref[i, :])                # (1, 3D) f32
            q = qkv[:, :d] * scale                  # pre-scaled
            k = qkv[:, d:2 * d]
            v = qkv[:, 2 * d:]
            q, k, v = pad_lanes(q), pad_lanes(k), pad_lanes(v)  # (1, d_pad)
            # kvrow[i] is the (2, d_pad) tile [K_t; V_t]: assembled as a
            # value and written whole
            kvrow_ref[i] = jnp.concatenate([k, v], axis=0).astype(cache_dtype)
            # Append this step's tile to the HBM cache NOW; waited at
            # end-of-step, overlapped with the remaining layers + logits.
            # NOTE (intentional read-under-write): the cache length is
            # rounded up to a chunk multiple, so this step's LAST chunk read
            # below can cover row t while this write DMA is still in flight
            # (e.g. t=500, chunk=768 reads rows [0, 768)). The torn row is
            # harmless ONLY because chunk_body masks tok < t on k_row BEFORE
            # the online-softmax max/exp — keep that ordering if editing.
            pltpu.make_async_copy(
                kvrow_ref.at[i], kv_out[i].at[t], write_sems.at[i]).start()

            # ---- online-softmax attention over the HBM prefix [0, t) ----
            n_chunks = pl.cdiv(t, chunk)            # 0 at t == 0

            def get_dma(slot, c):
                # double-buffered chunk reads through the ALIASED OUTPUT
                # refs (the buffers the per-step writes target)
                return pltpu.make_async_copy(
                    kv_out[i].at[pl.ds(c * chunk, chunk)],
                    kvbuf_ref.at[slot], read_sems.at[slot])

            @pl.when(n_chunks > 0)
            def _():
                get_dma(0, 0).start()

            def chunk_body(c, carry_a):
                m, l, acc = carry_a                 # (1,H) (1,H) (1,D_pad)
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < n_chunks)
                def _():
                    get_dma(1 - slot, c + 1).start()

                get_dma(slot, c).wait()
                # rows alternate K (even) / V (odd); scores live on K rows,
                # then roll by one row to align each token's p with its V
                kv = kvbuf_ref[slot].reshape(2 * chunk, d_pad).astype(
                    jnp.float32)
                prod = kv * q                       # bcast (2C, D_pad)
                s = jnp.dot(prod, mask.T,
                            preferred_element_type=jnp.float32)  # (2C, H)
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (2 * chunk, 1), 0)
                tok = c * chunk + row // 2
                k_row = (row % 2 == 0) & (tok < t)
                s = jnp.where(k_row, s, NEG_BIG)
                m_new = jnp.maximum(m, jnp.max(s, axis=0, keepdims=True))
                corr = jnp.exp(m - m_new)           # (1, H)
                p = jnp.exp(s - m_new)              # (2C, H)
                p = jnp.where(k_row, p, 0.0)
                l_new = l * corr + jnp.sum(p, axis=0, keepdims=True)
                p_v = pltpu.roll(p, shift=1, axis=0)  # onto the V rows
                p_lanes = jnp.dot(p_v, mask,
                                  preferred_element_type=jnp.float32)
                corr_lanes = jnp.dot(corr, mask,
                                     preferred_element_type=jnp.float32)
                acc_new = acc * corr_lanes + jnp.sum(
                    p_lanes * kv, axis=0, keepdims=True)   # (1, D_pad)
                return m_new, l_new, acc_new

            m0 = jnp.full((1, n_heads), NEG_BIG, jnp.float32)
            l0 = jnp.zeros((1, n_heads), jnp.float32)
            a0 = jnp.zeros((1, d_pad), jnp.float32)
            m, l, acc = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                          (m0, l0, a0))

            # current token's K/V from registers — the HBM tile may still be
            # in flight for this step
            s_cur = jnp.dot(k * q, mask.T,
                            preferred_element_type=jnp.float32)  # (1, H)
            m2 = jnp.maximum(m, s_cur)
            corr = jnp.exp(m - m2)
            p_cur = jnp.exp(s_cur - m2)
            l2 = l * corr + p_cur
            acc = acc * jnp.dot(corr, mask,
                                preferred_element_type=jnp.float32) \
                + jnp.dot(p_cur, mask,
                          preferred_element_type=jnp.float32) * v
            l_lanes = jnp.dot(l2, mask, preferred_element_type=jnp.float32)
            # pad lanes have l == 0; make the division a no-op there (wo's
            # pad rows are zero, so they never reach the residual)
            att = acc / jnp.where(l_lanes == 0.0, 1.0, l_lanes)

            x = x + jnp.dot(att.astype(wo_ref.dtype), wo_ref[i],
                            preferred_element_type=jnp.float32) + bo_ref[i, :]
            yn = layernorm(x, ln2s_ref, ln2b_ref, i)
            h = jnp.dot(yn.astype(ff0_ref.dtype), ff0_ref[i],
                        preferred_element_type=jnp.float32) + ff0b_ref[i, :]
            h = jnp.maximum(h, 0.0)
            x = x + jnp.dot(h.astype(ff1_ref.dtype), ff1_ref[i],
                            preferred_element_type=jnp.float32) + ff1b_ref[i, :]

        logits = jnp.dot(x.astype(pred_ref.dtype), pred_ref[:],
                         preferred_element_type=jnp.float32)     # (1, BINS)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, bins), 1)
        nxt = jnp.min(jnp.where(logits >= mx, col, bins))        # 1st argmax

        codes = jnp.where(lane_ids == t, nxt, codes)

        # all cache-tile writes must land before the next step's chunk reads
        for i in range(n_layers):
            pltpu.make_async_copy(
                kvrow_ref.at[i], kv_out[i].at[t], write_sems.at[i]).wait()
        return nxt, codes

    codes0 = jnp.zeros((1, t_total), jnp.int32)
    _, codes = jax.lax.fori_loop(
        0, t_total, step, (jnp.int32(go_id), codes0))
    codes_ref[:] = codes


def plm_decode_greedy(
    params: dict,
    tc_latent: jnp.ndarray,
    n_layers: int = 4,
    n_heads: int = 4,
    go_id: int = 1024,
    weight_dtype=jnp.bfloat16,
    cache_dtype=jnp.bfloat16,
    chunk: int = 768,
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy B=1 decode through the persistent kernel.

    params: ProsodyLM 'params' dict (same tree `models/plm.py:decode` takes);
    tc_latent: (1, T, D_tc) -> codes (1, T) int32.

    weight_dtype/cache_dtype=float32 reproduce the XLA decode's numerics to
    ~1e-5 (used by the parity tests); bf16 is the serving configuration.
    """
    b, t, _ = tc_latent.shape
    if b != 1:
        raise ValueError("pallas decode is specialized to B=1 serving")
    emb_table = params["pc_embedding"]["embedding"]
    vq_dim = emb_table.shape[-1]
    d = tc_latent.shape[-1] + vq_dim
    if d % n_heads:
        raise ValueError(f"d_model {d} not divisible by {n_heads} heads")
    vocab = emb_table.shape[0]
    f32 = jnp.float32

    lps = [params[f"layer_{i}"] for i in range(n_layers)]

    def stack(path_k, dtype):
        return jnp.stack([lp[path_k[0]][path_k[1]] for lp in lps]).astype(dtype)

    wqkv = jnp.stack([
        jnp.concatenate([lp["w_q"]["kernel"], lp["w_k"]["kernel"],
                         lp["w_v"]["kernel"]], axis=1) for lp in lps
    ]).astype(weight_dtype)
    bqkv = jnp.stack([
        jnp.concatenate([lp["w_q"]["bias"], lp["w_k"]["bias"],
                         lp["w_v"]["bias"]]) for lp in lps]).astype(f32)
    wo = stack(("out_proj", "kernel"), weight_dtype)
    bo = stack(("out_proj", "bias"), f32)
    ln1s = stack(("norm1", "scale"), f32)
    ln1b = stack(("norm1", "bias"), f32)
    ln2s = stack(("norm2", "scale"), f32)
    ln2b = stack(("norm2", "bias"), f32)
    ff0 = stack(("ff_0", "kernel"), weight_dtype)
    ff0b = stack(("ff_0", "bias"), f32)
    ff1 = stack(("ff_1", "kernel"), weight_dtype)
    ff1b = stack(("ff_1", "bias"), f32)
    pred = params["predict_layer"]["kernel"].astype(weight_dtype)

    # embeddings live on the high lanes of the concat [tc | pc]
    emb_pad = jnp.zeros((vocab, d), f32).at[:, d - vq_dim:].set(
        emb_table.astype(f32))

    from megatts2_hierspeechpp_tpu.models.plm import sine_positions

    pe = params["pos_alpha"].astype(f32)[0] * sine_positions(t, d).astype(f32)
    tc_pad = jnp.pad(tc_latent[0].astype(f32), ((0, 0), (0, vq_dim)))

    hd = d // n_heads
    d_pad = -(-d // 128) * 128
    # head mask over the PADDED lane width (zero on pad lanes); wo gets zero
    # rows for the pad lanes so (1, d_pad) @ wo -> (1, d) needs no slicing
    head_ids = jnp.arange(d_pad) // hd
    head_mask = jnp.where(
        (head_ids[None, :] == jnp.arange(n_heads)[:, None])
        & (jnp.arange(d_pad)[None, :] < d), 1.0, 0.0).astype(f32)
    if d_pad != d:
        wo = jnp.pad(wo, ((0, 0), (0, d_pad - d), (0, 0)))

    # chunk must never exceed T; the cache length is rounded UP to a chunk
    # multiple so the last chunk's fixed-size DMA never reads out of bounds
    # (padding rows are zero-initialized and masked by tok < t)
    chunk = max(1, min(chunk, t))
    t_pad = -(-t // chunk) * chunk
    cache0 = [jnp.zeros((t_pad, 2, d_pad), cache_dtype)
              for _ in range(n_layers)]

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    # caches MUST live in HBM (Mosaic's ANY may pick VMEM, where the per-row
    # DMA slices violate bf16 tiling)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)

    weights = [emb_pad, wqkv, bqkv, wo, bo,
               ln1s, ln1b, ln2s, ln2b, ff0, ff0b, ff1, ff1b, pred, head_mask]

    n_in = 2 + len(weights)
    outs = pl.pallas_call(
        functools.partial(_kernel, n_layers=n_layers, n_heads=n_heads,
                          go_id=go_id, chunk=chunk, t_total=t),
        in_specs=[vmem, vmem] + [vmem] * len(weights) + [hbm] * n_layers,
        out_specs=(vmem,) + (hbm,) * n_layers,
        out_shape=(
            jax.ShapeDtypeStruct((1, t), jnp.int32),
        ) + tuple(jax.ShapeDtypeStruct(c.shape, cache_dtype) for c in cache0),
        input_output_aliases={n_in + j: 1 + j for j in range(n_layers)},
        scratch_shapes=[
            pltpu.VMEM((n_layers, 2, d_pad), cache_dtype),
            pltpu.VMEM((2, chunk, 2, d_pad), cache_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((n_layers,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tc_pad, pe, *weights, *cache0)
    return outs[0]
