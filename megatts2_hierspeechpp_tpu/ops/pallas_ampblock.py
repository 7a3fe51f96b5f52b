"""Fused whole-AMPBlock — Pallas TPU kernel (C <= 128 stages).

One AMPBlock branch is AA-snake -> dilated WN-conv -> AA-snake -> WN-conv ->
residual add, and a block chains three branches (d = 1, 3, 5). Composed, that
is ~12 HBM round-trips over the largest activations in the vocoder; at the
16/8 kHz stages C is 16-64, so every elementwise op also wastes up to 8x of
the 128 VPU lanes in the native (T, C) layout.

This kernel runs the WHOLE block per tile in VMEM, in the transposed (C, T)
layout (lanes = time, same trick as ops/pallas_snake._kernel_tr): the
anti-aliased snakes become polyphase MACs on full vregs, and each conv tap is
a (Cout, Cin) @ (Cin, W) dot on the MXU. Valid regions shrink inward per
layer (no ring buffers, no masking); the tile is read with a 128-row halo
from each neighbor, of which Σ_i (16 + (k-1)/2·(1+d_i)) rows are actually
consumed.

Backward: custom_vjp via the composed math at the saved primals (pallas_call
has no autodiff rule; same pattern as ops/pallas_snake).

Reference equivalent: AMPBlock1, /root/reference/hierspeechpp_speechsynthesizer.py
(BigVGAN AMP blocks); the composed JAX path is nn/resblocks.py:AMPBlock.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from megatts2_hierspeechpp_tpu.ops.pallas_snake import _polyphase_taps

HALO = 128  # neighbor halo block (>= sum of per-branch shrink for k<=11)
TILE_T = 2048


def _shrink(kernel_size: int, dilations: Sequence[int]) -> int:
    """Total one-sided valid-region shrink of a fused block."""
    half = (kernel_size - 1) // 2
    return sum(16 + half * (1 + d) for d in dilations)


def _snake_tr(xt, alpha, inv_beta, out_w: int):
    """Anti-aliased SnakeBeta on a transposed (C, W) buffer.

    xt width must be out_w + 16; returns (C, out_w) aligned at offset +8
    (same polyphase math as pallas_snake._kernel_tr)."""
    e_taps, o_taps, ge, go = _polyphase_taps()
    m_len = out_w + 8
    base = 4  # = HALO_SNAKE(8) - 4

    def poly(taps, d0):
        acc = taps[0] * xt[:, base + d0: base + d0 + m_len]
        for k in range(1, 6):
            s0 = base + d0 + k
            acc = acc + taps[k] * xt[:, s0: s0 + m_len]
        return acc

    ue = poly(e_taps, -3)
    uo = poly(o_taps, -2)

    def snake(u):
        s = jnp.sin(u * alpha)
        return u + s * s * inv_beta

    se = snake(ue)
    so = snake(uo)

    y = ge[0] * se[:, 2: 2 + out_w]
    for i, o in enumerate(range(-1, 4), start=1):
        y = y + ge[i] * se[:, 4 + o: 4 + o + out_w]
    for i, o in enumerate(range(-3, 3)):
        y = y + go[i] * so[:, 4 + o: 4 + o + out_w]
    return y


def _conv_tr(xt, w, b, dilation: int, out_w: int, precision):
    """Valid conv on (Cin, W) -> (Cout, out_w); w: (k, Cout, Cin).

    out[t] corresponds to 'same'-conv output at offset +half*d in xt:
    out[:, t] = sum_j w[j] @ xt[:, t + j*d].

    Negative result (round 4): stacking g = 128//Cin taps along the
    contraction axis into one (Cout, g*Cin) @ (g*Cin, W) dot — to fill the
    MXU's 128 contraction rows at the vocoder's C in {16, 32, 64} — does
    NOT compile: Mosaic's tpu.concatenate requires uniform lane offsets on
    the non-concat dim ("result/input offset mismatch"), and the g slices
    sit at g different lane offsets (j*dilation mod 128). Normalizing each
    slice's offset is exactly the per-tap relayout the single-tap dots
    already pay, so the stacking would add copies without removing work."""
    import os

    k = w.shape[0]
    c_in = xt.shape[0]
    g = max(1, 128 // c_in)
    if (g > 1 and k > 1 and precision != jax.lax.Precision.HIGHEST
            and os.environ.get("MEGATTS_PACKED_CONV", "0") == "1"):
        return _conv_tr_packed(xt, w, b, dilation, out_w, g, precision)
    acc = None
    for j in range(k):
        term = jax.lax.dot(
            w[j], xt[:, j * dilation: j * dilation + out_w],
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        acc = term if acc is None else acc + term
    return acc + b[:, None]


def _conv_tr_packed(xt, w, b, dilation: int, out_w: int, g: int, precision):
    """Output-packed taps (opt-in: MEGATTS_PACKED_CONV=1).

    One (g*Cout, Cin) @ (Cin, W_ext) dot per group of g = 128 // C taps,
    instead of g separate (Cout, Cin) dots — fills the MXU's OUTPUT rows
    g-fold at the vocoder's C in {16, 32, 64}. Two earlier *contraction*-
    packed designs do NOT compile (Mosaic `tpu.concatenate` requires uniform
    lane offsets, and the activation slices sit at g different offsets;
    pltpu.roll does not canonicalize them either — re-verified on hardware
    round 5, offsets {0,112} vs {0,1}). This variant sidesteps the problem:
    the concat is over WEIGHT slices w[j] (leading-dim indexing, canonical
    layout, legal), the activations are one contiguous slice widened by
    (g-1)*dilation columns, and each tap's block of the result is added at
    its lane shift — the same shifted-slice adds the per-tap path performs.
    Exactness: bit-identical to the per-tap path (same add order).

    Measured (round 5, v5e): compiles and matches exactly, +4-5% on a
    STANDALONE fused block at C in {16, 64} — but -9 to -11% at MODEL level
    (vocoder 367.4 -> 325.0, SpeechSR-48k 261.2 -> 239.0 audio-s/s) inside
    the triple kernels, where the widened (g*Cout, W_ext) intermediates
    raise VMEM pressure and break Mosaic's pipelining of the surrounding
    snake stages. Default stays OFF; kept as a documented experiment."""
    k = w.shape[0]
    c_out = w.shape[1]
    acc = None
    for j0 in range(0, k, g):
        js = list(range(j0, min(j0 + g, k)))
        w_ext = out_w + (len(js) - 1) * dilation
        wcat = jnp.concatenate([w[j] for j in js], axis=0)  # (g*Cout, Cin)
        res = jax.lax.dot(
            wcat, xt[:, j0 * dilation: j0 * dilation + w_ext],
            precision=precision,
            preferred_element_type=jnp.float32)
        for i, j in enumerate(js):
            off = (j - j0) * dilation
            term = res[i * c_out:(i + 1) * c_out, off: off + out_w]
            acc = term if acc is None else acc + term
    return acc + b[:, None]


def _kernel(x_prev, x_cur, x_next, a1, ib1, w1, b1, a2, ib2, w2, b2, o_ref,
            *, tile_t, kernel_size, dilations):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    left = x_prev[0]
    left = jnp.where(j == 0, jnp.broadcast_to(x_cur[0, 0:1], left.shape), left)
    right = x_next[0]
    right = jnp.where(
        j == n_tiles - 1,
        jnp.broadcast_to(x_cur[0, tile_t - 1: tile_t], right.shape),
        right,
    )
    x = jnp.concatenate([left, x_cur[0], right], axis=0).astype(jnp.float32)
    xt = x.T  # (C, tile_t + 2*HALO)

    # f32 inputs keep HIGHEST (fp32 parity islands, nn/conv._precision_for);
    # bf16 compute uses the one-pass default (bf16 x bf16 -> f32 accumulate)
    precision = (jax.lax.Precision.HIGHEST
                 if o_ref.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    half = (kernel_size - 1) // 2
    w_cur = tile_t + 2 * HALO
    for i, d in enumerate(dilations):
        h_i = 16 + half * (1 + d)
        u = _snake_tr(xt, a1[i].reshape(-1, 1), ib1[i].reshape(-1, 1),
                      w_cur - 16)
        c1 = _conv_tr(u, w1[i], b1[i], d, w_cur - 16 - 2 * half * d, precision)
        v = _snake_tr(c1, a2[i].reshape(-1, 1), ib2[i].reshape(-1, 1),
                      w_cur - 32 - 2 * half * d)
        c2 = _conv_tr(v, w2[i], b2[i], 1, w_cur - 2 * h_i, precision)
        xt = xt[:, h_i: w_cur - h_i] + c2
        w_cur = w_cur - 2 * h_i

    off = (w_cur - tile_t) // 2
    o_ref[0] = xt[:, off: off + tile_t].T.astype(o_ref.dtype)


def _pick_tile(t: int, tile_t: int) -> int:
    """Largest multiple-of-HALO divisor of t that is <= tile_t (else a HALO
    multiple, triggering a one-off remainder pad).

    Every return value is a HALO multiple: the halo BlockSpec index maps in
    _pallas_forward assume tile_t % HALO == 0 — floor the incoming VMEM cap
    first so a non-power-of-two C can't yield a misaligned tile."""
    tile_t = max(HALO, tile_t - tile_t % HALO)
    if t <= tile_t:
        return min(-(-t // HALO) * HALO, tile_t)
    for cand in range(tile_t, HALO - 1, -HALO):
        if t % cand == 0:
            return cand
    return tile_t


def _pallas_forward(x, a1, ib1, w1, b1, a2, ib2, w2, b2, kernel_size,
                    dilations, tile_t):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c = x.shape
    assert tile_t % HALO == 0 and t % tile_t == 0, (tile_t, t)
    n_tiles = t // tile_t
    kernel = functools.partial(
        _kernel, tile_t=tile_t, kernel_size=kernel_size, dilations=dilations)
    block = lambda im: pl.BlockSpec((1, tile_t, c), im, memory_space=pltpu.VMEM)
    halo_blk = lambda im: pl.BlockSpec((1, HALO, c), im, memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    k_halo = tile_t // HALO
    last_halo = t // HALO - 1
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        grid=(b, n_tiles),
        in_specs=[
            halo_blk(lambda i, j: (i, jnp.maximum(j * k_halo - 1, 0), 0)),
            block(lambda i, j: (i, j, 0)),
            halo_blk(lambda i, j: (i, jnp.minimum((j + 1) * k_halo, last_halo), 0)),
        ] + [full()] * 8,
        out_specs=block(lambda i, j: (i, j, 0)),
    )(x, x, x, a1, ib1, w1, b1, a2, ib2, w2, b2)


def composed_ampblock(x, a1, ib1, w1, b1, a2, ib2, w2, b2, kernel_size,
                      dilations):
    """The XLA-composed reference math (identical function; used as the
    custom_vjp backward and as the CPU/interpret parity oracle).

    x: (B, T, C); a*/ib*: (n, C) post-exp alpha and 1/(beta+eps);
    w*: (n, k, Cout, Cin); b*: (n, Cout)."""
    from megatts2_hierspeechpp_tpu.nn.conv import conv1d_op
    from megatts2_hierspeechpp_tpu.ops.resample import activation1d

    half = (kernel_size - 1) // 2
    for i, d in enumerate(dilations):
        snake1 = lambda v: v + jnp.square(jnp.sin(v * a1[i])) * ib1[i]
        xt = activation1d(x, snake1)
        # conv1d_op kernel layout is (k, Cin, Cout)
        xt = conv1d_op(xt, jnp.transpose(w1[i], (0, 2, 1)), b1[i],
                       1, half * d, d, 1)
        snake2 = lambda v: v + jnp.square(jnp.sin(v * a2[i])) * ib2[i]
        xt = activation1d(xt, snake2)
        xt = conv1d_op(xt, jnp.transpose(w2[i], (0, 2, 1)), b2[i],
                       1, half, 1, 1)
        x = xt + x
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _fused(x, a1, ib1, w1, b1, a2, ib2, w2, b2, kernel_size, dilations,
           tile_t):
    return _pallas_forward(x, a1, ib1, w1, b1, a2, ib2, w2, b2, kernel_size,
                           dilations, tile_t)


def _fused_fwd(x, a1, ib1, w1, b1, a2, ib2, w2, b2, kernel_size, dilations,
               tile_t):
    y = _pallas_forward(x, a1, ib1, w1, b1, a2, ib2, w2, b2, kernel_size,
                        dilations, tile_t)
    return y, (x, a1, ib1, w1, b1, a2, ib2, w2, b2)


def _fused_bwd(kernel_size, dilations, tile_t, res, ct):
    args = res
    out, vjp = jax.vjp(
        lambda *a: composed_ampblock(*a, kernel_size, dilations), *args)
    # match the composed primal's JAX type: a bf16 downstream (GAN disc) may
    # hand back a bf16 cotangent against an f32 primal (pallas_amp_triple)
    return vjp(ct.astype(out.dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_ampblock(
    x: jnp.ndarray,
    a1, ib1, w1, b1, a2, ib2, w2, b2,
    kernel_size: int,
    dilations: Tuple[int, ...],
    tile_t: int = TILE_T,
) -> jnp.ndarray:
    """Whole-AMPBlock fused Pallas op. Differentiable (composed-math vjp).

    x: (B, T, C) with C <= 128; weights per docstring of composed_ampblock.

    Matches the composed path EVERYWHERE to float accumulation: the kernel's
    interior is exact by construction (real-sample halos), and the first/last
    `_shrink()` samples — where the kernel's edge replication would diverge
    from the composed path's per-layer zero padding, amplified by the conv
    gain of three chained branches — are stitched from the composed math on
    tiny strips (a 2E-sample prefix/suffix fully covers their receptive
    field)."""
    b, t, c = x.shape
    ws = (a1, ib1, w1, b1, a2, ib2, w2, b2)
    e = _shrink(kernel_size, dilations)
    if t <= 4 * e or e > HALO:
        # too short for a meaningful fused interior, or the receptive field
        # exceeds the halo blocks (k>11 / larger dilations): composed path
        return composed_ampblock(x, *ws, kernel_size, dilations)

    # VMEM: ~6 live (C, tile+256) f32 buffers + stacked weights ((n, k, C, C)
    # x2 ~ 4.3 MB at C=128, k=11) must fit the 16 MB scoped limit
    tile_t = _pick_tile(t, min(tile_t, 131072 // max(c, 64)))
    if t % tile_t != 0:
        t_pad = (-(-t // tile_t)) * tile_t
        xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)), mode="edge")
        core = _fused(xp, *ws, kernel_size, tuple(dilations), tile_t)[:, :t]
    else:
        core = _fused(x, *ws, kernel_size, tuple(dilations), tile_t)
    head = composed_ampblock(x[:, : 2 * e], *ws, kernel_size, dilations)
    tail = composed_ampblock(x[:, -2 * e:], *ws, kernel_size, dilations)
    return jnp.concatenate(
        [head[:, :e], core[:, e: t - e], tail[:, e:]], axis=1
    ).astype(x.dtype)
