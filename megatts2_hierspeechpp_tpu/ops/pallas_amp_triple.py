"""Fused AMPBlock-triple (+ optional decoder tail) — Pallas TPU kernel.

Every Generator/SourceNetwork/SpeechSR stage runs THREE parallel AMPBlocks on
the same input and averages them (/root/reference/hierspeechpp_speechsynthesizer.py:
Generator.forward resblock loop; speechsr48k/speechsr.py:SynthesizerTrn.forward),
and the network tail is AA-SnakeBeta -> conv_post(C->1, k=7) -> tanh. With the
per-block fused kernel (ops/pallas_ampblock) that is still 3 HBM reads + 3 HBM
writes of the full (B, T, C) activation per stage plus an XLA averaging pass,
and for SpeechSR another 2+ passes for the tail — at 48 kHz x C=16 these
dispatches dominate (BASELINE.md round-3 profile: SR costs ~2x the whole
vocoder per audio-second; vocoder `dec` is 87% of vocoder time).

This kernel computes the whole stage in ONE VMEM pass per tile, in the
transposed (C, T) layout (lanes = time): the tile is read ONCE with a 128-row
halo, all three blocks run on it back-to-back (each branch: AA-snake ->
dilated conv -> AA-snake -> conv -> residual, exactly as ops/pallas_ampblock),
their valid windows are aligned to the widest receptive field and averaged,
and — when `post` weights are given — the averaged buffer continues straight
through the tail AA-snake, the k=7 C->1 conv (a lane-wise MAC + sublane
reduction) and tanh, emitting the final (B, T) waveform tile.

Valid-region bookkeeping: block b shrinks e_b = Σ_i (16 + (k_b-1)/2·(1+d_i))
per side; the common window shrinks E = max_b e_b, the tail another 8 (AA
snake) + 3 (conv) = 11. E + 11 <= HALO = 128 holds for every stage shape in
the framework (k <= 11, d <= 5). Utterance edges are stitched from the
composed math on 2·E_tot-sample strips (same exactness argument as
ops/pallas_ampblock.fused_ampblock).

Backward: custom_vjp via the composed math at the saved primals.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.ops.pallas_ampblock import (
    HALO,
    _conv_tr,
    _pick_tile,
    _shrink,
    _snake_tr,
    composed_ampblock,
)

# Mosaic compile time scales superlinearly with the unrolled vector-op count
# (ops x tile width / 128 lanes): the whole-stage kernel at tile 4096 took
# ~7 min to compile per instance on v5e. 2048 keeps halo redundancy at
# 256/2304 = 11% and compile in the low minutes; executables persist in the
# XLA compile cache (+ AOT export for serving), so this is a one-time cost.
TILE_T = 2048
# tuples-of-arrays: per block (a1, ib1, w1, b1, a2, ib2, w2, b2) stacked over
# branches (the ops/pallas_ampblock weight contract); post = (alpha, 1/beta,
# w_post (7, C)) post-exp tail weights
BlockWeights = Tuple[jnp.ndarray, ...]


def _kernel(x_prev, x_cur, x_next, *refs, tile_t, ks, dils, tail):
    from jax.experimental import pallas as pl

    o_ref = refs[-1]
    wrefs = refs[:-1]
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
    xt = x.T  # (C, W) with W = tile_t + 2*HALO

    precision = (jax.lax.Precision.HIGHEST
                 if o_ref.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    w_full = tile_t + 2 * HALO
    e_max = max(_shrink(k, d) for k, d in zip(ks, dils))

    out_sum = None
    idx = 0
    for k, ds in zip(ks, dils):
        a1, ib1, w1, b1, a2, ib2, w2, b2 = wrefs[idx: idx + 8]
        idx += 8
        half = (k - 1) // 2
        cur = xt
        w_cur = w_full
        for i, d in enumerate(ds):
            h_i = 16 + half * (1 + d)
            u = _snake_tr(cur, a1[i].reshape(-1, 1), ib1[i].reshape(-1, 1),
                          w_cur - 16)
            c1 = _conv_tr(u, w1[i], b1[i], d, w_cur - 16 - 2 * half * d,
                          precision)
            v = _snake_tr(c1, a2[i].reshape(-1, 1), ib2[i].reshape(-1, 1),
                          w_cur - 32 - 2 * half * d)
            c2 = _conv_tr(v, w2[i], b2[i], 1, w_cur - 2 * h_i, precision)
            cur = cur[:, h_i: w_cur - h_i] + c2
            w_cur = w_cur - 2 * h_i
        e_b = (w_full - w_cur) // 2
        off = e_max - e_b
        o = cur[:, off: off + (w_full - 2 * e_max)]
        out_sum = o if out_sum is None else out_sum + o

    avg = out_sum / float(len(ks))
    if tail:
        pa, pib, pw = wrefs[idx: idx + 3]
        s = _snake_tr(avg, pa[0].reshape(-1, 1), pib[0].reshape(-1, 1),
                      w_full - 2 * e_max - 16)
        out_w = w_full - 2 * e_max - 22
        acc = None
        for t7 in range(7):
            term = pw[t7].reshape(-1, 1) * s[:, t7: t7 + out_w]
            acc = term if acc is None else acc + term
        row = jnp.tanh(jnp.sum(acc, axis=0, keepdims=True))  # (1, out_w)
        off2 = HALO - e_max - 11
        # out block is (1, tile_t, 1): Mosaic requires the block's last two
        # dims divisible by (8, 128) or equal to the array dims — a flat
        # (1, tile_t) waveform block violates the sublane rule
        o_ref[0] = row[:, off2: off2 + tile_t].T.astype(o_ref.dtype)
    else:
        off2 = HALO - e_max
        o_ref[0] = avg[:, off2: off2 + tile_t].T.astype(o_ref.dtype)


def _pallas_forward(x, ws, ks, dils, tile_t):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    block_ws, post = ws
    b, t, c = x.shape
    assert tile_t % HALO == 0 and t % tile_t == 0, (tile_t, t)
    n_tiles = t // tile_t
    tail = post is not None
    flat = [a for bw in block_ws for a in bw]
    if tail:
        pa, pib, pw = post
        flat += [pa.reshape(1, -1), pib.reshape(1, -1), pw]

    kernel = functools.partial(
        _kernel, tile_t=tile_t, ks=tuple(ks),
        dils=tuple(tuple(d) for d in dils), tail=tail)
    block = lambda im: pl.BlockSpec((1, tile_t, c), im, memory_space=pltpu.VMEM)
    halo_blk = lambda im: pl.BlockSpec((1, HALO, c), im, memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    k_halo = tile_t // HALO
    last_halo = t // HALO - 1
    if tail:
        out_shape = jax.ShapeDtypeStruct((b, t, 1), x.dtype)
        out_spec = pl.BlockSpec((1, tile_t, 1), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((b, t, c), x.dtype)
        out_spec = block(lambda i, j: (i, j, 0))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(b, n_tiles),
        in_specs=[
            halo_blk(lambda i, j: (i, jnp.maximum(j * k_halo - 1, 0), 0)),
            block(lambda i, j: (i, j, 0)),
            halo_blk(lambda i, j: (i, jnp.minimum((j + 1) * k_halo, last_halo), 0)),
        ] + [full()] * len(flat),
        out_specs=out_spec,
    )(x, x, x, *flat)


def composed_triple(x, block_ws, ks, dils, post=None):
    """The XLA-composed stage math (custom_vjp backward + parity oracle).

    x: (B, T, C); block_ws: per block the ops/pallas_ampblock weight tuple;
    post: optional (alpha, 1/beta, w_post (7, C)) -> (B, T, 1) tanh waveform,
    else the (B, T, C) averaged-resblock activation."""
    from megatts2_hierspeechpp_tpu.nn.conv import conv1d_op
    from megatts2_hierspeechpp_tpu.ops.resample import activation1d

    xs = None
    for bw, k, d in zip(block_ws, ks, dils):
        r = composed_ampblock(x, *bw, k, d)
        xs = r if xs is None else xs + r
    y = xs / float(len(ks))
    if post is None:
        return y
    pa, pib, pw = post
    y = activation1d(y, lambda v: v + jnp.square(jnp.sin(v * pa)) * pib)
    y = conv1d_op(y, pw[:, :, None], None, 1, 3, 1, 1)
    return jnp.tanh(y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused(x, ws, ks, dils, tile_t):
    return _pallas_forward(x, ws, ks, dils, tile_t)


def _fused_fwd(x, ws, ks, dils, tile_t):
    return _pallas_forward(x, ws, ks, dils, tile_t), (x, ws)


def _fused_bwd(ks, dils, tile_t, res, ct):
    x, ws = res
    out, vjp = jax.vjp(
        lambda x_, ws_: composed_triple(x_, ws_[0], ks, dils, ws_[1]), x, ws)
    # downstream bf16 compute (e.g. the GAN discriminator) may hand back a
    # bf16 cotangent while the composed primal is f32 — jax.vjp requires the
    # exact output JAX type, so match it (first hit: vocoder GAN training
    # through the fused last stage, round 5)
    return vjp(ct.astype(out.dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_amp_triple(
    x: jnp.ndarray,
    block_ws: Sequence[BlockWeights],
    ks: Sequence[int],
    dils: Sequence[Sequence[int]],
    post: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
    tile_t: int = TILE_T,
) -> jnp.ndarray:
    """Whole-stage fused Pallas op. Differentiable (composed-math vjp).

    x: (B, T, C) with C <= 64 (VMEM: all blocks' weights stay resident);
    returns (B, T, C) without `post`, (B, T, 1) tanh waveform with it.
    Falls back to `composed_triple` off-constraint (short T, wide C, k > 11).
    """
    b, t, c = x.shape
    e_max = max(_shrink(k, d) for k, d in zip(ks, dils))
    e_tot = e_max + (11 if post is not None else 0)
    wbytes = 4 * sum(bw[2].size + bw[6].size for bw in block_ws)
    cap = (10 * 2 ** 20 - wbytes) // (40 * c) - 2 * HALO
    if t <= 4 * e_tot or e_tot > HALO or cap < HALO:
        return composed_triple(x, block_ws, ks, dils, post)

    ks = tuple(ks)
    dils = tuple(tuple(d) for d in dils)
    ws = (tuple(tuple(bw) for bw in block_ws),
          None if post is None else tuple(post))
    tile_t = _pick_tile(t, min(tile_t, cap))
    if t % tile_t != 0:
        t_pad = (-(-t // tile_t)) * tile_t
        xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)), mode="edge")
        core = _fused(xp, ws, ks, dils, tile_t)[:, :t]
    else:
        core = _fused(x, ws, ks, dils, tile_t)
    head = composed_triple(x[:, : 2 * e_tot], block_ws, ks, dils, post)
    tail = composed_triple(x[:, -2 * e_tot:], block_ws, ks, dils, post)
    return jnp.concatenate(
        [head[:, :e_tot], core[:, e_tot: t - e_tot], tail[:, e_tot:]], axis=1
    ).astype(x.dtype)
