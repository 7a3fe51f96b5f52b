"""Fused anti-aliased SnakeBeta activation — Pallas TPU kernel.

The BigVGAN-style activation sandwich (upsample x2 -> snake -> downsample x2,
ops/resample.py:activation1d) is the vocoder's HBM-bandwidth hot spot: at the
16 kHz stages it makes three full passes over the largest activations. This
kernel fuses all three into one VMEM-resident pass per tile:

  y[t] = sum_o ge[o] * s(ue[t+o]) + sum_o go[o] * s(uo[t+o])
  ue[m] = sum_d e[d] x[m+d]   (even polyphase of the x2 kaiser-sinc upsampler)
  uo[m] = sum_d o[d] x[m+d]   (odd polyphase)
  s(u)  = u + sin^2(alpha*u)/beta

Polyphase taps are derived numerically from ops/resample.py's filters at trace
time, so the kernel is bit-equivalent (to fp accumulation order) with the
composed reference implementation — asserted in tests/test_pallas_snake.py.

Grid: (B, T/Tt); each program reads its tile plus the two neighbor tiles
(aligned BlockSpec blocks; the 8-sample halo is taken from their edges), runs
the 24 shifted multiply-adds + snake on the VPU, writes one y tile. Net HBM
traffic ~4 passes vs ~10 for the composed op.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from megatts2_hierspeechpp_tpu.ops.resample import kaiser_sinc_filter1d

HALO = 8
TILE_T = 512


@functools.lru_cache(maxsize=1)
def _polyphase_taps():
    """(e_taps[6], o_taps[6], ge[6], go[6]) float32 tuples.

    From the x2 kaiser filters: u[2m+p] = sum_d taps_p[d] x[m+d] with
    d in [-3..2] (even) / [-2..3] (odd); y[t] = sum g[d] u[2t+d], d in [-5..6],
    split by parity of 2t+d.
    """
    f_up = kaiser_sinc_filter1d(0.25, 0.3, 12).astype(np.float64)
    f_dn = kaiser_sinc_filter1d(0.25, 0.3, 12).astype(np.float64)

    # numerically probe the composed upsampler on a delta (same math as
    # ops/resample.upsample1d): u = 2 * conv_transpose(x_pad, f)[crop]
    t = 64
    u_mat = np.zeros((2 * t, t))
    for i in range(t):
        x = np.zeros(t)
        x[i] = 1.0
        xp = np.pad(x, (5, 5), mode="edge")
        full = np.zeros(2 * len(xp) + 10)
        for m, v in enumerate(xp):
            full[2 * m : 2 * m + 12] += 2.0 * v * f_up
        u_mat[:, i] = full[15 : 15 + 2 * t]
    j0 = t  # interior even row
    e_taps = [u_mat[j0, t // 2 + d] for d in range(-3, 3)]
    o_taps = [u_mat[j0 + 1, t // 2 + d] for d in range(-2, 4)]

    g = f_dn  # downsample: y[t] = sum_k g[k] u_pad[2t + k], pad (5, 6) edge
    # y[t] = sum_{d=-5..6} g[d+5] u[2t+d]
    ge = [g[d + 5] for d in (-4, -2, 0, 2, 4, 6)]  # pairs with ue[t + o], o=-2..3
    go = [g[d + 5] for d in (-5, -3, -1, 1, 3, 5)]  # pairs with uo[t + o], o=-3..2
    return (
        np.asarray(e_taps, np.float32),
        np.asarray(o_taps, np.float32),
        np.asarray(ge, np.float32),
        np.asarray(go, np.float32),
    )


def _kernel(x_prev, x_cur, x_next, ab_ref, o_ref, *, tile_t, n_ch):
    e_taps, o_taps, ge, go = _polyphase_taps()
    # halo from the neighbor tiles' edges
    x = jnp.concatenate(
        [x_prev[0, tile_t - HALO :], x_cur[0], x_next[0, :HALO]], axis=0
    ).astype(jnp.float32)  # (tile_t + 2*HALO, C)
    alpha = ab_ref[0:1, :]  # (1, C)
    inv_beta = ab_ref[1:2, :]

    m_len = tile_t + 8  # u region: local m in [HALO-4, HALO+tile_t+4)
    base = HALO - 4

    def poly(taps, d0):
        acc = taps[0] * x[base + d0 : base + d0 + m_len]
        for k in range(1, 6):
            s0 = base + d0 + k
            acc = acc + taps[k] * x[s0 : s0 + m_len]
        return acc

    ue = poly(e_taps, -3)
    uo = poly(o_taps, -2)

    def snake(u):
        s = jnp.sin(u * alpha)
        return u + s * s * inv_beta

    se = snake(ue)
    so = snake(uo)

    # y[t] = sum_o ge[o] se[t+4+o] (o=-2..3) + go[o] so[t+4+o] (o=-3..2)
    y = ge[0] * se[2 : 2 + tile_t]
    for i, o in enumerate(range(-1, 4), start=1):
        y = y + ge[i] * se[4 + o : 4 + o + tile_t]
    for i, o in enumerate(range(-3, 3)):
        y = y + go[i] * so[4 + o : 4 + o + tile_t]
    o_ref[0] = y.astype(o_ref.dtype)


def fused_aa_snakebeta(
    x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
    tile_t: int = TILE_T,
) -> jnp.ndarray:
    """x: (B, T, C); alpha/beta: (C,) post-exp. Pallas path (TPU)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c = x.shape
    tile_t = min(tile_t, max(8, t))
    n_tiles = -(-t // tile_t)
    t_pad = n_tiles * tile_t
    # one edge-replicated guard tile on each side so prev/next blocks exist
    xp = jnp.pad(
        x, ((0, 0), (tile_t, tile_t + (t_pad - t)), (0, 0)), mode="edge"
    )

    ab = jnp.stack(
        [jnp.broadcast_to(alpha, (c,)),
         jnp.broadcast_to(1.0 / (beta + 1e-9), (c,))]
    ).astype(jnp.float32)

    kernel = functools.partial(_kernel, tile_t=tile_t, n_ch=c)
    block = lambda off: pl.BlockSpec(
        (1, tile_t, c), lambda i, j, o=off: (i, j + o, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), x.dtype),
        grid=(b, n_tiles),
        in_specs=[block(0), block(1), block(2), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, tile_t, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
    )(xp, xp, xp, ab)
    return out[:, :t]
