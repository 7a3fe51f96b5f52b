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
TILE_T = 2048


def _pick_tile(t: int, tile_t: int) -> int:
    """Largest divisor of t that is <= tile_t and a multiple of HALO (falls
    back to a HALO multiple, triggering a one-off remainder pad).

    Every return value is a HALO multiple: the neighbor-halo BlockSpec index
    maps in _pallas_forward assume tile_t % HALO == 0 (k_halo = tile_t //
    HALO) — a non-multiple would silently misalign halo rows."""
    tile_t = max(HALO, tile_t - tile_t % HALO)
    if t <= tile_t:
        # ceil t to a HALO multiple; if that overflows the cap the caller's
        # remainder-pad path handles it (t % tile_t != 0)
        return min(-(-t // HALO) * HALO, tile_t)
    for cand in range(tile_t, HALO - 1, -HALO):
        if t % cand == 0:
            return cand
    return tile_t


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
    from jax.experimental import pallas as pl

    e_taps, o_taps, ge, go = _polyphase_taps()
    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    # halo from the neighbor tiles' edges; at the sequence boundary replicate
    # the tile's own edge row (prev/next index maps are clamped)
    left = x_prev[0]
    left = jnp.where(j == 0, jnp.broadcast_to(x_cur[0, 0:1], left.shape), left)
    right = x_next[0]
    right = jnp.where(
        j == n_tiles - 1,
        jnp.broadcast_to(x_cur[0, tile_t - 1 : tile_t], right.shape),
        right,
    )
    x = jnp.concatenate([left, x_cur[0], right], axis=0).astype(jnp.float32)
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


def _kernel_tr(x_prev, x_cur, x_next, ab_ref, o_ref, *, tile_t, n_ch):
    """Transposed-tile variant for small C: the (tile_t, C) block is
    transposed in VMEM to (C, tile_t) so every VPU op runs on full 128-lane
    vregs (a (2048, 16) block natively occupies 16/128 lanes — an 8x
    efficiency loss that dominates the 16 kHz stages); the polyphase shifts
    become small static lane-offset slices."""
    from jax.experimental import pallas as pl

    e_taps, o_taps, ge, go = _polyphase_taps()
    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    left = x_prev[0]
    left = jnp.where(j == 0, jnp.broadcast_to(x_cur[0, 0:1], left.shape), left)
    right = x_next[0]
    right = jnp.where(
        j == n_tiles - 1,
        jnp.broadcast_to(x_cur[0, tile_t - 1 : tile_t], right.shape),
        right,
    )
    x = jnp.concatenate([left, x_cur[0], right], axis=0).astype(jnp.float32)
    xt = x.T  # (C, tile_t + 2*HALO): lanes = time
    alpha = ab_ref[0:1, :].T  # (C, 1)
    inv_beta = ab_ref[1:2, :].T

    m_len = tile_t + 8
    base = HALO - 4

    def poly(taps, d0):
        acc = taps[0] * xt[:, base + d0 : base + d0 + m_len]
        for k in range(1, 6):
            s0 = base + d0 + k
            acc = acc + taps[k] * xt[:, s0 : s0 + m_len]
        return acc

    ue = poly(e_taps, -3)
    uo = poly(o_taps, -2)

    def snake(u):
        s = jnp.sin(u * alpha)
        return u + s * s * inv_beta

    se = snake(ue)
    so = snake(uo)

    y = ge[0] * se[:, 2 : 2 + tile_t]
    for i, o in enumerate(range(-1, 4), start=1):
        y = y + ge[i] * se[:, 4 + o : 4 + o + tile_t]
    for i, o in enumerate(range(-3, 3)):
        y = y + go[i] * so[:, 4 + o : 4 + o + tile_t]
    o_ref[0] = y.T.astype(o_ref.dtype)


def _pallas_forward(x, alpha, beta, tile_t):
    """Divisible-tile Pallas dispatch (t % tile_t == 0)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c = x.shape
    assert tile_t % HALO == 0 and t % tile_t == 0, (tile_t, t)
    n_tiles = t // tile_t

    ab = jnp.stack(
        [jnp.broadcast_to(alpha, (c,)),
         jnp.broadcast_to(1.0 / (beta + 1e-9), (c,))]
    ).astype(jnp.float32)

    kern = _kernel_tr if c <= 64 else _kernel
    kernel = functools.partial(kern, tile_t=tile_t, n_ch=c)
    block = lambda im: pl.BlockSpec((1, tile_t, c), im, memory_space=pltpu.VMEM)
    # neighbor halos are read as HALO-row blocks (not whole tiles): HBM read
    # traffic is ~1x the input instead of 3x
    halo_blk = lambda im: pl.BlockSpec((1, HALO, c), im, memory_space=pltpu.VMEM)
    k_halo = tile_t // HALO
    last_halo = t // HALO - 1
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        grid=(b, n_tiles),
        in_specs=[
            halo_blk(lambda i, j: (i, jnp.maximum(j * k_halo - 1, 0), 0)),
            block(lambda i, j: (i, j, 0)),
            halo_blk(lambda i, j: (i, jnp.minimum((j + 1) * k_halo, last_halo), 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=block(lambda i, j: (i, j, 0)),
    )(x, x, x, ab)
    return out


def _composed_math(x, alpha, beta):
    """The XLA-composed reference math (activations.py fallback path): the
    Pallas kernel computes the identical function, so this vjp IS the
    kernel's gradient (tests/test_pallas_snake.py pins fwd agreement and
    grad agreement)."""
    from megatts2_hierspeechpp_tpu.ops.resample import activation1d

    a = alpha.astype(x.dtype)
    b = beta.astype(x.dtype)
    return activation1d(x, lambda v: v + jnp.square(jnp.sin(v * a)) / (b + 1e-9))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused(x, alpha, beta, tile_t):
    return _pallas_forward(x, alpha, beta, tile_t)


def _fused_fwd(x, alpha, beta, tile_t):
    return _pallas_forward(x, alpha, beta, tile_t), (x, alpha, beta)


def _fused_bwd(tile_t, res, ct):
    # pallas_call has no autodiff rule; differentiate the composed math at
    # the saved primals instead (trainers hit this: AMPBlock backward)
    x, alpha, beta = res
    out, vjp = jax.vjp(_composed_math, x, alpha, beta)
    # match the composed primal's JAX type (see pallas_amp_triple._fused_bwd)
    return vjp(ct.astype(out.dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_aa_snakebeta(
    x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
    tile_t: int = TILE_T,
) -> jnp.ndarray:
    """x: (B, T, C); alpha/beta: (C,) post-exp. Pallas path (TPU).

    Differentiable: forward runs the fused kernel, backward is the vjp of the
    equivalent composed math (custom_vjp). Exact vs the composed path
    EVERYWHERE: kernel interiors by construction; the first/last ~4 samples
    (where the kernel replicates x once while the composed op edge-replicates
    twice, once per resample) are overwritten from the composed math on tiny
    strips via in-place updates."""
    b, t, c = x.shape
    edge = 8  # > the x2 kaiser filters' one-sided reach
    if t <= 4 * edge:
        return _composed_math(x, alpha, beta)
    # VMEM budget: ~10 live (tile, C) f32 buffers (3 in blocks + concat +
    # ue/uo/se/so + out) must fit the 16 MB scoped limit; the small-C
    # transpose staging pads C up to 128 lanes, so budget with c >= 128
    tile_t = _pick_tile(t, min(tile_t, 262144 // max(c, 128)))
    if t % tile_t != 0:
        # rare non-divisible case: pad once to a tile multiple
        t_pad = (-(-t // tile_t)) * tile_t
        xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)), mode="edge")
        core = _fused(xp, alpha, beta, tile_t)[:, :t]
    else:
        core = _fused(x, alpha, beta, tile_t)
    head = _composed_math(x[:, : 2 * edge], alpha, beta)[:, :edge]
    tail = _composed_math(x[:, -2 * edge:], alpha, beta)[:, edge:]
    core = core.at[:, :edge].set(head.astype(core.dtype))
    return core.at[:, t - edge:].set(tail.astype(core.dtype))
