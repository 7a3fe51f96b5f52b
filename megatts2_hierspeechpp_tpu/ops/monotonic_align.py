"""Monotonic alignment search (MAS), batched.

The reference ships a Cython/OpenMP kernel
(/root/reference/ttv_v1/monotonic_align/core.pyx: maximum_path_c) used for
MAS-style duration extraction. Two implementations here:

  - `maximum_path` (this module): vectorized JAX — a `lax.scan` over frames
    with a per-row shifted max (the DP recurrence is associative over y), and a
    reverse scan for backtracking. Batch-parallel, jit-friendly, TPU-resident.
  - `ops.mas_native`: a C++/OpenMP shared library with ctypes bindings for
    host-side use (the native-runtime counterpart of the reference kernel).

DP: value[y, x] += max(value[y-1, x], value[y-1, x-1]); path is the argmax
backtrace, constrained to start at (0, 0) and end at (t_y-1, t_x-1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def maximum_path(value: jnp.ndarray, t_ys: jnp.ndarray, t_xs: jnp.ndarray) -> jnp.ndarray:
    """value: (B, T_y, T_x) scores; t_ys/t_xs: (B,) valid lengths.

    Returns a {0,1} path (B, T_y, T_x) monotonically assigning each frame y to
    one phoneme x.
    """
    b, t_y, t_x = value.shape
    xs = jnp.arange(t_x)

    def forward(carry, inputs):
        prev = carry  # (B, T_x) best score up to previous frame
        row, y = inputs  # (B, T_x), scalar
        shifted = jnp.concatenate(
            [jnp.full((b, 1), NEG_INF, prev.dtype), prev[:, :-1]], axis=1
        )
        take_diag = shifted >= prev  # True: came from x-1
        best = jnp.maximum(prev, shifted)
        # first frame must start at x == 0
        init_row = jnp.where(xs[None, :] == 0, row, NEG_INF)
        cur = jnp.where(y == 0, init_row, best + row)
        # x cannot exceed y (one frame per phoneme minimum)
        cur = jnp.where(xs[None, :] <= y, cur, NEG_INF)
        return cur, take_diag

    rows = jnp.swapaxes(value, 0, 1)  # (T_y, B, T_x)
    final, decisions = jax.lax.scan(
        forward, jnp.full((b, t_x), NEG_INF), (rows, jnp.arange(t_y))
    )
    # decisions: (T_y, B, T_x) — whether cell (y, x) came from (y-1, x-1)

    end_x = t_xs - 1

    def backward(carry, inputs):
        cur_x = carry  # (B,)
        dec, y = inputs  # (B, T_x), scalar
        active = (y < t_ys) & (y >= 0)
        onehot = (xs[None, :] == cur_x[:, None]) & active[:, None]
        came_diag = jnp.take_along_axis(dec, cur_x[:, None], axis=1)[:, 0]
        new_x = jnp.where((y > 0) & came_diag, cur_x - 1, cur_x)
        new_x = jnp.where(active, new_x, cur_x)
        return jnp.clip(new_x, 0, t_x - 1), onehot

    # walk from the last valid frame down; frames beyond t_ys emit nothing
    ys_rev = jnp.arange(t_y - 1, -1, -1)
    decs_rev = decisions[::-1]
    # start cursor at end_x for each batch element
    _, path_rev = jax.lax.scan(backward, end_x, (decs_rev, ys_rev))
    path = path_rev[::-1]  # (T_y, B, T_x)
    path = jnp.swapaxes(path, 0, 1).astype(value.dtype)
    # mask columns beyond t_xs
    path = path * (xs[None, None, :] < t_xs[:, None, None])
    return path
