"""Mask utilities. All masks are boolean or {0,1} float, channels-last.

Covers the mask conventions of the reference (/root/reference/commons.py:128,
ttv_v1/utils_mega.py make_attn_mask) re-expressed for (B, T, C) layout.
"""
from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, T) bool mask. Static max_length (jit-friendly)."""
    pos = jnp.arange(max_length)[None, :]
    return pos < lengths[:, None]


def feature_mask(lengths: jnp.ndarray, max_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B,) -> (B, T, 1) float mask for multiplying onto (B, T, C) activations."""
    return sequence_mask(lengths, max_length)[:, :, None].astype(dtype)


def attn_mask_from(q_mask: jnp.ndarray, k_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, Tq) x (B, Tk) bool -> (B, 1, Tq, Tk) bool attention mask."""
    return (q_mask[:, None, :, None] & k_mask[:, None, None, :])


def causal_attn_mask(t: int) -> jnp.ndarray:
    """(1, 1, T, T) lower-triangular bool mask."""
    return jnp.tril(jnp.ones((t, t), dtype=bool))[None, None]


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None, eps: float = 1e-9):
    """Mean of x over positions where mask is true."""
    mask = mask.astype(x.dtype)
    return (x * mask).sum(axis) / jnp.maximum(mask.sum(axis), eps)
