"""GAN + VAE losses (parity with /root/reference/losses.py)."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def feature_loss(fmap_r: Sequence, fmap_g: Sequence) -> jnp.ndarray:
    """L1 feature-matching over all discriminator feature maps, x2 (losses.py:7-15)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(
                jnp.abs(jnp.asarray(rl, jnp.float32) - gl.astype(jnp.float32))
            )
    return loss * 2


def discriminator_loss(disc_real: Sequence, disc_gen: Sequence):
    """LSGAN D loss (losses.py:18-32)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_gen):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        r_loss = jnp.mean(jnp.square(1 - dr))
        g_loss = jnp.mean(jnp.square(dg))
        loss = loss + r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs: Sequence):
    """LSGAN G loss (losses.py:35-43)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean(jnp.square(1 - dg.astype(jnp.float32)))
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask) -> jnp.ndarray:
    """Masked KL between posterior samples and prior stats (losses.py:46-61).

    z_p, logs_q, m_p, logs_p: (B, T, C); z_mask: (B, T, 1).
    """
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    z_mask = z_mask.astype(jnp.float32)

    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * jnp.square(z_p - m_p) * jnp.exp(-2.0 * logs_p)
    kl = jnp.sum(kl * z_mask)
    return kl / jnp.sum(z_mask)
