"""EnCodec-style residual vector quantizer with EMA codebook learning.

Behavior parity with /root/reference/ttv_v1/{quantize.py,core_vq.py}:
Euclidean codebook, straight-through estimator, EMA cluster stats
(decay 0.99, laplace smoothing eps 1e-5), dead-code expiry (< 2 EMA count ->
resample from batch), k-means init on the first training batch, MSE commit loss.

TPU-native differences (deliberate):
  - codebook stats live in a flax variable collection "vq" and the EMA update is
    a pure new-state computation; under pjit/GSPMD the batch reductions
    (one-hot counts, embed sums) are *global* across the data mesh axis, which
    fixes the reference's cross-replica EMA divergence (core_vq.py:150-151
    commented-out broadcast, see SURVEY.md §5 race note).
  - k-means init runs host-side once before training (ops/kmeans.py) instead of
    inside the first forward.
  - distances are computed in fp32 on the MXU ((B*T) x bins matmul).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _dists_to_codebook(x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """x: (N, D); embed: (bins, D) -> negative squared distances (N, bins)."""
    x2 = jnp.sum(jnp.square(x), axis=1, keepdims=True)
    e2 = jnp.sum(jnp.square(embed), axis=1)[None, :]
    xe = jnp.dot(x, embed.T, precision=jax.lax.Precision.HIGHEST)
    return -(x2 - 2 * xe + e2)


def _laplace_smoothing(x, n_categories, epsilon=1e-5):
    return (x + epsilon) / (x.sum() + n_categories * epsilon)


class EuclideanCodebook(nn.Module):
    dim: int
    codebook_size: int
    decay: float = 0.99
    epsilon: float = 1e-5
    threshold_ema_dead_code: float = 2.0

    def setup(self):
        init = nn.initializers.variance_scaling(1.0 / 3, "fan_in", "uniform")
        self.embed = self.variable(
            "vq",
            "embed",
            lambda: init(jax.random.PRNGKey(0), (self.codebook_size, self.dim)),
        )
        self.embed_avg = self.variable(
            "vq", "embed_avg", lambda: jnp.array(self.embed.value)
        )
        self.cluster_size = self.variable(
            "vq", "cluster_size", lambda: jnp.zeros((self.codebook_size,))
        )
        self.inited = self.variable("vq", "inited", lambda: jnp.array(True))

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., D) -> int32 codes (...)."""
        shape = x.shape
        flat = x.reshape(-1, shape[-1]).astype(jnp.float32)
        dists = _dists_to_codebook(flat, self.embed.value.astype(jnp.float32))
        return jnp.argmax(dists, axis=-1).reshape(shape[:-1])

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.embed.value, codes, axis=0)

    def __call__(self, x: jnp.ndarray, train: bool = False, rng=None):
        """x: (B, T, D). Returns (quantized, codes). Mutates 'vq' when train."""
        codes = self.encode(x)
        quantized = self.decode(codes)

        if train:
            flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
            onehot = jax.nn.one_hot(codes.reshape(-1), self.codebook_size,
                                    dtype=jnp.float32)
            counts = onehot.sum(axis=0)  # global under GSPMD
            embed_sum = jnp.einsum(
                "nd,nc->cd", flat, onehot, precision=jax.lax.Precision.HIGHEST
            )

            # dead-code expiry *before* the EMA update (reference order,
            # core_vq.py:217-223) using pre-update cluster sizes
            cluster_size = self.cluster_size.value
            embed = self.embed.value
            if rng is not None and self.threshold_ema_dead_code > 0:
                expired = cluster_size < self.threshold_ema_dead_code
                n = flat.shape[0]
                sample_idx = jax.random.randint(
                    rng, (self.codebook_size,), 0, n
                )
                replacement = flat[sample_idx]
                embed = jnp.where(expired[:, None], replacement, embed)

            cluster_size = self.decay * cluster_size + (1 - self.decay) * counts
            embed_avg = self.decay * self.embed_avg.value + (1 - self.decay) * embed_sum
            smoothed = (
                _laplace_smoothing(cluster_size, self.codebook_size, self.epsilon)
                * cluster_size.sum()
            )
            embed_normalized = embed_avg / smoothed[:, None]
            # positions just resampled keep their replacement until next update
            self.cluster_size.value = cluster_size
            self.embed_avg.value = embed_avg
            self.embed.value = embed_normalized

        return quantized.astype(x.dtype), codes


class VectorQuantization(nn.Module):
    dim: int
    codebook_size: int
    decay: float = 0.99
    commitment_weight: float = 1.0
    threshold_ema_dead_code: float = 2.0

    def setup(self):
        self.codebook = EuclideanCodebook(
            self.dim,
            self.codebook_size,
            decay=self.decay,
            threshold_ema_dead_code=self.threshold_ema_dead_code,
        )

    def encode(self, x):
        return self.codebook.encode(x)

    def decode(self, codes):
        return self.codebook.decode(codes)

    def __call__(self, x: jnp.ndarray, train: bool = False, rng=None):
        quantized, codes = self.codebook(x, train=train, rng=rng)
        if train:
            # straight-through + commit loss (fp32 island)
            commit = jnp.mean(
                jnp.square(jax.lax.stop_gradient(quantized) - x).astype(jnp.float32)
            )
            quantized = x + jax.lax.stop_gradient(quantized - x)
        else:
            commit = jnp.zeros((), jnp.float32)
        return quantized, codes, commit * self.commitment_weight


class ResidualVectorQuantizer(nn.Module):
    """n_q residual stages (reference uses n_q=1, bins=1024, dim=20)."""

    dimension: int = 20
    n_q: int = 1
    bins: int = 1024
    decay: float = 0.99
    threshold_ema_dead_code: float = 2.0

    def setup(self):
        self.layers = [
            VectorQuantization(
                self.dimension,
                self.bins,
                decay=self.decay,
                threshold_ema_dead_code=self.threshold_ema_dead_code,
                name=f"vq_{i}",
            )
            for i in range(self.n_q)
        ]

    def __call__(self, x: jnp.ndarray, train: bool = False, rng=None,
                 n_q: Optional[int] = None):
        """x: (B, T, D). Returns (quantized_sum, codes (n_q, B, T), commit_loss)."""
        n_q = n_q or self.n_q
        residual = x
        quantized_out = jnp.zeros_like(x)
        all_codes = []
        losses = []
        for i, layer in enumerate(self.layers[:n_q]):
            lrng = None
            if rng is not None:
                rng, lrng = jax.random.split(rng)
            quantized, codes, loss = layer(residual, train=train, rng=lrng)
            residual = residual - quantized
            quantized_out = quantized_out + quantized
            all_codes.append(codes)
            losses.append(loss)
        return quantized_out, jnp.stack(all_codes), jnp.mean(jnp.stack(losses))

    def encode(self, x: jnp.ndarray, n_q: Optional[int] = None) -> jnp.ndarray:
        n_q = n_q or self.n_q
        residual = x
        out = []
        for layer in self.layers[:n_q]:
            codes = layer.encode(residual)
            residual = residual - layer.decode(codes)
            out.append(codes)
        return jnp.stack(out)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes: (n_q, B, T) -> (B, T, D)."""
        out = 0.0
        for i in range(codes.shape[0]):
            out = out + self.layers[i].decode(codes[i])
        return out
