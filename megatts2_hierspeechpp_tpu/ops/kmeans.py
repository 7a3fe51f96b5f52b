"""Host-side k-means codebook initialization for the RVQ.

Reference behavior (/root/reference/ttv_v1/core_vq.py:71-93,140-151): on the
first training batch, run k-means (<=500 samples, 50 iters) and copy the
centroids into embed/embed_avg with the final bin counts as cluster sizes.
Here it runs as an explicit pre-training step on host 0, and the resulting
stats are broadcast to all hosts via the checkpoint/param pytree — making the
initialization deterministic and replica-consistent (the reference left its
cross-worker broadcast commented out).
"""
from __future__ import annotations

import numpy as np


def kmeans(samples: np.ndarray, num_clusters: int, num_iters: int = 50,
           max_samples: int = 500, seed: int = 0):
    """samples: (N, D) -> (centroids (C, D), bin_counts (C,))."""
    rng = np.random.default_rng(seed)
    samples = np.asarray(samples, np.float32)[:max_samples]
    n = samples.shape[0]
    if n >= num_clusters:
        idx = rng.permutation(n)[:num_clusters]
    else:
        idx = rng.integers(0, n, (num_clusters,))
    means = samples[idx]

    bins = np.zeros(num_clusters, np.int64)
    for _ in range(num_iters):
        d2 = (
            (samples[:, None, :] - means[None, :, :]) ** 2
        ).sum(-1)
        buckets = np.argmin(d2, axis=1)
        bins = np.bincount(buckets, minlength=num_clusters)
        zero = bins == 0
        denom = np.maximum(bins, 1)
        new_means = np.zeros_like(means)
        np.add.at(new_means, buckets, samples)
        new_means = new_means / denom[:, None]
        means = np.where(zero[:, None], means, new_means)
    return means.astype(np.float32), bins.astype(np.float32)


def init_rvq_state(vq_state: dict, samples: np.ndarray, seed: int = 0) -> dict:
    """Replace the 'vq' collection of a ResidualVectorQuantizer with k-means
    initialized codebooks. vq_state: nested dict {vq_i: {codebook: {...}}};
    samples: (N, D) feature vectors from the first batch (residual stages are
    initialized from the successive residuals, as in the reference loop)."""
    out = {}
    residual = np.asarray(samples, np.float32)
    for name in sorted(vq_state.keys(), key=lambda s: int(s.split("_")[-1])):
        cb = vq_state[name]["codebook"]
        bins = cb["embed"].shape[0]
        centroids, counts = kmeans(residual, bins, seed=seed)
        out[name] = {
            "codebook": {
                "embed": centroids,
                "embed_avg": centroids.copy(),
                "cluster_size": counts,
                "inited": np.array(True),
            }
        }
        # next residual stage trains on what this stage failed to explain
        d2 = ((residual[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        q = centroids[np.argmin(d2, axis=1)]
        residual = residual - q
    return out
