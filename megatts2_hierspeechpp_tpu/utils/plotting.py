"""Plot utilities for training observability (reference utils.py:79-154 pushed
matplotlib spectrogram/f0 images to TensorBoard; we render to PNG files next
to the JSONL scalars)."""
from __future__ import annotations

import os

import numpy as np


def save_spectrogram_plot(spec: np.ndarray, path: str, title: str = ""):
    """spec: (T, n_mels) or (n_mels, T)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if spec.shape[0] > spec.shape[1]:
        spec = spec.T
    fig, ax = plt.subplots(figsize=(10, 3))
    im = ax.imshow(spec, aspect="auto", origin="lower", interpolation="none")
    plt.colorbar(im, ax=ax)
    ax.set_title(title)
    ax.set_xlabel("frames")
    ax.set_ylabel("channels")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def save_f0_plot(f0_target: np.ndarray, f0_pred: np.ndarray, path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 3))
    ax.plot(f0_target, label="target", alpha=0.8)
    ax.plot(f0_pred, label="pred", alpha=0.8)
    ax.legend()
    ax.set_xlabel("frames (200 Hz)")
    ax.set_ylabel("f0 (Hz)")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
