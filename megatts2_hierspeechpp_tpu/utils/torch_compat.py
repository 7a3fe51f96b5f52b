"""Torch-checkpoint porting: convert PyTorch tensors/state_dicts into the
parameter layouts of this framework.

Used (a) at release time to load reference checkpoints (reference ckpt format:
{model, iteration, optimizer, learning_rate}, /root/reference/utils.py:19-57),
and (b) in the test suite, where randomly-initialized reference torch modules
act as numerical oracles.

Layout rules (see nn/conv.py):
  torch Conv1d weight (Cout, Cin/g, K)        -> (K, Cin/g, Cout)   transpose(2,1,0)
  torch ConvTranspose1d weight (Cin, Cout, K) -> flipped (K, Cin, Cout)
  torch Conv2d weight (Cout, Cin, Kh, Kw)     -> (Kh, Kw, Cin, Cout)
  torch Linear weight (Out, In)               -> (In, Out)
  weight-norm pairs weight_g/weight_v map to g (squeezed) / v (same rule as above)
"""
from __future__ import annotations

import numpy as np


def conv1d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 1, 0))


def conv_transpose1d_kernel(w: np.ndarray) -> np.ndarray:
    # (Cin, Cout, K) -> flip K -> (K, Cin, Cout)
    w = np.asarray(w)[:, :, ::-1]
    return np.transpose(w, (2, 0, 1))


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def wn_conv1d(weight_g: np.ndarray, weight_v: np.ndarray) -> dict:
    """torch weight_norm(Conv1d) -> {g: (Cout,), v: (K, Cin, Cout)}."""
    return {
        "g": np.asarray(weight_g).reshape(-1),
        "v": conv1d_kernel(weight_v),
    }


def wn_conv_transpose1d(weight_g: np.ndarray, weight_v: np.ndarray) -> dict:
    """torch weight_norm(ConvTranspose1d) -> {g: (Cin,), v: flipped (K, Cin, Cout)}."""
    return {
        "g": np.asarray(weight_g).reshape(-1),
        "v": conv_transpose1d_kernel(weight_v),
    }


def wn_conv2d(weight_g: np.ndarray, weight_v: np.ndarray) -> dict:
    return {
        "g": np.asarray(weight_g).reshape(-1),
        "v": conv2d_kernel(weight_v),
    }


def to_np(t) -> np.ndarray:
    """torch tensor -> numpy (no torch import at module scope)."""
    if hasattr(t, "detach"):
        # copy: torch .numpy() returns a view that in-place ops would mutate
        return t.detach().cpu().numpy().copy()
    return np.asarray(t)
