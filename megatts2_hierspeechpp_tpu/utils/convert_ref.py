"""Reference-checkpoint converters: map liuhuang31/Megatts2_HierSpeechpp torch
state_dicts onto this framework's flax param trees, block by block.

Each function takes a flat torch state_dict (tensor or numpy values) and a key
prefix, and returns a nested flax params dict for the corresponding module in
megatts2_hierspeechpp_tpu. Composed into whole-model converters in
models/convert.py. Also used by the test suite, where randomly initialized
reference modules serve as numerical oracles.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np

from megatts2_hierspeechpp_tpu.utils import torch_compat as tc


def _np(sd: Mapping, key: str) -> np.ndarray:
    return tc.to_np(sd[key])


def _j(p: str, name: str) -> str:
    """Join a (possibly empty) prefix with a key name."""
    return f"{p}.{name}" if p else name


def conv1d(sd, p) -> dict:
    """torch Conv1d '{p}.weight/bias' -> {kernel, bias}."""
    out = {"kernel": tc.conv1d_kernel(_np(sd, _j(p, "weight")))}
    if _j(p, "bias") in sd:
        out["bias"] = _np(sd, _j(p, "bias"))
    return out


def dense_from_conv1x1(sd, p) -> dict:
    """torch Conv1d kernel_size=1 -> Dense {kernel (In,Out), bias}."""
    w = _np(sd, _j(p, "weight"))  # (Out, In, 1)
    out = {"kernel": np.transpose(w[:, :, 0], (1, 0))}
    if _j(p, "bias") in sd:
        out["bias"] = _np(sd, _j(p, "bias"))
    return out


def dense(sd, p) -> dict:
    out = {"kernel": tc.linear_kernel(_np(sd, _j(p, "weight")))}
    if _j(p, "bias") in sd:
        out["bias"] = _np(sd, _j(p, "bias"))
    return out


def wn_conv1d(sd, p) -> dict:
    g_key = _j(p, "weight_g") if _j(p, "weight_g") in sd else _j(p, "parametrizations.weight.original0")
    v_key = _j(p, "weight_v") if _j(p, "weight_v") in sd else _j(p, "parametrizations.weight.original1")
    out = tc.wn_conv1d(_np(sd, g_key), _np(sd, v_key))
    if _j(p, "bias") in sd:
        out["bias"] = _np(sd, _j(p, "bias"))
    return out


def wn_conv_transpose1d(sd, p) -> dict:
    g_key = _j(p, "weight_g") if _j(p, "weight_g") in sd else _j(p, "parametrizations.weight.original0")
    v_key = _j(p, "weight_v") if _j(p, "weight_v") in sd else _j(p, "parametrizations.weight.original1")
    out = tc.wn_conv_transpose1d(_np(sd, g_key), _np(sd, v_key))
    if _j(p, "bias") in sd:
        out["bias"] = _np(sd, _j(p, "bias"))
    return out


def conv_transpose1d(sd, p) -> dict:
    out = {"kernel": tc.conv_transpose1d_kernel(_np(sd, _j(p, "weight")))}
    if _j(p, "bias") in sd:
        out["bias"] = _np(sd, _j(p, "bias"))
    return out


def conv2d(sd, p) -> dict:
    out = {"kernel": tc.conv2d_kernel(_np(sd, _j(p, "weight")))}
    if _j(p, "bias") in sd:
        out["bias"] = _np(sd, _j(p, "bias"))
    return out


def wn_conv2d(sd, p) -> dict:
    g_key = _j(p, "weight_g") if _j(p, "weight_g") in sd else _j(p, "parametrizations.weight.original0")
    v_key = _j(p, "weight_v") if _j(p, "weight_v") in sd else _j(p, "parametrizations.weight.original1")
    out = tc.wn_conv2d(_np(sd, g_key), _np(sd, v_key))
    if _j(p, "bias") in sd:
        out["bias"] = _np(sd, _j(p, "bias"))
    return out


def layer_norm(sd, p, gamma="gamma", beta="beta") -> dict:
    """Reference modules.LayerNorm uses gamma/beta; torch nn.LayerNorm weight/bias."""
    if _j(p, gamma) in sd:
        return {"scale": _np(sd, _j(p, gamma)), "bias": _np(sd, _j(p, beta))}
    return {"scale": _np(sd, _j(p, "weight")), "bias": _np(sd, _j(p, "bias"))}


def embedding(sd, p) -> dict:
    return {"embedding": _np(sd, _j(p, "weight"))}


def mha(sd, p) -> dict:
    """attentions.MultiHeadAttention: conv_q/k/v/o are 1x1 convs; optional rel embs."""
    out = {
        "conv_q": dense_from_conv1x1(sd, _j(p, "conv_q")),
        "conv_k": dense_from_conv1x1(sd, _j(p, "conv_k")),
        "conv_v": dense_from_conv1x1(sd, _j(p, "conv_v")),
        "conv_o": dense_from_conv1x1(sd, _j(p, "conv_o")),
    }
    if _j(p, "emb_rel_k") in sd:
        out["emb_rel_k"] = _np(sd, _j(p, "emb_rel_k"))
        out["emb_rel_v"] = _np(sd, _j(p, "emb_rel_v"))
    return out


def ffn(sd, p) -> dict:
    return {"conv_1": conv1d(sd, _j(p, "conv_1")), "conv_2": conv1d(sd, _j(p, "conv_2"))}


def vits_encoder(sd, p, n_layers) -> dict:
    out = {}
    for i in range(n_layers):
        out[f"attn_{i}"] = mha(sd, _j(p, f"attn_layers.{i}"))
        out[f"norm1_{i}"] = layer_norm(sd, _j(p, f"norm_layers_1.{i}"))
        out[f"ffn_{i}"] = ffn(sd, _j(p, f"ffn_layers.{i}"))
        out[f"norm2_{i}"] = layer_norm(sd, _j(p, f"norm_layers_2.{i}"))
    return out


def wn(sd, p, n_layers, gin: bool = True) -> dict:
    out = {}
    if gin:
        out["cond_layer"] = wn_conv1d(sd, _j(p, "cond_layer"))
    for i in range(n_layers):
        out[f"in_{i}"] = wn_conv1d(sd, _j(p, f"in_layers.{i}"))
        out[f"res_skip_{i}"] = wn_conv1d(sd, _j(p, f"res_skip_layers.{i}"))
    return out


def resblock1(sd, p) -> dict:
    out = {}
    for i in range(3):
        out[f"convs1_{i}"] = wn_conv1d(sd, _j(p, f"convs1.{i}"))
        out[f"convs2_{i}"] = wn_conv1d(sd, _j(p, f"convs2.{i}"))
    return out


def resblock2(sd, p) -> dict:
    return {f"convs_{i}": wn_conv1d(sd, _j(p, f"convs.{i}")) for i in range(2)}


def snakebeta(sd, p) -> dict:
    return {"alpha": _np(sd, _j(p, "alpha")), "beta": _np(sd, _j(p, "beta"))}


def ampblock(sd, p) -> dict:
    """AMPBlock1/0: convs1/convs2 WN convs + Activation1d-wrapped SnakeBeta."""
    out = {}
    for i in range(3):
        out[f"convs1_{i}"] = wn_conv1d(sd, _j(p, f"convs1.{i}"))
        out[f"convs2_{i}"] = wn_conv1d(sd, _j(p, f"convs2.{i}"))
    for j in range(6):
        out[f"act_{j}"] = snakebeta(sd, _j(p, f"activations.{j}.act"))
    return out
