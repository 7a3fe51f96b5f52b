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


def timm_attention(sd, p) -> dict:
    return {"qkv": dense(sd, _j(p, "qkv")), "proj": dense(sd, _j(p, "proj"))}


def dit_block(sd, p) -> dict:
    return {
        "attn": timm_attention(sd, _j(p, "attn")),
        "mlp": {"fc1": conv1d(sd, _j(p, "mlp.fc1")), "fc2": conv1d(sd, _j(p, "mlp.fc2"))},
        "adaLN_modulation": dense(sd, _j(p, "adaLN_modulation.1")),
    }


def dit_coupling_layer(sd, p, n_layers=3) -> dict:
    out = {
        "pre": conv1d(sd, _j(p, "pre")),
        "post": conv1d(sd, _j(p, "post")),
    }
    for i in range(n_layers):
        out[f"enc_{i}"] = dit_block(sd, _j(p, f"enc_block.{i}"))
    return out


def dit_coupling_block(sd, p, n_flows=4, n_layers=3) -> dict:
    """ResidualCouplingBlock_Transformer: flows list interleaves couplings and
    Flips (parameterless), so torch indices 0,2,4,... map to flow_0..n."""
    out = {
        "cond_0": dense(sd, _j(p, "cond_block.0")),
        "cond_1": dense(sd, _j(p, "cond_block.2")),
    }
    for i in range(n_flows):
        out[f"flow_{i}"] = dit_coupling_layer(sd, _j(p, f"flows.{2 * i}"), n_layers)
    return out


def style_encoder(sd, p) -> dict:
    return {
        "spectral_0": dense_from_conv1x1(sd, _j(p, "spectral.0")),
        "spectral_1": dense_from_conv1x1(sd, _j(p, "spectral.3")),
        "temporal_0": {"conv1": conv1d(sd, _j(p, "temporal.0.conv1"))},
        "temporal_1": {"conv1": conv1d(sd, _j(p, "temporal.1.conv1"))},
        "slf_attn": mha(sd, _j(p, "slf_attn")),
        "fc": dense_from_conv1x1(sd, _j(p, "fc")),
    }


def _lstm_dir(sd, p, layer, suffix) -> dict:
    w_ih = tc.linear_kernel(_np(sd, _j(p, f"weight_ih_l{layer}{suffix}")))
    w_hh = tc.linear_kernel(_np(sd, _j(p, f"weight_hh_l{layer}{suffix}")))
    b = _np(sd, _j(p, f"bias_ih_l{layer}{suffix}")) + _np(
        sd, _j(p, f"bias_hh_l{layer}{suffix}")
    )
    d = "fwd" if suffix == "" else "bwd"
    return {f"w_ih_{d}": w_ih, f"w_hh_{d}": w_hh, f"b_{d}": b}


def bilstm(sd, p, layer=0) -> dict:
    out = {}
    out.update(_lstm_dir(sd, p, layer, ""))
    out.update(_lstm_dir(sd, p, layer, "_reverse"))
    return out


def stacked_bilstm(sd, p, num_layers) -> dict:
    return {f"layer_{i}": bilstm(sd, p, i) for i in range(num_layers)}


def duration_predictor(sd, p) -> dict:
    return {
        "cond": dense_from_conv1x1(sd, _j(p, "cond")),
        "lstms": stacked_bilstm(sd, _j(p, "lstms"), 2),
        "norm_2": layer_norm(sd, _j(p, "norm_2")),
        "proj": dense_from_conv1x1(sd, _j(p, "proj")),
    }


def range_predictor(sd, p) -> dict:
    return {
        "lstm": bilstm(sd, _j(p, "lstm")),
        "proj": dense(sd, _j(p, "proj.linear_layer")),
    }
