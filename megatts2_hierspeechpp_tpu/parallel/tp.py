"""Tensor-parallel sharding rules for the prosody LM (and the AR T2S model).

BASELINE north star: "PLM sharded across chips when it exceeds one HBM".
Under GSPMD this is placement, not code: attention q/k/v projections and the
first FFN matmul are column-sharded over the `model` mesh axis (head-parallel),
the output projection and second FFN matmul are row-sharded, embeddings/norms
replicated. XLA inserts the all-reduces on the row-sharded contractions over
ICI. Works for training (jit over the 2-D mesh) and for the KV-cached decode
function (cache tensors get head-sharded automatically by propagation).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple, leaf) -> P:
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(names)
    last = names[-1] if names else ""
    if "layer_" in joined:
        # column-parallel: split heads / ffn hidden
        if any(f"/{n}/" in joined + "/" for n in ("w_q", "w_k", "w_v", "ff_0",
                                                  "linear1")):
            if last == "kernel":
                return P(None, "model")
            if last == "bias":
                return P("model")
        # packed qkv (T2S in_proj): output dim is 3*d — split over model
        if last == "in_proj_weight":
            return P("model", None)
        if last == "in_proj_bias":
            return P("model")
        # row-parallel: contract over the sharded dim, replicate output
        if any(f"/{n}/" in joined + "/" for n in ("out_proj", "ff_1", "linear2")):
            if last == "kernel":
                return P("model", None)
            return P()
    return P()  # embeddings, norms, heads stay replicated


def plm_param_shardings(mesh: Mesh, params: Any):
    """Pytree of NamedShardings matching ProsodyLM / Text2Semantic params."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)), params
    )


def shard_params(mesh: Mesh, params: Any):
    shardings = plm_param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)
