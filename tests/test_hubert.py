"""Hubert (base/group-norm variant) parity vs HF transformers (random small
config, no download) — the cnhubert-family SSL extractor the GPT-SoVITS
dataset stage 2 (/root/reference/prepare_datasets/2-get-hubert-wav32k.py)
expects. That script is dead code in the reference (imports
feature_extractor.cnhubert / my_utils, neither shipped); this oracle pins our
working equivalent to the HF model it wraps."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.models.wav2vec2 import Hubert
from megatts2_hierspeechpp_tpu.models.convert import convert_hubert


@pytest.fixture(scope="module")
def models():
    from transformers import HubertConfig, HubertModel

    cfg = HubertConfig(
        hidden_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=128,
        conv_dim=[32] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    # base-variant invariants the jax module hard-codes
    assert cfg.feat_extract_norm == "group"
    assert cfg.do_stable_layer_norm is False
    assert cfg.conv_bias is False
    torch.manual_seed(0)
    tmod = HubertModel(cfg).eval()
    jmod = Hubert(hidden_size=64, n_heads=4, ffn_dim=128, n_layers=4,
                  conv_dim=(32,) * 7)
    return tmod, jmod


def test_last_hidden_state_matches_hf(models):
    tmod, jmod = models
    x = np.random.default_rng(0).standard_normal((2, 3200)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).last_hidden_state.numpy().copy()

    params = convert_hubert(tmod.state_dict(), n_layers=4)
    yj = jmod.apply({"params": params}, jnp.asarray(x))
    assert yj.shape == ref.shape
    np.testing.assert_allclose(np.asarray(yj), ref, atol=2e-4, rtol=1e-3)
