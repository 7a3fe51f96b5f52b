"""Wav2vec2 parity vs HF transformers (random small config, no download)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.models.wav2vec2 import Wav2Vec2
from megatts2_hierspeechpp_tpu.models.convert import convert_wav2vec2


@pytest.fixture(scope="module")
def models():
    from transformers import Wav2Vec2Config, Wav2Vec2ForPreTraining

    cfg = Wav2Vec2Config(
        hidden_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=128,
        conv_dim=[32] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        conv_bias=True,
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        codevector_dim=32,
        proj_codevector_dim=32,
    )
    torch.manual_seed(0)
    tmod = Wav2Vec2ForPreTraining(cfg).eval()
    jmod = Wav2Vec2(hidden_size=64, n_heads=4, ffn_dim=128, output_layer=3,
                    conv_dim=(32,) * 7)
    return tmod, jmod


def test_hidden_state_layer_matches_hf(models):
    tmod, jmod = models
    from megatts2_hierspeechpp_tpu.models import wav2vec2 as w2v_mod

    x = np.random.default_rng(0).standard_normal((2, 3200)).astype(np.float32) * 0.1
    with torch.no_grad():
        out = tmod(torch.from_numpy(x), output_hidden_states=True)
        ref = out.hidden_states[3].numpy()  # output of layer 3

    params = convert_wav2vec2(tmod.state_dict(), output_layer=3)
    yj = jmod.apply({"params": params}, jnp.asarray(x))
    assert yj.shape == ref.shape
    np.testing.assert_allclose(np.asarray(yj), ref, atol=2e-4, rtol=1e-3)
