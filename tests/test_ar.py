"""AR (GPT-SoVITS text-to-semantic) stack parity + decode tests."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import torch_ref
from megatts2_hierspeechpp_tpu.ar.t2s import Text2Semantic, t2s_decode
from megatts2_hierspeechpp_tpu.models.convert import convert_t2s

torch_ref.add_reference_path()
torch_ref.preload_ar_patched_mha()


@pytest.fixture(scope="module")
def models():
    from AR.models.t2s_model import Text2SemanticDecoder

    cfg = {
        "model": {
            "hidden_dim": 64, "embedding_dim": 64, "head": 4, "n_layer": 2,
            "vocab_size": 101, "phoneme_vocab_size": 50, "dropout": 0.0,
            "EOS": 100,
        }
    }
    torch.manual_seed(0)
    tmod = Text2SemanticDecoder(cfg, top_k=3).eval()
    jmod = Text2Semantic(
        hidden_dim=64, embedding_dim=64, n_heads=4, n_layers=2,
        vocab_size=101, phoneme_vocab_size=50, p_dropout=0.0, top_k_acc=3,
    )
    params = convert_t2s(tmod.state_dict(), n_layers=2)
    return tmod, jmod, params


def test_t2s_training_forward_parity(models):
    tmod, jmod, params = models
    rng = np.random.default_rng(0)
    x = rng.integers(0, 50, (2, 7))
    xl = np.array([7, 5])
    y = rng.integers(0, 100, (2, 9))
    yl = np.array([9, 6])
    bert = rng.standard_normal((2, 7, 1024)).astype(np.float32)

    with torch.no_grad():
        loss_t, acc_t = tmod(
            torch.from_numpy(x), torch.from_numpy(xl), torch.from_numpy(y),
            torch.from_numpy(yl), torch.from_numpy(bert.transpose(0, 2, 1)),
        )

    out = jmod.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(xl), jnp.asarray(y),
        jnp.asarray(yl), jnp.asarray(bert),
    )
    np.testing.assert_allclose(float(out["loss"]), float(loss_t), rtol=1e-4)
    np.testing.assert_allclose(float(out["acc"]), float(acc_t), atol=1e-5)


def test_t2s_decode_runs_and_stops(models):
    _, jmod, params = models
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 50, (1, 6)))
    bert = jnp.asarray(rng.standard_normal((1, 6, 1024)), jnp.float32)
    prompts = jnp.asarray(rng.integers(0, 100, (1, 4)))

    tokens, lengths = t2s_decode(
        params, jmod, x, bert, prompts, max_new=24, top_k=3,
        rng=jax.random.PRNGKey(0),
    )
    assert tokens.shape == (1, 24)
    assert (np.asarray(tokens) >= 0).all() and (np.asarray(tokens) <= 100).all()
    n = int(lengths[0])
    assert 0 <= n <= 24
    # after EOS everything is EOS
    t_np = np.asarray(tokens)[0]
    if n < 24:
        assert (t_np[n:] == 100).all()


def test_t2s_greedy_decode_matches_full_recompute(models):
    """KV-cached decode must equal a full-prefix re-run under greedy (top_k=1
    with fixed rng is argmax when temperature is tiny)."""
    _, jmod, params = models
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 50, (1, 5)))
    bert = jnp.asarray(rng.standard_normal((1, 5, 1024)), jnp.float32)
    prompts = jnp.asarray(rng.integers(0, 100, (1, 3)))

    tokens, _ = t2s_decode(
        params, jmod, x, bert, prompts, max_new=8, top_k=1,
        rng=jax.random.PRNGKey(0),
    )

    # naive re-run: grow y, full forward each step, argmax
    import megatts2_hierspeechpp_tpu.ar.t2s as t2s_mod

    bound = jmod.bind({"params": params})
    xx = bound._embed_text(x, bert)
    y_ids = np.asarray(prompts)

    out_tokens = []
    for _step in range(8):
        yy = bound._embed_audio(jnp.asarray(y_ids))
        xy = jnp.concatenate([xx, yy], axis=1)
        x_len, y_len = 5, y_ids.shape[1]
        total = x_len + y_len
        q = jnp.arange(total)[:, None]
        kpos = jnp.arange(total)[None, :]
        text_row = q < x_len
        allowed = jnp.where(text_row, kpos < x_len, (kpos < x_len) | (kpos <= q))
        bias = jnp.where(allowed, 0.0, t2s_mod.NEG_INF)[None, None]
        cur = xy
        for i in range(2):
            cur = bound.layers[i](cur, bias)
        logits = bound.ar_predict_layer(cur[:, -1])
        nxt = int(jnp.argmax(logits, axis=-1)[0])
        out_tokens.append(nxt if nxt != 100 else 100)
        if nxt == 100:
            break
        y_ids = np.concatenate([y_ids, [[nxt]]], axis=1)

    cached = list(np.asarray(tokens)[0][: len(out_tokens)])
    assert cached == out_tokens
