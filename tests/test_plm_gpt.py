"""Tests for the tortoise/XTTS-style GPT stack and DVAE mel codec."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.models.plm_gpt import (
    DiscreteVAE,
    GPTProsody,
    gpt_generate,
)


@pytest.fixture(scope="module")
def gpt():
    model = GPTProsody(dim=64, n_layers=2, n_heads=4, n_text_tokens=50,
                       n_mel_tokens=100, max_text=32, max_mel=64)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((2, 12, 80)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 50, (2, 7)))
    mel_tok = jnp.asarray(rng.integers(0, 100, (2, 10)))
    mel_lens = jnp.asarray([10, 6])
    params = model.init({"params": jax.random.PRNGKey(0)}, cond, text, mel_tok,
                        mel_lens)["params"]
    return model, params, cond, text, mel_tok, mel_lens


def test_gpt_training_loss_finite_and_learnable(gpt):
    model, params, cond, text, mel_tok, mel_lens = gpt
    out = model.apply({"params": params}, cond, text, mel_tok, mel_lens)
    assert np.isfinite(float(out["loss"]))
    assert out["logits"].shape == (2, 11, 102)

    # one SGD step on the same batch reduces the loss
    import optax

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss_fn(p):
        return model.apply({"params": p}, cond, text, mel_tok, mel_lens)["loss"]

    l0, grads = jax.value_and_grad(loss_fn)(params)
    upd, opt = tx.update(grads, opt, params)
    p2 = optax.apply_updates(params, upd)
    l1 = loss_fn(p2)
    assert float(l1) < float(l0)


def test_gpt_generate_kv_cached(gpt):
    model, params, cond, text, _, _ = gpt
    tokens, lengths = gpt_generate(
        params, model, cond, text, max_new=16, top_k=5,
        rng=jax.random.PRNGKey(1),
    )
    assert tokens.shape == (2, 16)
    t = np.asarray(tokens)
    assert (t >= 0).all() and (t <= 101).all()
    for i in range(2):
        n = int(lengths[i])
        if n < 16:
            assert (t[i, n:] == model.stop_mel).all()


def test_dvae_roundtrip_and_training():
    model = DiscreteVAE(channels=32, codebook_size=64, codebook_dim=32)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((2, 16, 80)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, mel)
    out, _ = model.apply(variables, mel, train=True,
                         rng=jax.random.PRNGKey(2), mutable=["vq"])
    assert np.isfinite(float(out["loss"]))
    assert out["codes"].shape == (2, 4)  # x4 temporal compression

    codes = model.apply(variables, mel, method=DiscreteVAE.encode)
    recon = model.apply(variables, codes, method=DiscreteVAE.decode)
    assert recon.shape == (2, 16, 80)
