"""Fused AMPBlock-triple (+ tail) kernel: forward + gradient parity against
the composed stage math, and module-level integration for SpeechSR and the
vocoder Generator (interpret mode on CPU; the compiled TPU path is A/B'd at
model level in BASELINE.md)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import megatts2_hierspeechpp_tpu.ops.pallas_amp_triple as pat

KS = (3, 7, 11)
DILS = ((1, 3, 5),) * 3


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)


def _block_ws(rng, n, k, c):
    a1 = np.exp(rng.standard_normal((n, c)) * 0.2).astype(np.float32)
    ib1 = np.exp(rng.standard_normal((n, c)) * 0.2).astype(np.float32)
    a2 = np.exp(rng.standard_normal((n, c)) * 0.2).astype(np.float32)
    ib2 = np.exp(rng.standard_normal((n, c)) * 0.2).astype(np.float32)
    w1 = (rng.standard_normal((n, k, c, c)) * 0.1).astype(np.float32)
    b1 = (rng.standard_normal((n, c)) * 0.05).astype(np.float32)
    w2 = (rng.standard_normal((n, k, c, c)) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal((n, c)) * 0.05).astype(np.float32)
    return tuple(jnp.asarray(w) for w in (a1, ib1, w1, b1, a2, ib2, w2, b2))


def _stage(rng, c, ks=KS, dils=DILS):
    return [_block_ws(rng, len(d), k, c) for k, d in zip(ks, dils)]


def _post(rng, c):
    pa = jnp.asarray(np.exp(rng.standard_normal(c) * 0.2), jnp.float32)
    pib = jnp.asarray(np.exp(rng.standard_normal(c) * 0.2), jnp.float32)
    pw = jnp.asarray(rng.standard_normal((7, c)) * 0.1, jnp.float32)
    return pa, pib, pw


@pytest.mark.parametrize("shape", [
    (1, 512, 16),    # Generator C=16 stage
    (2, 640, 32),    # SpeechSR stage (ragged tile remainder)
    (1, 1024, 64),   # widest triple stage
])
def test_triple_matches_composed(shape, interpret_pallas):
    b, t, c = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    bws = _stage(rng, c)

    ref = pat.composed_triple(x, bws, KS, DILS)
    out = pat.fused_amp_triple(x, bws, KS, DILS)
    assert out.shape == ref.shape
    d = np.abs(np.asarray(out) - np.asarray(ref))
    rel = d.max() / np.abs(np.asarray(ref)).max()
    assert rel < 1e-5, (d.max(), rel)


@pytest.mark.parametrize("shape", [(1, 512, 16), (2, 640, 32)])
def test_triple_tail_matches_composed(shape, interpret_pallas):
    b, t, c = shape
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    bws = _stage(rng, c)
    post = _post(rng, c)

    ref = pat.composed_triple(x, bws, KS, DILS, post)
    out = pat.fused_amp_triple(x, bws, KS, DILS, post=post)
    assert out.shape == ref.shape == (b, t, 1)
    d = np.abs(np.asarray(out) - np.asarray(ref))
    # tanh output is O(1) but the 0.1-scale test convs amplify the pre-tanh
    # signal ~14x per branch (O(30) at C=32), so fp accumulation-order noise
    # reaches a few e-5 absolute — same slack class as the relative 1e-5 above
    assert d.max() < 1e-4, d.max()


def test_triple_short_input_falls_back(interpret_pallas):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 128, 16)), jnp.float32)
    bws = _stage(rng, 16)
    out = pat.fused_amp_triple(x, bws, KS, DILS)
    ref = pat.composed_triple(x, bws, KS, DILS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_triple_gradients_match(interpret_pallas):
    b, t, c = 1, 512, 16
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    bws = _stage(rng, c)
    post = _post(rng, c)
    cot = jnp.asarray(rng.standard_normal((b, t, 1)), jnp.float32)

    def loss_fused(x, bws, post):
        return jnp.sum(cot * pat.fused_amp_triple(x, bws, KS, DILS, post=post))

    def loss_composed(x, bws, post):
        return jnp.sum(cot * pat.composed_triple(x, bws, KS, DILS, post))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, bws, post)
    gc = jax.grad(loss_composed, argnums=(0, 1, 2))(x, bws, post)
    jax.tree.map(
        lambda a_, b_: np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=2e-3, atol=2e-3),
        gf, gc)


def test_triple_gradient_with_bf16_cotangent(interpret_pallas):
    """GAN-training shape of the backward: a bf16 discriminator downstream
    hands a bf16 cotangent to the f32-primal custom_vjp (crashed the round-5
    vocoder trainer before the astype in _fused_bwd)."""
    b, t, c = 1, 512, 16
    rng = np.random.default_rng(4)
    # bf16 activations + f32 weights = the trainer's mixed setup: the pallas
    # forward returns bf16 (ct arrives bf16) while the composed replay's
    # f32 weights promote its primal to f32
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.bfloat16)
    bws = _stage(rng, c)
    post = _post(rng, c)

    def loss(x, bws, post):
        y = pat.fused_amp_triple(x, bws, KS, DILS, post=post)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(x, bws, post)  # must not raise
    assert np.isfinite(np.asarray(g, np.float32)).all()


def test_speechsr_module_fused_path_matches(interpret_pallas, monkeypatch):
    """SpeechSR's whole-stage fused path equals its composed path with the
    SAME flax params (weight extraction + tail fusion integration)."""
    from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR

    monkeypatch.setenv("MEGATTS_PALLAS", "1")
    monkeypatch.setenv("MEGATTS_FUSED_TRIPLE", "1")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 600, 1)) * 0.1, jnp.float32)
    mod = SpeechSR(upsample_initial_channel=16, rate_num=3, rate_den=1)
    params = mod.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda p: p + 0.1 * jax.random.normal(jax.random.PRNGKey(1), p.shape,
                                              p.dtype), params)

    composed = mod.apply(params, x)  # CPU backend -> composed path
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fused = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(composed),
                               rtol=1e-4, atol=1e-5)


def test_generator_module_fused_path_matches(interpret_pallas, monkeypatch):
    """Generator integration: the C<=64 stages (incl. the last-stage tail
    fold) dispatch to the triple kernel and match the composed model."""
    from megatts2_hierspeechpp_tpu.models.vocoder import Generator

    monkeypatch.setenv("MEGATTS_PALLAS", "1")
    monkeypatch.setenv("MEGATTS_FUSED_TRIPLE", "1")
    monkeypatch.setenv("MEGATTS_FUSED_AMPBLOCK", "0")  # isolate the triple
    rng = np.random.default_rng(6)
    mod = Generator(initial_channel=32, upsample_initial_channel=64,
                    upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                    gin_channels=16)
    x = jnp.asarray(rng.standard_normal((1, 40, 32)), jnp.float32)
    pitch = jnp.asarray(rng.standard_normal((1, 160, 9)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, pitch, g)
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(1), p.shape,
                                               p.dtype), params)

    composed = mod.apply(params, x, pitch, g)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fused = mod.apply(params, x, pitch, g)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(composed),
                               rtol=1e-4, atol=1e-5)
