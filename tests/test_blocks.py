"""Parity tests for NN building blocks vs the reference torch implementations."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import torch_ref
from megatts2_hierspeechpp_tpu.nn.attention import Encoder, MultiHeadAttention
from megatts2_hierspeechpp_tpu.nn.wavenet import WN
from megatts2_hierspeechpp_tpu.nn.resblocks import ResBlock1, AMPBlock
from megatts2_hierspeechpp_tpu.nn.activations import SnakeBeta
from megatts2_hierspeechpp_tpu.ops.resample import activation1d, upsample1d, downsample1d
from megatts2_hierspeechpp_tpu.utils import convert_ref as cr

torch_ref.add_reference_path()


def _lengths_mask(lengths, t):
    m = np.zeros((len(lengths), t, 1), np.float32)
    for i, l in enumerate(lengths):
        m[i, :l] = 1.0
    return m


def test_encoder_matches_reference():
    import attentions as ref_attn

    torch.manual_seed(0)
    tmod = ref_attn.Encoder(64, 256, 4, 2, kernel_size=3, p_dropout=0.0).eval()

    b, t, c = 2, 21, 64
    x = np.random.default_rng(0).standard_normal((b, t, c)).astype(np.float32)
    lengths = [21, 13]
    mask = _lengths_mask(lengths, t)

    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 2, 1)))
        mt = torch.from_numpy(np.transpose(mask, (0, 2, 1)))
        yt = tmod(xt * mt, mt).transpose(1, 2).numpy()

    jmod = Encoder(64, 256, 4, 2, kernel_size=3, p_dropout=0.0)
    sd = tmod.state_dict()
    params = {"params": cr.vits_encoder(sd, "", 2)}
    # reference keys have no leading prefix dot; rebuild with correct prefix
    params = {"params": cr.vits_encoder({k: v for k, v in sd.items()}, "", 2)}
    yj = jmod.apply(params, jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=2e-5, rtol=1e-4)


def test_cross_attention_matches_reference():
    import attentions as ref_attn

    torch.manual_seed(1)
    tmod = ref_attn.MultiHeadAttention(64, 64, 4, p_dropout=0.0).eval()

    b, tq, tk = 2, 9, 17
    x = np.random.default_rng(1).standard_normal((b, tq, 64)).astype(np.float32)
    ctx = np.random.default_rng(2).standard_normal((b, tk, 64)).astype(np.float32)
    qmask = _lengths_mask([9, 6], tq)
    kmask = _lengths_mask([17, 11], tk)
    attn_mask = (qmask[:, None, :, 0:1] * kmask[:, None, None, :, 0]) > 0

    with torch.no_grad():
        am = torch.from_numpy(attn_mask.astype(np.float32))
        yt = (
            tmod(
                torch.from_numpy(np.transpose(x, (0, 2, 1))),
                torch.from_numpy(np.transpose(ctx, (0, 2, 1))),
                am,
            )
            .transpose(1, 2)
            .numpy()
        )

    jmod = MultiHeadAttention(64, 64, 4, window_size=None)
    params = {"params": cr.mha(tmod.state_dict(), "")}
    # strip leading dot from keys produced by empty prefix
    yj = jmod.apply(params, jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(attn_mask))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=2e-5, rtol=1e-4)


def test_wn_matches_reference():
    import modules as ref_modules

    torch.manual_seed(2)
    tmod = ref_modules.WN(32, 5, 1, 4, gin_channels=16).eval()

    b, t = 2, 33
    x = np.random.default_rng(3).standard_normal((b, t, 32)).astype(np.float32)
    g = np.random.default_rng(4).standard_normal((b, 1, 16)).astype(np.float32)
    mask = _lengths_mask([33, 20], t)

    with torch.no_grad():
        yt = (
            tmod(
                torch.from_numpy(np.transpose(x, (0, 2, 1))),
                torch.from_numpy(np.transpose(mask, (0, 2, 1))),
                g=torch.from_numpy(np.transpose(g, (0, 2, 1))),
            )
            .transpose(1, 2)
            .numpy()
        )

    jmod = WN(32, 5, 1, 4, gin_channels=16)
    params = {"params": cr.wn(tmod.state_dict(), "", 4)}
    yj = jmod.apply(params, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=2e-5, rtol=1e-4)


def test_resblock1_matches_reference():
    import modules as ref_modules

    torch.manual_seed(3)
    tmod = ref_modules.ResBlock1(24, 3, (1, 3, 5)).eval()
    x = np.random.default_rng(5).standard_normal((2, 40, 24)).astype(np.float32)
    with torch.no_grad():
        yt = tmod(torch.from_numpy(np.transpose(x, (0, 2, 1)))).transpose(1, 2).numpy()
    jmod = ResBlock1(24, 3, (1, 3, 5))
    params = {"params": cr.resblock1(tmod.state_dict(), "")}
    yj = jmod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=2e-5, rtol=1e-4)


def test_snakebeta_and_antialias_matches_reference():
    import activations as ref_act
    from alias_free_torch import Activation1d as RefActivation1d

    torch.manual_seed(4)
    tact = ref_act.SnakeBeta(12, alpha_logscale=True)
    with torch.no_grad():
        tact.alpha.copy_(torch.randn(12) * 0.3)
        tact.beta.copy_(torch.randn(12) * 0.3)
    tmod = RefActivation1d(activation=tact).eval()

    x = np.random.default_rng(6).standard_normal((2, 50, 12)).astype(np.float32)
    with torch.no_grad():
        yt = tmod(torch.from_numpy(np.transpose(x, (0, 2, 1)))).transpose(1, 2).numpy()

    snake = SnakeBeta(12, alpha_logscale=True)
    params = {
        "params": {
            "alpha": tact.alpha.detach().numpy(),
            "beta": tact.beta.detach().numpy(),
        }
    }
    yj = activation1d(jnp.asarray(x), lambda v: snake.apply(params, v))
    assert yj.shape == yt.shape
    np.testing.assert_allclose(np.asarray(yj), yt, atol=2e-5, rtol=1e-4)


def test_up_down_sample_shapes():
    x = jnp.asarray(np.random.default_rng(7).standard_normal((2, 64, 4)), jnp.float32)
    up = upsample1d(x, 2)
    assert up.shape == (2, 128, 4)
    down = downsample1d(up, 2)
    assert down.shape == (2, 64, 4)


def test_ampblock_matches_reference():
    import hierspeechpp_speechsynthesizer as ref_voc

    torch.manual_seed(5)
    tmod = ref_voc.AMPBlock1(16, 3, (1, 3, 5), activation="snakebeta").eval()
    # randomize the snake params (zeros by default in logscale)
    with torch.no_grad():
        for a in tmod.activations:
            a.act.alpha.copy_(torch.randn(16) * 0.2)
            a.act.beta.copy_(torch.randn(16) * 0.2)

    x = np.random.default_rng(8).standard_normal((2, 48, 16)).astype(np.float32)
    with torch.no_grad():
        yt = tmod(torch.from_numpy(np.transpose(x, (0, 2, 1)))).transpose(1, 2).numpy()

    jmod = AMPBlock(16, 3, (1, 3, 5))
    params = {"params": cr.ampblock(tmod.state_dict(), "")}
    yj = jmod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=3e-5, rtol=1e-4)
