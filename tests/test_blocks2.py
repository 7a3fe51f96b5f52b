"""Parity tests: DiT coupling flows, StyleEncoder, LSTM predictors, Gaussian upsample."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests import torch_ref
from megatts2_hierspeechpp_tpu.nn.dit import (
    DiTConVBlock,
    ResidualCouplingBlockTransformer,
)
from megatts2_hierspeechpp_tpu.nn.styleencoder import StyleEncoder
from megatts2_hierspeechpp_tpu.nn.duration import (
    DurationPredictor,
    RangePredictor,
    gaussian_upsample,
)
from megatts2_hierspeechpp_tpu.utils import convert_ref as cr

torch_ref.add_reference_path()


def _mask(lengths, t):
    m = np.zeros((len(lengths), t, 1), np.float32)
    for i, l in enumerate(lengths):
        m[i, :l] = 1.0
    return m


def test_dit_block_matches_reference():
    import modules as ref_modules

    torch.manual_seed(0)
    tmod = ref_modules.DiTConVBlock(32, 2, mlp_ratio=4.0, kernel=5, p_dropout=0.0).eval()
    # randomize adaLN (zero-init by reference init elsewhere, but module default is not zero)
    b, t, c = 2, 15, 32
    x = np.random.default_rng(0).standard_normal((b, t, c)).astype(np.float32)
    g = np.random.default_rng(1).standard_normal((b, c)).astype(np.float32)
    mask = _mask([15, 9], t)

    with torch.no_grad():
        yt = tmod(
            torch.from_numpy(x), torch.from_numpy(g), torch.from_numpy(mask)
        ).numpy()

    jmod = DiTConVBlock(32, 2, mlp_ratio=4.0, kernel=5, p_dropout=0.0)
    params = {"params": cr.dit_block(tmod.state_dict(), "")}
    yj = jmod.apply(params, jnp.asarray(x), jnp.asarray(g), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=3e-5, rtol=1e-4)


def test_dit_coupling_block_fwd_rev_matches_reference():
    import hierspeechpp_speechsynthesizer as ref_voc

    torch.manual_seed(1)
    tmod = ref_voc.ResidualCouplingBlock_Transformer(
        16, 32, 5, 1, n_layers=2, n_flows=2, gin_channels=24
    ).eval()
    # randomize the zero-initialized post convs so the flow actually transforms
    with torch.no_grad():
        for i in [0, 2]:
            tmod.flows[i].post.weight.normal_(0, 0.05)
            tmod.flows[i].post.bias.normal_(0, 0.05)

    b, t = 2, 13
    x = np.random.default_rng(2).standard_normal((b, t, 16)).astype(np.float32)
    g = np.random.default_rng(3).standard_normal((b, 24)).astype(np.float32)
    mask = _mask([13, 8], t)

    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 2, 1)))
        mt = torch.from_numpy(np.transpose(mask, (0, 2, 1)))
        gt = torch.from_numpy(g)[:, :, None]
        y_fwd = tmod(xt, mt, g=gt, reverse=False).transpose(1, 2).numpy()
        y_rev = tmod(xt, mt, g=gt, reverse=True).transpose(1, 2).numpy()

    jmod = ResidualCouplingBlockTransformer(
        16, 32, n_layers=2, n_flows=2, gin_channels=24, attention_heads=2
    )
    params = {"params": cr.dit_coupling_block(tmod.state_dict(), "", 2, 2)}
    yj_fwd = jmod.apply(params, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(g))
    yj_rev = jmod.apply(
        params, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(g), reverse=True
    )
    np.testing.assert_allclose(np.asarray(yj_fwd), y_fwd, atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(yj_rev), y_rev, atol=3e-5, rtol=1e-4)


def test_style_encoder_matches_reference():
    import styleencoder as ref_se

    torch.manual_seed(2)
    tmod = ref_se.StyleEncoder(in_dim=80, hidden_dim=64, out_dim=48).eval()
    b, t = 2, 40
    x = np.random.default_rng(4).standard_normal((b, t, 80)).astype(np.float32)
    mask = _mask([40, 40], t)  # full-length: reference pools unmasked positions too

    with torch.no_grad():
        yt = tmod(
            torch.from_numpy(np.transpose(x, (0, 2, 1))),
            torch.from_numpy(np.transpose(mask, (0, 2, 1))),
        ).numpy()

    jmod = StyleEncoder(in_dim=80, hidden_dim=64, out_dim=48)
    params = {"params": cr.style_encoder(tmod.state_dict(), "")}
    yj = jmod.apply(params, jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=3e-5, rtol=1e-4)


def test_duration_predictor_matches_reference():
    from ttv_v1.vits_models import DurationPredictor as RefDP

    torch.manual_seed(3)
    tmod = RefDP(32, 48, 3, 0.0, gin_channels=24).eval()
    b, n = 2, 17
    x = np.random.default_rng(5).standard_normal((b, n, 32)).astype(np.float32)
    g = np.random.default_rng(6).standard_normal((b, 24)).astype(np.float32)
    mask = _mask([17, 11], n)

    with torch.no_grad():
        yt = (
            tmod(
                torch.from_numpy(np.transpose(x, (0, 2, 1))),
                torch.from_numpy(np.transpose(mask, (0, 2, 1))),
                g=torch.from_numpy(g)[:, :, None],
            )
            .transpose(1, 2)
            .numpy()
        )

    jmod = DurationPredictor(filter_channels=48, gin_channels=24, p_dropout=0.0)
    params = {"params": cr.duration_predictor(tmod.state_dict(), "")}
    yj = jmod.apply(params, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=3e-5, rtol=1e-4)


def test_range_predictor_matches_reference():
    from ttv_v1.Gaussian import RangePredictor as RefRP

    torch.manual_seed(4)
    tmod = RefRP(33, 24).eval()
    b, n = 2, 14
    x = np.random.default_rng(7).standard_normal((b, n, 32)).astype(np.float32)
    dur = np.random.default_rng(8).integers(1, 6, (b, n)).astype(np.float32)
    lengths = np.array([14, 9], np.int64)

    with torch.no_grad():
        yt = tmod(
            torch.from_numpy(np.transpose(x, (0, 2, 1))),
            torch.from_numpy(dur),
            torch.from_numpy(lengths),
        ).numpy()

    jmod = RangePredictor(out_channel=24)
    params = {"params": cr.range_predictor(tmod.state_dict(), "")}
    yj = np.asarray(
        jmod.apply(params, jnp.asarray(x), jnp.asarray(dur), jnp.asarray(lengths))
    )
    # reference pad_packed zero-pads; compare within valid lengths
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(yj[i, :l], yt[i, :l], atol=3e-5, rtol=1e-4)


def test_gaussian_upsample_matches_reference():
    from ttv_v1.Gaussian import GaussianUpsampling as RefGU

    tmod = RefGU()
    b, n, h = 2, 8, 16
    rng = np.random.default_rng(9)
    x = rng.standard_normal((b, n, h)).astype(np.float32)
    dur = rng.integers(1, 5, (b, n)).astype(np.float32)
    rngs = rng.uniform(0.5, 2.0, (b, n)).astype(np.float32)
    lengths = np.array([8, 5], np.int64)
    t_out = int(dur.sum(axis=1).max())

    with torch.no_grad():
        yt = (
            tmod(
                torch.from_numpy(np.transpose(x, (0, 2, 1))),
                torch.from_numpy(dur),
                torch.from_numpy(rngs),
                torch.from_numpy(lengths),
            )
            .transpose(1, 2)
            .numpy()
        )

    yj = gaussian_upsample(
        jnp.asarray(x), jnp.asarray(dur), jnp.asarray(rngs), jnp.asarray(lengths), t_out
    )
    np.testing.assert_allclose(np.asarray(yj), yt, atol=3e-5, rtol=1e-4)


def test_length_regulate_matches_repeat():
    from megatts2_hierspeechpp_tpu.nn.duration import length_regulate

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 4, 8)).astype(np.float32)
    dur = np.array([[2, 1, 3, 2], [1, 1, 1, 0]], np.int32)
    out = np.asarray(length_regulate(jnp.asarray(x), jnp.asarray(dur), 10))
    for b in range(2):
        ref = np.concatenate(
            [np.repeat(x[b, i : i + 1], dur[b, i], axis=0) for i in range(4)]
        )
        np.testing.assert_allclose(out[b, : ref.shape[0]], ref, atol=1e-6)
        assert np.abs(out[b, ref.shape[0] :]).max() == 0
