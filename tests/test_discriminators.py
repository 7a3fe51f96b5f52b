"""Discriminator + loss parity tests vs reference."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests import torch_ref
from megatts2_hierspeechpp_tpu.models.discriminators import (
    DiscriminatorP,
    DiscriminatorR,
    MultiResSpecDiscriminator,
)
from megatts2_hierspeechpp_tpu.models.convert import disc_p, disc_r, convert_mrsd
from megatts2_hierspeechpp_tpu.train import losses as jlosses

torch_ref.add_reference_path()


def test_discriminator_p_matches_reference():
    import hierspeechpp_speechsynthesizer as ref_voc

    torch.manual_seed(0)
    tmod = ref_voc.DiscriminatorP(3).eval()
    x = np.random.default_rng(0).standard_normal((2, 1000, 1)).astype(np.float32) * 0.3
    with torch.no_grad():
        logits_t, fmap_t = tmod(torch.from_numpy(x.transpose(0, 2, 1)))

    jmod = DiscriminatorP(3)
    params = {"params": disc_p(tmod.state_dict(), "")}
    logits_j, fmap_j = jmod.apply(params, jnp.asarray(x))
    assert logits_j.shape == tuple(logits_t.shape)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(), atol=1e-4)
    assert len(fmap_j) == len(fmap_t)
    # compare a middle fmap (layout: ours NHWC, torch NCHW)
    np.testing.assert_allclose(
        np.asarray(fmap_j[2]), fmap_t[2].permute(0, 2, 3, 1).numpy(), atol=1e-4
    )


def test_discriminator_r_matches_reference():
    import hierspeechpp_speechsynthesizer as ref_voc

    torch.manual_seed(1)
    tmod = ref_voc.DiscriminatorR([128, 32, 128]).eval()
    x = np.random.default_rng(1).standard_normal((2, 1600, 1)).astype(np.float32) * 0.3
    with torch.no_grad():
        logits_t, fmap_t = tmod(torch.from_numpy(x.transpose(0, 2, 1)))

    jmod = DiscriminatorR((128, 32, 128))
    params = {"params": disc_r(tmod.state_dict(), "")}
    logits_j, fmap_j = jmod.apply(params, jnp.asarray(x))
    assert logits_j.shape == tuple(logits_t.shape)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(), atol=2e-4)


def test_mrsd_matches_reference():
    from ttv_v1.msd import MultiResSpecDiscriminator as RefMRSD

    torch.manual_seed(2)
    tmod = RefMRSD().eval()
    rng = np.random.default_rng(2)
    y = rng.standard_normal((2, 64, 40)).astype(np.float32)
    y_hat = rng.standard_normal((2, 64, 40)).astype(np.float32)
    with torch.no_grad():
        dr_t, dg_t, fr_t, fg_t = tmod(torch.from_numpy(y), torch.from_numpy(y_hat))

    jmod = MultiResSpecDiscriminator()
    variables = convert_mrsd(tmod.state_dict())
    (dr_j, dg_j, fr_j, fg_j) = jmod.apply(
        variables, jnp.asarray(y), jnp.asarray(y_hat)
    )
    for a, b in zip(dr_j, dr_t):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-2, atol=2e-3)
    for a, b in zip(dg_j, dg_t):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-2, atol=2e-3)

    # loss parity on top of matched outputs
    import losses as ref_losses

    with torch.no_grad():
        loss_t, _, _ = ref_losses.discriminator_loss(dr_t, dg_t)
        gen_t, _ = ref_losses.generator_loss(dg_t)
        fm_t = ref_losses.feature_loss(fr_t, fg_t)
    loss_j, _, _ = jlosses.discriminator_loss(dr_j, dg_j)
    gen_j, _ = jlosses.generator_loss(dg_j)
    fm_j = jlosses.feature_loss(
        [[jnp.asarray(t.permute(0, 2, 3, 1).numpy()) for t in f] for f in fr_t],
        [[jnp.asarray(t.permute(0, 2, 3, 1).numpy()) for t in f] for f in fg_t],
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-2)
    np.testing.assert_allclose(float(gen_j), float(gen_t), rtol=1e-2)
    np.testing.assert_allclose(float(fm_j), float(fm_t), rtol=1e-4)


def test_kl_loss_matches_reference():
    import losses as ref_losses

    rng = np.random.default_rng(3)
    b, t, c = 2, 9, 8
    z_p = rng.standard_normal((b, t, c)).astype(np.float32)
    logs_q = rng.standard_normal((b, t, c)).astype(np.float32) * 0.1
    m_p = rng.standard_normal((b, t, c)).astype(np.float32)
    logs_p = rng.standard_normal((b, t, c)).astype(np.float32) * 0.1
    mask = np.ones((b, t, 1), np.float32)
    mask[1, 6:] = 0

    tt = lambda a: torch.from_numpy(a.transpose(0, 2, 1))
    ref = ref_losses.kl_loss(tt(z_p), tt(logs_q), tt(m_p), tt(logs_p), tt(mask))
    mine = jlosses.kl_loss(
        jnp.asarray(z_p), jnp.asarray(logs_q), jnp.asarray(m_p), jnp.asarray(logs_p),
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-5)
