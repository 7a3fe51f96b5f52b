"""Smoke tests: SpeechSR GAN trainer and denoiser trainer."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.train.optim import adamw


@pytest.mark.slow
def test_speechsr_train_step():
    from megatts2_hierspeechpp_tpu.models.discriminators import (
        MultiPeriodDiscriminator,
    )
    from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR
    from megatts2_hierspeechpp_tpu.train import speechsr as srt

    gen = SpeechSR(upsample_initial_channel=16, rate_num=3, rate_den=1)
    disc = MultiPeriodDiscriminator(
        resolutions=((128, 32, 128),), periods=(2,)
    )
    tx = adamw(1e-4)
    state = srt.create_state(gen, disc, tx, tx, jax.random.PRNGKey(0), seg_in=1600)
    step = jax.jit(srt.make_train_step(gen, disc, tx, tx, n_fft=512, hop=128,
                                       n_mels=64))
    rng = np.random.default_rng(0)
    batch = {
        "lo": jnp.asarray(rng.uniform(-0.5, 0.5, (2, 1600, 1)), jnp.float32),
        "hi": jnp.asarray(rng.uniform(-0.5, 0.5, (2, 4800, 1)), jnp.float32),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))


@pytest.mark.slow
def test_denoiser_train_step_improves():
    from megatts2_hierspeechpp_tpu.models.denoiser import MPNet
    from megatts2_hierspeechpp_tpu.train import denoiser as dt

    model = MPNet(dense_channel=8, num_tsblocks=1, n_freqs=201)
    tx = adamw(1e-3)
    state = dt.create_state(model, tx, jax.random.PRNGKey(0))
    step = jax.jit(dt.make_train_step(model, tx))
    rng = np.random.default_rng(0)
    clean = rng.uniform(-0.5, 0.5, (2, 2000)).astype(np.float32)
    noisy = clean + 0.1 * rng.standard_normal((2, 2000)).astype(np.float32)
    batch = {"noisy": jnp.asarray(noisy), "clean": jnp.asarray(clean)}
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss/total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
