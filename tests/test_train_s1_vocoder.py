"""Smoke tests: s1 (PLM) trainer and vocoder GAN+VAE trainer."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.models.plm import ProsodyLM
from megatts2_hierspeechpp_tpu.models.ttv import TTVModel
from megatts2_hierspeechpp_tpu.train.optim import adamw
from megatts2_hierspeechpp_tpu.train import s1 as s1_mod


@pytest.mark.slow
def test_s1_train_step_improves_loss():
    from tests.test_train_s2 import tiny_batch

    batch = {k: jnp.asarray(v) for k, v in tiny_batch(b=2).items()}
    ttv = TTVModel(n_vocab=40, n_tone=10, n_language=3)
    ttv_vars = ttv.init(
        {"params": jax.random.PRNGKey(0)},
        batch["x_ids"], batch["tone"], batch["language"], batch["x_lengths"],
        batch["w2v"], batch["w2v_lengths"], batch["mel"], batch["mel_lengths"],
        batch["pitch"], batch["pitch_lengths"], batch["dur"],
        batch["mrte_mel"], batch["mrte_mel_lengths"],
    )
    plm = ProsodyLM(n_layers=2)
    tx = adamw(1e-3, steps_per_epoch=10)
    state = s1_mod.create_state(plm, tx, jax.random.PRNGKey(1), ttv_vars)
    step = jax.jit(s1_mod.make_train_step(ttv, plm, tx))

    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(10 + i))
        losses.append(float(metrics["loss/plm"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # same batch: loss must drop


@pytest.mark.slow
def test_vocoder_train_step_runs():
    from megatts2_hierspeechpp_tpu.models.discriminators import (
        MultiPeriodDiscriminator,
    )
    from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder
    from megatts2_hierspeechpp_tpu.train import vocoder as vt

    b, t = 2, 16
    rng = np.random.default_rng(0)
    batch = {
        "spec": jnp.asarray(rng.standard_normal((b, t, 641)), jnp.float32),
        "audio": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 320 * t)), jnp.float32
        ),
        "mel": jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32),
        "w2v": jnp.asarray(rng.standard_normal((b, t, 1024)), jnp.float32),
        "f0": jnp.asarray(np.abs(rng.standard_normal((b, 4 * t))), jnp.float32),
        "mask": jnp.ones((b, t, 1), jnp.float32),
        "lengths": jnp.full((b,), t, jnp.int32),
    }
    # trimmed discriminator set to keep CPU compile time in check
    disc = MultiPeriodDiscriminator(
        resolutions=((256, 64, 256), (128, 32, 128)), periods=(2, 3)
    )
    voc = HierVocoder(upsample_initial_channel=64, posterior_wn_layers=4,
                      n_flows=1, flow_layers=1)
    tx_g = adamw(1e-4, steps_per_epoch=10)
    tx_d = adamw(1e-4, steps_per_epoch=10)
    state = vt.create_state(voc, disc, tx_g, tx_d, jax.random.PRNGKey(0))
    step = jax.jit(vt.make_train_step(voc, disc, tx_g, tx_d, segment_frames=8))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert int(state.step) == 1
    # excitation/f0 supervision is wired (SourceNetwork predictor head e_)
    assert "loss/g/f0" in metrics and float(metrics["loss/g/f0"]) > 0


def test_vocoder_eval_hook(tmp_path):
    """Periodic-eval hook for the vocoder trainer: held-out full-inference
    mel L1 scalar + excitation overlay PNG (train/evalhooks.py)."""
    from megatts2_hierspeechpp_tpu.models.discriminators import (
        MultiPeriodDiscriminator,
    )
    from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder
    from megatts2_hierspeechpp_tpu.train import vocoder as vt
    from megatts2_hierspeechpp_tpu.train.evalhooks import make_vocoder_eval_fn

    b, t = 1, 16
    rng = np.random.default_rng(3)
    batch = {
        "audio": rng.uniform(-0.5, 0.5, (b, 320 * t)).astype(np.float32),
        "mel": rng.standard_normal((b, t, 80)).astype(np.float32),
        "w2v": rng.standard_normal((b, t, 1024)).astype(np.float32),
        "f0": np.abs(rng.standard_normal((b, 4 * t))).astype(np.float32),
        "mask": np.ones((b, t, 1), np.float32),
        "lengths": np.full((b,), t, np.int32),
    }
    voc = HierVocoder(upsample_initial_channel=64, posterior_wn_layers=4,
                      n_flows=1, flow_layers=1)
    disc = MultiPeriodDiscriminator(
        resolutions=((256, 64, 256),), periods=(2,)
    )
    tx = adamw(1e-4, steps_per_epoch=10)
    state = vt.create_state(voc, disc, tx, tx, jax.random.PRNGKey(0))

    eval_fn = make_vocoder_eval_fn(voc, batch)
    scalars = eval_fn(state, 5, str(tmp_path))
    assert np.isfinite(scalars["mel_l1"]) and scalars["mel_l1"] > 0
    import os

    assert os.path.exists(os.path.join(str(tmp_path), "eval", "excitation_5.png"))
