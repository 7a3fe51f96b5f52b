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


@pytest.mark.slow
def test_denoiser_remat_matches():
    """remat=True (the trainer CLI default since the B=8 x 2 s OOM) must be
    numerically identical: same param tree, same loss, same updated params."""
    from megatts2_hierspeechpp_tpu.models.denoiser import MPNet
    from megatts2_hierspeechpp_tpu.train import denoiser as dt

    rng = np.random.default_rng(1)
    clean = rng.uniform(-0.5, 0.5, (2, 2000)).astype(np.float32)
    noisy = clean + 0.1 * rng.standard_normal((2, 2000)).astype(np.float32)
    batch = {"noisy": jnp.asarray(noisy), "clean": jnp.asarray(clean)}

    outs = {}
    for remat in (False, True):
        model = MPNet(dense_channel=8, num_tsblocks=1, n_freqs=201,
                      remat=remat)
        tx = adamw(1e-3)
        state = dt.create_state(model, tx, jax.random.PRNGKey(0))
        step = jax.jit(dt.make_train_step(model, tx))
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        outs[remat] = (state, metrics)
    # remat recomputes the SAME ops -> bitwise-identical loss and params
    assert jax.tree.structure(outs[False][0].params) == jax.tree.structure(
        outs[True][0].params)
    np.testing.assert_allclose(float(outs[False][1]["loss/total"]),
                               float(outs[True][1]["loss/total"]),
                               rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        outs[False][0].params, outs[True][0].params)


@pytest.mark.slow
def test_denoiser_attn_chunked_matches():
    """The exact q-chunked attention (the B=8 x 2 s training-memory path)
    agrees with the dense form at loss AND gradient level. Post-optimizer
    params are NOT compared: the chunked form reassociates reductions
    (~1e-7 output diff), and Adam's ~sign(grad) first step amplifies
    sub-ulp gradient differences on near-zero entries to O(lr)."""
    from megatts2_hierspeechpp_tpu.models.denoiser import MPNet
    from megatts2_hierspeechpp_tpu.train import denoiser as dt

    rng = np.random.default_rng(3)
    clean = rng.uniform(-0.5, 0.5, (2, 2000)).astype(np.float32)
    noisy = clean + 0.1 * rng.standard_normal((2, 2000)).astype(np.float32)
    batch = {"noisy": jnp.asarray(noisy), "clean": jnp.asarray(clean)}

    grads, losses = {}, {}
    for chunk in (None, 16):
        model = MPNet(dense_channel=8, num_tsblocks=1, n_freqs=201,
                      remat=True, attn_chunk=chunk)
        tx = adamw(1e-3)
        state = dt.create_state(model, tx, jax.random.PRNGKey(0))
        step = dt.make_train_step(model, tx)

        # re-derive the loss the step optimizes, for clean grad access
        from megatts2_hierspeechpp_tpu.ops.stft import mag_pha_stft

        def loss_fn(params, model=model, state=state):
            mag_n, pha_n = mag_pha_stft(batch["noisy"], 400, 100, 400, 0.3)
            mag_c, pha_c = mag_pha_stft(batch["clean"], 400, 100, 400, 0.3)
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                mag_n, pha_n, True, mutable=["batch_stats"])
            (mag_h, pha_h), _ = out
            return jnp.mean(jnp.square(mag_h - mag_c)) + jnp.mean(
                jnp.square(jnp.cos(pha_h) - jnp.cos(pha_c)))

        losses[chunk] = float(loss_fn(state.params))
        grads[chunk] = jax.grad(loss_fn)(state.params)
    np.testing.assert_allclose(losses[None], losses[16], rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-6),
        grads[None], grads[16])


@pytest.mark.slow
def test_eval_hooks_s2_and_s1(tmp_path):
    """Periodic-eval hooks (VERDICT #3): s2 hook returns w2v/lf0 scalars and
    writes eval/*.png; s1 hook returns held-out PLM loss/acc."""
    from tests.test_train_s2 import tiny_batch
    from megatts2_hierspeechpp_tpu.models.discriminators import (
        MultiResSpecDiscriminator,
    )
    from megatts2_hierspeechpp_tpu.models.plm import ProsodyLM
    from megatts2_hierspeechpp_tpu.models.ttv import TTVModel
    from megatts2_hierspeechpp_tpu.train.evalhooks import (
        make_s1_eval_fn,
        make_s2_eval_fn,
    )
    from megatts2_hierspeechpp_tpu.train import s1 as s1_lib
    from megatts2_hierspeechpp_tpu.train import s2 as s2_lib

    ttv = TTVModel(n_vocab=40, n_tone=10, n_language=3, text_layers=1,
                   mel_enc_layers=1, w2v_enc_layers=1, w2v_dec_layers=2)
    batch = tiny_batch(b=2, mel_len=16)
    tx = adamw(1e-4, steps_per_epoch=10)
    st2 = s2_lib.create_state(ttv, MultiResSpecDiscriminator(), tx, tx,
                              jax.random.PRNGKey(0), batch)

    model_dir = str(tmp_path / "run")
    eval_fn = make_s2_eval_fn(ttv, batch)
    scalars = eval_fn(st2, 100, model_dir)
    assert set(scalars) == {"w2v_l1", "lf0_l1"}
    assert all(np.isfinite(v) for v in scalars.values())
    import os
    pngs = os.listdir(os.path.join(model_dir, "eval"))
    assert "w2v_pred_100.png" in pngs and "f0_100.png" in pngs

    plm = ProsodyLM(n_layers=1, n_heads=2)
    st1 = s1_lib.create_state(
        plm, tx, jax.random.PRNGKey(1),
        {"params": st2.params_g, "vq": st2.vq},
    )
    s1_scalars = make_s1_eval_fn(ttv, plm, batch)(st1, 100, model_dir)
    assert set(s1_scalars) == {"plm_loss", "plm_acc_top10"}
    assert all(np.isfinite(v) for v in s1_scalars.values())
