"""s2 trainer smoke test: full GAN step under pjit on an 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.models.discriminators import MultiResSpecDiscriminator
from megatts2_hierspeechpp_tpu.models.ttv import TTVModel
from megatts2_hierspeechpp_tpu.parallel.mesh import make_mesh, shard_batch
from megatts2_hierspeechpp_tpu.train.optim import adamw
from megatts2_hierspeechpp_tpu.train.s2 import create_state, make_train_step


def tiny_batch(b=8, n=6, mel_len=16, seed=0):
    rng = np.random.default_rng(seed)
    dur = np.zeros((b, n), np.float32)
    x_lengths = np.full((b,), n, np.int32)
    for i in range(b):
        d = rng.integers(1, 6, n).astype(np.float32)
        d = d * (2 * mel_len) / d.sum()
        d = np.floor(d)
        d[0] += 2 * mel_len - d.sum()
        dur[i] = d
    return {
        "x_ids": rng.integers(0, 40, (b, n)),
        "tone": rng.integers(0, 10, (b, n)),
        "language": rng.integers(0, 3, (b, n)),
        "x_lengths": x_lengths,
        "w2v": rng.standard_normal((b, mel_len, 1024)).astype(np.float32),
        "w2v_lengths": np.full((b,), mel_len, np.int32),
        "mel": rng.standard_normal((b, mel_len, 80)).astype(np.float32),
        "mel_lengths": np.full((b,), mel_len, np.int32),
        "pitch": np.abs(rng.standard_normal((b, mel_len * 4))).astype(np.float32),
        "pitch_lengths": np.full((b,), mel_len * 4, np.int32),
        "dur": dur,
        "mrte_mel": rng.standard_normal((b, 24, 80)).astype(np.float32),
        "mrte_mel_lengths": np.full((b,), 24, np.int32),
    }


@pytest.mark.slow
def test_s2_train_step_runs_on_mesh():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8

    ttv = TTVModel(n_vocab=40, n_tone=10, n_language=3, text_layers=1,
                   mel_enc_layers=1, w2v_enc_layers=1, w2v_dec_layers=2)
    disc = MultiResSpecDiscriminator()
    tx_g = adamw(1e-4, steps_per_epoch=10)
    tx_d = adamw(1e-4, steps_per_epoch=10)

    batch = tiny_batch()
    with mesh:
        state = create_state(ttv, disc, tx_g, tx_d, jax.random.PRNGKey(0), batch)
        train_step = jax.jit(make_train_step(ttv, disc, tx_g, tx_d))
        sharded = shard_batch(mesh, batch)
        state, metrics = train_step(state, sharded, jax.random.PRNGKey(1))
        state, metrics = train_step(state, sharded, jax.random.PRNGKey(2))

    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert int(state.step) == 2
    # VQ EMA stats must have moved
    cs = state.vq["quantizer"]["vq_0"]["codebook"]["cluster_size"]
    assert float(jnp.sum(cs)) > 0


@pytest.mark.slow
def test_s2_train_step_bf16_compute():
    """bf16 compute / fp32 params+opt islands: the CLI default (reference
    trains fp16 AMP, train_ms.py:175). Params must stay fp32, losses must be
    finite, and the G loss must track the fp32 step's to ~1e-1."""
    ttv32 = TTVModel(n_vocab=40, n_tone=10, n_language=3, text_layers=1,
                     mel_enc_layers=1, w2v_enc_layers=1, w2v_dec_layers=2)
    ttv16 = TTVModel(n_vocab=40, n_tone=10, n_language=3, text_layers=1,
                     mel_enc_layers=1, w2v_enc_layers=1, w2v_dec_layers=2,
                     dtype=jnp.bfloat16)
    disc32 = MultiResSpecDiscriminator()
    disc16 = MultiResSpecDiscriminator(dtype=jnp.bfloat16)
    tx_g = adamw(1e-4, steps_per_epoch=10)
    tx_d = adamw(1e-4, steps_per_epoch=10)

    batch = jax.tree.map(jnp.asarray, tiny_batch())
    state = create_state(ttv32, disc32, tx_g, tx_d, jax.random.PRNGKey(0), batch)
    for leaf in jax.tree_util.tree_leaves(state.params_g):
        assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype

    step16 = jax.jit(make_train_step(ttv16, disc16, tx_g, tx_d))
    step32 = jax.jit(make_train_step(ttv32, disc32, tx_g, tx_d))
    s16, m16 = step16(state, batch, jax.random.PRNGKey(1))
    _, m32 = step32(state, batch, jax.random.PRNGKey(1))

    for k, v in m16.items():
        assert np.isfinite(float(v)), (k, float(v))
        assert np.asarray(v).dtype == np.float32  # loss islands stay fp32
    rel = abs(float(m16["loss/g/total"]) - float(m32["loss/g/total"])) / (
        abs(float(m32["loss/g/total"])) + 1e-6)
    assert rel < 0.1, (float(m16["loss/g/total"]), float(m32["loss/g/total"]))
    # params updated and still fp32 after the bf16 step
    for leaf in jax.tree_util.tree_leaves(s16.params_g):
        assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype


def test_kmeans_init_on_true_pre_vq_features():
    """CLI k-means init path: fit on the quantizer's actual inputs
    (plm_conv1 -> pool8 -> plm_conv2 at step-0 params), masked frames
    excluded — not on raw pooled mel."""
    from megatts2_hierspeechpp_tpu.ops.kmeans import init_rvq_state

    ttv = TTVModel(n_vocab=40, n_tone=10, n_language=3, text_layers=1,
                   mel_enc_layers=1, w2v_enc_layers=1, w2v_dec_layers=2,
                   vq_bins=16)
    disc = MultiResSpecDiscriminator()
    tx_g = adamw(1e-4, steps_per_epoch=10)
    tx_d = adamw(1e-4, steps_per_epoch=10)
    batch = tiny_batch(b=4, mel_len=64)
    batch["mel_lengths"] = np.asarray([64, 48, 40, 33], np.int32)
    state = create_state(ttv, disc, tx_g, tx_d, jax.random.PRNGKey(0), batch)

    feats, pool_mask = ttv.apply(
        {"params": state.params_g, "vq": state.vq},
        jnp.asarray(batch["mel"]), jnp.asarray(batch["mel_lengths"]),
        method=TTVModel.pre_vq_features,
    )
    assert feats.shape == (4, 8, 20)
    keep = np.asarray(pool_mask)[..., 0].reshape(-1) > 0
    assert keep.sum() == 8 + 6 + 5 + 5  # ceil(len/8) valid pooled frames
    samples = np.asarray(feats).reshape(-1, 20)[keep]
    new_vq = init_rvq_state(state.vq["quantizer"], samples, seed=0)
    emb = np.asarray(jax.tree_util.tree_leaves(new_vq)[0])
    # codebook now lives in the feature distribution, not at the zero init
    flat = samples.reshape(-1, 20)
    assert np.isfinite(emb).all()
    lo, hi = flat.min() - 1e-3, flat.max() + 1e-3
    embs = [l for l in jax.tree_util.tree_leaves(new_vq)
            if np.asarray(l).ndim == 2 and np.asarray(l).shape[-1] == 20]
    assert embs and all(((np.asarray(e) >= lo) & (np.asarray(e) <= hi)).all()
                        for e in embs)
