"""PLM parity + KV-cache decode equivalence tests."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import torch_ref
from megatts2_hierspeechpp_tpu.models.plm import ProsodyLM, decode
from megatts2_hierspeechpp_tpu.models.convert import convert_plm

torch_ref.add_reference_path()


@pytest.fixture(scope="module")
def models():
    from ttv_v1.t2w2v_transformer import Megatts2PLM1

    torch.manual_seed(0)
    tmod = Megatts2PLM1(n_layers=2, n_heads=4, vq_dim=20, tc_latent_dim=44,
                        vq_bins=1024, dropout=0.0).eval()
    jmod = ProsodyLM(n_layers=2, n_heads=4, vq_dim=20, tc_latent_dim=44,
                     vq_bins=1024, p_dropout=0.0)
    params = {"params": convert_plm(tmod.state_dict(), n_layers=2)}
    return tmod, jmod, params


def test_plm_training_forward_parity(models):
    tmod, jmod, params = models
    b, t = 2, 12
    rng = np.random.default_rng(0)
    tc = rng.standard_normal((b, t, 44)).astype(np.float32)
    codes = rng.integers(0, 1024, (b, t))
    lens = np.array([12, 12], np.int64)  # full length: reference CE counts all

    with torch.no_grad():
        logits_t, targets_t, loss_t, loss_log_t, acc_t = tmod(
            torch.from_numpy(tc.transpose(0, 2, 1)),
            torch.from_numpy(codes),
            torch.from_numpy(lens),
        )

    out = jmod.apply(
        params, jnp.asarray(tc), jnp.asarray(codes), jnp.asarray(lens)
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]), logits_t.transpose(1, 2).numpy(), atol=2e-4
    )
    np.testing.assert_allclose(float(out["loss"]), float(loss_t), rtol=1e-5)
    np.testing.assert_allclose(float(out["loss_log"]), float(loss_log_t), rtol=1e-5)
    np.testing.assert_allclose(float(out["acc"]), float(acc_t), atol=1e-6)


def test_kv_decode_matches_naive_causal_greedy(models):
    """The KV-cached scan must produce exactly the causal greedy sequence.

    Note: the reference's own `infer` omits the causal mask it trained with
    (plm(x_pos) with mask=None, t2w2v_transformer.py:715) — a train/infer
    mismatch its sibling class comment acknowledges; we decode causally,
    consistent with training.
    """
    tmod, jmod, params = models
    b, t = 2, 9
    tc = np.random.default_rng(1).standard_normal((b, t, 44)).astype(np.float32)

    naive = jmod.apply(params, jnp.asarray(tc), method=ProsodyLM.infer_naive)
    fast = decode(params["params"], jnp.asarray(tc), n_layers=2, n_heads=4, go_id=1024)
    np.testing.assert_array_equal(np.asarray(naive), np.asarray(fast))


def test_kv_decode_accepts_bf16_latents(models):
    """The serving pipeline feeds bf16 tc_latent from a bf16 TTV; the KV
    cache must match the dtype the f32-param projections produce (f32 after
    promotion), not the input dtype."""
    _, jmod, params = models
    b, t = 1, 6
    tc = np.random.default_rng(4).standard_normal((b, t, 44)).astype(np.float32)
    f32 = decode(params["params"], jnp.asarray(tc), n_layers=2, n_heads=4,
                 go_id=1024)
    b16 = decode(params["params"], jnp.asarray(tc, jnp.bfloat16), n_layers=2,
                 n_heads=4, go_id=1024)
    assert b16.shape == (b, t) and b16.dtype == np.int32
    # bf16 input rounding may flip near-tie argmaxes; codes stay in range
    assert (np.asarray(b16) >= 0).all() and (np.asarray(b16) < 1024).all()
    del f32


def test_fused_decode_matches_unfused(models):
    """The fused step (merged QKV, in-place cache writes) is the same math as
    the round-2 decode: greedy codes must agree exactly, and top-k sampling
    must agree under the same rng (identical logits -> identical choices)."""
    from megatts2_hierspeechpp_tpu.models.plm import decode_unfused

    _, jmod, params = models
    b, t = 2, 11
    tc = np.random.default_rng(5).standard_normal((b, t, 44)).astype(np.float32)
    for kw in (dict(), dict(rng=jax.random.PRNGKey(9), top_k=5,
                            temperature=0.8)):
        fused = decode(params["params"], jnp.asarray(tc), n_layers=2,
                       n_heads=4, go_id=1024, **kw)
        ref = decode_unfused(params["params"], jnp.asarray(tc), n_layers=2,
                             n_heads=4, go_id=1024, **kw)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_topk_sampling_decodes_valid_codes(models):
    _, jmod, params = models
    b, t = 1, 7
    tc = np.random.default_rng(2).standard_normal((b, t, 44)).astype(np.float32)
    codes = decode(
        params["params"], jnp.asarray(tc), n_layers=2, n_heads=4, go_id=1024,
        rng=jax.random.PRNGKey(3), top_k=5, temperature=0.8,
    )
    assert codes.shape == (b, t)
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 1024).all()


def test_noncausal_plm_variant_matches_reference():
    """Variant A (Megatts2PLM): rel-pos Encoder over the concat input."""
    from ttv_v1.t2w2v_transformer import Megatts2PLM
    from megatts2_hierspeechpp_tpu.models.plm import ProsodyLMNonCausal
    from megatts2_hierspeechpp_tpu.models.convert import convert_plm_noncausal

    torch.manual_seed(5)
    tmod = Megatts2PLM(n_layers=2, n_heads=4, vq_dim=20, tc_latent_dim=44,
                       vq_bins=1024, kernel_size=9, dropout=0.0).eval()
    jmod = ProsodyLMNonCausal(n_layers=2, n_heads=4, vq_dim=20, tc_latent_dim=44,
                              vq_bins=1024, kernel_size=9, p_dropout=0.0)

    b, t = 2, 12
    rng = np.random.default_rng(5)
    tc = rng.standard_normal((b, t, 44)).astype(np.float32)
    codes = rng.integers(0, 1024, (b, t))
    lens = np.array([12, 12], np.int64)

    with torch.no_grad():
        logits_t, _targets, loss_t, _loss_log, _acc = tmod(
            torch.from_numpy(tc.transpose(0, 2, 1)),
            torch.from_numpy(codes),
            torch.from_numpy(lens),
        )

    params = {"params": convert_plm_noncausal(tmod.state_dict(), n_layers=2)}
    out = jmod.apply(params, jnp.asarray(tc), jnp.asarray(codes), jnp.asarray(lens))
    np.testing.assert_allclose(
        np.asarray(out["logits"]), logits_t.transpose(1, 2).numpy(), atol=5e-4
    )
    np.testing.assert_allclose(float(out["loss"]), float(loss_t), rtol=1e-4)


def test_bf16_decode_fast_path(models):
    """compute_dtype=bfloat16 (the serving fast path: weights + KV caches
    stored bf16, f32 accumulation) must produce valid codes that
    overwhelmingly agree with the exact f32 greedy path — divergence is
    allowed only at near-ties of the argmax."""
    _, jmod, params = models
    b, t = 2, 33
    tc = np.random.default_rng(7).standard_normal((b, t, 44)).astype(np.float32)
    f32 = np.asarray(decode(params["params"], jnp.asarray(tc), n_layers=2,
                            n_heads=4, go_id=1024))
    b16 = np.asarray(decode(params["params"], jnp.asarray(tc), n_layers=2,
                            n_heads=4, go_id=1024,
                            compute_dtype=jnp.bfloat16))
    assert b16.shape == (b, t) and b16.dtype == np.int32
    assert (b16 >= 0).all() and (b16 < 1024).all()
    # greedy AR decode can fork after a near-tie flip; require agreement on a
    # clear majority of positions rather than everywhere
    assert (b16 == f32).mean() > 0.5, (b16 == f32).mean()
