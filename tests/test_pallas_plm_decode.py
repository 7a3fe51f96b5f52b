"""Parity tests for the persistent Pallas PLM decode kernel
(ops/pallas_plm_decode.py) against the XLA scan decode (models/plm.py),
interpret mode on CPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.models.plm import ProsodyLM, decode
from megatts2_hierspeechpp_tpu.ops.pallas_plm_decode import plm_decode_greedy


def _setup(n_layers=2, n_heads=4, vq_dim=20, tc_dim=44, t=37, seed=0):
    mod = ProsodyLM(n_layers=n_layers, n_heads=n_heads, vq_dim=vq_dim,
                    tc_latent_dim=tc_dim, p_dropout=0.0)
    tc = jnp.asarray(
        np.random.default_rng(seed).standard_normal((1, t, tc_dim)),
        jnp.float32)
    params = jax.jit(mod.init)(
        {"params": jax.random.PRNGKey(seed)}, tc,
        jnp.zeros((1, t), jnp.int32), jnp.full((1,), t, jnp.int32),
    )["params"]
    return params, tc


@pytest.mark.parametrize("t,chunk", [(37, 16), (16, 16), (3, 8), (64, 64)])
def test_kernel_matches_xla_decode_f32(t, chunk):
    """f32 weights/cache: greedy codes must match the XLA scan decode exactly
    (same math, f32 accumulation everywhere; chunked online softmax covers
    partial/full/singleton chunk shapes)."""
    params, tc = _setup(t=t)
    ref = np.asarray(decode(params, tc, n_layers=2, n_heads=4, go_id=1024))
    out = np.asarray(plm_decode_greedy(
        params, tc, n_layers=2, n_heads=4, go_id=1024,
        weight_dtype=jnp.float32, cache_dtype=jnp.float32,
        chunk=chunk, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_kernel_bf16_serving_config_agrees():
    """bf16 weights/caches (the serving configuration): valid codes, near-tie
    flips only — a clear majority must agree with the exact path."""
    params, tc = _setup(t=48, seed=3)
    ref = np.asarray(decode(params, tc, n_layers=2, n_heads=4, go_id=1024))
    out = np.asarray(plm_decode_greedy(
        params, tc, n_layers=2, n_heads=4, go_id=1024,
        chunk=16, interpret=True))
    assert out.shape == ref.shape and out.dtype == np.int32
    assert (out >= 0).all() and (out < 1024).all()
    assert (out == ref).mean() > 0.5


def test_kernel_rejects_batched_input():
    params, tc = _setup(t=8)
    with pytest.raises(ValueError, match="B=1"):
        plm_decode_greedy(params, jnp.tile(tc, (2, 1, 1)), n_layers=2,
                          n_heads=4, interpret=True)
