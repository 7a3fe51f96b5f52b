"""Fused anti-aliased snake kernel: formula equivalence (interpret mode on CPU;
the compiled TPU path is exercised by bench.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import megatts2_hierspeechpp_tpu.ops.pallas_snake as psn
from megatts2_hierspeechpp_tpu.ops.resample import activation1d


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)


@pytest.mark.parametrize(
    "shape",
    # C<=64 exercises the transposed-tile kernel, C=256 the classic one
    [(1, 512, 16), (2, 1000, 32), (1, 700, 64), (1, 512, 256)],
)
def test_fused_matches_composed_interior(shape, interpret_pallas):
    b, t, c = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    alpha = jnp.asarray(np.exp(rng.standard_normal(c) * 0.3), jnp.float32)
    beta = jnp.asarray(np.exp(rng.standard_normal(c) * 0.3), jnp.float32)

    ref = activation1d(
        x, lambda v: v + jnp.square(jnp.sin(v * alpha)) / (beta + 1e-9)
    )
    out = psn.fused_aa_snakebeta(x, alpha, beta)
    d = np.abs(np.asarray(out) - np.asarray(ref))
    # exact EVERYWHERE: interior from the kernel, utterance-edge strips
    # stitched from the composed math (in-place updates)
    assert d.max() < 5e-6, d.max()


@pytest.mark.parametrize("shape", [(1, 512, 16), (1, 512, 256)])
def test_fused_gradients_match_composed(shape, interpret_pallas):
    """Trainers differentiate through AMPBlock activations: the custom_vjp
    (Pallas fwd, composed-math bwd) must give the composed path's gradients
    for x, alpha AND beta (alpha/beta are learned parameters)."""
    b, t, c = shape
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    alpha = jnp.asarray(np.exp(rng.standard_normal(c) * 0.3), jnp.float32)
    beta = jnp.asarray(np.exp(rng.standard_normal(c) * 0.3), jnp.float32)
    w = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)

    def loss_fused(x, a, bt):
        return jnp.sum(w * psn.fused_aa_snakebeta(x, a, bt))

    def loss_composed(x, a, bt):
        y = activation1d(x, lambda v: v + jnp.square(jnp.sin(v * a)) / (bt + 1e-9))
        return jnp.sum(w * y)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, alpha, beta)
    gc = jax.grad(loss_composed, argnums=(0, 1, 2))(x, alpha, beta)
    for name, a_, b_ in zip(("x", "alpha", "beta"), gf, gc):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-5, atol=1e-5,
            err_msg=f"grad wrt {name}")


def test_pick_tile_always_halo_aligned():
    """ADVICE r2: a VMEM cap that is not a HALO multiple (non-power-of-two C,
    e.g. 262144//192 = 1365) must never yield a misaligned tile."""
    from megatts2_hierspeechpp_tpu.ops import pallas_ampblock as pab

    for mod in (psn, pab):
        for t in (7, 64, 100, 1365, 4096, 6000, 48000, 131072):
            for cap in (1365, 131072 // 96, 262144 // 192, 2048, 9, 100):
                tile = mod._pick_tile(t, cap)
                assert tile % mod.HALO == 0, (mod.__name__, t, cap, tile)
                assert tile >= mod.HALO
                # tile must not exceed the HALO-floored cap
                assert tile <= max(mod.HALO, cap - cap % mod.HALO)


def test_fused_non_power_of_two_channels(interpret_pallas):
    """C=192 with t above the VMEM cap exercises the previously-misaligned
    fallback path end-to-end."""
    rng = np.random.default_rng(3)
    c = 192
    t = 2000  # > 262144//192 = 1365 -> capped, non-divisor fallback + pad
    x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
    alpha = jnp.asarray(np.exp(rng.standard_normal(c) * 0.3), jnp.float32)
    beta = jnp.asarray(np.exp(rng.standard_normal(c) * 0.3), jnp.float32)
    got = psn.fused_aa_snakebeta(x, alpha, beta)
    want = activation1d(
        x, lambda v: v + jnp.square(jnp.sin(v * alpha)) / (beta + 1e-9))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
