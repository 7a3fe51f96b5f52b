"""Fused whole-AMPBlock kernel: forward + gradient parity against the
composed math (interpret mode on CPU; the compiled TPU path is A/B'd at model
level in BASELINE.md)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import megatts2_hierspeechpp_tpu.ops.pallas_ampblock as pab


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)


def _weights(rng, n, k, c):
    a1 = np.exp(rng.standard_normal((n, c)) * 0.2).astype(np.float32)
    ib1 = np.exp(rng.standard_normal((n, c)) * 0.2).astype(np.float32)
    a2 = np.exp(rng.standard_normal((n, c)) * 0.2).astype(np.float32)
    ib2 = np.exp(rng.standard_normal((n, c)) * 0.2).astype(np.float32)
    w1 = (rng.standard_normal((n, k, c, c)) * 0.1).astype(np.float32)
    b1 = (rng.standard_normal((n, c)) * 0.05).astype(np.float32)
    w2 = (rng.standard_normal((n, k, c, c)) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal((n, c)) * 0.05).astype(np.float32)
    return a1, ib1, w1, b1, a2, ib2, w2, b2


@pytest.mark.parametrize("shape,k,dil", [
    ((1, 512, 16), 11, (1, 3, 5)),   # Generator C=16 stage
    ((2, 640, 32), 7, (1, 3, 5)),    # SourceNetwork-style kernel
    ((1, 512, 64), 3, (1, 3, 5)),    # small kernel
    ((1, 1024, 128), 11, (1, 3, 5)),  # C=128 (1024-tile VMEM budget)
])
def test_fused_ampblock_matches_composed(shape, k, dil, interpret_pallas):
    b, t, c = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    ws = [jnp.asarray(w) for w in _weights(rng, len(dil), k, c)]

    ref = pab.composed_ampblock(x, *ws, k, dil)
    out = pab.fused_ampblock(x, *ws, kernel_size=k, dilations=dil)
    d = np.abs(np.asarray(out) - np.asarray(ref))
    # stitched edges make the op exact EVERYWHERE (vs composed), to fp
    # accumulation; relative because the 0.1-scale test convs amplify signals
    # ~14x per branch at large C
    rel = d.max() / np.abs(np.asarray(ref)).max()
    assert rel < 1e-5, (d.max(), rel)


def test_ampblock_module_fused_path_matches(interpret_pallas, monkeypatch):
    """Module-level integration: nn.AMPBlock's fused path (weight extraction
    via return_kernel/return_params + stacked dispatch) equals its composed
    path with the SAME flax params."""
    from megatts2_hierspeechpp_tpu.nn.resblocks import AMPBlock

    monkeypatch.setenv("MEGATTS_PALLAS", "1")
    monkeypatch.setenv("MEGATTS_FUSED_AMPBLOCK", "1")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 512, 32)), jnp.float32)
    block = AMPBlock(32, 11, (1, 3, 5))
    params = block.init(jax.random.PRNGKey(0), x)
    # perturb params away from init (alpha/beta logs at 0, conv v ~ 1e-2)
    params = jax.tree.map(
        lambda p: p + 0.1 * jax.random.normal(jax.random.PRNGKey(1), p.shape,
                                              p.dtype), params)

    composed = block.apply(params, x)  # CPU backend -> composed path
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fused = block.apply(params, x)  # spoofed backend -> fused path
    np.testing.assert_allclose(np.asarray(fused), np.asarray(composed),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,k", [
    ((1, 512, 16), 11),   # g=8: taps pack as 8+3
    ((1, 512, 32), 7),    # g=4: 4+3
    ((1, 512, 64), 3),    # g=2: 2+1
])
def test_packed_conv_matches_per_tap(shape, k, interpret_pallas, monkeypatch):
    """MEGATTS_PACKED_CONV=1 (tap-packed MXU dots via pltpu.roll) equals the
    per-tap path bit-for-bit modulo in-group f32 reassociation (ADVICE r4).

    The packed gate requires non-HIGHEST precision, which the kernel derives
    from a bf16 output dtype — so both arms run in bf16 here."""
    b, t, c = shape
    dil = (1, 3, 5)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.bfloat16)
    ws = [jnp.asarray(w) for w in _weights(rng, len(dil), k, c)]

    monkeypatch.setenv("MEGATTS_PACKED_CONV", "0")
    per_tap = np.asarray(
        pab.fused_ampblock(x, *ws, kernel_size=k, dilations=dil),
        np.float32)
    monkeypatch.setenv("MEGATTS_PACKED_CONV", "1")
    packed = np.asarray(
        pab.fused_ampblock(x, *ws, kernel_size=k, dilations=dil),
        np.float32)
    d = np.abs(packed - per_tap)
    rel = d.max() / np.abs(per_tap).max()
    assert rel < 2e-2, (d.max(), rel)  # bf16 output quantum + reassociation

    # and both agree with the composed math at bf16 tolerance
    ref = np.asarray(pab.composed_ampblock(
        x.astype(jnp.float32), *ws, k, dil))
    rel_ref = np.abs(packed - ref).max() / np.abs(ref).max()
    assert rel_ref < 5e-2, rel_ref


def test_fused_ampblock_gradients_match(interpret_pallas):
    b, t, c, k, dil = 1, 512, 16, 11, (1, 3, 5)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    ws = [jnp.asarray(w) for w in _weights(rng, len(dil), k, c)]
    cot = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)

    def loss_fused(x, *ws):
        return jnp.sum(cot * pab.fused_ampblock(x, *ws, kernel_size=k,
                                                dilations=dil))

    def loss_composed(x, *ws):
        return jnp.sum(cot * pab.composed_ampblock(x, *ws, k, dil))

    gf = jax.grad(loss_fused, argnums=tuple(range(9)))(x, *ws)
    gc = jax.grad(loss_composed, argnums=tuple(range(9)))(x, *ws)
    names = ("x", "a1", "ib1", "w1", "b1", "a2", "ib2", "w2", "b2")
    for name, a_, b_ in zip(names, gf, gc):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=2e-3, atol=2e-3,
            err_msg=f"grad wrt {name}")
