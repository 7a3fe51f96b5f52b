"""Crash-restart resume semantics of the training loop (aux subsystem parity:
the reference's only fault tolerance is latest-checkpoint restart,
train_ms.py:163-170)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.ar.t2s import Text2Semantic
from megatts2_hierspeechpp_tpu.ar.trainer import create_state, make_train_step
from megatts2_hierspeechpp_tpu.train import checkpoints as ckpt_lib
from megatts2_hierspeechpp_tpu.train.loop import run_training
from megatts2_hierspeechpp_tpu.train.optim import adamw


def _tiny():
    model = Text2Semantic(hidden_dim=32, embedding_dim=32, n_heads=2, n_layers=1,
                          vocab_size=33, phoneme_vocab_size=20, p_dropout=0.0)
    tx = adamw(1e-3)
    rng = np.random.default_rng(0)
    batch = {
        "x_ids": np.asarray(rng.integers(0, 20, (2, 8)), np.int32),
        "x_lens": np.asarray([8, 6], np.int32),
        "y_ids": np.asarray(rng.integers(0, 32, (2, 8)), np.int32),
        "y_lens": np.asarray([8, 8], np.int32),
        "bert_feature": np.zeros((2, 8, 1024), np.float32),
    }
    return model, tx, batch


@pytest.mark.slow
def test_training_resumes_from_latest_checkpoint(tmp_path):
    model, tx, batch = _tiny()
    model_dir = str(tmp_path / "run")

    def batches(_epoch):
        for _ in range(3):
            yield batch

    state = create_state(model, tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx))

    # "crash" after 2 epochs (6 steps); epoch-end checkpoints written
    state = run_training(state, step, batches, model_dir, epochs=2,
                         log_interval=1, save_interval=100)
    assert int(state.step) == 6
    assert ckpt_lib.latest_step(os.path.join(model_dir, "ckpt")) == 6

    # fresh process: restore and continue
    state2 = create_state(model, tx, jax.random.PRNGKey(0))
    restored = ckpt_lib.restore(os.path.join(model_dir, "ckpt"), state2)
    assert restored is not None
    assert int(restored.step) == 6
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    state3 = run_training(restored, step, batches, model_dir, epochs=3,
                          start_epoch=2, log_interval=1, save_interval=100)
    assert int(state3.step) == 9
    # scalars were appended
    assert os.path.exists(os.path.join(model_dir, "scalars.jsonl"))


@pytest.mark.slow
def test_resume_reproduces_loss_curve(tmp_path):
    """An epoch-boundary crash-restart must replay the IDENTICAL loss curve:
    per-step rng is fold_in(fold_in(seed, epoch), i), not a split stream that
    restarts from the seed on resume (train/loop.py:116-124). Dropout is on so
    the losses actually depend on the rng."""
    import json

    model = Text2Semantic(hidden_dim=32, embedding_dim=32, n_heads=2, n_layers=1,
                          vocab_size=33, phoneme_vocab_size=20, p_dropout=0.3)
    tx = adamw(1e-3)
    rng = np.random.default_rng(0)
    batch = {
        "x_ids": np.asarray(rng.integers(0, 20, (2, 8)), np.int32),
        "x_lens": np.asarray([8, 6], np.int32),
        "y_ids": np.asarray(rng.integers(0, 32, (2, 8)), np.int32),
        "y_lens": np.asarray([8, 8], np.int32),
        "bert_feature": np.zeros((2, 8, 1024), np.float32),
    }

    def batches(_epoch):
        for _ in range(3):
            yield batch

    step = jax.jit(make_train_step(model, tx))

    def scalars(model_dir):
        with open(os.path.join(model_dir, "scalars.jsonl")) as f:
            return {r["step"]: r["loss/t2s"] for r in map(json.loads, f)}

    # run A: 3 epochs uninterrupted
    dir_a = str(tmp_path / "a")
    run_training(create_state(model, tx, jax.random.PRNGKey(0)), step, batches,
                 dir_a, epochs=3, log_interval=1, save_interval=100)

    # run B: crash after epoch 2, restore, finish epoch 3
    dir_b = str(tmp_path / "b")
    run_training(create_state(model, tx, jax.random.PRNGKey(0)), step, batches,
                 dir_b, epochs=2, log_interval=1, save_interval=100)
    restored = ckpt_lib.restore(
        os.path.join(dir_b, "ckpt"), create_state(model, tx, jax.random.PRNGKey(0)))
    run_training(restored, step, batches, dir_b, epochs=3, start_epoch=2,
                 log_interval=1, save_interval=100)

    a, b = scalars(dir_a), scalars(dir_b)
    assert set(a) == set(b) == set(range(1, 10))
    for s in range(1, 10):
        np.testing.assert_allclose(a[s], b[s], rtol=1e-6,
                                   err_msg=f"step {s} diverged after resume")


def test_prefetch_propagates_producer_errors():
    """A dataset iterator that raises (corrupt sidecar, I/O error) must fail
    the training loop loudly, not hang the consumer on q.get()."""
    from megatts2_hierspeechpp_tpu.train.loop import prefetch

    def bad_iter():
        yield 1
        yield 2
        raise FileNotFoundError("corrupt.hw2v.npy")

    got = []
    with pytest.raises(FileNotFoundError, match="corrupt"):
        for item in prefetch(bad_iter(), size=2):
            got.append(item)
    assert got == [1, 2]


def test_prefetch_clean_exhaustion():
    from megatts2_hierspeechpp_tpu.train.loop import prefetch

    assert list(prefetch(iter(range(5)), size=2)) == list(range(5))
