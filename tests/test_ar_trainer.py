"""AR trainer + ScaledAdam + dataset tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.ar.dataset import Text2SemanticDataset, collate
from megatts2_hierspeechpp_tpu.ar.scaled_adam import scaled_adam, warmup_cosine_schedule
from megatts2_hierspeechpp_tpu.ar.t2s import Text2Semantic
from megatts2_hierspeechpp_tpu.ar.trainer import create_state, make_train_step


def test_warmup_cosine_schedule_shape():
    s = warmup_cosine_schedule(1e-5, 1e-3, 1e-5, 100, 1000)
    assert float(s(0)) == pytest.approx(1e-5)
    assert float(s(100)) == pytest.approx(1e-3, rel=1e-2)
    assert float(s(1000)) == pytest.approx(1e-5, rel=1e-1)
    assert float(s(50)) < float(s(100))


def test_ar_dataset_and_collate(tmp_path):
    ph = tmp_path / "2-name2text.txt"
    sem = tmp_path / "6-name2semantic.tsv"
    ph.write_text("a\tx y z\nb\tx x\nc\tbad_symbol\n")
    sem.write_text("a\t" + " ".join(map(str, range(30))) + "\n"
                   "b\t" + " ".join(map(str, range(12))) + "\n"
                   "c\t1 2 3\n")
    vocab = {"x": 1, "y": 2, "z": 3}
    ds = Text2SemanticDataset(str(ph), str(sem), vocab)
    assert len(ds) == 2  # c dropped: unknown symbol
    batch = collate([ds[0], ds[1]])
    assert batch["x_ids"].shape[0] == 2
    assert batch["y_lens"].tolist() == [30, 12]
    assert batch["bert_feature"].shape[-1] == 1024


@pytest.mark.slow
def test_ar_train_step_with_scaled_adam_improves():
    model = Text2Semantic(hidden_dim=64, embedding_dim=64, n_heads=4,
                          n_layers=2, vocab_size=101, phoneme_vocab_size=50,
                          p_dropout=0.0)
    tx = scaled_adam(learning_rate=1e-2)
    state = create_state(model, tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx, grad_accum=2))

    rng = np.random.default_rng(0)
    batch = {
        "x_ids": jnp.asarray(rng.integers(0, 50, (2, 8))),
        "x_lens": jnp.asarray([8, 6]),
        "y_ids": jnp.asarray(rng.integers(0, 100, (2, 16))),
        "y_lens": jnp.asarray([16, 12]),
        "bert_feature": jnp.zeros((2, 8, 1024)),
    }
    losses = []
    for i in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss/t2s"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
