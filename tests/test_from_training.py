"""Serving from OUR OWN training runs: save real trainer states (s2/s1/voc)
via train/checkpoints, rebuild a TTSPipeline with infer/from_training, and
synthesize. Validates the field-name contract between the trainer states and
the loader (the reference's analog: loading its G_*.pth into inference,
/root/reference/inference_plm.py:236-258)."""
import numpy as np
import pytest

import jax

from megatts2_hierspeechpp_tpu.data import text as text_frontend
from megatts2_hierspeechpp_tpu.models.discriminators import (
    MultiPeriodDiscriminator,
    MultiResSpecDiscriminator,
)
from megatts2_hierspeechpp_tpu.models.plm import ProsodyLM
from megatts2_hierspeechpp_tpu.models.ttv import TTVModel
from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder
from megatts2_hierspeechpp_tpu.train import checkpoints as ckpt_lib
from megatts2_hierspeechpp_tpu.train import s1 as s1_mod
from megatts2_hierspeechpp_tpu.train import s2 as s2_mod
from megatts2_hierspeechpp_tpu.train import vocoder as vt
from megatts2_hierspeechpp_tpu.train.optim import adamw
from tests.test_train_s2 import tiny_batch


@pytest.mark.slow
def test_build_pipeline_from_train_dirs(tmp_path):
    # --- create + save REAL trainer states (default-size models, as the
    # CLIs construct them; the loader reconstructs defaults) ---
    tx = adamw(1e-4, steps_per_epoch=10)
    batch = tiny_batch(b=1)

    ttv = TTVModel(n_vocab=text_frontend.N_VOCAB,
                   n_tone=text_frontend.N_TONE,
                   n_language=text_frontend.N_LANGUAGE)
    s2_state = s2_mod.create_state(
        ttv, MultiResSpecDiscriminator(), tx, tx, jax.random.PRNGKey(0),
        batch)
    ckpt_lib.save(str(tmp_path / "s2" / "ckpt"), s2_state, step=1)

    plm = ProsodyLM()
    s1_state = s1_mod.create_state(
        plm, tx, jax.random.PRNGKey(1),
        {"params": s2_state.params_g, "vq": s2_state.vq})
    ckpt_lib.save(str(tmp_path / "s1" / "ckpt"), s1_state, step=1)

    voc_state = vt.create_state(
        HierVocoder(), MultiPeriodDiscriminator(), tx, tx,
        jax.random.PRNGKey(2))
    ckpt_lib.save(str(tmp_path / "voc" / "ckpt"), voc_state, step=1)

    # --- rebuild the pipeline from the run dirs and synthesize ---
    from megatts2_hierspeechpp_tpu.infer.from_training import (
        build_pipeline_from_train_dirs,
    )

    pipe = build_pipeline_from_train_dirs(
        str(tmp_path / "s2"), str(tmp_path / "s1"), str(tmp_path / "voc"))
    prompt = np.random.default_rng(0).uniform(-0.3, 0.3, 32000).astype(
        np.float32)
    wav = pipe.tts("sil zh ang1 h ao3 sp", prompt, output_sr=16000)
    assert wav.ndim == 1 and len(wav) > 1000 and np.isfinite(wav).all()

    # loaded params are numerically the trainer's params
    leaf = jax.tree.leaves(pipe.ttv_vars["params"])[0]
    ref = jax.tree.leaves(s2_state.params_g)[0]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(ref))


def test_restore_raw_missing_dir(tmp_path):
    assert ckpt_lib.restore_raw(str(tmp_path / "nope")) is None
