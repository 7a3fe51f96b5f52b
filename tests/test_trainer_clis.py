"""End-to-end smokes for the speechsr / denoiser trainer CLIs (VERDICT r2
next-round #7): a couple of real steps through main() on a tiny wav corpus,
asserting train scalars + eval-hook scalars land in scalars.jsonl."""
import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture()
def wav_corpus(tmp_path):
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    for i in range(4):
        t = np.arange(16000) / 16000.0
        f = 120.0 + 40.0 * i
        wav = 0.4 * np.sin(2 * np.pi * f * t) + 0.1 * np.sin(
            2 * np.pi * 3 * f * t
        )
        wav = wav + 0.01 * rng.standard_normal(len(t))
        wavfile.write(
            str(tmp_path / f"utt{i}.wav"), 16000,
            (wav * 32767).astype(np.int16),
        )
    return tmp_path


def _run_cli(main, argv):
    old = sys.argv
    sys.argv = argv
    try:
        main()
    finally:
        sys.argv = old


def _read_scalars(model_dir):
    with open(os.path.join(model_dir, "scalars.jsonl")) as f:
        return [json.loads(l) for l in f]


@pytest.mark.slow
def test_train_sr_cli(wav_corpus, tmp_path):
    from megatts2_hierspeechpp_tpu.cli.train_sr import main

    logs = str(tmp_path / "logs")
    _run_cli(main, [
        "train_sr", "--data_dir", str(wav_corpus), "-m", "sr",
        "--logs_dir", logs, "--out_sr", "24000", "--epochs", "1",
        "--steps_per_epoch", "2", "--batch_size", "1", "--seg_in", "2048",
        "--ch", "16", "--eval_interval", "2",
    ])
    recs = _read_scalars(os.path.join(logs, "sr"))
    evals = [r for r in recs if "eval/mel_l1" in r]
    assert evals and np.isfinite(evals[-1]["eval/mel_l1"])
    assert np.isfinite(evals[-1]["eval/snr_db"])


@pytest.mark.slow
def test_train_denoiser_cli(wav_corpus, tmp_path):
    from megatts2_hierspeechpp_tpu.cli.train_denoiser import main

    logs = str(tmp_path / "logs")
    _run_cli(main, [
        "train_denoiser", "--data_dir", str(wav_corpus), "-m", "dn",
        "--logs_dir", logs, "--epochs", "1", "--steps_per_epoch", "2",
        "--batch_size", "1", "--seg", "4000", "--dense_channel", "16",
        "--eval_interval", "2",
    ])
    recs = _read_scalars(os.path.join(logs, "dn"))
    evals = [r for r in recs if "eval/mag_mse" in r]
    assert evals and np.isfinite(evals[-1]["eval/mag_mse"])
    assert np.isfinite(evals[-1]["eval/snr_improvement_db"])
