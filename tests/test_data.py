"""Data pipeline tests: text frontend parity vs reference, sidecar dataset
shape/alignment invariants, bucket sampler determinism."""
import os

import numpy as np
import pytest

from tests import torch_ref
from megatts2_hierspeechpp_tpu.data import text as jtext
from megatts2_hierspeechpp_tpu.data.dataset import (
    DatasetConfig,
    DistributedBucketSampler,
    SidecarDataset,
    collate,
    durations_to_frames,
)

torch_ref.add_reference_path()


def test_symbols_match_reference():
    from text.symbols_lmdh import symbols, tone_symbols, language_symbols

    assert jtext.SYMBOLS == symbols
    assert jtext.TONE_SYMBOLS == tone_symbols
    assert jtext.LANGUAGE_SYMBOLS == language_symbols
    assert jtext.ENGLISH_START == 74
    assert jtext.PUNCT_START == 113


def test_text_to_sequence_matches_reference():
    from text import cleaned_text_to_sequence_lmdh, cleaned_tone_to_sequence_lmdh

    s = "sil zh ang1 HH AH0 , sp eos"
    s_clean = "sil zh ang HH AH , sp"
    assert jtext.text_to_sequence(s_clean) == cleaned_text_to_sequence_lmdh(s_clean)
    tones = jtext.get_tone("sil zh ang1 HH AH0 , sp")
    assert jtext.tones_to_sequence(tones) == cleaned_tone_to_sequence_lmdh(tones)


def test_get_tone_behavior():
    # Mandarin tone digits propagate backwards onto initials; English stress
    # digits map to 7-9 (no digit -> 6); punct/pause -> 0; first symbol forced 0
    tones = jtext.get_tone("sil zh ang1 h ao3 HH AH0 W ER1 , sp")
    assert tones == ["0", "1", "1", "3", "3", "6", "7", "6", "8", "0", "0"]


def test_process_text_language_ids():
    ids, tones, langs = jtext.process_text("~ sil #1 zh ang1 #3 , HH AH0 eos")
    # reference ranges (data_utils.py:399-408): only id 0 ('~') -> 0; ids
    # 1..73 (incl. pause words like 'sil') -> 1; 74..112 English -> 2;
    # >=113 punct -> 0
    assert langs == [0, 1, 1, 1, 0, 2, 2]
    assert len(ids) == len(tones) == len(langs)


def test_durations_to_frames_redistribution():
    d = durations_to_frames(np.array([0.101, 0.203, 0.299]), total_frames=60)
    assert d.sum() == 60
    d2 = durations_to_frames(np.array([0.10, 0.20, 0.30]), total_frames=62)
    assert d2.sum() == 62


def _make_fake_corpus(tmp_path, n=6, t_base=40):
    rows = []
    rng = np.random.default_rng(0)
    for i in range(n):
        wav = str(tmp_path / f"utt{i}.wav")
        t = t_base + 8 * i
        np.save(wav.replace(".wav", ".hw2v.npy"), rng.standard_normal((1024, t)).astype(np.float32))
        np.save(wav.replace(".wav", ".hmel.npy"), rng.standard_normal((80, t)).astype(np.float32))
        np.save(wav.replace(".wav", ".hf0.npy"), np.abs(rng.standard_normal(4 * t)).astype(np.float32))
        n_ph = 5
        dur = np.full(n_ph, (2 * t) / n_ph * 0.010)
        np.save(wav.replace(".wav", ".dur.npy"), dur)
        rows.append(f"{wav}|spk0|sil zh ang1 h ao3")
    sub = tmp_path / "trans.txt"
    sub.write_text("\n".join(rows))
    fl = tmp_path / "train_list.txt"
    fl.write_text(str(sub))
    return str(fl)


def test_sidecar_dataset_alignment(tmp_path):
    fl = _make_fake_corpus(tmp_path)
    ds = SidecarDataset(fl, DatasetConfig(min_w2v_frames=1))
    assert len(ds) == 6
    item = ds[0]
    t = item["w2v"].shape[0]
    assert t % 8 == 0
    assert item["mel"].shape == (t, 80)
    assert item["pitch"].shape == (4 * t,)
    assert item["dur"].sum() == 2 * t
    assert len(item["x_ids"]) == len(item["tone"]) == len(item["dur"])

    batch = collate([ds[i] for i in range(4)])
    b, tm, _ = batch["w2v"].shape
    assert b == 4 and tm % 8 == 0
    assert batch["mel"].shape == (b, tm, 80)
    assert batch["pitch"].shape == (b, 4 * tm)
    # sorted by length desc
    assert (np.diff(batch["w2v_lengths"]) <= 0).all()


def test_bucket_sampler_deterministic_and_sharded():
    lengths = list(np.random.default_rng(1).integers(40, 400, 64))
    s0 = DistributedBucketSampler(lengths, 4, [0, 100, 200, 300, 500],
                                  num_replicas=2, rank=0)
    s1 = DistributedBucketSampler(lengths, 4, [0, 100, 200, 300, 500],
                                  num_replicas=2, rank=1)
    b0a = s0.epoch_batches(3)
    b0b = s0.epoch_batches(3)
    assert b0a == b0b  # deterministic per epoch
    b1 = s1.epoch_batches(3)
    flat0 = {i for b in b0a for i in b}
    flat1 = {i for b in b1 for i in b}
    assert flat0.isdisjoint(flat1) or (flat0 - flat1)  # different shards
    for b in b0a:
        assert len(b) == 4
