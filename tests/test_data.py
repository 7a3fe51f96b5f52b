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


def _ref_redistribute(dur_sec, total_frames):
    """The reference's exact error redistribution (data_utils.py:369-382)."""
    dur = np.round(np.divide(np.asarray(dur_sec, np.float64), 0.01))
    dur_length = int(sum(dur))
    if total_frames - dur_length > 0:
        begin = (total_frames - dur_length) // 2
        end = total_frames - dur_length - begin
        dur[0] += begin
        dur[-1] += end
    if dur_length - total_frames > 0:
        dur[-1] -= dur_length - total_frames
    return dur.astype(np.int64)


def test_durations_to_frames_matches_reference():
    rng = np.random.default_rng(7)
    for _ in range(50):
        n = int(rng.integers(2, 12))
        dur = rng.uniform(0.03, 0.4, n)
        base = int(np.round(dur / 0.01).sum())
        # small deficits/surpluses where the reference math is well-defined
        for delta in (-3, -1, 0, 1, 2, 5):
            total = base + delta
            ours = durations_to_frames(dur, total)
            ref = _ref_redistribute(dur, total)
            if (ref >= 0).all():
                np.testing.assert_array_equal(ours, ref)
            assert ours.sum() == total and (ours >= 0).all()


def test_durations_to_frames_large_surplus_stays_nonnegative():
    # surplus bigger than the last phone: reference would go negative; we
    # clip and pull the remainder from the longest phones, exact-sum
    d = durations_to_frames(np.array([0.30, 0.10, 0.02]), total_frames=32)
    assert d.sum() == 32 and (d >= 0).all()


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


def test_dataset_tolerance_filtering(tmp_path):
    """Mis-aligned items are dropped (reference data_utils.py:241-272), not
    silently truncated."""
    fl = _make_fake_corpus(tmp_path, n=4)
    # utt0: phone-count mismatch (4 durs vs 5 text symbols)
    w0 = str(tmp_path / "utt0.wav")
    np.save(w0.replace(".wav", ".dur.npy"), np.full(4, 0.1))
    # utt1: dur sum far off 2*w2v (> 2*dur_tolerance frames)
    w1 = str(tmp_path / "utt1.wav")
    t1 = np.load(w1.replace(".wav", ".hw2v.npy")).shape[-1]
    bad = np.full(5, (2 * t1 + 40) / 5 * 0.010)
    np.save(w1.replace(".wav", ".dur.npy"), bad)
    ds = SidecarDataset(fl, DatasetConfig(min_w2v_frames=1))
    assert len(ds) == 2
    kept = {os.path.basename(e[0]) for e in ds.items}
    assert kept == {"utt2.wav", "utt3.wav"}


def test_bucket_sampler_cycle_pads_small_buckets():
    """A bucket smaller than one world-batch cycles instead of starving
    (reference data_utils.py:599-600)."""
    lengths = [50, 60, 70]  # one bucket of 3 < world=2*4=8
    samplers = [DistributedBucketSampler(lengths, 4, [0, 100],
                                         num_replicas=2, rank=r)
                for r in (0, 1)]
    per_rank = [s.epoch_batches(0) for s in samplers]
    for batches in per_rank:
        assert len(batches) == 1 and len(batches[0]) == 4
    # every item still appears somewhere across the world
    seen = {i for batches in per_rank for b in batches for i in b}
    assert seen == {0, 1, 2}


def test_bucket_sampler_two_replica_disjoint_and_complete():
    """Per-epoch world coverage: shards are disjoint per batch-step and their
    union covers every bucket item at least once (DDP-sampler contract)."""
    lengths = list(np.random.default_rng(5).integers(40, 400, 61))  # odd size
    samplers = [DistributedBucketSampler(lengths, 4, [0, 100, 200, 300, 500],
                                         num_replicas=2, rank=r)
                for r in (0, 1)]
    b0, b1 = (s.epoch_batches(2) for s in samplers)
    assert len(b0) == len(b1)  # same number of steps per rank
    union = {i for b in b0 + b1 for i in b}
    bucketed = {i for bucket in samplers[0].buckets for i in bucket}
    assert union == bucketed  # complete coverage incl. cycle-padded tail
    # duplication comes only from cycle padding: per bucket the padded list
    # repeats at most ceil((len+rem)/len) times -> with rem < world each item
    # appears at most twice across the whole world-epoch
    from collections import Counter

    counts = Counter(i for b in b0 + b1 for i in b)
    world = 2 * 4
    for bucket in samplers[0].buckets:
        cap = 1 + (((-len(bucket)) % world) + len(bucket) - 1) // len(bucket)
        for i in bucket:
            assert counts[i] <= cap, (i, counts[i], cap)


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
