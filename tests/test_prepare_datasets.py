"""prepare_datasets stages 1+2 (working equivalents of the reference's dead
1-get-text.py / 2-get-hubert-wav32k.py — both have broken imports as shipped:
text.cleaner and feature_extractor.cnhubert don't exist in the reference)."""
import os
import sys

import numpy as np
import pytest
from scipy.io import wavfile


# ---------------------------------------------------------------- stage 1


def _tiny_bert_dir(tmp_path):
    import torch
    from transformers import BertConfig, BertForMaskedLM, BertTokenizer

    d = tmp_path / "bert"
    d.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + list("你好世界中文abc")
    (d / "vocab.txt").write_text("\n".join(vocab), encoding="utf-8")
    tok = BertTokenizer(str(d / "vocab.txt"))
    tok.save_pretrained(str(d))
    torch.manual_seed(0)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=16,
                     num_hidden_layers=3, num_attention_heads=2,
                     intermediate_size=32, max_position_embeddings=64)
    BertForMaskedLM(cfg).eval().save_pretrained(str(d))
    return str(d)


def test_prepare_text_stage(tmp_path, monkeypatch):
    from megatts2_hierspeechpp_tpu.cli import prepare_text as pt

    filelist = tmp_path / "list.txt"
    filelist.write_text(
        "/data/a/utt1.wav|spk0|zh|sil zh ong1 #1 g uo2 #4 。 eos|中文中文\n"
        "/data/a/utt2.wav|spk1|en|sil HH AH0 L OW1 #4 。 eos\n",
        encoding="utf-8",
    )
    bert_dir = _tiny_bert_dir(tmp_path)
    opt = tmp_path / "opt"
    monkeypatch.setattr(sys, "argv", [
        "prepare_text", "--filelist", str(filelist), "--opt_dir", str(opt),
        "--bert_ckpt", bert_dir,
    ])
    pt.main()

    rows = (opt / "2-name2text-0.txt").read_text(encoding="utf-8").strip().split("\n")
    assert len(rows) == 2
    name, phones, word2ph, norm = rows[0].split("\t")
    assert name == "utt1.wav"
    # prosody tags + eos + tone-digit stripping per data/text.py process_text
    # (toneless: the AR CLI maps phones with the 126-symbol SYMBOL_TO_ID)
    assert phones == "sil zh ong g uo 。"
    assert norm == "中文中文"
    # zh line with raw text -> per-phone BERT sidecar
    feats = np.load(opt / "3-bert" / "utt1.wav.npy")
    assert feats.shape == (6, 16)
    # word2ph distributes 6 phones over 4 chars evenly
    assert eval(word2ph) == [2, 2, 1, 1]
    # en line: phones only, stress digits stripped, no sidecar
    _, phones2, w2p2, _ = rows[1].split("\t")
    assert phones2 == "sil HH AH L OW 。"
    assert not os.path.exists(opt / "3-bert" / "utt2.wav.npy")
    assert eval(w2p2) == [1] * 6

    # phones round-trip through the frontend symbol table
    from megatts2_hierspeechpp_tpu.data import text as tf
    for ptxt in (phones, phones2):
        ids = tf.text_to_sequence(ptxt)
        assert all(0 <= i < tf.N_VOCAB for i in ids)


def test_ar_dataset_loads_bert_sidecars(tmp_path):
    from megatts2_hierspeechpp_tpu.ar.dataset import Text2SemanticDataset, collate

    (tmp_path / "2-name2text.txt").write_text(
        "u1\tsil a b\nu2\tsil c\n", encoding="utf-8")
    (tmp_path / "6-name2semantic.tsv").write_text(
        "u1\t" + " ".join(["3"] * 30) + "\nu2\t" + " ".join(["5"] * 10) + "\n",
        encoding="utf-8")
    bert_dir = tmp_path / "3-bert"
    bert_dir.mkdir()
    np.save(bert_dir / "u1.npy", np.ones((3, 1024), np.float32) * 7)

    p2id = {"sil": 1, "a": 2, "b": 3, "c": 4}
    ds = Text2SemanticDataset(str(tmp_path / "2-name2text.txt"),
                              str(tmp_path / "6-name2semantic.tsv"),
                              p2id, bert_dir=str(bert_dir))
    assert len(ds) == 2
    batch = collate([ds[0], ds[1]])
    # u1 has a sidecar, u2 zero-fills (the reference default)
    assert batch["bert_feature"][0, :3].max() == 7.0
    assert batch["bert_feature"][1].max() == 0.0


# ---------------------------------------------------------------- stage 2


def test_normalize_mix_matches_reference_formula():
    from megatts2_hierspeechpp_tpu.cli.prepare_hubert import normalize_mix

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(320) * 0.1).astype(np.float32)
    mix = normalize_mix(wav)
    peak = np.abs(wav).max()
    ref = wav / peak * (0.95 * 0.5 * 32768) + (1 - 0.5) * 32768 * wav
    np.testing.assert_allclose(mix, ref, rtol=1e-6)
    # peak filter (2-get-hubert-wav32k.py:62-64)
    assert normalize_mix(wav * 30.0) is None


def _tiny_hubert_dir(tmp_path):
    import torch
    from transformers import HubertConfig, HubertModel

    d = tmp_path / "hubert"
    torch.manual_seed(0)
    cfg = HubertConfig(hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=64,
                       conv_dim=[16] * 7, conv_kernel=[10, 3, 3, 3, 3, 2, 2],
                       conv_stride=[5, 2, 2, 2, 2, 2, 2],
                       num_conv_pos_embeddings=16,
                       num_conv_pos_embedding_groups=4)
    HubertModel(cfg).eval().save_pretrained(str(d))
    return str(d)


@pytest.mark.slow
def test_prepare_hubert_stage(tmp_path, monkeypatch):
    from megatts2_hierspeechpp_tpu.cli import prepare_hubert as ph

    rng = np.random.default_rng(1)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    wav = (rng.standard_normal(32000) * 3000).astype(np.int16)  # 1 s @ 32 kHz
    wavfile.write(wav_dir / "utt1.wav", 32000, wav)
    filelist = tmp_path / "list.txt"
    filelist.write_text(f"{wav_dir}/utt1.wav|spk|zh|sil a\n", encoding="utf-8")

    opt = tmp_path / "opt"
    monkeypatch.setattr(sys, "argv", [
        "prepare_hubert", "--filelist", str(filelist), "--opt_dir", str(opt),
        "--ssl_ckpt", _tiny_hubert_dir(tmp_path), "--n_heads", "4",
    ])
    ph.main()

    feats = np.load(opt / "4-cnhubert" / "utt1.wav.npy")
    # 1 s -> 16k samples -> 50 Hz SSL frames (HF conv stack: (T-400)//320+1)
    assert feats.shape == ((16000 - 400) // 320 + 1, 32)
    assert np.isfinite(feats).all()
    sr, w32 = wavfile.read(opt / "5-wav32k" / "utt1.wav")
    assert sr == 32000 and w32.dtype == np.int16 and len(w32) == 32000
    # normalized mix, not the raw wav
    assert np.abs(w32).max() > np.abs(wav).max()
