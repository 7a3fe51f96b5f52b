"""Sidecar feature extraction CLI (extract_mel.py / extract_f0.py /
extract_w2v.py equivalents, batched on the accelerator).

Walks a directory tree, and for every .wav writes (idempotently):
  .hmel.npy  (80, T)    log-mel (MelSpectrogramFixed convention)
  .hf0.npy   (4T,)      200 Hz f0 (YIN; reference used YAAPT)
  .hw2v.npy  (1024, T)  wav2vec2 layer-7 features (needs --w2v_ckpt)
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from scipy.io import wavfile

import jax.numpy as jnp


def find_wavs(root: str):
    for base, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".wav"):
                yield os.path.join(base, f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav_dir", required=True)
    p.add_argument("--w2v_ckpt", default=None,
                   help="HF Wav2Vec2ForPreTraining .bin/.safetensors state dict "
                        "(torch) for mms-300m; skip w2v extraction if absent")
    p.add_argument("--skip_mel", action="store_true")
    p.add_argument("--skip_f0", action="store_true")
    p.add_argument("--shard", default="0/1",
                   help="i/n: process every n-th file starting at i "
                        "(prepare_datasets/0-pipeline.py-style fan-out)")
    args = p.parse_args()
    shard_i, shard_n = (int(v) for v in args.shard.split("/"))

    from megatts2_hierspeechpp_tpu.ops.f0 import yin_f0
    from megatts2_hierspeechpp_tpu.ops.stft import mel_spectrogram_fixed

    w2v_model = w2v_params = None
    if args.w2v_ckpt:
        import torch

        from megatts2_hierspeechpp_tpu.models.convert import convert_wav2vec2
        from megatts2_hierspeechpp_tpu.models.wav2vec2 import Wav2Vec2

        sd = torch.load(args.w2v_ckpt, map_location="cpu", weights_only=True)
        w2v_model = Wav2Vec2()
        w2v_params = convert_wav2vec2(sd)

    for idx, path in enumerate(sorted(find_wavs(args.wav_dir))):
        if idx % shard_n != shard_i:
            continue
        sr, data = wavfile.read(path)
        if sr != 16000:
            print("skip (not 16k):", path)
            continue
        audio = data.astype(np.float32) / 32768.0
        x = jnp.asarray(audio)[None]

        mel_path = path.replace(".wav", ".hmel.npy")
        if not args.skip_mel and not os.path.exists(mel_path):
            mel = np.asarray(mel_spectrogram_fixed(x))[0].T  # (80, T)
            np.save(mel_path, mel)

        f0_path = path.replace(".wav", ".hf0.npy")
        if not args.skip_f0 and not os.path.exists(f0_path):
            f0 = np.asarray(yin_f0(x))[0]
            np.save(f0_path, f0)

        w2v_path = path.replace(".wav", ".hw2v.npy")
        if w2v_model is not None and not os.path.exists(w2v_path):
            xp = jnp.pad(x, ((0, 0), (40, 40)), mode="reflect")
            feats = np.asarray(
                w2v_model.apply({"params": w2v_params}, xp)
            )[0].T  # (1024, T)
            np.save(w2v_path, feats)
        print("done:", path)


if __name__ == "__main__":
    main()
