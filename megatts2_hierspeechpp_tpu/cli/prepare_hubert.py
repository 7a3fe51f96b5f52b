"""GPT-SoVITS dataset stage 2: SSL-feature + normalized-wav extraction
(prepare_datasets/2-get-hubert-wav32k.py equivalent).

The reference script is dead code as shipped — it imports
`feature_extractor.cnhubert` and `my_utils`, neither of which exists in the
repo (GPT-SoVITS leftovers). This is a working TPU-native equivalent: the
cnhubert-family HF HubertModel runs as the JAX `Hubert` module (oracle-pinned
in tests/test_hubert.py), resampling uses the kaiser-sinc ops, and the odd
32768-scale normalization quirk is replicated exactly
(/root/reference/prepare_datasets/2-get-hubert-wav32k.py:48-76):

  mix   = wav / max(|wav|) * (0.95 * 0.5 * 32768) + 0.5 * 32768 * wav
  skip if max(|wav|) > 2.2; 5-wav32k gets int16(mix); 4-cnhubert gets
  SSL(resample_16k(mix)) — i.e. the SSL model sees +-16k-scale floats, a
  GPT-SoVITS statistical contract the downstream semantic codes depend on.

Outputs per wav `name`: {opt_dir}/4-cnhubert/{name}.npy (T50, hidden) and
{opt_dir}/5-wav32k/{name}.wav (32 kHz int16).
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from scipy.io import wavfile

import jax.numpy as jnp

MAXX = 0.95
ALPHA = 0.5


def normalize_mix(wav: np.ndarray) -> np.ndarray | None:
    """wav float [-1, 1] -> +-32768-scale mix, or None if peak-filtered."""
    peak = np.abs(wav).max()
    if peak > 2.2 or peak == 0.0:
        return None
    return wav / peak * (MAXX * ALPHA * 32768.0) + ((1 - ALPHA) * 32768.0) * wav


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--filelist", required=True,
                   help="lines: wav_path|spk|lang|text (reference filelist "
                        "format); only the wav path is used here")
    p.add_argument("--opt_dir", required=True)
    p.add_argument("--ssl_ckpt", required=True,
                   help="HF HubertModel dir or .bin/.safetensors state dict "
                        "(cnhubert family, base variant)")
    p.add_argument("--n_heads", type=int, default=12,
                   help="attention heads (not recoverable from a state dict)")
    p.add_argument("--shard", default="0/1", help="i/n fan-out")
    args = p.parse_args()
    shard_i, shard_n = (int(v) for v in args.shard.split("/"))

    from megatts2_hierspeechpp_tpu.models.convert import convert_hubert
    from megatts2_hierspeechpp_tpu.models.wav2vec2 import Hubert
    from megatts2_hierspeechpp_tpu.ops.resample import downsample1d, upsample1d

    sd = _load_state_dict(args.ssl_ckpt)
    n_layers = max(int(k.split(".")[2]) for k in sd
                   if k.startswith("encoder.layers.")) + 1
    hidden = sd["feature_projection.projection.bias"].shape[0]
    conv_dim = tuple(
        sd[f"feature_extractor.conv_layers.{i}.conv.weight"].shape[0]
        for i in range(7)
    )
    pos_v = sd.get("encoder.pos_conv_embed.conv.weight_v",
                   sd.get("encoder.pos_conv_embed.conv.parametrizations.weight.original1"))
    model = Hubert(
        hidden_size=hidden, n_layers=n_layers, n_heads=args.n_heads,
        ffn_dim=sd["encoder.layers.0.feed_forward.intermediate_dense.bias"].shape[0],
        conv_dim=conv_dim,
        pos_conv_kernel=pos_v.shape[2],
        pos_conv_groups=hidden // pos_v.shape[1],
    )
    params = convert_hubert(sd, n_layers=n_layers)

    hubert_dir = os.path.join(args.opt_dir, "4-cnhubert")
    wav32_dir = os.path.join(args.opt_dir, "5-wav32k")
    os.makedirs(hubert_dir, exist_ok=True)
    os.makedirs(wav32_dir, exist_ok=True)

    import jax

    @jax.jit
    def ssl_features(wav16):
        return model.apply({"params": params}, wav16)

    with open(args.filelist, encoding="utf-8") as f:
        lines = [ln.strip() for ln in f if ln.strip()]

    for idx, line in enumerate(lines):
        if idx % shard_n != shard_i:
            continue
        wav_path = line.split("|")[0]
        name = os.path.basename(wav_path)
        out_feat = os.path.join(hubert_dir, name + ".npy")
        if os.path.exists(out_feat):
            continue
        sr, data = wavfile.read(wav_path)
        wav = data.astype(np.float32)
        if data.dtype.kind == "i":
            # scale by the source width (int16/int32/...), not a fixed 2^15 —
            # int32 PCM would otherwise blow past the peak filter below
            wav = wav / float(2 ** (8 * data.dtype.itemsize - 1))
        elif data.dtype.kind == "u":  # uint8 PCM: offset-binary
            wav = (wav - 128.0) / 128.0
        # bring to 32 kHz with the anti-aliased kaiser-sinc ops (B, T, C)
        if sr != 32000:
            x = jnp.asarray(wav)[None, :, None]
            if sr == 16000:
                x = upsample1d(x, 2)
            elif sr % 32000 == 0:
                x = downsample1d(x, sr // 32000)
            else:
                print("skip (sr %d not 16k/32k-divisible): %s" % (sr, wav_path))
                continue
            wav = np.asarray(x)[0, :, 0]
        mix = normalize_mix(wav)
        if mix is None:
            print("filtered (peak): %s" % wav_path)
            continue
        # SSL input: 16 kHz resample of the +-32768-scale mix (quirk kept)
        w16 = downsample1d(jnp.asarray(mix, jnp.float32)[None, :, None], 2)[0, :, 0]
        feats = np.asarray(ssl_features(w16[None]))[0]
        if not np.isfinite(feats).all():
            print("nan-filtered: %s" % wav_path)
            continue
        wavfile.write(os.path.join(wav32_dir, name), 32000,
                      np.clip(mix, -32768, 32767).astype(np.int16))
        np.save(out_feat, feats.astype(np.float32))
        print("done:", name)


def _load_state_dict(path: str):
    import torch

    if os.path.isdir(path):
        for cand in ("pytorch_model.bin", "model.safetensors"):
            full = os.path.join(path, cand)
            if os.path.exists(full):
                path = full
                break
    if path.endswith(".safetensors"):
        from safetensors.torch import load_file

        sd = load_file(path)
    else:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k.removeprefix("hubert."): v for k, v in sd.items()}


if __name__ == "__main__":
    main()
