"""Semantic-code extraction CLI (3-get-semantic-s.py equivalent).

Walks a directory tree and for every `.hmel.npy` sidecar writes a
`.semantic.npy` of RVQ prosody-code ids using a trained s2 acoustic model
(TTVModel.extract_latent path: mel[:20] -> plm convs -> pool8 -> RVQ encode).
Also writes the AR-stack style `6-name2semantic.tsv` if --tsv_out is given.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mel_dir", required=True)
    p.add_argument("--s2_ckpt", required=True,
                   help="reference ttv .pth or an s2 checkpoint dir")
    p.add_argument("--tsv_out", default=None)
    args = p.parse_args()

    from megatts2_hierspeechpp_tpu.data import text as tf
    from megatts2_hierspeechpp_tpu.models.ttv import TTVModel

    ttv = TTVModel(n_vocab=tf.N_VOCAB, n_tone=tf.N_TONE, n_language=tf.N_LANGUAGE)
    if args.s2_ckpt.endswith(".pth"):
        from megatts2_hierspeechpp_tpu.infer.pipeline import load_torch_checkpoint
        from megatts2_hierspeechpp_tpu.models.convert import convert_ttv

        variables = convert_ttv(load_torch_checkpoint(args.s2_ckpt))
    else:
        raise SystemExit("pass a reference ttv .pth (dir restore: use train_s1)")

    @jax.jit
    def extract(mel):
        # mel: (1, T, 80) -> pooled-rate RVQ code ids
        lengths = jnp.full((1,), mel.shape[1], jnp.int32)
        return ttv.apply(variables, mel, lengths,
                         method=TTVModel.pooled_prosody_codes)

    rows = []
    for base, _dirs, files in os.walk(args.mel_dir):
        for f in files:
            if not f.endswith(".hmel.npy"):
                continue
            path = os.path.join(base, f)
            out_path = path.replace(".hmel.npy", ".semantic.npy")
            mel = np.load(path).astype(np.float32)
            if mel.shape[0] == 80:
                mel = mel.T
            t8 = (mel.shape[0] // 8) * 8
            codes = np.asarray(extract(jnp.asarray(mel[None, :t8])))[0]
            np.save(out_path, codes.astype(np.int32))
            rows.append((os.path.splitext(f)[0].replace(".hmel", ""),
                         " ".join(map(str, codes.tolist()))))
            print(out_path)

    if args.tsv_out:
        with open(args.tsv_out, "w", encoding="utf-8") as fh:
            for name, seq in rows:
                fh.write(f"{name}\t{seq}\n")


if __name__ == "__main__":
    main()
