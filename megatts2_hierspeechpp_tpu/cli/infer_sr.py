"""Super-resolution-only CLI (inference_speechsr.py equivalent)."""
from __future__ import annotations

import argparse
import os

import numpy as np
from scipy.io import wavfile

import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.cli.infer_tts import load_wav_16k
from megatts2_hierspeechpp_tpu.infer.pipeline import load_torch_checkpoint
from megatts2_hierspeechpp_tpu.models.convert import convert_speechsr
from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_speech", required=True)
    p.add_argument("--output_dir", default="output_sr")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--output_sr", type=int, default=48000, choices=[24000, 48000])
    args = p.parse_args()

    num, den = (3, 1) if args.output_sr == 48000 else (3, 2)
    model = SpeechSR(rate_num=num, rate_den=den)
    params = {"params": convert_speechsr(load_torch_checkpoint(args.ckpt), "dec")}

    audio = load_wav_16k(args.input_speech)
    up = model.apply(params, jnp.asarray(audio)[None, :, None])
    wav = np.asarray(up)[0, :, 0]
    wav = wav / max(np.abs(wav).max(), 1e-8) * 0.999

    os.makedirs(args.output_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(args.input_speech))[0]
    out = os.path.join(args.output_dir, f"{name}_{args.output_sr}.wav")
    wavfile.write(out, args.output_sr, (wav * 32767.0).astype(np.int16))
    print(out)


if __name__ == "__main__":
    main()
