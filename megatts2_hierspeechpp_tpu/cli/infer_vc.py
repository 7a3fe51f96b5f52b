"""Voice conversion CLI (inference_vc.py equivalent)."""
from __future__ import annotations

import argparse
import os

import numpy as np
from scipy.io import wavfile

from megatts2_hierspeechpp_tpu.cli.infer_tts import load_wav_16k
from megatts2_hierspeechpp_tpu.infer.pipeline import load_torch_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--source_speech", required=True)
    p.add_argument("--target_speech", required=True)
    p.add_argument("--output_dir", default="output_vc")
    p.add_argument("--ckpt_voc", required=True)
    p.add_argument("--ckpt_w2v", required=True,
                   help="HF mms-300m state dict (torch)")
    p.add_argument("--ckpt_ttv", default=None)
    p.add_argument("--ckpt_plm", default=None)
    p.add_argument("--ckpt_sr", default=None)
    p.add_argument("--ckpt_denoiser", default=None)
    p.add_argument("--output_sr", type=int, default=16000)
    p.add_argument("--denoise_ratio", type=float, default=0.0)
    p.add_argument("--noise_scale_vc", type=float, default=0.333)
    args = p.parse_args()

    # ttv/plm unused for VC; pipeline builder requires them only for tts()
    from megatts2_hierspeechpp_tpu.infer.pipeline import TTSPipeline
    from megatts2_hierspeechpp_tpu.models import convert as C
    from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder
    from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR
    from megatts2_hierspeechpp_tpu.models.denoiser import MPNet
    from megatts2_hierspeechpp_tpu.models.wav2vec2 import Wav2Vec2
    from megatts2_hierspeechpp_tpu.models.convert import convert_wav2vec2

    voc = HierVocoder()
    voc_params = {"params": C.convert_vocoder(load_torch_checkpoint(args.ckpt_voc))}
    sr_model = sr_params = None
    if args.ckpt_sr:
        num, den = (3, 1) if args.output_sr == 48000 else (3, 2)
        sr_model = SpeechSR(rate_num=num, rate_den=den)
        sr_params = C.convert_speechsr(load_torch_checkpoint(args.ckpt_sr), "dec")
    den_model = den_vars = None
    if args.ckpt_denoiser:
        import torch

        ckpt = torch.load(args.ckpt_denoiser, map_location="cpu", weights_only=True)
        den_model = MPNet()
        den_vars = C.convert_denoiser(ckpt.get("generator", ckpt))

    pipe = TTSPipeline(
        ttv=None, ttv_vars=None, plm=None, plm_params=None,
        vocoder=voc, vocoder_params=voc_params,
        speechsr=sr_model, speechsr_params=sr_params,
        denoiser=den_model, denoiser_vars=den_vars,
    )

    import torch

    w2v_model = Wav2Vec2()
    w2v_params = convert_wav2vec2(
        torch.load(args.ckpt_w2v, map_location="cpu", weights_only=True)
    )

    src = load_wav_16k(args.source_speech)
    trg = load_wav_16k(args.target_speech)
    wav = pipe.vc(src, trg, w2v_model, w2v_params,
                  denoise_ratio=args.denoise_ratio,
                  noise_scale_vc=args.noise_scale_vc,
                  output_sr=args.output_sr)
    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, "converted.wav")
    wavfile.write(out, args.output_sr, (wav * 32767.0).astype(np.int16))
    print(out)


if __name__ == "__main__":
    main()
