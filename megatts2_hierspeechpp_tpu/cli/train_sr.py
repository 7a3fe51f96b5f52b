"""SpeechSR (16 kHz -> 24/48 kHz) GAN training CLI.

Training-recipe parity with the reference's speechsr configs
(/root/reference/speechsr48k/config.json: segment 9600 @ 48 kHz i.e. 3200 @
16 kHz input, c_mel 45, AdamW lr 1e-4 betas (0.8, 0.99), lr decay 0.995 per
epoch) and its in-file discriminator bank (6 STFT resolutions + 5 periods,
/root/reference/speechsr48k/speechsr.py:116-212) over train/speechsr.py.

Data: raw 16 kHz wavs listed by --data_dir/train_list.txt (the synth corpus
layout). Hi-rate ground truth is polyphase-resampled on the host at load —
the synthetic corpus is bandlimited (harmonics < 2 kHz), so the resampled
target is exact up to the anti-aliasing filter and the SR losses genuinely
converge. For real corpora point --hi_dir at native-rate wavs instead.

Usage: python -m megatts2_hierspeechpp_tpu.cli.train_sr \
         --data_dir /tmp/synth_corpus -m sr_long --out_sr 48000
"""
from __future__ import annotations

import argparse
import logging
import os

import jax
import numpy as np

from megatts2_hierspeechpp_tpu.models.discriminators import (
    SPEECHSR48_RESOLUTIONS,
    VOCODER_RESOLUTIONS,
    MultiPeriodDiscriminator,
)
from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR
from megatts2_hierspeechpp_tpu.parallel.mesh import (
    init_distributed,
    make_mesh,
    shard_batch,
)
from megatts2_hierspeechpp_tpu.train import checkpoints as ckpt_lib
from megatts2_hierspeechpp_tpu.train import speechsr as srt
from megatts2_hierspeechpp_tpu.train.loop import run_training
from megatts2_hierspeechpp_tpu.train.optim import adamw

SR_IN = 16000


def load_corpus(data_dir: str, hi_dir: str | None, num: int, den: int):
    """Returns (lo_wavs, hi_wavs) float32 lists with len(hi) = len(lo)*num/den."""
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    trans = os.path.join(data_dir, "trans.txt")
    if os.path.exists(trans):
        # synth-corpus layout: `wav_path|spk|text` lines
        paths = [l.split("|")[0].strip() for l in open(trans) if l.strip()]
    else:
        paths = sorted(
            os.path.join(data_dir, f) for f in os.listdir(data_dir)
            if f.endswith(".wav")
        )
    lo_wavs, hi_wavs = [], []
    for p in paths:
        _, data = wavfile.read(p)
        lo = data.astype(np.float32) / 32768.0
        # keep lo a multiple of den so the resampled length is exactly
        # len(lo) * num / den and segment starts align sample-exactly
        lo = lo[: len(lo) - (len(lo) % den)] if den > 1 else lo
        if hi_dir is not None:
            _, hi = wavfile.read(
                os.path.join(hi_dir, os.path.basename(p)))
            hi = hi.astype(np.float32) / 32768.0
            hi = hi[: len(lo) * num // den]
        else:
            hi = resample_poly(lo.astype(np.float64), num, den).astype(np.float32)
        lo_wavs.append(lo)
        hi_wavs.append(hi)
    return lo_wavs, hi_wavs


def make_batch_iter(lo_wavs, hi_wavs, batch_size: int, seg_in: int,
                    num: int, den: int, seed: int, steps_per_epoch: int):
    def batches(epoch: int):
        rng = np.random.default_rng((seed, epoch))
        seg_out = seg_in * num // den
        for _ in range(steps_per_epoch):
            lo = np.zeros((batch_size, seg_in, 1), np.float32)
            hi = np.zeros((batch_size, seg_out, 1), np.float32)
            for b in range(batch_size):
                i = int(rng.integers(len(lo_wavs)))
                w = lo_wavs[i]
                max_start = max(1, (len(w) - seg_in) // den)
                s = int(rng.integers(max_start)) * den
                seg = w[s : s + seg_in]
                lo[b, : len(seg), 0] = seg
                h = hi_wavs[i][s * num // den : s * num // den + seg_out]
                hi[b, : len(h), 0] = h
            yield {"lo": lo, "hi": hi}

    return batches


def main():
    logging.basicConfig(level=logging.INFO)
    from megatts2_hierspeechpp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--hi_dir", default=None,
                   help="native hi-rate wavs (else polyphase-resample lo)")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("--logs_dir", default="logs")
    p.add_argument("--out_sr", type=int, default=48000, choices=(24000, 48000))
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--steps_per_epoch", type=int, default=40)
    p.add_argument("--seg_in", type=int, default=3200,
                   help="16 kHz input segment (ref: 9600 @ 48k target)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_decay", type=float, default=0.995)
    p.add_argument("--c_mel", type=float, default=45.0)
    p.add_argument("--ch", type=int, default=32,
                   help="upsample_initial_channel (ref speechsr: 32)")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--eval_interval", type=int, default=50)
    args = p.parse_args()

    num, den = (3, 1) if args.out_sr == 48000 else (3, 2)
    model_dir = os.path.join(args.logs_dir, args.model)
    os.makedirs(model_dir, exist_ok=True)

    init_distributed()
    mesh = make_mesh()

    lo_wavs, hi_wavs = load_corpus(args.data_dir, args.hi_dir, num, den)
    logging.info("SR corpus: %d wavs (out_sr=%d)", len(lo_wavs), args.out_sr)

    # per-device batch scales with the data axis (same convention as the
    # other trainer CLIs)
    global_bs = args.batch_size * mesh.shape["data"]

    gen = SpeechSR(upsample_initial_channel=args.ch, rate_num=num, rate_den=den)
    # discriminator bank per target rate: the 48k recipe adds a 4096-FFT
    # resolution (/root/reference/speechsr48k/speechsr.py:193-194) that the
    # 24k recipe does not have (/root/reference/speechsr24k/speechsr.py:194)
    disc = MultiPeriodDiscriminator(
        resolutions=tuple(SPEECHSR48_RESOLUTIONS if args.out_sr == 48000
                          else VOCODER_RESOLUTIONS))
    tx_g = adamw(args.lr, lr_decay=args.lr_decay,
                 steps_per_epoch=args.steps_per_epoch)
    tx_d = adamw(args.lr, lr_decay=args.lr_decay,
                 steps_per_epoch=args.steps_per_epoch)

    with mesh:
        state = srt.create_state(gen, disc, tx_g, tx_d,
                                 jax.random.PRNGKey(args.seed),
                                 seg_in=args.seg_in)
        restored = ckpt_lib.restore(os.path.join(model_dir, "ckpt"), state)
        if restored is not None:
            state = restored
        train_step = jax.jit(srt.make_train_step(
            gen, disc, tx_g, tx_d, c_mel=args.c_mel, sr_out=args.out_sr))

        batches = make_batch_iter(
            lo_wavs, hi_wavs, global_bs, args.seg_in, num, den,
            args.seed, args.steps_per_epoch)

        # held-out eval: fixed segments from the last few wavs (tiny-corpus
        # observability, not model selection — same caveat as train_ar)
        from megatts2_hierspeechpp_tpu.train.evalhooks import make_sr_eval_fn

        ev_rng = np.random.default_rng(args.seed + 999)
        seg_out = args.seg_in * num // den
        ev_lo = np.zeros((4, args.seg_in, 1), np.float32)
        ev_hi = np.zeros((4, seg_out, 1), np.float32)
        for b in range(4):
            i = len(lo_wavs) - 1 - (b % min(4, len(lo_wavs)))
            s = int(ev_rng.integers(max(1, (len(lo_wavs[i]) - args.seg_in) // den))) * den
            seg = lo_wavs[i][s : s + args.seg_in]
            ev_lo[b, : len(seg), 0] = seg
            h = hi_wavs[i][s * num // den : s * num // den + seg_out]
            ev_hi[b, : len(h), 0] = h
        eval_fn = make_sr_eval_fn(gen, {"lo": ev_lo, "hi": ev_hi}, args.out_sr)

        run_training(
            state, train_step, batches, model_dir,
            epochs=args.epochs, seed=args.seed,
            log_interval=10, save_interval=200,
            shard_fn=lambda b: shard_batch(mesh, b),
            eval_interval=args.eval_interval, eval_fn=eval_fn,
        )


if __name__ == "__main__":
    main()
