"""MP-SENet denoiser training CLI.

Training-recipe parity with the MP-SENet loss surface the reference embeds
(/root/reference/denoiser/generator.py:150-170: compressed-magnitude MSE,
anti-wrapping ip/gd/iaf phase losses, complex MSE, time L1) over
train/denoiser.py. The reference ships the denoiser inference-only; this CLI
completes the training capability (PARITY.md).

Data: clean 16 kHz wavs from --data_dir (synth-corpus layout); noisy inputs
are synthesized per segment at a random SNR in [--snr_lo, --snr_hi] dB from
white + pink-ish noise — the standard additive-noise recipe (VoiceBank-DEMAND
stand-in; the real pairing is a corpus choice, not a framework feature).

Usage: python -m megatts2_hierspeechpp_tpu.cli.train_denoiser \
         --data_dir /tmp/synth_corpus -m dn_long
"""
from __future__ import annotations

import argparse
import logging
import os

import jax
import numpy as np

from megatts2_hierspeechpp_tpu.models.denoiser import MPNet
from megatts2_hierspeechpp_tpu.parallel.mesh import (
    init_distributed,
    make_mesh,
    shard_batch,
)
from megatts2_hierspeechpp_tpu.train import checkpoints as ckpt_lib
from megatts2_hierspeechpp_tpu.train import denoiser as dnt
from megatts2_hierspeechpp_tpu.train.loop import run_training
from megatts2_hierspeechpp_tpu.train.optim import adamw


def load_wavs(data_dir: str):
    from scipy.io import wavfile

    paths = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir)
        if f.endswith(".wav")
    )
    return [wavfile.read(p)[1].astype(np.float32) / 32768.0 for p in paths]


def _noise_like(rng: np.random.Generator, n: int) -> np.ndarray:
    """White + first-order-lowpassed (pink-ish) mixture, unit-ish power."""
    white = rng.standard_normal(n).astype(np.float32)
    low = np.copy(white)
    for _ in range(1):  # one smoothing pass: -6 dB/oct-ish tilt
        low[1:] = 0.7 * low[:-1] + 0.3 * low[1:]
    mix = 0.6 * white + 0.4 * low
    return mix / max(np.std(mix), 1e-6)


def make_batch_iter(wavs, batch_size: int, seg: int, snr_lo: float,
                    snr_hi: float, seed: int, steps_per_epoch: int):
    def batches(epoch: int):
        rng = np.random.default_rng((seed, epoch))
        for _ in range(steps_per_epoch):
            clean = np.zeros((batch_size, seg), np.float32)
            noisy = np.zeros((batch_size, seg), np.float32)
            for b in range(batch_size):
                w = wavs[int(rng.integers(len(wavs)))]
                s = int(rng.integers(max(1, len(w) - seg)))
                c = w[s : s + seg]
                clean[b, : len(c)] = c
                snr_db = rng.uniform(snr_lo, snr_hi)
                p_sig = max(np.mean(np.square(c)), 1e-8)
                sigma = np.sqrt(p_sig / (10.0 ** (snr_db / 10.0)))
                noisy[b] = clean[b] + sigma * _noise_like(rng, seg)
            yield {"clean": clean, "noisy": noisy}

    return batches


def main():
    logging.basicConfig(level=logging.INFO)
    from megatts2_hierspeechpp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("-m", "--model", required=True)
    p.add_argument("--logs_dir", default="logs")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--steps_per_epoch", type=int, default=40)
    p.add_argument("--seg", type=int, default=32000, help="2 s @ 16 kHz")
    p.add_argument("--snr_lo", type=float, default=0.0)
    p.add_argument("--snr_hi", type=float, default=15.0)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--lr_decay", type=float, default=0.99)
    p.add_argument("--dense_channel", type=int, default=64,
                   help="MP-SENet width (ref: 64)")
    p.add_argument("--attn_chunk", type=int, default=64,
                   help="q-chunk size for the exact chunked attention "
                        "(training memory; 0 = dense)")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--eval_interval", type=int, default=50)
    args = p.parse_args()

    model_dir = os.path.join(args.logs_dir, args.model)
    os.makedirs(model_dir, exist_ok=True)

    init_distributed()
    mesh = make_mesh()

    wavs = load_wavs(args.data_dir)
    # genuine held-out split: the last 4 wavs feed ONLY the eval batch, so
    # eval/snr_improvement_db measures generalization (ADVICE r3 — the eval
    # segments previously overlapped training data)
    if len(wavs) > 4:
        ev_wavs, wavs = wavs[-4:], wavs[:-4]
    else:  # tiny-corpus fallback: overlapping, observability-only
        ev_wavs = wavs
    logging.info("denoiser corpus: %d train wavs, %d held-out", len(wavs),
                 len(ev_wavs))

    n_fft, hop, win = 400, 100, 400
    # Training-memory path: remat each TS block AND q-chunk the attention
    # (exact — full key axis per chunk). Dense attention backward of ONE
    # block at B=8 x 2 s wants ~33 GB on a 16 GB chip (BASELINE.md r4), so
    # both knobs are needed to train the reference's segment recipe.
    model = MPNet(dense_channel=args.dense_channel, remat=True,
                  attn_chunk=args.attn_chunk or None)
    tx = adamw(args.lr, lr_decay=args.lr_decay,
               steps_per_epoch=args.steps_per_epoch, max_grad_norm=5.0)

    t_frames = args.seg // hop + 1
    with mesh:
        state = dnt.create_state(model, tx, jax.random.PRNGKey(args.seed),
                                 t=t_frames, f=n_fft // 2 + 1)
        restored = ckpt_lib.restore(os.path.join(model_dir, "ckpt"), state)
        if restored is not None:
            state = restored
        train_step = jax.jit(dnt.make_train_step(model, tx, n_fft=n_fft,
                                                 hop=hop, win=win))

        # per-device batch scales with the data axis (CLI convention)
        batches = make_batch_iter(wavs, args.batch_size * mesh.shape["data"],
                                  args.seg, args.snr_lo, args.snr_hi,
                                  args.seed, args.steps_per_epoch)

        from megatts2_hierspeechpp_tpu.train.evalhooks import (
            make_denoiser_eval_fn,
        )

        # fixed held-out eval batch at a fixed 5 dB SNR so the curve is
        # comparable across evals
        ev = next(make_batch_iter(ev_wavs, 4, args.seg, 5.0, 5.0,
                                  args.seed + 999, 1)(0))
        eval_fn = make_denoiser_eval_fn(model, ev, n_fft=n_fft, hop=hop,
                                        win=win)

        run_training(
            state, train_step, batches, model_dir,
            epochs=args.epochs, seed=args.seed,
            log_interval=10, save_interval=200,
            shard_fn=lambda b: shard_batch(mesh, b),
            eval_interval=args.eval_interval, eval_fn=eval_fn,
        )


if __name__ == "__main__":
    main()
