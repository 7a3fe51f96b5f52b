"""Vocoder (HierSpeech++) GAN+VAE training CLI.

The reference ships no vocoder trainer (README.md:53); this completes the
capability. Expects sidecar features plus raw 16 kHz wavs; linear specs are
computed on the fly.

Usage: python -m megatts2_hierspeechpp_tpu.cli.train_vocoder -c configs/hierspeechpp.json -m exp_voc
"""
from __future__ import annotations

import argparse
import logging
import os

import jax
import numpy as np

import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.data.dataset import (
    DatasetConfig,
    DistributedBucketSampler,
    SidecarDataset,
)
from megatts2_hierspeechpp_tpu.models.discriminators import MultiPeriodDiscriminator
from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder
from megatts2_hierspeechpp_tpu.ops.stft import linear_spectrogram
from megatts2_hierspeechpp_tpu.parallel.mesh import init_distributed, make_mesh, shard_batch
from megatts2_hierspeechpp_tpu.train import checkpoints as ckpt_lib, vocoder as vt
from megatts2_hierspeechpp_tpu.train.loop import run_training
from megatts2_hierspeechpp_tpu.train.optim import adamw
from megatts2_hierspeechpp_tpu.utils.config import load_hparams, save_hparams


def vocoder_batch(ds: SidecarDataset, idxs, hop=320, pad_multiple=64):
    """Collate (spec, audio, mel, w2v, f0, mask, lengths) for the vocoder.
    Frame dim rounds up to pad_multiple to bound the XLA compile count."""
    from scipy.io import wavfile

    items = [ds[i] for i in idxs]
    wavs = []
    for i in idxs:
        sr, data = wavfile.read(ds.items[i][0])
        wavs.append(data.astype(np.float32) / 32768.0)
    t_max = max(it["w2v"].shape[0] for it in items)
    t_max = ((t_max + pad_multiple - 1) // pad_multiple) * pad_multiple
    b = len(items)
    batch = {
        "audio": np.zeros((b, hop * t_max), np.float32),
        "mel": np.zeros((b, t_max, 80), np.float32),
        "w2v": np.zeros((b, t_max, 1024), np.float32),
        "f0": np.zeros((b, 4 * t_max), np.float32),
        "mask": np.zeros((b, t_max, 1), np.float32),
        "lengths": np.zeros((b,), np.int32),
    }
    for i, (it, wav) in enumerate(zip(items, wavs)):
        t = it["w2v"].shape[0]
        n = min(len(wav), hop * t)
        batch["audio"][i, :n] = wav[:n]
        batch["mel"][i, :t] = it["mel"]
        batch["w2v"][i, :t] = it["w2v"]
        batch["f0"][i, : 4 * t] = it["pitch"][: 4 * t]
        batch["mask"][i, :t] = 1.0
        batch["lengths"][i] = t
    spec = np.asarray(linear_spectrogram(jnp.asarray(batch["audio"])))
    batch["spec"] = spec[:, :t_max]
    return batch


def main():
    logging.basicConfig(level=logging.INFO)
    from megatts2_hierspeechpp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    # Training default: composed stage math. Embedding the fused stage
    # kernels in the GAN train graph costs ~45 min of (uncached) remote XLA
    # compile PER shape bucket on the axon tunnel vs ~6 min composed, for a
    # training step whose B=8 x 32-frame decode slice sees no fusion win.
    # The kernels are numerics-equivalent (custom_vjp backward IS the
    # composed math) so the trained weights serve under the fused kernels
    # unchanged. Override with MEGATTS_FUSED_TRIPLE=1 / _AMPBLOCK=1.
    os.environ.setdefault("MEGATTS_FUSED_TRIPLE", "0")
    os.environ.setdefault("MEGATTS_FUSED_AMPBLOCK", "0")
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-m", "--model", required=True)
    p.add_argument("--logs_dir", default="logs")
    args = p.parse_args()

    hps = load_hparams(args.config)
    model_dir = os.path.join(args.logs_dir, args.model)
    os.makedirs(model_dir, exist_ok=True)
    save_hparams(hps, os.path.join(model_dir, "config.json"))

    init_distributed()
    mesh = make_mesh()

    ds = SidecarDataset(hps.data.get("training_files", "filelists/train_list.txt"),
                        DatasetConfig())
    sampler = DistributedBucketSampler(
        ds.lengths(), hps.train.batch_size * mesh.shape["data"],
        boundaries=[32, 300, 500, 700, 900], num_replicas=jax.process_count(),
        rank=jax.process_index(), seed=hps.train.seed,
    )

    # Compute dtype (params stay fp32) — bf16 default, the TPU analog of
    # HiFi-GAN-style fp16 autocast training.
    dtype = {"bf16": jnp.bfloat16, "fp32": None}[hps.train.get("dtype", "bf16")]
    voc = HierVocoder(
        spec_channels=hps.model.spec_channels,
        inter_channels=hps.model.inter_channels,
        hidden_channels=hps.model.hidden_channels,
        filter_channels=hps.model.filter_channels,
        upsample_rates=tuple(hps.model.upsample_rates),
        upsample_initial_channel=hps.model.upsample_initial_channel,
        upsample_kernel_sizes=tuple(hps.model.upsample_kernel_sizes),
        dtype=dtype,
    )
    disc = MultiPeriodDiscriminator(dtype=dtype)
    tx_g = adamw(hps.train.learning_rate, tuple(hps.train.betas), hps.train.eps,
                 lr_decay=hps.train.lr_decay, steps_per_epoch=1000)
    tx_d = adamw(hps.train.learning_rate, tuple(hps.train.betas), hps.train.eps,
                 lr_decay=hps.train.lr_decay, steps_per_epoch=1000)

    with mesh:
        state = vt.create_state(voc, disc, tx_g, tx_d,
                                jax.random.PRNGKey(hps.train.seed),
                                spec_ch=hps.model.spec_channels)
        restored = ckpt_lib.restore(os.path.join(model_dir, "ckpt"), state)
        if restored is not None:
            state = restored
        train_step = jax.jit(vt.make_train_step(
            voc, disc, tx_g, tx_d,
            segment_frames=hps.train.get("segment_frames", 32),
            c_mel=hps.train.c_mel, c_kl=hps.train.get("c_kl", 1.0),
            c_f0=hps.train.get("c_f0", 1.0),
        ))

        def batches(epoch):
            for idx in sampler.epoch_batches(epoch):
                yield vocoder_batch(ds, idx)

        # held-out full-inference mel-L1 + excitation plots every
        # eval_interval (same observability contract as the s2/s1 CLIs)
        from megatts2_hierspeechpp_tpu.train.evalhooks import make_vocoder_eval_fn

        eval_fn = make_vocoder_eval_fn(
            voc, vocoder_batch(ds, sampler.epoch_batches(0)[0]))

        run_training(
            state, train_step, batches, model_dir,
            epochs=hps.train.epochs, seed=hps.train.seed,
            log_interval=hps.train.log_interval,
            save_interval=hps.train.save_interval,
            shard_fn=lambda b: shard_batch(mesh, b),
            eval_interval=hps.train.get("eval_interval", None),
            eval_fn=eval_fn,
        )


if __name__ == "__main__":
    main()
