"""s2-stage training CLI (train_ms.py equivalent).

Usage: python -m megatts2_hierspeechpp_tpu.cli.train_s2 -c configs/config.json -m exp_s2
"""
from __future__ import annotations

import argparse
import logging
import os

import jax
import numpy as np

from megatts2_hierspeechpp_tpu.data import text as text_frontend
from megatts2_hierspeechpp_tpu.data.dataset import (
    DatasetConfig,
    DistributedBucketSampler,
    SidecarDataset,
    collate,
)
from megatts2_hierspeechpp_tpu.models.discriminators import MultiResSpecDiscriminator
from megatts2_hierspeechpp_tpu.models.ttv import TTVModel
from megatts2_hierspeechpp_tpu.ops.kmeans import init_rvq_state
from megatts2_hierspeechpp_tpu.parallel.mesh import (
    init_distributed,
    make_mesh,
    shard_batch,
)
from megatts2_hierspeechpp_tpu.train import checkpoints as ckpt_lib
from megatts2_hierspeechpp_tpu.train.loop import run_training
from megatts2_hierspeechpp_tpu.train.optim import adamw
from megatts2_hierspeechpp_tpu.train.s2 import create_state, make_train_step
from megatts2_hierspeechpp_tpu.utils.config import load_hparams, save_hparams


def main():
    logging.basicConfig(level=logging.INFO)
    from megatts2_hierspeechpp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
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

    ds_cfg = DatasetConfig()
    ds = SidecarDataset(hps.data.training_files, ds_cfg)
    logging.info("dataset size: %d", len(ds))
    sampler = DistributedBucketSampler(
        ds.lengths(),
        hps.train.batch_size * mesh.shape["data"],
        boundaries=[32, 300, 400, 500, 600, 700, 800, 900, 1000],
        num_replicas=jax.process_count(),
        rank=jax.process_index(),
        seed=hps.train.seed,
    )

    # Compute dtype (params stay fp32). The reference trains under fp16
    # autocast (train_ms.py:175); bf16 is the TPU-faithful analog and is
    # ~5x faster per step (the fp32 MRSD dominates at HIGHEST precision).
    import jax.numpy as jnp
    dtype = {"bf16": jnp.bfloat16, "fp32": None}[hps.train.get("dtype", "bf16")]
    ttv = TTVModel(
        n_vocab=text_frontend.N_VOCAB,
        n_tone=text_frontend.N_TONE,
        n_language=text_frontend.N_LANGUAGE,
        dtype=dtype,
    )
    disc = MultiResSpecDiscriminator(dtype=dtype)
    steps_per_epoch = max(sum(len(b) for b in sampler.epoch_batches(0)), 1)
    tx_g = adamw(hps.train.learning_rate, tuple(hps.train.betas), hps.train.eps,
                 lr_decay=hps.train.lr_decay, steps_per_epoch=steps_per_epoch)
    tx_d = adamw(hps.train.learning_rate, tuple(hps.train.betas), hps.train.eps,
                 lr_decay=hps.train.lr_decay, steps_per_epoch=steps_per_epoch)

    # coarse frame buckets: each distinct padded shape is a separate XLA
    # compile, so CLI collation rounds frame dims to pad_multiple (64 ~= 1.28 s
    # of padding worst-case) to keep the compile count to a handful per run
    from functools import partial
    pad = int(hps.train.get("pad_multiple", 64))
    collate_fn = partial(collate, pad_multiple=pad)

    first = collate_fn([ds[i] for i in sampler.epoch_batches(0)[0]])
    with mesh:
        state = create_state(ttv, disc, tx_g, tx_d, jax.random.PRNGKey(hps.train.seed), first)

        # k-means VQ init from the first batch's pooled prosody features
        restored = ckpt_lib.restore(os.path.join(model_dir, "ckpt"), state)
        if restored is not None:
            state = restored
            logging.info("resumed at step %d", int(np.asarray(state.step)))
        else:
            # fit k-means on the TRUE quantizer inputs of the first batch
            # (plm_conv1 -> pool8 -> plm_conv2 at step-0 params), matching the
            # reference's in-forward kmeans_init; masked frames excluded
            feats, pool_mask = ttv.apply(
                {"params": state.params_g, "vq": state.vq},
                jax.numpy.asarray(first["mel"]),
                jax.numpy.asarray(first["mel_lengths"]),
                method=TTVModel.pre_vq_features,
            )
            keep = np.asarray(pool_mask)[..., 0].reshape(-1) > 0
            samples = np.asarray(feats).reshape(-1, feats.shape[-1])[keep]
            new_vq = init_rvq_state(state.vq["quantizer"], samples,
                                    seed=hps.train.seed)
            state = state.replace(vq={"quantizer": new_vq})
            logging.info("k-means initialized RVQ codebooks")

        train_step = jax.jit(make_train_step(
            ttv, disc, tx_g, tx_d,
            c_mel=hps.train.c_mel, c_commit=hps.train.get("c_commit", 100.0),
        ))

        def batches(epoch):
            for idx in sampler.epoch_batches(epoch):
                yield collate_fn([ds[i] for i in idx])

        # periodic eval on a held-out batch (reference evaluate() + TB
        # images every eval_interval, train_ms.py:345-405)
        from megatts2_hierspeechpp_tpu.cli._evalsetup import make_eval_batch
        from megatts2_hierspeechpp_tpu.train.evalhooks import make_s2_eval_fn

        eval_batch = make_eval_batch(hps, fallback=first, cfg=ds_cfg)
        eval_fn = make_s2_eval_fn(ttv, eval_batch)

        steps_done = int(np.asarray(state.step))
        per_epoch = max(len(sampler.epoch_batches(0)), 1)
        run_training(
            state, train_step, batches, model_dir,
            epochs=hps.train.epochs, seed=hps.train.seed,
            log_interval=hps.train.log_interval,
            save_interval=hps.train.save_interval,
            shard_fn=lambda b: shard_batch(mesh, b),
            start_epoch=steps_done // per_epoch,
            eval_interval=hps.train.get("eval_interval", None),
            eval_fn=eval_fn,
        )


if __name__ == "__main__":
    main()
