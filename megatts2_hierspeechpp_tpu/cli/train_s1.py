"""s1-stage (prosody LM) training CLI (train_ms_s1.py equivalent).

Usage: python -m megatts2_hierspeechpp_tpu.cli.train_s1 -c configs/config.json \
         -m exp_s1 --s2_ckpt logs/exp_s2/ckpt
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
from megatts2_hierspeechpp_tpu.models.plm import ProsodyLM
from megatts2_hierspeechpp_tpu.models.ttv import TTVModel
from megatts2_hierspeechpp_tpu.parallel.mesh import init_distributed, make_mesh, shard_batch
from megatts2_hierspeechpp_tpu.train import checkpoints as ckpt_lib
from megatts2_hierspeechpp_tpu.train.loop import run_training
from megatts2_hierspeechpp_tpu.train.optim import adamw
from megatts2_hierspeechpp_tpu.train.s1 import create_state, make_train_step
from megatts2_hierspeechpp_tpu.utils.config import load_hparams, save_hparams


def load_s2_vars(s2_ckpt: str, ttv: TTVModel, example_batch, hps):
    """Restore frozen s2 variables from an s2 training checkpoint dir or a
    converted reference .pth."""
    if s2_ckpt.endswith(".pth"):
        from megatts2_hierspeechpp_tpu.infer.pipeline import load_torch_checkpoint
        from megatts2_hierspeechpp_tpu.models.convert import convert_ttv

        return convert_ttv(load_torch_checkpoint(s2_ckpt))
    from megatts2_hierspeechpp_tpu.models.discriminators import (
        MultiResSpecDiscriminator,
    )
    from megatts2_hierspeechpp_tpu.train.optim import adamw as _adamw
    from megatts2_hierspeechpp_tpu.train.s2 import create_state as s2_state

    # the example optimizer must have the SAME optax state structure the s2
    # trainer used (schedule vs constant lr differ), else orbax rejects it
    tx = _adamw(hps.train.learning_rate, tuple(hps.train.betas), hps.train.eps,
                lr_decay=hps.train.lr_decay, steps_per_epoch=1000)
    st = s2_state(ttv, MultiResSpecDiscriminator(), tx, tx,
                  jax.random.PRNGKey(0), example_batch)
    restored = ckpt_lib.restore(s2_ckpt, st)
    if restored is None:
        raise FileNotFoundError(f"no s2 checkpoint under {s2_ckpt}")
    return {"params": restored.params_g, "vq": restored.vq}


def main():
    logging.basicConfig(level=logging.INFO)
    from megatts2_hierspeechpp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-m", "--model", required=True)
    p.add_argument("--s2_ckpt", required=True)
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
    sampler = DistributedBucketSampler(
        ds.lengths(), hps.train.batch_size * mesh.shape["data"],
        boundaries=[32, 300, 400, 500, 600, 700, 800, 900, 1000],
        num_replicas=jax.process_count(), rank=jax.process_index(),
        seed=hps.train.seed,
    )

    # Compute dtype (params stay fp32); reference s1 trains under fp16
    # autocast (train_ms_s1.py), bf16 is the TPU analog.
    import jax.numpy as jnp
    dtype = {"bf16": jnp.bfloat16, "fp32": None}[hps.train.get("dtype", "bf16")]
    ttv = TTVModel(n_vocab=text_frontend.N_VOCAB, n_tone=text_frontend.N_TONE,
                   n_language=text_frontend.N_LANGUAGE, dtype=dtype)
    plm = ProsodyLM(dtype=dtype)
    # coarse frame buckets (see train_s2.py): bound the per-run compile count
    from functools import partial
    pad = int(hps.train.get("pad_multiple", 64))
    collate_fn = partial(collate, pad_multiple=pad)

    first = collate_fn([ds[i] for i in sampler.epoch_batches(0)[0]])
    ttv_vars = load_s2_vars(args.s2_ckpt, ttv, first, hps)

    tx = adamw(hps.train.learning_rate, tuple(hps.train.betas), hps.train.eps,
               lr_decay=hps.train.lr_decay, steps_per_epoch=1000)

    with mesh:
        state = create_state(plm, tx, jax.random.PRNGKey(hps.train.seed), ttv_vars)
        restored = ckpt_lib.restore(os.path.join(model_dir, "ckpt"), state)
        if restored is not None:
            state = restored
            logging.info("resumed at step %d", int(np.asarray(state.step)))
        train_step = jax.jit(make_train_step(ttv, plm, tx))

        def batches(epoch):
            for idx in sampler.epoch_batches(epoch):
                yield collate_fn([ds[i] for i in idx])

        # held-out PLM loss/acc every eval_interval (train_ms_s1.py:288-295)
        from megatts2_hierspeechpp_tpu.cli._evalsetup import make_eval_batch
        from megatts2_hierspeechpp_tpu.train.evalhooks import make_s1_eval_fn

        eval_fn = make_s1_eval_fn(ttv, plm,
                                  make_eval_batch(hps, fallback=first, cfg=ds_cfg))

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
