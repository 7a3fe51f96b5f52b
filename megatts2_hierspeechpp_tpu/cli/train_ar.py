"""AR (GPT-SoVITS text-to-semantic) training CLI — s1_train.py equivalent.

Usage: python -m megatts2_hierspeechpp_tpu.cli.train_ar \
         --phoneme_path 2-name2text.txt --semantic_path 6-name2semantic.tsv -m exp_ar
"""
from __future__ import annotations

import argparse
import logging
import os

import jax

from megatts2_hierspeechpp_tpu.ar.dataset import Text2SemanticDataset, collate
from megatts2_hierspeechpp_tpu.ar.scaled_adam import scaled_adam, warmup_cosine_schedule
from megatts2_hierspeechpp_tpu.ar.t2s import Text2Semantic
from megatts2_hierspeechpp_tpu.ar.trainer import create_state, make_train_step
from megatts2_hierspeechpp_tpu.data import text as text_frontend
from megatts2_hierspeechpp_tpu.data.dataset import DistributedBucketSampler
from megatts2_hierspeechpp_tpu.parallel.mesh import init_distributed, make_mesh, shard_batch
from megatts2_hierspeechpp_tpu.train import checkpoints as ckpt_lib
from megatts2_hierspeechpp_tpu.train.loop import run_training


def main():
    logging.basicConfig(level=logging.INFO)
    from megatts2_hierspeechpp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--phoneme_path", required=True)
    p.add_argument("--semantic_path", required=True)
    p.add_argument("-m", "--model", required=True)
    p.add_argument("--logs_dir", default="logs")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--peak_lr", type=float, default=1e-2)
    p.add_argument("--warmup_steps", type=int, default=2000)
    p.add_argument("--total_steps", type=int, default=200000)
    p.add_argument("--grad_accum", type=int, default=4)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--pad_multiple", type=int, default=64,
                   help="collate length rounding: each distinct padded shape "
                        "is a separate XLA compile (minutes over the device "
                        "tunnel), so keep this coarse for real runs")
    args = p.parse_args()

    model_dir = os.path.join(args.logs_dir, args.model)
    os.makedirs(model_dir, exist_ok=True)

    init_distributed()
    mesh = make_mesh()

    ds = Text2SemanticDataset(
        args.phoneme_path, args.semantic_path, text_frontend.SYMBOL_TO_ID
    )
    logging.info("AR dataset: %d items", len(ds))
    sampler = DistributedBucketSampler(
        ds.lengths(), args.batch_size * mesh.shape["data"],
        boundaries=[0, 200, 400, 700, 1000, 1400],
        num_replicas=jax.process_count(), rank=jax.process_index(),
        seed=args.seed,
    )

    model = Text2Semantic(phoneme_vocab_size=text_frontend.N_VOCAB * 4)
    sched = warmup_cosine_schedule(args.peak_lr * 1e-2, args.peak_lr,
                                   args.peak_lr * 1e-2, args.warmup_steps,
                                   args.total_steps)
    tx = scaled_adam(learning_rate=sched)

    with mesh:
        state = create_state(model, tx, jax.random.PRNGKey(args.seed))
        restored = ckpt_lib.restore(os.path.join(model_dir, "ckpt"), state)
        if restored is not None:
            state = restored
        train_step = jax.jit(make_train_step(model, tx, grad_accum=args.grad_accum))

        def batches(epoch):
            for idx in sampler.epoch_batches(epoch):
                yield collate([ds[i] for i in idx],
                              pad_multiple=args.pad_multiple)

        # held-out eval: the last few items (the bucket sampler owns the
        # training order; these still overlap train on tiny corpora — the
        # hook is observability, not model selection)
        from megatts2_hierspeechpp_tpu.train.evalhooks import make_ar_eval_fn

        eval_batch = collate([ds[i] for i in range(max(0, len(ds) - 4), len(ds))],
                             pad_multiple=args.pad_multiple)
        run_training(
            state, train_step, batches, model_dir,
            epochs=args.epochs, seed=args.seed,
            log_interval=20, save_interval=5000,
            shard_fn=lambda b: shard_batch(mesh, b),
            eval_interval=100, eval_fn=make_ar_eval_fn(model, eval_batch),
        )


if __name__ == "__main__":
    main()
