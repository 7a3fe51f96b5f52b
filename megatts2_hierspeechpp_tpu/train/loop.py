"""Training-loop orchestration shared by the CLI trainers.

Replaces the reference's per-rank loops (train_ms.py:186-349) with a
single-program pjit loop: epoch-seeded bucket batches, host data loading with
simple double-buffered prefetch, jitted train step, periodic scalar logging
(JSONL + stdout) and checkpointing with latest-step resume.
"""
from __future__ import annotations

import json
import logging
import os
import threading
import time
from queue import Queue
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from megatts2_hierspeechpp_tpu.train import checkpoints as ckpt_lib

log = logging.getLogger("megatts2")


class ScalarLogger:
    """JSONL scalar logger (observability equivalent of the reference's
    TensorBoard SummaryWriter, train_ms.py:324-343)."""

    def __init__(self, model_dir: str):
        os.makedirs(model_dir, exist_ok=True)
        self.path = os.path.join(model_dir, "scalars.jsonl")
        self._f = open(self.path, "a")

    def write(self, step: int, scalars: Dict[str, float]):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()


def prefetch(iterable: Iterable, size: int = 2):
    """Host-side loader prefetch (the reference used DataLoader workers).

    Producer errors (missing/corrupt sidecar .npy, I/O failures) are carried
    across the thread boundary and re-raised in the consumer so training
    fails loudly instead of hanging on q.get()."""
    q: Queue = Queue(maxsize=size)
    _SENTINEL = object()

    def producer():
        try:
            for item in iterable:
                q.put(item)
            q.put(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 — re-raised in the consumer
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def _stamp_git_provenance(model_dir: str) -> None:
    """Record the framework git hash into the run dir (reference
    utils.check_git_hash provenance stamp, utils.py:219-236)."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        h = subprocess.run(
            ["git", "-C", repo, "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        return
    if not h:
        return
    path = os.path.join(model_dir, "githash")
    prev = open(path).read().strip() if os.path.exists(path) else None
    if prev and prev != h:
        log.warning("git hash changed since this run dir was created: %s -> %s",
                    prev[:8], h[:8])
    os.makedirs(model_dir, exist_ok=True)
    with open(path, "w") as f:
        f.write(h + "\n")


def run_training(
    state,
    train_step: Callable,
    batch_iter_fn: Callable[[int], Iterable[Dict[str, np.ndarray]]],
    model_dir: str,
    epochs: int,
    seed: int = 1234,
    log_interval: int = 20,
    save_interval: int = 5000,
    shard_fn: Optional[Callable] = None,
    start_epoch: int = 0,
    eval_interval: Optional[int] = None,
    eval_fn: Optional[Callable] = None,
):
    """Generic loop; `batch_iter_fn(epoch)` yields collated numpy batches."""
    logger = ScalarLogger(model_dir)
    _stamp_git_provenance(model_dir)
    base_rng = jax.random.PRNGKey(seed)
    step = int(np.asarray(state.step))
    t_last = time.time()

    for epoch in range(start_epoch, epochs):
        # per-step rng derived from (epoch, index): a crash-restart resumed at
        # an epoch boundary replays the identical rng stream (the reference's
        # DataLoader epoch seeding has the same property, data_utils.py:560)
        epoch_rng = jax.random.fold_in(base_rng, epoch)
        for i, batch in enumerate(prefetch(batch_iter_fn(epoch))):
            if shard_fn is not None:
                batch = shard_fn(batch)
            sub = jax.random.fold_in(epoch_rng, i)
            state, metrics = train_step(state, batch, sub)
            step += 1
            if step % log_interval == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t_last
                metrics["steps_per_sec"] = log_interval / max(dt, 1e-6)
                t_last = time.time()
                logger.write(step, metrics)
                log.info("epoch %d step %d %s", epoch, step, metrics)
            if step % save_interval == 0:
                ckpt_lib.save(os.path.join(model_dir, "ckpt"), state, step)
            if eval_fn is not None and eval_interval and step % eval_interval == 0:
                # periodic eval hook (reference: evaluate() + TB images every
                # eval_interval, train_ms.py:345-405); receives (state, step,
                # model_dir) and may write plots via utils/plotting.py
                try:
                    eval_scalars = eval_fn(state, step, model_dir)
                    if eval_scalars:
                        logger.write(step, {f"eval/{k}": v
                                            for k, v in eval_scalars.items()})
                except Exception as e:  # eval must never kill training
                    log.warning("eval_fn failed at step %d: %s", step, e)
        # epoch checkpoint
        ckpt_lib.save(os.path.join(model_dir, "ckpt"), state, step)
    return state
