"""Checkpoint save/restore with reference-compatible resume semantics.

Reference behavior (/root/reference/utils.py:19-76, train_ms.py:163-175):
torch .pth dicts saved as G_{step}.pth / D_{step}.pth every save_interval,
resume picks the latest by digit-sorted glob, partial loads tolerated, LR
scheduler reconstructed from the epoch number.

Here: orbax-style sharded checkpoints (via orbax.checkpoint) holding the full
train-state pytree (params, optimizer state, VQ stats, step), same
latest-by-step resume rule, and a `keep` retention policy.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax


def _ckpt_dir(base: str, step: int) -> str:
    return os.path.join(base, f"step_{step:08d}")


def latest_step(base: str) -> Optional[int]:
    if not os.path.isdir(base):
        return None
    steps = []
    for name in os.listdir(base):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def save(base: str, state: Any, step: int, keep: int = 3) -> str:
    import orbax.checkpoint as ocp

    os.makedirs(base, exist_ok=True)
    path = _ckpt_dir(base, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()

    steps = sorted(
        int(m.group(1))
        for name in os.listdir(base)
        if (m := re.fullmatch(r"step_(\d+)", name))
    )
    for old in steps[:-keep]:
        import shutil

        shutil.rmtree(_ckpt_dir(base, old), ignore_errors=True)
    return path


def restore(base: str, example_state: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure of example_state; returns None if absent."""
    import orbax.checkpoint as ocp

    step = step if step is not None else latest_step(base)
    if step is None or not os.path.isdir(_ckpt_dir(base, step)):
        return None
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(lambda x: x, example_state)
    return ckptr.restore(os.path.abspath(_ckpt_dir(base, step)), target)


def restore_raw(base: str, step: Optional[int] = None) -> Any:
    """Restore the latest (or given-step) checkpoint WITHOUT an example tree.

    Returns the raw saved pytree as nested dicts of numpy arrays — enough to
    pull `params_g` / `params_plm` / `vq` out of a finished training run for
    serving (infer/from_training.py) without rebuilding optimizer state.
    Returns None if no checkpoint exists.
    """
    import orbax.checkpoint as ocp

    step = step if step is not None else latest_step(base)
    if step is None or not os.path.isdir(_ckpt_dir(base, step)):
        return None
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(_ckpt_dir(base, step)))
