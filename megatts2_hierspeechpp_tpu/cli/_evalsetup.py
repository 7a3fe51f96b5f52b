"""Shared held-out-batch construction for the training CLIs' periodic eval
(reference: eval_loader over hps.data.validation_files, train_ms.py:179-184)."""
from __future__ import annotations

import logging
import os

from megatts2_hierspeechpp_tpu.data.dataset import (
    DatasetConfig,
    SidecarDataset,
    collate,
)

log = logging.getLogger("megatts2")


def make_eval_batch(hps, fallback, max_items: int = 4, cfg=None):
    """Collate a few utterances from validation_files; falls back to the
    first training batch when no validation list is usable (the hook is
    observability, not model selection).

    `cfg` is the DatasetConfig the TRAINING dataset uses — pass it through so
    validation items aren't silently filtered by mismatched defaults."""
    val = hps.data.get("validation_files", None)
    if val and os.path.exists(val):
        try:
            ds = SidecarDataset(val, cfg if cfg is not None else DatasetConfig())
            if len(ds):
                return collate([ds[i] for i in range(min(len(ds), max_items))])
        except Exception as e:
            log.warning("validation_files unusable (%s); eval on train batch", e)
    return fallback
