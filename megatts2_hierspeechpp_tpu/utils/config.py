"""Config system: JSON configs with attribute access.

Mirrors the field names of the reference configs (``configs/config.json`` of
liuhuang31/Megatts2_HierSpeechpp, see /root/reference/utils.py:168-295) so that a
user of the reference can reuse their config files unchanged.
"""
from __future__ import annotations

import json
import os
from typing import Any, Mapping


class HParams(dict):
    """Recursive attribute-access dict (same surface as reference utils.HParams)."""

    def __init__(self, **kwargs: Any):
        super().__init__()
        for k, v in kwargs.items():
            if isinstance(v, Mapping):
                v = HParams(**v)
            self[k] = v

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def copy(self) -> "HParams":
        return HParams(**self)

    def to_dict(self) -> dict:
        return {
            k: (v.to_dict() if isinstance(v, HParams) else v) for k, v in self.items()
        }


def load_hparams(path: str) -> HParams:
    with open(path, "r") as f:
        data = json.load(f)
    return HParams(**data)


def save_hparams(hps: HParams, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(hps.to_dict(), f, indent=2)
