"""Device mesh + sharding helpers.

The reference scales with single-node DDP over NCCL (train_ms.py:84-106);
here the equivalent is a 1-D `data` mesh axis under GSPMD: parameters are
replicated, batches are sharded on axis 0, and XLA inserts the gradient
all-reduces (and the RVQ EMA-stat reductions — fixing the reference's
unsynced-codebook race, SURVEY.md §5) automatically over ICI.

An optional `model` axis is provisioned for tensor-sharding the PLM when a
larger-than-HBM config is used (BASELINE north star).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1) -> Mesh:
    devices = jax.devices()
    n_data = n_data or (len(devices) // n_model)
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array in a pytree with batch-axis sharding."""
    ds = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, ds), batch)


def init_distributed():
    """Multi-host initialization (call once per host before building the mesh).

    Replaces the reference's torch.distributed NCCL env:// rendezvous
    (train_ms.py:106) with jax.distributed (coordinator from env vars
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or TPU
    metadata auto-detection on Cloud TPU pods — this jax build does not read
    the env vars itself, so pass them explicitly when present).

    Exercised for real (2 OS processes, coordinator rendezvous + one
    cross-process AllReduce) by tools/smoke_distributed.py /
    tests/test_distributed_smoke.py.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
