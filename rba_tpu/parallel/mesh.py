"""Device mesh + sharding helpers.

The reference's only parallelism is NCCL data-parallel DDP
(/root/reference/train_net.py:393-403; SURVEY.md §2.5).  The TPU-native
equivalent is a 1-D ``data`` mesh: batches are sharded over it, parameters
are replicated, and XLA inserts the gradient all-reduce over ICI from the
shardings — no process-group bootstrap, no explicit collectives.

A second ``model`` axis carries optional Megatron-style tensor parallelism
for the transformer MLPs (parallel/tp.py) — capability beyond the
reference's DDP; the released models fit one chip, so it is off by default.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_axis: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n % model_axis:
        raise ValueError(
            f"n_devices={n} is not divisible by model_axis={model_axis}; "
            f"pick a model axis that divides the device count"
        )
    devices = np.asarray(devices[:n]).reshape(n // model_axis, model_axis)
    return Mesh(devices, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh, sharded along dim 0."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
