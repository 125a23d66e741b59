"""Device mesh + sharding helpers (replaces the reference's DDP/NCCL layer,
train_ms.py:71-81, 250-258).

One global mesh with axes ("data", "model"):
- "data": utterance batches (the reference's only strategy — DDP);
- "model": tensor parallelism for the BERT encoders / large layers when a
  model exceeds one chip (SURVEY.md §2.9).

Everything goes through jax.jit with NamedSharding'ed inputs; XLA inserts the
gradient psums over ICI (intra-slice) / DCN (multi-slice) automatically.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put every leaf with its batch axis sharded over `data`."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up (the torchrun/env:// equivalent, train_ms.py:74).

    No-op for single-process runs; on a real multi-host TPU slice JAX picks
    the topology up from the environment.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
