"""Mesh / sharding layer (pjit-era replacement for DDP+NCCL)."""

from bert_vits2_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    init_distributed,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from bert_vits2_tpu.parallel.sharding import tp_shard_tree, tp_spec, tp_specs

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "init_distributed",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "tp_shard_tree",
    "tp_spec",
    "tp_specs",
]
