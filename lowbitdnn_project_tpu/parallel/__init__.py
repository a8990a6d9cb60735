"""Distributed layer: Mesh construction + DP/TP sharding rules."""

from lowbitdnn_project_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
)
from lowbitdnn_project_tpu.parallel.sharding import (
    replicate_qparams,
    shard_batch,
    shard_qparams_tp,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_qparams_tp",
    "replicate_qparams",
    "shard_batch",
]
