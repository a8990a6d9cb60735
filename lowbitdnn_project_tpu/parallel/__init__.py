"""Distributed layer: Mesh construction + DP/TP/SP sharding rules."""

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
from lowbitdnn_project_tpu.parallel.collective import (
    qconv2d_tp_ring,
    ring_all_gather,
)
from lowbitdnn_project_tpu.parallel.spatial import (
    halo_exchange_rows,
    qconv2d_sp,
    shard_spatial,
)
from lowbitdnn_project_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_apply,
    run_pipeline,
    run_pipeline_het,
    shard_stage_params,
)

__all__ = [
    "ring_all_gather",
    "qconv2d_tp_ring",
    "halo_exchange_rows",
    "qconv2d_sp",
    "shard_spatial",
    "make_pipeline_mesh",
    "pipeline_apply",
    "run_pipeline",
    "run_pipeline_het",
    "shard_stage_params",
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_qparams_tp",
    "replicate_qparams",
    "shard_batch",
]
