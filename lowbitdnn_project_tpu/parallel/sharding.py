"""Sharding rules for quantized CNN parameters: K-channel TP over ICI.

Packed int8 conv weights are sharded along the output-channel (K) axis —
the TPU-native analogue of the reference's intra-kernel outC-blocking
(blockIdx.z over channel groups, conv2DForward3x3TensorCores.cuh:551-554),
lifted to the chip level. Per-channel scales and biases shard with their
channel; activations shard on batch. XLA's SPMD partitioner inserts the
all-gathers/reduce-scatters on ICI and overlaps them with conv compute
(latency-hiding scheduler), per the scaling-book recipe: annotate shardings,
let XLA place collectives.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lowbitdnn_project_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from lowbitdnn_project_tpu.quant import QTensor
from lowbitdnn_project_tpu.models.layers import QConvParams, QLinearParams


def _shard_qtensor_on_axis(q: QTensor, mesh: Mesh, channel_axis: int) -> QTensor:
    """Shard a QTensor's values (and per-channel scale) on one named axis."""
    ndim = q.values.ndim
    spec = [None] * ndim
    spec[channel_axis % ndim] = MODEL_AXIS
    values = jax.device_put(q.values, NamedSharding(mesh, P(*spec)))
    if q.axis is not None and (q.axis % ndim) == (channel_axis % ndim):
        scale = jax.device_put(q.scale, NamedSharding(mesh, P(*spec)))
    else:
        scale = jax.device_put(q.scale, NamedSharding(mesh, P()))
    # zero_point is static metadata (a Python int), not a device array
    return QTensor(values=values, scale=scale, bits=q.bits, axis=q.axis,
                   zero_point=q.zero_point)


def shard_qparams_tp(qparams: Any, mesh: Mesh) -> Any:
    """Walk a quantized param pytree, sharding every conv/linear on K.

    Conv HWIO weights shard on axis 3 (K); linear (K_in, K_out) on axis 1;
    biases on their only axis. Structure-agnostic: works for any model in
    models/ because it dispatches on the QConvParams/QLinearParams node types.
    """
    def go(node):
        if isinstance(node, QConvParams):
            bias = None if node.bias is None else jax.device_put(
                node.bias, NamedSharding(mesh, P(MODEL_AXIS)))
            return QConvParams(
                weight=_shard_qtensor_on_axis(node.weight, mesh, 3), bias=bias)
        if isinstance(node, QLinearParams):
            bias = None if node.bias is None else jax.device_put(
                node.bias, NamedSharding(mesh, P(MODEL_AXIS)))
            return QLinearParams(
                weight=_shard_qtensor_on_axis(node.weight, mesh, 1), bias=bias)
        return node

    return jax.tree_util.tree_map(
        go, qparams,
        is_leaf=lambda n: isinstance(n, (QConvParams, QLinearParams)))


def replicate_qparams(qparams: Any, mesh: Mesh) -> Any:
    return jax.device_put(qparams, NamedSharding(mesh, P()))


def shard_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    return jax.device_put(
        x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))))
