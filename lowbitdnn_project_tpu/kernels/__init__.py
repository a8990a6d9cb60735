"""Pallas MXU/VPU kernels — the TPU-native analogue of cpp/int8conv."""

from lowbitdnn_project_tpu.kernels.matmul_int8 import (
    int8_matmul_fused,
    int8_matmul_xla,
)

__all__ = ["int8_matmul_fused", "int8_matmul_xla"]
