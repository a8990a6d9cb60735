"""Pallas MXU/VPU kernels — the TPU-native analogue of cpp/int8conv."""

from lowbitdnn_project_tpu.kernels.matmul_int8 import (
    choose_blocks,
    int8_matmul_fused,
    int8_matmul_xla,
)
from lowbitdnn_project_tpu.kernels.matmul_w4a8 import (
    pack_int4_rows,
    w4a8_matmul_fused,
    w4a8_matmul_xla,
)
from lowbitdnn_project_tpu.kernels.conv_direct import conv2d_direct_int8
from lowbitdnn_project_tpu.kernels.conv_direct2 import conv2d_direct_v2
from lowbitdnn_project_tpu.kernels.winograd_fused import conv3x3_winograd_fused

__all__ = [
    "int8_matmul_fused",
    "int8_matmul_xla",
    "choose_blocks",
    "w4a8_matmul_fused",
    "w4a8_matmul_xla",
    "pack_int4_rows",
    "conv2d_direct_int8",
    "conv2d_direct_v2",
    "conv3x3_winograd_fused",
]
