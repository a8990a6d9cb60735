"""Quantized op library: conv, linear, pooling."""

from lowbitdnn_project_tpu.ops.conv import (
    conv2d_int32,
    im2col,
    qconv2d,
)
from lowbitdnn_project_tpu.ops.linear import qlinear
from lowbitdnn_project_tpu.ops.pool import (
    avg_pool2d,
    global_avg_pool2d_int32,
    max_pool2d,
    qmax_pool2d,
)
from lowbitdnn_project_tpu.ops.winograd import (
    qconv2d_winograd,
    wino_quantize_filter,
)
from lowbitdnn_project_tpu.ops.grad import make_qconv2d_train

__all__ = [
    "conv2d_int32",
    "im2col",
    "qconv2d",
    "qlinear",
    "qmax_pool2d",
    "max_pool2d",
    "avg_pool2d",
    "global_avg_pool2d_int32",
    "qconv2d_winograd",
    "wino_quantize_filter",
    "make_qconv2d_train",
]
