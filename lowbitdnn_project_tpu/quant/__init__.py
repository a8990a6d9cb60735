"""Quantization core: QTensor, quantize/dequantize, int4 packing, calibration."""

from lowbitdnn_project_tpu.quant.qtensor import QTensor, QMAX, scale_shape
from lowbitdnn_project_tpu.quant.quantize import (
    compute_scale,
    group_channel_scale,
    quantize,
    dequantize,
    fake_quantize,
)
from lowbitdnn_project_tpu.quant.int4 import pack_int4, unpack_int4
from lowbitdnn_project_tpu.quant.calibrate import Calibrator, calibrate_model

__all__ = [
    "QTensor",
    "QMAX",
    "scale_shape",
    "compute_scale",
    "group_channel_scale",
    "quantize",
    "dequantize",
    "fake_quantize",
    "pack_int4",
    "unpack_int4",
    "Calibrator",
    "calibrate_model",
]
