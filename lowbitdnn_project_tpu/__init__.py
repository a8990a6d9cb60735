"""lowbitdnn_project_tpu — a TPU-native low-bit CNN inference engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
GPU research project alnfedorov/lowbitdnn-project (INT8/INT4 quantized
convolution and GEMM with per-channel scales, fused requantize+bias+ReLU
epilogues, quantized Winograd 3x3 fast paths, quantized pooling, an
FP32->quantized model converter, gradient-free annealing training, and a
correctness/roofline benchmark harness) — re-expressed idiomatically for TPU.

Layer map (TPU-native analogue of reference SURVEY.md §1):

    models/     model zoo + FP32->quantized converter   (ref: qtorch/nn, tmp.py)
    ops/        quantized op library (conv/linear/pool) (ref: qtorch/cpp bindings)
    kernels/    Pallas MXU kernels                      (ref: cpp/int8conv CUDA lab)
    quant/      QTensor + quantize/dequantize/calibrate (ref: qtorch functional/quantization.py)
    parallel/   Mesh/pjit/shard_map DP+TP layer         (new; no reference counterpart)
    train/      annealing + QAT training                (ref: python/df-optimization)
    bench/      roofline + sweep harness                (ref: cpp/libbenchmark, check.cu)
    runtime/    native C++ host-side pieces             (ref: refConv2DForward.hpp)
    utils/      layouts, checkpoints, profiling
"""

from lowbitdnn_project_tpu.quant import (
    QTensor,
    quantize,
    dequantize,
    fake_quantize,
    compute_scale,
    pack_int4,
    unpack_int4,
    Calibrator,
)

__version__ = "0.1.0"

__all__ = [
    "QTensor",
    "quantize",
    "dequantize",
    "fake_quantize",
    "compute_scale",
    "pack_int4",
    "unpack_int4",
    "Calibrator",
]
